package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonBatchSink

/** K1/K2 partitioned JSON sink: layout fidelity + roundtrip. */
class SinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("batched JSON sink reproduces the reference layout and roundtrips") {
    val outDir = Files.createTempDirectory("jsonsink").toString + "/corpus"
    val docs = Tables.documents(spark, sfDir)
    val n = JsonBatchSink.write(docs, Seq("doc_id", "text", "lang", "source"),
      outDir, "doc_id", batchSize = 100)
    assert(n == docs.count())

    val back = JsonBatchSink.read(spark, outDir)
    assert(back.count() == n)
    // partition dirs exist per 100-doc batch
    val batches = back.select("batch_id").distinct().as[Long].collect().sorted
    assert(batches.toSeq == (0L until (n + 99) / 100).toSeq)
    // file_name column preserves the reference's per-article naming
    val first = back.where(col("doc_id") === 0).select("file_name").as[String].head()
    assert(first == "batch_000/article_000000.json")
    // content roundtrips
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val rt = back.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rt == orig)
  }

  test("manifest-committed sink: crash windows converge on re-run; a " +
    "committed sink is a no-op re-run; readers refuse an uncommitted dir") {
    import org.apache.hadoop.fs.Path
    val outDir = Files.createTempDirectory("jsonsink-mc").toString + "/corpus"
    val docs = Tables.documents(spark, sfDir).limit(250)
      .select($"doc_id", $"text", $"lang", $"source")
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cols = Seq("doc_id", "text", "lang", "source")

    // CRASH WINDOW 1: data staged / partially moved, manifest never
    // renamed in — simulate by a raw write (batch dirs present, no
    // manifest). The reader must refuse; the re-run must converge.
    JsonBatchSink.write(docs.limit(120), cols, outDir, "doc_id", 100)
    assert(fs.listStatus(new Path(outDir))
      .exists(_.getPath.getName.startsWith("batch_id=")), "partial state set up")
    intercept[IllegalArgumentException] {
      JsonBatchSink.readCommitted(spark, outDir)
    }
    val n = JsonBatchSink.writeCommitted(docs, cols, outDir, "doc_id", 100)
    assert(n == 250L)
    val back = JsonBatchSink.readCommitted(spark, outDir)
    assert(back.count() == 250L, "re-run did not discard the partial state")
    assert(!fs.exists(new Path(outDir, "_staging")))

    // COMMITTED: a blind retry is a no-op — same count, data untouched
    val mtimes = fs.listStatus(new Path(outDir))
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    assert(JsonBatchSink.writeCommitted(docs, cols, outDir, "doc_id", 100) == 250L)
    val mtimes2 = fs.listStatus(new Path(outDir))
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    assert(mtimes2 == mtimes, "a committed sink was rewritten on retry")

    // CRASH WINDOW 2: manifest.tmp staged but never renamed — still
    // uncommitted; re-run converges and the tmp is swept
    fs.delete(new Path(outDir, "_manifest"), false)
    val tmp = fs.create(new Path(outDir, "_manifest.tmp"), true)
    tmp.write("999".getBytes("UTF-8")); tmp.close()
    intercept[IllegalArgumentException] {
      JsonBatchSink.readCommitted(spark, outDir)
    }
    assert(JsonBatchSink.writeCommitted(docs, cols, outDir, "doc_id", 100) == 250L)
    assert(!fs.exists(new Path(outDir, "_manifest.tmp")))
    assert(JsonBatchSink.readCommitted(spark, outDir).count() == 250L)
  }

  test("article storage schema (nested metadata) round-trips through JSON") {
    import Schemas.{ArticleDoc, ArticleMetadata, PageMetadata}
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // the reference's own fixture articles (FIXTURES.md §1.2)
    val minimal = ArticleDoc("Test Article",
      "https://en.wikipedia.org/wiki/Test_Article", "This is test content",
      None, None, Seq("Test Category"), None, 123L, "mwclient", "wikitext", None)
    val full = ArticleDoc("Wikitext Article",
      "https://en.wikipedia.org/wiki/Wikitext_Article",
      "This is [[wikitext]] content with **bold** and *italic*.",
      Some("This is wikitext content with bold and italic."),
      Some("This is wikitext content with bold and italic."),
      Seq("Test", "Example"), None, 456L, "mwclient", "wikitext",
      Some(ArticleMetadata(57, 47, 47, 2, ts, "mwclient",
        PageMetadata(456L, 0, 789L, 50, ts))))
    val ds = Seq(minimal, full).toDS()
    val dir = Files.createTempDirectory("articledoc").toString + "/articles"
    ds.toDF().write.json(dir)
    val back = spark.read.schema(ds.schema).json(dir).as[ArticleDoc]
      .collect().sortBy(_.title).toSeq
    assert(back == Seq(minimal, full).sortBy(_.title))
  }
}
