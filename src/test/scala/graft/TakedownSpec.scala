package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Deletion legs for the dedup-side persisted artifacts (signature index,
  * span index, pHash band index, pair graph): survivor-exactness (delete
  * == rebuild over survivors), NO-RESIDUE (a deleted doc can never
  * resurface as a probe partner), idempotence, and the partition-scoped
  * write discipline of the batch_id-partitioned streaming index. */
class TakedownSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-takedown-$tag-").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("removeFromMinhashIndex: survivor index equals a rebuild over the " +
    "survivors; a deleted doc never resurfaces against its own exact copy " +
    "(no residue); idempotent") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val base = docs.where($"doc_id" < 200)
    val sigs = Dedup.minhashTable(base, 3, 16)
    val goneIds = base.where($"doc_id" % 7 === 5).select($"doc_id")
    val survivors = Dedup.removeFromMinhashIndex(sigs, goneIds)
    // exactness: delete == rebuild over survivors
    val rebuilt = Dedup.minhashTable(
      base.join(goneIds, Seq("doc_id"), "left_anti"), 3, 16)
    assert(rows(survivors) == rows(rebuilt))
    // no residue: probe with an EXACT COPY of a deleted doc — against the
    // un-deleted index it pairs with its source; against the survivor
    // index the deleted id must never appear
    val victim = base.where($"doc_id" === 5L)
      .select(lit(900000L).as("doc_id"), $"text")
    val before = Dedup.minhashPairsIncremental(sigs, victim, 3, 16, 4, 50)
    assert(before.where($"doc_a" === 5L || $"doc_b" === 5L).count() > 0,
      "planted copy must pair with its source pre-delete")
    val after = Dedup.minhashPairsIncremental(survivors, victim, 3, 16, 4, 50)
    assert(after.where($"doc_a" === 5L || $"doc_b" === 5L).isEmpty,
      "deleted doc resurfaced as a near-dup partner")
    // idempotent: nothing left to remove
    assert(rows(Dedup.removeFromMinhashIndex(survivors, goneIds)) ==
      rows(survivors))
  }

  test("removeFromMinhashIndexDir is partition-scoped: only batch " +
    "partitions containing a removed doc are rewritten, an emptied " +
    "partition is deleted, untouched partitions keep their exact files") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .where($"doc_id" < 300)
    val dir = tmp("mhidx") + "/index"
    (0L to 2L).foreach { b =>
      Dedup.minhashTable(docs.where($"doc_id" % 3 === b), 3, 16)
        .withColumn("batch_id", lit(b))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    }
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileSnapshot(b: Long): Set[(String, Long, Long)] =
      fs.listStatus(new Path(dir, s"batch_id=$b")).toSeq
        .filter(_.isFile)
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .toSet
    val keep0 = fileSnapshot(0L)
    val keep2 = fileSnapshot(2L)
    // remove docs living only in batch 1 (doc_id % 3 == 1)
    val gone = docs.where($"doc_id" % 3 === 1 && $"doc_id" % 5 === 0)
      .select($"doc_id")
    Dedup.removeFromMinhashIndexDir(spark, dir, gone)
    assert(fileSnapshot(0L) == keep0, "untouched partition 0 was rewritten")
    assert(fileSnapshot(2L) == keep2, "untouched partition 2 was rewritten")
    val left = spark.read.parquet(dir)
    assert(left.join(gone, Seq("doc_id")).isEmpty, "residue after delete")
    assert(rows(left.select($"doc_id", $"i", $"mh")) ==
      rows(Dedup.minhashTable(docs.join(gone, Seq("doc_id"), "left_anti"),
        3, 16)))
    // idempotent: re-delivering the same ids touches nothing
    val snap1 = fileSnapshot(1L)
    Dedup.removeFromMinhashIndexDir(spark, dir, gone)
    assert(fileSnapshot(1L) == snap1, "re-delivered delete rewrote files")
    // emptying a whole partition deletes its directory outright
    Dedup.removeFromMinhashIndexDir(spark, dir,
      docs.where($"doc_id" % 3 === 2).select($"doc_id"))
    assert(!fs.exists(new Path(dir, "batch_id=2")),
      "emptied partition directory must be deleted (stale files would " +
        "resurrect the deleted docs)")
    assert(fileSnapshot(0L) == keep0)
  }

  test("removeFromSpanIndex and removeFromPhashIndex equal rebuilds over " +
    "the survivors; pHash probe shows no residue") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // spans
    val idx = Dedup.spanIndex(docs.where($"doc_id" < 200), 8)
    val goneIds = docs.where($"doc_id" < 200 && $"doc_id" % 6 === 0)
      .select($"doc_id")
    assert(rows(Dedup.removeFromSpanIndex(idx, goneIds)) ==
      rows(Dedup.spanIndex(
        docs.where($"doc_id" < 200).join(goneIds, Seq("doc_id"), "left_anti"),
        8)))
    // pHash
    val bands = Multimodal.imagePHash(spark,
      Multimodal.phashImageTable(spark, docs))
    val base = bands.where($"media_id" % 4 =!= 3)
    val goneImgs = bands.where($"media_id" % 8 === 1).select($"media_id")
    val survivors = Multimodal.removeFromPhashIndex(base, goneImgs)
    assert(rows(survivors) ==
      rows(base.join(goneImgs, Seq("media_id"), "left_anti")))
    val probe = Multimodal.phashPairsIncremental(survivors,
      bands.where($"media_id" % 4 === 3))
    val goneSet = goneImgs.as[Long].collect().toSet
    assert(probe.where($"doc_a".isin(goneSet.toSeq: _*) ||
      $"doc_b".isin(goneSet.toSeq: _*)).isEmpty,
      "deleted image resurfaced as a near-dup partner")
  }

  test("removeFromPairsArtifact drops every pair touching a deleted doc, " +
    "in place through the atomic swap; idempotent") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source").where($"doc_id" < 300)
    val dir = tmp("pairs")
    Dedup.buildPairsArtifact(docs, dir, 3, 5000L)
    val all = rows(Dedup.pairsFromArtifact(spark, dir))
    assert(all.nonEmpty, "need a non-empty pair graph for the test")
    // materialize the victim id — a lazy plan over the artifact would
    // reference the pre-swap files after the delete replaces them
    val gone = Dedup.pairsFromArtifact(spark, dir)
      .select($"doc_a").limit(1).as[Long].collect().toSet
    val goneIds = gone.toSeq.toDF("doc_id")
    Dedup.removeFromPairsArtifact(spark, dir, goneIds)
    val left = rows(Dedup.pairsFromArtifact(spark, dir))
    assert(left == all.filterNot(r =>
      gone(r.head.asInstanceOf[Long]) || gone(r(1).asInstanceOf[Long])))
    assert(left.size < all.size, "the deleted doc's pairs must be gone")
    Dedup.removeFromPairsArtifact(spark, dir, goneIds) // idempotent
    assert(rows(Dedup.pairsFromArtifact(spark, dir)) == left)
  }
}
