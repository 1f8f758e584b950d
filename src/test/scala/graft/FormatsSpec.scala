package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats

/** Multi-format source/sink layer: every supported format must round-trip
  * adversarial content losslessly under an enforced schema. */
class FormatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("all formats round-trip adversarial text losslessly") {
    // embedded commas, quotes, newlines, unicode, leading/trailing spaces
    val nasty = Seq(
      (1L, "plain text", "en", "src0", 10L),
      (2L, "comma, separated, values", "en", "src0", 24L),
      (3L, "a \"quoted\" phrase, and, commas", "de", "src1", 30L),
      (4L, "line one\nline two\nline three", "fr", "src1", 28L),
      (5L, "unicode: snowman ☃ and ümläut", "en", "src2", 28L),
      (6L, "  leading and trailing  ", "es", "src2", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expect = nasty.collect().map(_.toSeq).toSet
    Formats.supported.foreach { fmt =>
      val dir = tmp(s"graft-fmt-$fmt-")
      Formats.write(nasty, dir, fmt)
      val back = Formats.read(spark, dir, fmt, nasty.schema)
      // file sources surface every column nullable; names+types must hold
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        nasty.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$fmt schema drift")
      val got = back.collect().map(_.toSeq).toSet
      assert(got == expect,
        s"$fmt round-trip mismatch: ${got.diff(expect).take(2)} vs ${expect.diff(got).take(2)}")
    }
  }

  test("columnar formats push filters; row formats read with enforced schema") {
    val docs = Tables.documents(spark, sfDir)
    Seq("parquet", "orc").foreach { fmt =>
      val dir = tmp(s"graft-push-$fmt-")
      Formats.write(docs, dir, fmt)
      val plan = Formats.read(spark, dir, fmt, docs.schema)
        .where(col("n_chars") > 100L).select("doc_id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(n_chars"),
        s"$fmt did not push the filter:\n$plan")
    }
    // json path: same rows under the enforced schema, no inference pass
    val jdir = tmp("graft-json-")
    Formats.write(docs, jdir, "json")
    assert(Formats.read(spark, jdir, "json", docs.schema).count() == docs.count())
  }

  test("corrupt-record quarantine: every malformation class lands in " +
    "_corrupt_record with the raw line verbatim; valid rows parse intact; " +
    "the read never throws") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmp("graft-dirty-")
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "good one"}""", // valid
      """{"doc_id": 2, "lang":""",                           // truncated
      """### not json at all""",                             // garbage
      """{"doc_id": "abc", "lang": "de", "text": "typed"}""", // type mismatch
      """{"doc_id": 3, "lang": "fr", "text": "good two"}""", // valid
      """[1, 2, 3]""")                                       // wrong top-level
    spark.createDataset(lines).toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val schema = new StructType()
      .add("doc_id", LongType).add("lang", StringType).add("text", StringType)
    val back = Formats.readJsonQuarantine(spark, dir, schema).collect()
    assert(back.length == 6, "no line may be dropped or kill the read")
    val (bad, good) = back.partition(r => !r.isNullAt(3))
    assert(good.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "en", "good one"), (3L, "fr", "good two")))
    // raw malformed lines preserved VERBATIM (forensics/replay contract)
    assert(bad.map(_.getString(3)).toSet ==
      lines.toSet -- good.map(r => s"""{"doc_id": ${r.getLong(0)}, "lang": "${r.getString(1)}", "text": "${r.getString(2)}"}"""))
    // structurally-malformed rows carry NO parsed data fields; a TYPE
    // mismatch is partial salvage — the bad field nulls, well-typed
    // siblings survive alongside the raw line (Spark PERMISSIVE contract)
    val (typed, structural) = bad.partition(_.getString(3).contains("typed"))
    assert(structural.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
    assert(typed.map(r => (r.isNullAt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((true, "de", "typed")))
  }

  test("quarantine reader rejects a schema that already claims the corrupt column") {
    import org.apache.spark.sql.types.{StringType, StructType}
    val s = new StructType().add("_corrupt_record", StringType)
    intercept[IllegalArgumentException] {
      Formats.readJsonQuarantine(spark, "/tmp/unused", s)
    }
  }
}
