package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Offset-format compatibility of the custom micro-batch source: the
  * round-12 cursor is a chunk-NAME watermark, but a checkpoint written by
  * the round-11 build carries the legacy {"chunks":N} COUNT. Deserializing
  * that as "nothing consumed" would silently re-read every chunk and
  * duplicate rows in the sink — the translation must map it to the name
  * of the N-th sorted chunk, and an unrecognizable format must fail
  * loudly, never restart from zero. */
class CorpusOffsetSpec extends AnyFunSuite with graft.SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-offset-").toString
    CorpusSourceV2.stage(
      graft.Tables.documents(spark, sfDir)
        .select($"doc_id", $"source", $"lang", $"text"),
      d, chunks = 4)
    d
  }

  private def stream = new CorpusMicroBatchStream(dir,
    new StructType().add("doc_id", LongType).add("text", StringType),
    Array.empty,
    new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration))

  test("current name-watermark offsets round-trip") {
    val o = CorpusOffset("chunk_00002.tsv")
    assert(stream.deserializeOffset(o.json()) == o)
    assert(stream.deserializeOffset("""{"watermark":""}""") ==
      CorpusOffset(""))
  }

  test("legacy {\"chunks\":N} checkpoints translate to the N-th sorted " +
    "chunk's name — a resume consumes exactly the unseen tail, no replay") {
    assert(stream.deserializeOffset("""{"chunks":2}""") ==
      CorpusOffset("chunk_00001.tsv"))
    assert(stream.deserializeOffset("""{"chunks":0}""") == CorpusOffset(""))
    // the translated watermark plans exactly the tail (chunks 2..3)
    val parts = stream.planInputPartitions(
      stream.deserializeOffset("""{"chunks":2}"""), stream.latestOffset())
    assert(parts.length == 2, s"expected the 2-chunk tail, got ${parts.length}")
  }

  test("an unrecognized offset format fails loudly (never a silent " +
    "restart-from-zero), and a count past the chunk list refuses") {
    intercept[IllegalStateException] {
      stream.deserializeOffset("""{"cursor":3}""")
    }
    intercept[IllegalArgumentException] {
      stream.deserializeOffset("""{"chunks":99}""")
    }
  }
}
