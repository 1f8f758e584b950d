package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format source/sink layer: one read/write surface over the
  * formats this Spark build ships (parquet, orc, json, csv).
  *
  * Posture per format at 100 TB:
  *  - `parquet` / `orc` — columnar, compressed, predicate/projection
  *    pushdown to row-group (parquet) / stripe (orc) stats: the storage
  *    formats; everything else is an exchange format.
  *  - `json` / `csv` — row-oriented schema-on-read: every query scans every
  *    byte. Reads REQUIRE an explicit schema here: schema inference is a
  *    whole extra pass over the data and can differ run-to-run on dirty
  *    inputs — never acceptable on a lake path.
  *
  * CSV is configured for LOSSLESS round-trips (quotes on, escaped quotes,
  * `multiLine` for embedded newlines, whitespace trimming OFF — univocity
  * trims unquoted fields by default) — the FormatsSpec drives adversarial
  * content (commas, quotes, newlines, unicode, edge whitespace) through
  * every format.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private def csvOptions: Map[String, String] = Map(
    "header" -> "true", "quote" -> "\"", "escape" -> "\"",
    "multiLine" -> "true",
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  def write(df: DataFrame, path: String, format: String): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.options(csvOptions) else w).save(path)
  }

  /** Schema-enforced read; `schema` is mandatory (see scaladoc above). */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.options(csvOptions) else r).load(path)
  }

  /** PERMISSIVE corrupt-record read over line-delimited JSON — the BATCH
    * quarantine surface (the streaming side's dead-letter split,
    * [[graft.streaming.Streams.splitValid]], is its sibling; the reference
    * quarantines failed articles and keeps going,
    * `/root/reference/src/main.py:122-135`,
    * `/root/reference/src/queue_manager.py:80-84`). A malformed line —
    * truncated JSON, non-JSON garbage, a type mismatch — never kills the
    * read: its data fields come back null and the RAW input line lands
    * verbatim in `corruptCol` for forensics/replay, which is the first
    * thing a real 100 TB crawl ingest needs (one bad record per billion is
    * a certainty, a job restart per bad record is not an option).
    * Map-only: the quarantine split is a per-row predicate on the scan. */
  def readJsonQuarantine(spark: SparkSession, path: String, schema: StructType,
                         corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already carries $corruptCol — pass the DATA schema only")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
