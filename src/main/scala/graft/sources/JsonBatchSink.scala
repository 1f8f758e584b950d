package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ArticleOps

/** K1/K2 — the reference's batched JSON sink
  * (`batch_{NNN}/article_{NNNNNN}.json`, `src/azure_manager.py:33-78`,
  * batch size `config/config.yaml:25`), re-expressed as a partitioned
  * columnar write:
  *
  *  - `batch_id` becomes a partition column → one directory per batch,
  *    written by a single Spark job (the job commit protocol supplies the
  *    all-or-nothing semantics the reference approximates with a success
  *    flag, `src/azure_manager.py:60-78`);
  *  - each record carries the reference's `file_name` so the logical layout
  *    is preserved byte-for-byte in the data even though physical files are
  *    task-sized (one-file-per-record at 100 TB would be a small-files
  *    disaster — `maxRecordsPerFile` bounds file size instead).
  */
object JsonBatchSink {

  /** Write `docs` as JSON-lines partitioned by batch directory. Returns the
    * number of records written. */
  def write(docs: DataFrame, jsonCols: Seq[String], outDir: String,
            orderCol: String, batchSize: Int): Long = {
    val out = ArticleOps.batchLayout(docs, orderCol, batchSize)
      .select((jsonCols :+ "file_name" :+ "batch_id").map(col): _*)
    out.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", batchSize)
      .partitionBy("batch_id")
      .json(outDir)
    // count what was written (output-sized scan, not a source re-scan).
    // The explicit schema keeps this safe for an EMPTY write: schema
    // inference would throw with only _SUCCESS in the directory.
    docs.sparkSession.read.schema(out.schema).json(outDir).count()
  }

  /** S10/S11 — read the batch layout back (schema inferred or given);
    * `batch_id` is recovered from partition discovery. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)
}
