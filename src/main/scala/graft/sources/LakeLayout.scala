package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout writer: the data-organization step that decides whether every
  * later 100 TB query scans the whole corpus or 1% of it.
  *
  * Two levers, both free at read time forever after:
  *
  *  - **Directory partitioning** (`partitionBy`): queries filtering on a
  *    partition column never open the other directories — partition pruning
  *    happens in the driver against file paths, before any I/O.
  *  - **Sort-within-files** (`sortWithinPartitions`): parquet keeps min/max
  *    stats per row group; sorting the sort columns makes those ranges
  *    disjoint and tight, so predicate pushdown skips whole row groups
  *    instead of post-filtering every page.
  *
  * The write repartitions into EXACTLY `filesPerPartition` tasks keyed on
  * an id hash-bucket FIRST (explicit partition count — a count-less
  * `repartition(cols…)` is fair game for AQE partition coalescing, which
  * collapses small stages and with them the file layout): each task holds
  * one bucket's slice of every partition value and writes at most one file
  * per directory, so a directory gets ≤ `filesPerPartition` files
  * regardless of cluster size. Without this, every one of T shuffle tasks
  * writes into every directory — T×P small files, the classic lake-rot
  * failure. The knob trades file count against per-file size / write
  * parallelism — at 100 TB set it so files land in the 128 MB–1 GB range.
  */
object LakeLayout {

  def writeOptimized(docs: DataFrame, path: String,
                     partitionCols: Seq[String] = Seq("lang"),
                     sortCols: Seq[String] = Seq("n_chars"),
                     filesPerPartition: Int = 1,
                     idCol: String = "doc_id"): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    val bucket = pmod(xxhash64(col(idCol)), lit(filesPerPartition.toLong))
    docs
      .repartition(filesPerPartition, bucket)
      // partition cols lead the in-task sort so each directory's slice is
      // contiguous, then the stat columns so row-group min/max are tight
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read the layout back: partition discovery re-derives the partition
    * columns from directory names; filters on them prune directories,
    * filters on sort columns push down to row-group stats. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compaction plan over a file manifest `(dir, file, bytes)` — the
    * OPTIMIZE step of lake maintenance: small files accrete per directory
    * (streaming appends, changeset MERGEs), and scan cost degrades with
    * per-file overhead until someone coalesces them. Greedy contiguous
    * grouping in file-name order: a file joins the current group while the
    * group's size BEFORE it is under `targetBytes` (groups are ≥ target
    * only via their last member — the packSequences budget rule, on
    * bytes). Output one row per planned output file: `(dir, group_no,
    * n_files, group_bytes, first_file, last_file)`; `n_files = 1` groups
    * are already-compact files the plan leaves untouched.
    *
    * Plan shape: one per-dir window (prefix sum in name order) + one hash
    * agg — manifest-sized, never touches data bytes. */
  def compactionPlan(files: DataFrame, targetBytes: Long,
                     dirCol: String = "dir", fileCol: String = "file",
                     bytesCol: String = "bytes"): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dirCol)).orderBy(col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    files
      .withColumn("_cum", sum(col(bytesCol)).over(w))
      .withColumn("group_no",
        expr(s"(_cum - $bytesCol) DIV ${targetBytes}L"))
      .groupBy(col(dirCol).as("dir"), col("group_no"))
      .agg(count(lit(1)).as("n_files"), sum(col(bytesCol)).as("group_bytes"),
        min(col(fileCol)).as("first_file"), max(col(fileCol)).as("last_file"))
  }
}
