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
  * The write repartitions on (partition cols, hash-bucket of the id) FIRST:
  * without it every one of T shuffle tasks holds rows of every partition
  * value and writes its own file into every directory — T×P small files,
  * the classic lake-rot failure. With it, each partition directory gets
  * exactly `filesPerPartition` files regardless of task count (the knob
  * trades file count against per-file size / write parallelism — at 100 TB
  * set it so files land in the 128 MB–1 GB range).
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
      .repartition(partitionCols.map(col) :+ bucket: _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read the layout back: partition discovery re-derives the partition
    * columns from directory names; filters on them prune directories,
    * filters on sort columns push down to row-group stats. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
