package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-side LOGICAL views over the segmented BM25 artifact — what the
  * serving query actually consumes: segment unions, tombstone masks,
  * aggregated termdf/stats, and the query-time cap. Spec equality runs
  * against these (segment boundaries are layout, not semantics). */
object Bm25Views {

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) return true
    }
    false
  }

  private def segs(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(s"$dir/$c").drop("seg")

  private def minusDeleted(spark: SparkSession, dir: String,
                           df: DataFrame): DataFrame =
    if (hasData(spark, s"$dir/deleted"))
      df.join(segs(spark, dir, "deleted").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    else df

  def maxDf(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/meta").select(col("max_df")).head().getLong(0)

  def livePostings(spark: SparkSession, dir: String): DataFrame =
    minusDeleted(spark, dir, segs(spark, dir, "postings"))

  def liveDoclen(spark: SparkSession, dir: String): DataFrame =
    minusDeleted(spark, dir, segs(spark, dir, "doclen"))

  def termdfAgg(spark: SparkSession, dir: String): DataFrame =
    segs(spark, dir, "termdf").groupBy(col("t"))
      .agg(sum(col("df")).as("df")).where(col("df") > 0)

  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    segs(spark, dir, "stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_len")).as("tot_len"))

  /** Postings as the query serves them: live rows of under-cap terms. */
  def servedPostings(spark: SparkSession, dir: String): DataFrame =
    livePostings(spark, dir)
      .join(termdfAgg(spark, dir).where(col("df") <= maxDf(spark, dir))
        .select(col("t")), Seq("t"), "left_semi")
      .select(col("doc_id"), col("t"), col("tf"))

  def assertServedEqual(spark: SparkSession, a: String, b: String): Unit = {
    def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet
    assert(rows(servedPostings(spark, a)) == rows(servedPostings(spark, b)),
      "served postings diverged")
    assert(rows(liveDoclen(spark, a)) == rows(liveDoclen(spark, b)),
      "live doclen diverged")
    assert(rows(termdfAgg(spark, a)) == rows(termdfAgg(spark, b)),
      "aggregated termdf diverged")
    assert(rows(statsAgg(spark, a)) == rows(statsAgg(spark, b)),
      "aggregated stats diverged")
  }
}
