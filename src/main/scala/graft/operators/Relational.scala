package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Summaries.{exactSum, exactAvg, fx}

/** Relational workload (joins/aggs/top-k over the TPC-H-ish tables) — the
  * scale-bearing queries that exercise shuffle, join-strategy, and pushdown
  * behavior the way the reference's enrichment loop (`src/main.py:101-114`)
  * would at 100 TB.
  *
  * Join posture: dimension tables (`region`, `nation`, `supplier`,
  * `customer` at small SF) are broadcast — zero shuffle on the fact side for
  * those joins; the lineitem↔orders join shuffles both sides on the order
  * key (AQE re-plans to broadcast when the filtered side fits).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: full lineitem scan, 2-key hash agg with
    * map-side partials; measures as exact fixed-point sums. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(fx(col("l_quantity"), 100L)).as("sum_qty_x100"),
        sum(fx(col("l_extendedprice"), 100L)).as("sum_base_price_x100"),
        sum(fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L))
          .as("sum_disc_price_x10000"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped top-k: 3-way join + agg + order+limit. The limit is
    * pushed into a TakeOrderedAndProject — no full sort at scale. */
  def topRevenueOrders(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val c = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L))
        .as("revenue_x10000"))
      .orderBy(col("revenue_x10000").desc, col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-shaped multi-join: fact table joined through 4 broadcast dims,
    * grouped by nation. Star-join: all dim joins broadcast → single shuffle
    * (the final groupBy). */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L))
          .as("revenue_x10000"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** JSON-props extraction over events (reference parses JSON at
    * `src/azure_manager.py:133`): per-type sum of a JSON field. */
  def propsSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))
}
