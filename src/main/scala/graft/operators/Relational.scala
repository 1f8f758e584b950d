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

  /** TPC-H Q6-shaped filter-aggregate: every predicate reaches the parquet
    * scan (PushedFilters), one map-side-combined global agg — the minimal
    * "scan efficiency" probe. */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1994-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(fx(col("l_extendedprice") * col("l_discount"), 10000L))
        .as("revenue_x10000"), count(lit(1)).as("n_items"))

  /** TPC-H Q4-shaped EXISTS: count orders per priority having at least one
    * returned line item in a date window. The EXISTS executes as a LEFT
    * SEMI join — the probe side short-circuits on first match inside the
    * join (no `distinct`-then-inner-join double shuffle), and the
    * `l_returnflag` predicate is pushed to the lineitem parquet scan so
    * only the returned fraction ever shuffles. */
  def priorityReturns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val l = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Window ranking: each customer's top-revenue order (row_number over a
    * per-customer window) — the partitioned-window shape (shuffle on the
    * partition key only; no global sort). */
  def topOrderPerCustomer(spark: SparkSession, dir: String, topN: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice_x100").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("o_totalprice_x100", fx(col("o_totalprice"), 100L))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice_x100"),
        col("rn").cast("long").as("rn"))
  }

  /** Pearson correlation from exact integer sums — the fixed-point technique
    * extended to second-order statistics: every Σ is an integer, the final
    * formula is a handful of deterministic double ops, so both engines agree
    * bit-for-bit (unlike built-in corr(), whose running-moment accumulation
    * is partition-order-dependent). */
  def valueCorrelation(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("v", fx(col("value"), 100L)) // x100 keeps sum(v*v) far from Long overflow
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"), sum(col("k")).as("sk"),
        sum(col("v") * col("v")).as("svv"), sum(col("k") * col("k")).as("skk"),
        sum(col("v") * col("k")).as("svk"))
      .withColumn("corr_x10000",
        floor(lit(10000.0) *
          (col("n") * col("svk") - col("sv") * col("sk")) /
          (sqrt((col("n") * col("svv") - col("sv") * col("sv")).cast("double")) *
            sqrt((col("n") * col("skk") - col("sk") * col("sk")).cast("double"))) + 0.5)
          .cast("long"))
      .select(col("event_type"), col("n"), col("corr_x10000"))

  /** Event sessionization, relationally: a session break is a >gap pause
    * between a user's consecutive events (lag + cumulative sum over a
    * per-user window) — the batch form of a session window, exact in
    * integer microseconds so the oracle matches. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      .withColumn("new_session",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapMinutes * 60000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tsu")).as("start_us"), max(col("tsu")).as("end_us"))
  }

  /** Positional median (lower median): the value at row ⌈n/2⌉ of the sorted
    * group — pure relational (row_number + count), avoiding interpolation
    * formulas that differ across engines. */
  def medianValue(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("v", fx(col("value"), 10000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("v"), col("event_id"))
    ev
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      // floor division on both engines (a double-to-int CAST truncates in
      // Spark but rounds in DuckDB)
      .where(col("rn") === floor((col("cnt") + 1) / 2).cast("int"))
      .select(col("event_type"), col("v").as("median_x10000"))
  }

  /** Multi-level totals via ROLLUP: (region, nation), per-region subtotals,
    * and the grand total in one pass. Subtotal rows' null keys are projected
    * to 'ALL' so ordering is engine-agnostic (null sort order differs across
    * engines). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(fx(col("o_totalprice"), 100L)).as("total_x100"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_x100"), col("n_orders"))
  }

  /** INTERSECT/EXCEPT set-op report: customers who ordered in BOTH of two
    * years (INTERSECT) but not in a third (EXCEPT) — the set-algebra
    * surface the join queries express only indirectly. Catalyst plans
    * INTERSECT as a left-semi and EXCEPT as a left-anti join over
    * DISTINCT inputs — so the scale posture is exactly the audited
    * semi/anti family; the year filters push to the scan. Output: one
    * row (n_customers, custkey_sum) — the checksum makes the oracle
    * sensitive to membership, not just cardinality. */
  def setOpsReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def custsIn(year: Int) = o
      .where(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    custsIn(1996).intersect(custsIn(1997)).except(custsIn(1998))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("o_custkey")).as("custkey_sum"))
  }

  /** CUBE over (market segment, order status) — [[rollupRevenue]]'s
    * lattice-complete sibling: ROLLUP emits only the drill-down prefix
    * path, CUBE every subset — including the (ALL, status) marginals a
    * prefix hierarchy cannot express. One expand + one hash agg, as with
    * rollup; `grouping_id` disambiguates real NULLs from subtotal rows
    * (the reason coalesce alone is not a safe label). */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(sum(fx(col("o_totalprice"), 100L)).as("total_x100"),
        count(lit(1)).as("n_orders"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("total_x100"), col("n_orders"))

  /** Bounded range join via time bucketing — the second relational shape
    * Spark has no efficient built-in for (the first is the as-of join,
    * [[graft.plans.AsOfJoin]]): `left JOIN right ON key AND right.time ∈
    * [left.time + lower, left.time + upper]`. A naive inequality join plans
    * as a per-key cartesian; here the window width `upper − lower` becomes
    * the bucket size, the left row is exploded into the (at most 2)
    * buckets its window spans, candidates come from an equi-join on
    * (key, bucket), and the exact range predicate filters them. Bucket
    * arithmetic is integer `DIV` (a double division's ulp can misplace a
    * boundary row at µs-epoch magnitudes), computed over fixed-name temp
    * columns so arbitrary caller column names never reach a SQL string.
    * Cost: 2× the left rows through one equi-join — the plan shape that
    * survives 100 TB. */
  def boundedRangeJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       lowerOffset: Long, upperOffset: Long): DataFrame = {
    require(upperOffset > lowerOffset,
      s"empty window: [$lowerOffset, $upperOffset]")
    val w = upperOffset - lowerOffset
    val lo = col(leftTime) + lowerOffset
    val hi = col(leftTime) + upperOffset
    val lExp = left
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .withColumn("_b", explode(sequence(
        expr(s"_lo DIV ${w}L"), expr(s"_hi DIV ${w}L"))))
    val rB = right
      .withColumn("_rt", col(rightTime))
      .withColumn("_b", expr(s"_rt DIV ${w}L"))
      .drop("_rt")
    lExp.join(rB, Seq(key, "_b"))
      .where(col(rightTime).between(col("_lo"), col("_hi")))
      .drop("_b", "_lo", "_hi")
  }

  /** A14 — clicks within the trailing 5 minutes of each purchase, per user:
    * the attribution-window query, via [[boundedRangeJoin]]. Left-outer
    * semantics by re-joining counts onto the purchase set (0 for no
    * clicks). */
  def purchaseClickWindow(spark: SparkSession, dir: String,
                          windowMinutes: Int = 5): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsu"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("tsu").as("click_tsu"))
    val windowUs = windowMinutes * 60L * 1000000L
    val matched = boundedRangeJoin(purchases, clicks, "user_id",
        "tsu", "click_tsu", -windowUs, 0L)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"))
    purchases.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_clicks_5m"))
  }

  /** Ordered funnel analysis: how many users performed step 1, then step 2
    * strictly after their first step 1, then step 3 strictly after that
    * earliest step 2, … The ORDER constraint is what distinguishes a funnel
    * from k semi-joins — a user who purchased before ever viewing does not
    * convert.
    *
    * Per step i: one equi-join of the user-level frontier (u, tᵢ₋₁) — at
    * 100 TB a users-sized table, orders of magnitude smaller than events —
    * against only that step's events, one map-combinable min per user.
    * Steps are sequential by nature (tᵢ needs tᵢ₋₁), so the plan is k
    * slim joins, not a self-join of events with events. Output: one row
    * per step with the surviving-user count. */
  def funnel(events: DataFrame, steps: Seq[String],
             tsCol: String = "tsu", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    var acc = ev.where(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("t1"))
    for (i <- 2 to steps.length) {
      val prev = s"t${i - 1}"
      val ti = acc.select(col("u"), col(prev))
        .join(ev.where(col("et") === steps(i - 1)), Seq("u"))
        .where(col("t") > col(prev))
        .groupBy(col("u")).agg(min(col("t")).as(s"t$i"))
        .select(col("u"), col(s"t$i"))
      acc = acc.join(ti, Seq("u"), "left")
    }
    val counts = acc.agg(
      count(col("t1")).as("c1"),
      (2 to steps.length).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}L, '$s', c${i + 1}" }
      .mkString(", ")
    counts.select(expr(
      s"stack(${steps.length}, $stackArgs) as (step_no, step, users)"))
  }

  /** Weekly retention cohorts: users grouped by first-active week, counted
    * in each later week they return — the (cohort, offset) retention
    * triangle. Weeks are integer epoch-week indexes (`µs DIV week-µs`), so
    * the bucketing is exact cross-engine.
    *
    * Plan shape: events reduce to DISTINCT (user, week) FIRST (one hash
    * agg — the only pass over the full log), cohorts are a users-sized min
    * agg, and the final count groups the slim distinct frame. */
  def retentionCohorts(events: DataFrame, tsCol: String = "tsu",
                       userCol: String = "user_id"): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val uw = events
      .select(col(userCol).as("u"), expr(s"$tsCol DIV ${weekUs}L").as("week"))
      .distinct()
    val cohorts = uw.groupBy(col("u")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohorts, Seq("u"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Common user journeys: sliding n-grams over each user's time-ordered
    * event-type sequence, counted corpus-wide, top-k paths. The sequence
    * order ties on (ts, event_id) so the paths are deterministic.
    *
    * Plan shape: one window per user (lead(i) over the per-user sort — the
    * per-user partition is what a 100 TB event log is already bucketed by;
    * a bot-sized user would call for the [[Skew]] salting) + one hash agg
    * on the path + TakeOrderedAndProject. */
  def eventPaths(events: DataFrame, n: Int = 3, k: Int = 20,
                 tsCol: String = "tsu", userCol: String = "user_id",
                 typeCol: String = "event_type",
                 idCol: String = "event_id"): DataFrame = {
    require(n >= 2, "a path needs at least 2 steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val stepCols = (0 until n).map(i =>
      lead(col(typeCol), i).over(w).as(s"s$i"))
    events.select(stepCols: _*)
      .where(col(s"s${n - 1}").isNotNull) // windows running off the tail
      .select(concat_ws(" > ", (0 until n).map(i => col(s"s$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }

  /** Daily volume anomaly flags per event type: a day is anomalous when its
    * count sits more than 2 standard deviations from that type's daily
    * mean. The z-test is INTEGER-EXACT: z² > 4 ⟺ (n·D − S)² > 4·(Q·D − S²)
    * with D = days observed, S = Σn, Q = Σn² — no division, no sqrt, no
    * float, so the flags are bit-identical cross-engine (a double z-score's
    * ulp can flip a boundary day).
    *
    * Plan shape: one (type, day) hash agg over the log, one type-level agg
    * of (D, S, Q), one slim equi-join back — the monitoring query shape
    * that stays two aggs at any scale. */
  def volumeAnomalies(events: DataFrame, tsCol: String = "tsu",
                      typeCol: String = "event_type"): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = events
      .select(col(typeCol).as("event_type"),
        expr(s"$tsCol DIV ${dayUs}L").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("d_days"), sum(col("n")).as("s_sum"),
      sum(col("n") * col("n")).as("q_sumsq"))
    daily.join(stats, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        ((col("n") * col("d_days") - col("s_sum")) *
          (col("n") * col("d_days") - col("s_sum")) >
          lit(4L) * (col("q_sumsq") * col("d_days") -
            col("s_sum") * col("s_sum"))).as("anomalous"))
  }

  /** JSON-props extraction over events (reference parses JSON at
    * `src/azure_manager.py:133`): per-type sum of a JSON field. */
  def propsSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** TPC-H Q14-shaped promo-revenue share: one shipdate year of lineitem
    * (predicate pushed to the scan) against the broadcast `part` dim, ONE
    * conditional aggregation pass — promo and total revenue as exact
    * fixed-point BIGINTs, the share as BIGINT integer division
    * `(promo·10⁴) div total` (exact floor; the ×10⁴ numerator stays under
    * 2⁶³ through sf0.1 with 10⁵ headroom). The classic "filter + broadcast
    * dim + CASE aggregate" report shape. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .select((col("p_type") === "PROMO").as("is_promo"),
        fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L)
          .as("rev"))
      .agg(
        sum(when(col("is_promo"), col("rev")).otherwise(0L))
          .as("promo_x10000"),
        sum(col("rev")).as("total_x10000"))
      .select(col("promo_x10000"), col("total_x10000"),
        expr("(promo_x10000 * 10000) DIV total_x10000")
          .as("promo_share_x10000"))

  /** TPC-H Q9-shaped supplier-nation revenue by ship year: the fact table
    * against TWO stacked broadcast dims (supplier → nation), grouped on
    * (nation, year). Exercises the supplier dimension end to end; one
    * shuffle total (the final group-by), both dim joins broadcast. */
  def supplierNationRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(
        sum(fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L))
          .as("revenue_x10000"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("o_year"))

  /** Rolling ROW-window mean of event values per user (current + 4
    * preceding events in time order) — the moving-aggregate family the
    * time-window queries (a7/a21) don't cover: smoothing/trend features
    * for per-user behavior models. Exact fixed-point: values quantize
    * ×100 to BIGINT, the window emits (sum, count), the mean is BIGINT
    * FLOOR division — `(s - pmod(s, n)) DIV n`, not bare `DIV`, because
    * Spark's `DIV` truncates toward zero while the DuckDB oracle's `//`
    * floors; they differ exactly when the rolling sum is negative (event
    * values are unconstrained), and pmod(s, n) is non-negative for n>0 so
    * the subtraction lands on the floor multiple in pure integer
    * arithmetic — bit-reproducible. One per-user window, sources
    * parallelize across users; nothing global. */
  def rollingMean(spark: SparkSession, dir: String, nPrev: Int): DataFrame =
    rollingMean(Tables.events(spark, dir), nPrev)

  def rollingMean(events: DataFrame, nPrev: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-nPrev, org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"),
        fx(col("value"), 100L).as("v"))
      .withColumn("roll_sum_x100", sum(col("v")).over(w))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"),
        col("roll_sum_x100"), col("roll_n"),
        expr("(roll_sum_x100 - pmod(roll_sum_x100, roll_n)) DIV roll_n")
          .as("roll_mean_x100"))
  }

  /** TPC-H Q17-shaped CORRELATED-AVERAGE filter: lineitems whose quantity
    * is below 20% of their part's average quantity (the decorrelated
    * form: one per-part aggregate joined back on `l_partkey` — never a
    * per-row subquery). The comparison stays EXACT rational integer
    * arithmetic — `5 · qty_x100 · cnt < sum_x100` avoids materializing
    * the average as a rounded value entirely, so there is no float or
    * rounding divergence to reconcile cross-engine. Plan: one partkey
    * hash agg + one partkey equi-join + one scalar agg; at scale both
    * sides shuffle on the part key once (AQE broadcasts the avg side
    * when the filtered part count fits). */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), fx(col("l_quantity"), 100L).as("qx100"),
        fx(col("l_extendedprice"), 100L).as("px100"))
    val avgQ = l.groupBy(col("l_partkey"))
      .agg(sum(col("qx100")).as("sum_x100"), count(lit(1)).as("cnt"))
    l.join(avgQ, Seq("l_partkey"))
      .where(col("qx100") * 5L * col("cnt") < col("sum_x100"))
      .agg(sum(col("px100")).as("revenue_x100"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-shaped LARGE-VOLUME orders: orders whose total lineitem
    * quantity exceeds the threshold, enriched with the customer. The
    * HAVING runs on the map-combinable per-order sum BEFORE any join, so
    * the join inputs are the few qualifying orders (broadcast), never the
    * fact table. */
  def largeVolumeOrders(spark: SparkSession, dir: String,
                        minQtyX100: Long = 25000L): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(fx(col("l_quantity"), 100L)).as("total_qty_x100"))
      .where(col("total_qty_x100") > minQtyX100)
    Tables.orders(spark, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty_x100"))
  }

  /** TPC-H Q22-shaped IDLE-ACCOUNT report: customers with above-average
    * balance and NO urgent order — the scalar-subquery + anti-join plan
    * shape. The global average rides along as a broadcast one-row
    * aggregate (exact integer mean: `sum_x100 · 1 > bal_x100 · n` is the
    * rational comparison, no rounded mean materialized); the NOT EXISTS
    * is a LEFT ANTI join against the slim (custkey) projection of urgent
    * orders. Output per market segment: qualifying count + their balance
    * mass. */
  def idleAccounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        fx(col("c_acctbal"), 100L).as("bal_x100"))
    val avgBal = c.agg(sum(col("bal_x100")).as("sum_x100"),
      count(lit(1)).as("n"))
    val urgent = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.crossJoin(broadcast(avgBal))
      .where(col("bal_x100") * col("n") > col("sum_x100"))
      .join(urgent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("bal_x100")).as("balance_x100"))
  }

  /** TPC-H Q19-shaped DISJUNCTIVE-predicate join: an OR of conjunctive
    * (brand, size-range, quantity-range) branches across the lineitem ⨝
    * part join — the predicate shape that defeats naive single-column
    * pushdown and exercises Catalyst's OR handling (the p_size/p_brand
    * legs still prune the broadcast dim; the mixed l_quantity legs
    * evaluate post-join). One broadcast join + one aggregate. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1.0 && col("l_quantity") <= 20.0) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity") >= 10.0 && col("l_quantity") <= 35.0) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity") >= 20.0 && col("l_quantity") <= 50.0))
      .agg(
        sum(fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L))
          .as("revenue_x10000"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q13-shaped order-count distribution: how many customers placed
    * exactly N orders, INCLUDING the zero-order customers only an outer
    * join surfaces. Orders pre-aggregate to one row per ordering customer
    * (the only fact-side shuffle); `customer` LEFT-joins that per-customer
    * count table and the null leg becomes the N=0 bucket. The second
    * group-by runs on ≤|customer| rows. The left-outer + double-aggregation
    * shape is the one report family the inner-join queries never exercise. */
  def orderCountHistogram(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Years the pivot report spans — a FIXED list (the `pivot(col, values)`
    * overload): with explicit values the pivot is one pass with no
    * distinct-values pre-query, the output schema is static (a plan
    * property, not a data property — what a 100 TB report needs), and the
    * oracle can mirror each column as a CASE sum. */
  val PivotYears: Seq[Int] = 1995 to 2001

  /** Nation × order-year revenue matrix via `groupBy().pivot()` — the
    * wide-report surface (long→wide reshape) the relational tier hadn't
    * exercised: per nation one row, one BIGINT fixed-point revenue column
    * per year in [[PivotYears]]. Same star join as [[regionRevenue]]
    * (dimensions broadcast), revenue quantized per row THEN summed (the
    * exactness rule), absent (nation, year) cells coalesced to 0 so the
    * report carries no NULLs. */
  def nationYearPivot(spark: SparkSession, dir: String): DataFrame = {
    val long = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("o_year"),
        fx(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L)
          .as("rev"))
    PivotYears.foldLeft(
      long.groupBy(col("n_name"))
        .pivot("o_year", PivotYears)
        .agg(sum(col("rev")))) { (df, y) =>
      df.withColumn(s"rev_${y}_x10000", coalesce(col(s"$y"), lit(0L)))
        .drop(s"$y")
    }
  }

  /** TPC-H Q21-shaped SOLE-FAULT supplier report: suppliers whose returned
    * (`l_returnflag = 'R'`) item sits on a finished (`'F'`) multi-supplier
    * order where NO other supplier's item was returned — the classic
    * EXISTS + NOT-EXISTS double self-join on the fact table, decorrelated.
    * (The testdata carries no commit/receipt dates, so "returned" stands in
    * for TPC-H's late-delivery marker; the plan shape is Q21's.)
    *
    * Instead of two correlated self-joins (each a second full lineitem
    * shuffle probed per outer row), ONE per-order aggregate computes both
    * subquery answers at once: `n_supp` (distinct suppliers on the order —
    * EXISTS ⇔ ≥ 2) and `n_fault_supp` (distinct suppliers with a returned
    * item — NOT EXISTS another ⇔ exactly 1, which must then be this row's
    * supplier since the outer row itself is at fault). The aggregate runs
    * at the (order, supplier) grain first (map-side combinable, ≤ one
    * shuffle row per pair) with the per-order counts from a near-free
    * second agg; the fact table is never joined to itself row-to-row, and
    * qualifying orders join back broadcast-size after both filters. Top-k
    * via TakeOrderedAndProject. */
  def soleFaultSuppliers(spark: SparkSession, dir: String,
                         k: Int = 100): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    // (order, supplier) grain first — map-side combinable, so the shuffle
    // carries at most one row per pair; the per-order counts then come
    // from a near-free second agg. A direct double countDistinct would
    // Expand the fact table 2× into its shuffle instead.
    val perOrder = l.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as("fault"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("fault")).as("n_fault_supp"))
      .where(col("n_supp") >= 2 && col("n_fault_supp") === 1)
    val finished = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    l.where(col("l_returnflag") === "R")
      .join(perOrder, Seq("l_orderkey"))
      .join(finished, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }

  /** TPC-H Q20-shaped DOMINANT-SHARE supplier semi-join: suppliers in the
    * given nations who ship a disproportionate share of some pattern-matched
    * part — the correlated-aggregate IN-subquery chain, decorrelated. (The
    * testdata has no `partsupp`, so the supplied-quantity ledger is the
    * lineitem history itself and "disproportionate" is share > 2× the
    * per-supplier fair share; the plan shape — per-part totals, per-
    * (supplier, part) totals, rational compare, distinct semi-join up to the
    * dimension — is Q20's.)
    *
    * The comparison is EXACT rational integer arithmetic
    * (`sq · n_supp > 2 · tq`), so no average or ratio is ever materialized.
    * Both aggregates shuffle on the part key and join colocated; the part
    * pattern filter prunes the broadcast dim BEFORE the join; the qualifying
    * supplier set reaches the supplier dim as a LEFT SEMI join (no
    * duplicate-row blowup, no distinct afterwards). */
  def dominantShareSuppliers(spark: SparkSession, dir: String,
                             nations: Seq[String] = Seq("NATION_3", "NATION_7"),
                             partPattern: String = "red%"): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"),
        fx(col("l_quantity"), 100L).as("qx100"))
    val perSuppPart = l.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("qx100")).as("sq"))
    // per-part totals DERIVE from the per-(supplier, part) grain — one
    // fact scan feeds both aggregates, and the distinct-supplier count is
    // a plain count over the finer grain (no countDistinct Expand)
    val perPart = perSuppPart.groupBy(col("l_partkey"))
      .agg(sum(col("sq")).as("tq"), count(lit(1)).as("n_supp"))
    val qualifying = perSuppPart
      .join(perPart, Seq("l_partkey"))
      .join(broadcast(Tables.part(spark, dir)
        .where(col("p_name").like(partPattern)).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .where(col("sq") * col("n_supp") > lit(2L) * col("tq"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .where(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }
}
