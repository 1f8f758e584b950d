package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** The custom AsOfJoinExec (LogicalPlan + Strategy + SparkPlan) must agree
  * with the composed union+window formulation (the a13_asof query). */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("custom as-of join (the a13_asof query) equals the composed window formulation") {
    // a13_asof now runs through AsOfJoinExec; the composed union+window
    // form below is the oracle-expressible formulation it must match
    val custom = SparkEntry.queries("a13_asof")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(3)) -1L else r.getLong(3),
                                if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
    val tagged = ev.where(col("event_type").isin("click", "purchase"))
      .withColumn("is_click", (col("event_type") === "click").cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("is_click").desc, col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("last_click_id",
        last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_tsu",
        last(when(col("is_click") === 1, col("tsu")), ignoreNulls = true).over(w))
      .where(col("is_click") === 0)
      .select(col("event_id"), col("user_id"), col("tsu"),
        col("last_click_id"), col("last_click_tsu"))
      .collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(3)) -1L else r.getLong(3),
                                if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(custom.size == composed.size && custom.size > 0)
    assert(custom == composed)
  }

  test("a13_asof physical plan uses the custom AsOfJoinExec node") {
    val plan = SparkEntry.queries("a13_asof")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in plan:\n$plan")
  }

  test("NULL times never match: null-time right rows are skipped, null-time left rows join nothing") {
    // SQL semantics: `rt <= lt` is UNKNOWN when either side is NULL
    val l = Seq((1L, Some(50L)), (1L, None.asInstanceOf[Option[Long]]), (2L, Some(10L)))
      .toDF("k", "t")
    val r = Seq((1L, None.asInstanceOf[Option[Long]], "nul"), (1L, Some(40L), "a"),
      (2L, None.asInstanceOf[Option[Long]], "nul2"))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.asofJoin(spark, l, r, "k", "rk", "t", "rt")
      .select("k", "t", "v").collect()
      .map(x => ((if (x.isNullAt(0)) -1L else x.getLong(0)),
        (if (x.isNullAt(1)) -1L else x.getLong(1)),
        (if (x.isNullAt(2)) null else x.getString(2))))
      .toSet
    // (1, 50) matches the t=40 row, NOT the null-time row; (1, null) and
    // (2, 10) (whose only candidate has a null time) stay unmatched
    assert(got == Set((1L, 50L, "a"), (1L, -1L, null), (2L, 10L, null)))
  }

  test("as-of join emits nulls when no right row precedes") {
    val l = Seq((1L, 100L), (1L, 50L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 60L, "a"), (1L, 90L, "b"), (3L, 5L, "c"))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.asofJoin(spark, l, r, "k", "rk", "t", "rt")
      .select("k", "t", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1), if (x.isNullAt(2)) null else x.getString(2)))
      .toSet
    assert(got == Set((1L, 100L, "b"), (1L, 50L, null), (2L, 10L, null)))
  }
}
