package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** The custom AsOfJoinExec (LogicalPlan + Strategy + SparkPlan) must agree
  * with the composed union+window formulation (the a13_asof query). */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("custom as-of join equals the composed window formulation") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsu"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("tsu").as("click_tsu"))
    val custom = AsOfJoin.asofJoin(spark, purchases, clicks,
        "user_id", "c_user", "tsu", "click_tsu")
      .select(col("event_id"), col("user_id"), col("tsu"),
        col("click_id"), col("click_tsu"))
      .collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(3)) -1L else r.getLong(3),
                                if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    val composed = SparkEntry.queries("a13_asof")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(3)) -1L else r.getLong(3),
                                if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(custom.size == composed.size && custom.size > 0)
    assert(custom == composed)
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
