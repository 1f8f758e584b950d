package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.streaming.{ProgressListener, Streams}

/** Scale-pattern proofs: salted joins preserve results, bucketed joins plan
  * without a shuffle, listeners observe progress — the mechanisms the 100 TB
  * posture relies on, exercised at test scale. */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(orders, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", salts = 8).count()
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf; the default ./spark-warehouse is used
    // (gitignored) and the tables are dropped afterwards
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.inputPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(shuffles).sum
      case other => other.children.map(shuffles).sum
    }
    assert(shuffles(plan) == 0, s"expected bucketed co-located join, got:\n$plan")
    // and it still computes the right thing
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }

  test("ngram docFreqCap prunes hot shingles from the join") {
    import operators.Dedup
    // 30 docs sharing one hot phrase + one true near-dup pair
    val hot = "the quick brown fox jumps"
    val docs = ((1L to 30L).map(i => (i, s"$hot unique$i tail$i words$i here$i")) ++
      Seq(100L -> "alpha beta gamma delta epsilon zeta eta theta",
          101L -> "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, 3, 1000L)
    val capped = Dedup.ngramJaccardPairs(docs, 3, 1000L, docFreqCap = Some(5))
    // the true pair survives capping; the hot-phrase clique shrinks
    val cappedPairs = capped.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cappedPairs.contains((100L, 101L)))
    assert(capped.count() <= uncapped.count())
  }

  test("streaming progress listener observes batches and rows") {
    val listener = new ProgressListener
    spark.streams.addListener(listener)
    try {
      val srcDir = Files.createTempDirectory("listener-src").toString
      val events = Tables.events(spark, sfDir)
      events.write.mode("overwrite").parquet(srcDir)
      val q = Streams.slidingEventCounts(
          Streams.fileSource(spark, srcDir, events.schema, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName("listener_out")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // listener callbacks are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (listener.rows.get() < events.count() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.batches.get() >= 1)
      assert(listener.rows.get() == events.count())
    } finally spark.streams.removeListener(listener)
  }
}
