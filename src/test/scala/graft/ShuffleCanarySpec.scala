package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-VOLUME canaries for the suite's most expensive queries — the
  * noise-immune structural net the wall-time envelope can't be: shuffle
  * RECORD counts are deterministic for a fixed input (unlike bytes, which
  * move with compression, and seconds, which move with the host), so a
  * broadcast join silently degrading to a sort-merge (both sides shuffle
  * — records jump by the large side's count) or an extra exchange
  * appearing fails here even when the clock stays quiet. Budgets are the
  * sf0.001 measured counts with 1.3× slack for planner drift; a genuine
  * plan regression moves records by multiples, not percents. */
class ShuffleCanarySpec extends AnyFunSuite with SparkSpec {

  /** Total shuffle-write records across all stages of one query run. */
  private def shuffledRecords(name: String): Long = {
    val acc = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      // the listener bus is asynchronous: wait until the count is stable
      // for a full second, bounded at 15 s (the PlanAuditSpec pattern)
      var stableSince = System.nanoTime()
      var last = acc.get()
      val deadline = System.nanoTime() + 15_000_000_000L
      while (System.nanoTime() - stableSince < 1_000_000_000L &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = acc.get()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // sf0.001 measured shuffle-write records for the most expensive bench
  // queries — re-ranked round 13 against bench_out.json (the round-12 set
  // missed the five newest, heaviest plans: the autocompact loops, the
  // streamed ANN takedown, and both LSM compactions) plus sim_bm25 (its
  // plan moved to the Zipfian corpus this round). Re-measure with the
  // printer below when a plan legitimately changes.
  private val budgets: Map[String, Long] = Map(
    "stream_ann_autocompact" -> 23453L, "stream_bm25_autocompact" -> 59443L,
    "stream_ann_incr" -> 21149L, "stream_ann_takedown" -> 21555L,
    "ann_index_compact" -> 16674L, "dedup_verdict" -> 20600L,
    "stream_bm25_takedown" -> 74734L, "stream_bm25_incr" -> 59379L,
    "e2e_corpus" -> 34144L, "mix_hard_triplets" -> 73757L,
    "sim_bm25_compact" -> 84374L, "sim_bm25" -> 4583L)

  test("shuffle-record budgets hold for the top-cost queries (broadcast " +
    "stays broadcast, no extra exchange)") {
    val top = Seq("stream_ann_autocompact", "stream_bm25_autocompact",
      "stream_ann_incr", "stream_ann_takedown", "ann_index_compact",
      "dedup_verdict", "stream_bm25_takedown", "stream_bm25_incr",
      "e2e_corpus", "mix_hard_triplets", "sim_bm25_compact", "sim_bm25")
    if (budgets.isEmpty) {
      // printer mode: emit the measured counts to paste into `budgets`
      val measured = top.map(n => n -> shuffledRecords(n))
      info(measured.map { case (n, v) => s""""$n" -> ${v}L""" }
        .mkString("MEASURED: Map(", ", ", ")"))
      fail("budgets not committed yet — paste the MEASURED map above")
    } else {
      val offenders = top.flatMap { n =>
        val got = shuffledRecords(n)
        val cap = (budgets(n) * 1.3).toLong + 64
        if (got > cap) Some(s"$n: $got records > budget ${budgets(n)} (cap $cap)")
        else None
      }
      assert(offenders.isEmpty,
        s"shuffle-volume regression:\n${offenders.mkString("\n")}")
    }
  }

  test("the net actually trips: an injected broadcast→shuffle degradation " +
    "(auto-broadcast disabled) blows a budget by multiples") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = shuffledRecords("sim_bm25")
      val cap = (budgets("sim_bm25") * 1.3).toLong + 64
      assert(got > cap,
        s"disabling auto-broadcast left sim_bm25 at $got records " +
          s"(cap $cap) — the canary would not catch a broadcast " +
          "degradation on this plan; pick a threshold-sensitive query")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
