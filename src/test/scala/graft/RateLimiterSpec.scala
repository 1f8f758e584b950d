package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AdaptiveRateLimiter, RateLimitConfig, RetryingEnrichment}

/** AdaptiveRateLimiter control law under a fake clock — mirrors the
  * reference's behavior (`enhanced_production_mediawiki_client.py:32-94`):
  * sliding-window burst gate, ×0.8 backoff after 3 consecutive 429s floored
  * at 0.5 QPS, streak decay on success, ×1.1 recovery after a clean
  * 5-minute window. */
class RateLimiterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def limiterAt(t0: Double = 0.0) = {
    var now = t0
    val rl = new AdaptiveRateLimiter(RateLimitConfig(), () => now)
    (rl, (d: Double) => { now += d })
  }

  test("burst limit gates the next request; the window releases old requests") {
    val (rl, advance) = limiterAt()
    (1 to 5).foreach { _ => rl.recordRequest(200); advance(0.01) }
    assert(rl.shouldWait() > 0.0) // 5 requests in-window = at burst limit
    advance(61.0)                 // everything ages out of the 60s window
    assert(rl.shouldWait() == 0.0)
  }

  test("per-request spacing of 1/qps applies below the burst limit") {
    val (rl, advance) = limiterAt()
    rl.recordRequest(200)
    advance(0.1) // 1/qps = 0.5s at the default 2 QPS
    val w = rl.shouldWait()
    assert(w > 0.39 && w < 0.41)
    advance(0.5)
    assert(rl.shouldWait() == 0.0)
  }

  test("three consecutive 429s cut qps by 0.8, floored at 0.5") {
    val (rl, advance) = limiterAt()
    assert(rl.qps == 2.0)
    (1 to 3).foreach { _ => rl.recordRequest(429); advance(1.0) }
    assert(math.abs(rl.qps - 1.6) < 1e-9)
    (1 to 40).foreach { _ => rl.recordRequest(429); advance(1.0) }
    assert(rl.qps == 0.5) // hard floor
  }

  test("success decays the 429 streak; a clean 5 minutes recovers toward the ceiling") {
    val (rl, advance) = limiterAt()
    (1 to 3).foreach { _ => rl.recordRequest(429); advance(1.0) }
    val reduced = rl.qps
    assert(reduced < 2.0)
    rl.recordRequest(200) // within 300s of the last 429: no recovery yet
    assert(rl.qps == reduced)
    advance(301.0)
    rl.recordRequest(200)
    assert(math.abs(rl.qps - reduced * 1.1) < 1e-9)
    (1 to 50).foreach { _ => advance(301.0); rl.recordRequest(200) }
    assert(rl.qps == 2.0) // capped at the configured ceiling
  }

  test("enrichment pays the limiter gate per attempt and still enriches") {
    // closure serialization copies captured vars, so the fake clock lives in
    // a singleton module — same instance on both sides in local mode
    RateLimiterSpecState.reset()
    val keys = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
      .repartition(1) // one partition => one limiter sees every request
    val got = RetryingEnrichment.enrichWithRetry[Long](
      spark, keys, () => k => s"content-$k",
      retries = 0,
      sleep = RateLimiterSpecState.sleep(_),
      rateLimit = Some(RateLimitConfig()),
      clock = () => RateLimiterSpecState.now)
      .collect()
    assert(got.length == 7 && got.forall(_.content.isDefined))
    // on a clock that only advances while sleeping, the 1/qps spacing gate
    // fires exactly once (request 2 vs request 1: 0.5s at 2 QPS); after
    // that the oldest in-window request is already ≥ 1/qps old, so the
    // reference's oldest-request burst formula yields no further waits
    assert(RateLimiterSpecState.sleptMs.get() == 500L)
  }
}

object RateLimiterSpecState {
  @volatile var now: Double = 0.0
  val sleptMs = new java.util.concurrent.atomic.AtomicLong(0L)
  def sleep(ms: Long): Unit = { sleptMs.addAndGet(ms); now += ms / 1000.0 }
  def reset(): Unit = { now = 0.0; sleptMs.set(0L) }
}
