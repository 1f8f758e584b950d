package graft.sources

/** §2.7 adaptive rate limiting — the reference throttles its fetch fan-out
  * with an adaptive QPS limiter
  * (`src/enhanced_production_mediawiki_client.py:24-94`): a sliding-window
  * burst gate plus feedback control — three consecutive 429s multiply the
  * rate by 0.8 (floored at 0.5 QPS), sustained success decays the 429 streak
  * and, after a 5-minute clean window, recovers the rate ×1.1 toward the
  * configured ceiling.
  *
  * In the Spark engine the limiter is per-partition state inside
  * [[RetryingEnrichment.enrichWithRetry]] (one limiter per task, exactly
  * like the reference's one limiter per worker pool): each fetch attempt
  * first pays `shouldWait()`, then reports its status. Aggregate cluster QPS
  * = per-task QPS × running tasks, so the per-task ceiling is what a
  * deployment sizes against an external API quota. The clock is injected so
  * the control law is unit-testable without wall time.
  */
final case class RateLimitConfig(
    requestsPerSecond: Double = 2.0,
    burstLimit: Int = 5,
    windowSizeSec: Int = 60,
    adaptiveEnabled: Boolean = true)

final class AdaptiveRateLimiter(cfg: RateLimitConfig,
                                clock: () => Double) extends Serializable {
  private val requestTimes = scala.collection.mutable.ArrayDeque.empty[Double]
  private var last429: Option[Double] = None
  private var consecutive429s = 0
  private var currentQps = cfg.requestsPerSecond

  /** Current adapted QPS (starts at the configured ceiling). */
  def qps: Double = synchronized(currentQps)

  /** Seconds to wait before the next request (0 if clear to send) —
    * mirrors `should_wait` (`enhanced_production_mediawiki_client.py:43-63`):
    * drop requests outside the sliding window, gate on the burst limit,
    * otherwise enforce the per-request spacing `1/qps`. */
  def shouldWait(): Double = synchronized {
    val now = clock()
    while (requestTimes.nonEmpty && now - requestTimes.head >= cfg.windowSizeSec)
      requestTimes.removeHead()
    if (requestTimes.size >= cfg.burstLimit)
      math.max(0.0, requestTimes.head + 1.0 / currentQps - now)
    else if (requestTimes.nonEmpty && now - requestTimes.head < 1.0 / currentQps)
      1.0 / currentQps - (now - requestTimes.head)
    else 0.0
  }

  /** Record a completed request and adapt the rate
    * (`enhanced_production_mediawiki_client.py:65-94`). */
  def recordRequest(statusCode: Int = 200): Unit = synchronized {
    val now = clock()
    requestTimes.append(now)
    if (cfg.adaptiveEnabled) {
      if (statusCode == 429) {
        consecutive429s += 1
        last429 = Some(now)
        if (consecutive429s >= 3)
          currentQps = math.max(0.5, currentQps * 0.8)
      } else {
        if (consecutive429s > 0) consecutive429s -= 1
        if (last429.forall(now - _ > 300.0))
          currentQps = math.min(cfg.requestsPerSecond, currentQps * 1.1)
      }
    }
  }
}

object AdaptiveRateLimiter {
  /** Marker for a rate-limited upstream response (the 429 analog) — lets a
    * fetcher signal "slow down" distinctly from a genuine failure. */
  final class RateLimitedException(msg: String) extends RuntimeException(msg)

  def statusOf(e: Throwable): Int = e match {
    case _: RateLimitedException => 429
    case _ => 500
  }
}
