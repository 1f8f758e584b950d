package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** §2.7 retry/backoff — the reference retries each fetch up to 3 times with
  * exponential backoff capped at 60 s (`src/mediawiki_client.py:24-62`,
  * `config/config.yaml:13-15`). Here the same policy lives inside a
  * partition-parallel enrichment: one fetcher per partition (the thread-pool
  * fan-out of `src/enhanced_production_mediawiki_client.py:362-415`
  * dissolves into task parallelism), per-record retry inside the task, and
  * failures emitted as a dead-letter column instead of aborting the task —
  * `spark.task.maxFailures` remains the outer retry budget.
  */
object RetryingEnrichment {

  /** `min(initialDelay * 2^attempt, maxDelay)` backoff policy. */
  def backoffMs(attempt: Int, initialMs: Long, maxMs: Long): Long =
    math.min(initialMs * (1L << attempt), maxMs)

  def withBackoff[T](retries: Int, initialMs: Long, maxMs: Long,
                     sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f catch {
        case e: Exception if attempt < retries =>
          sleep(backoffMs(attempt, initialMs, maxMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  final case class Enriched[K](key: K, content: Option[String], error: Option[String])

  /** Enrich each key via `fetch`, retrying with backoff; failures become
    * dead-letter rows. `fetch` is constructed once per partition (the
    * client-per-worker shape). When `rateLimit` is set, every attempt pays
    * an [[AdaptiveRateLimiter]] gate and reports its outcome — one limiter
    * per task, the reference's limiter-per-worker shape
    * (`src/enhanced_production_mediawiki_client.py:96-120`); a fetcher
    * signals 429 by throwing [[AdaptiveRateLimiter.RateLimitedException]].
    * The live-HTTP client itself is out of scope for the dump-based engine
    * (SURVEY §4) — tests inject a flaky fetcher. */
  def enrichWithRetry[K](spark: SparkSession, keys: Dataset[K],
                         makeFetcher: () => K => String,
                         retries: Int = 3, initialMs: Long = 1,
                         maxMs: Long = 60000,
                         sleep: Long => Unit = Thread.sleep(_),
                         rateLimit: Option[RateLimitConfig] = None,
                         clock: () => Double = () => System.nanoTime() / 1e9)(
      implicit ev: org.apache.spark.sql.Encoder[Enriched[K]]): Dataset[Enriched[K]] =
    keys.mapPartitions { it =>
      val fetch = makeFetcher() // per-partition client init
      val limiter = rateLimit.map(new AdaptiveRateLimiter(_, clock))
      def gatedFetch(k: K): String = limiter match {
        case None => fetch(k)
        case Some(rl) =>
          val w = rl.shouldWait()
          if (w > 0) sleep(math.ceil(w * 1000).toLong)
          try { val v = fetch(k); rl.recordRequest(200); v }
          catch { case e: Throwable =>
            rl.recordRequest(AdaptiveRateLimiter.statusOf(e)); throw e }
      }
      it.map { k =>
        try {
          val v = withBackoff(retries, initialMs, maxMs, sleep)(gatedFetch(k))
          Enriched(k, Some(v), None)
        } catch {
          case e: Exception => Enriched(k, None, Some(e.getMessage))
        }
      }
    }
}
