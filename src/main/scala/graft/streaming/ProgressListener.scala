package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.StreamingQueryListener

/** A5/A6 — run-level progress metrics. The reference logs
  * `processed/total*100` and wall-clock deltas from its checkpoint file
  * (`src/checkpoint_manager.py:123-146`, `src/logging_manager.py:84-88`);
  * Structured Streaming emits the same signals per micro-batch through
  * `StreamingQueryListener` — no hand-rolled bookkeeping.
  */
class ProgressListener extends StreamingQueryListener {
  val batches = new AtomicLong(0)
  val rows = new AtomicLong(0)
  @volatile var lastBatchDurationMs: Long = 0L

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rows.addAndGet(e.progress.numInputRows)
    lastBatchDurationMs =
      Option(e.progress.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
