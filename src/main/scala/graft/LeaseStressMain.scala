package graft

import org.apache.spark.sql.SparkSession

import graft.sources.AtomicSwap

/** Cross-PROCESS writer-lease stress driver. The in-JVM stress spec
  * (LeaseRaceSpec) proves thread-level mutual exclusion; this main is
  * forked N times by LeaseCrossProcessSpec (and runnable standalone via
  * `tools/run.sh graft.LeaseStressMain ...`) to prove the same contract
  * across PROCESSES — the level the O_EXCL `Files.createFile`
  * acquisition and pid-liveness reclaim actually operate at, mirroring
  * the reference's multi-worker deployment
  * (reference: src/batch_processor.py single-writer queue assumption).
  *
  * Every acquire/release is recorded in a shared append-only WITNESS
  * file (one O_APPEND write per line — atomic on POSIX for short
  * lines), so the orchestrator can verify max-one-holder from the
  * interleaving alone, without trusting any child.
  *
  * Usage: LeaseStressMain <artifactDir> <witnessFile> <mode> [cycles]
  *        [holdMs] [staleMs]
  *  - mode `churn`: loop `cycles` acquire→ENTER→hold→EXIT→release
  *    cycles, retrying on LeaseHeldException; prints `DONE n=<cycles>`.
  *  - mode `wedge`: acquire once, write ENTER + WEDGED, then sleep
  *    forever — the orchestrator kill -9s this child and verifies the
  *    next writer reclaims the dead holder's lease immediately (same
  *    host ⇒ pid death is PROVABLE; cross-host holders wait out
  *    staleMs instead). */
object LeaseStressMain {
  private def note(witness: String, ev: String): Unit = {
    val line =
      s"$ev pid=${ProcessHandle.current().pid()} t=${System.nanoTime()}\n"
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(witness),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.APPEND)
    try ch.write(java.nio.ByteBuffer.wrap(line.getBytes("UTF-8")))
    finally ch.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val witness = args(1)
    val mode = args(2)
    val cycles = if (args.length > 3) args(3).toInt else 10
    val holdMs = if (args.length > 4) args(4).toLong else 5L
    val staleMs = if (args.length > 5) args(5).toLong else 3600000L

    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-lease-stress")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try mode match {
      case "churn" =>
        var done = 0
        while (done < cycles) {
          try {
            AtomicSwap.withLease(spark, dir, staleMs = staleMs) {
              note(witness, "ENTER")
              Thread.sleep(holdMs)
              note(witness, "EXIT")
            }
            done += 1
          } catch {
            case _: AtomicSwap.LeaseHeldException => Thread.sleep(2)
          }
        }
        // stdout is the child's report to the orchestrator
        println(s"DONE n=$done")
      case "wedge" =>
        AtomicSwap.withLease(spark, dir, staleMs = staleMs) {
          note(witness, "ENTER")
          note(witness, "WEDGED")
          Thread.sleep(600000L) // killed -9 by the orchestrator mid-hold
        }
      case other =>
        System.err.println(s"unknown mode: $other"); sys.exit(2)
    } finally spark.stop()
  }
}
