package graft

import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.AtomicSwap

/** Round-15 lease hardening contracts (the round-14 ADVICE findings):
  *  - reclaim of a stale lease is decided by an ATOMIC RENAME-claim, so
  *    two contenders racing the same stale lease admit exactly one writer
  *    (delete-then-recreate let the loser's delete land on the winner's
  *    fresh lease — two concurrent writers);
  *  - commit() FENCES on the lease token, so a holder whose lease was
  *    reclaimed mid-body aborts before swapping anything;
  *  - the holder identity includes the process START INSTANT, so a
  *    recycled pid (same number, different process) can neither hold the
  *    lease forever nor block breakLease;
  *  - autoBuckets never trusts Catalyst's defaultSizeInBytes sentinel
  *    (RDD-backed plans), so a small in-memory build cannot explode into
  *    a 4096-way bucket layout. */
class LeaseRaceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-r15-$tag-").toString

  /** Race/stress iteration count. The races these specs hunt are
    * ~1-in-several-runs flakes; `GRAFT_STRESS_ITERS=50 sbt "testOnly
    * *LeaseRaceSpec"` loops the adversarial tests that many times (the
    * round-16 burn-in ran ≥50 green). Default keeps the CI suite fast. */
  private val stressIters: Int =
    sys.env.get("GRAFT_STRESS_ITERS").map(_.toInt).getOrElse(2)

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def plantLease(dir: String, holder: String, ageMs: Long): Path = {
    val lease = new Path(s"$dir/_writer_lease")
    val out = fs.create(lease, true)
    out.write(holder.getBytes("UTF-8")); out.close()
    if (ageMs > 0)
      fs.setTimes(lease, System.currentTimeMillis() - ageMs, -1)
    lease
  }

  test("reclaim race: N threads racing ONE stale lease admit exactly one " +
    "writer — the rename-claim is atomic; losers fail held, never " +
    "corrupting the winner's fresh lease") {
    for (iter <- 1 to stressIters) {
      val dir = tmp("race") + "/art"
      fs.mkdirs(new Path(dir))
      // stale cross-host holder: every contender adjudicates "reclaimable"
      plantLease(dir, "pid=1@some-other-host", 7200000)
      val n = 4
      val barrier = new CyclicBarrier(n)
      val entered = new AtomicInteger(0)
      val held = new AtomicInteger(0)
      val others = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          barrier.await()
          try AtomicSwap.withLease(spark, dir, staleMs = 3600000) {
            entered.incrementAndGet()
            Thread.sleep(800) // hold long enough that every loser has raced
          } catch {
            case _: AtomicSwap.LeaseHeldException => held.incrementAndGet()
            case t: Throwable => others.add(t)
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert(others.isEmpty, s"[iter $iter] unexpected failures: $others")
      assert(entered.get() == 1,
        s"[iter $iter] exactly one contender must win the reclaim, " +
          s"got ${entered.get()}")
      assert(held.get() == n - 1, s"[iter $iter] held=${held.get()}")
      assert(!fs.exists(new Path(s"$dir/_writer_lease")),
        s"[iter $iter] the winner must release its lease")
      assert(fs.listStatus(new Path(dir)).forall(st =>
        !st.getPath.getName.startsWith("_writer_lease.stale-")),
        s"[iter $iter] claim tombstones must not accumulate")
      assert(fs.listStatus(new Path(dir)).forall(st =>
        !st.getPath.getName.endsWith(".crc")),
        s"[iter $iter] no ChecksumFileSystem sidecar may exist for a " +
          "lease (the round-15 chmod-race flake is impossible only if " +
          "none is ever written)")
    }
  }

  test("fencing: a holder whose lease was reclaimed MID-BODY aborts at " +
    "commit() with LeaseLostException — the live artifact is untouched " +
    "and no swap marker is written") {
    val dir = tmp("fence") + "/art"
    Seq((1L, "live")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/data")
    intercept[AtomicSwap.LeaseLostException] {
      AtomicSwap.withLease(spark, dir) {
        Seq((2L, "staged")).toDF("id", "v")
          .write.mode("overwrite").parquet(AtomicSwap.stageDir(dir, "data"))
        // simulate a reclaimer: the lease now records someone else
        plantLease(dir, "pid=77@elsewhere start=1 token=not-ours", 0)
        AtomicSwap.commit(spark, dir, Seq("data"))
      }
    }
    assert(!fs.exists(new Path(s"$dir/_swap_commit")),
      "the fence must fire before the marker is written")
    assert(spark.read.parquet(s"$dir/data").select($"v")
      .head().getString(0) == "live",
      "a fenced-out commit must leave the live component untouched")
    // the fenced holder must NOT delete the reclaimer's lease on release
    assert(fs.exists(new Path(s"$dir/_writer_lease")),
      "release must only remove the holder's OWN lease")
  }

  test("fencing: commit inside an intact lease proceeds (the fence is a " +
    "no-op for the rightful holder), and direct commit callers outside " +
    "withLease are unaffected") {
    val dir = tmp("fence-ok") + "/art"
    Seq((1L, "old")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/data")
    AtomicSwap.withLease(spark, dir) {
      Seq((2L, "new")).toDF("id", "v")
        .write.mode("overwrite").parquet(AtomicSwap.stageDir(dir, "data"))
      AtomicSwap.commit(spark, dir, Seq("data"))
    }
    assert(spark.read.parquet(s"$dir/data").select($"v")
      .head().getString(0) == "new")
    // outside any lease: commit still works (caller-managed exclusion)
    Seq((3L, "direct")).toDF("id", "v")
      .write.mode("overwrite").parquet(AtomicSwap.stageDir(dir, "data"))
    AtomicSwap.commit(spark, dir, Seq("data"))
    assert(spark.read.parquet(s"$dir/data").select($"v")
      .head().getString(0) == "direct")
  }

  test("recycled pid: a lease naming THIS pid but a different process " +
    "start instant is provably dead — reclaimed immediately and " +
    "breakLease agrees (a recycled pid must never wedge the artifact)") {
    val dir = tmp("recycle") + "/art"
    fs.mkdirs(new Path(dir))
    val host = java.net.InetAddress.getLocalHost.getHostName
    val pid = ProcessHandle.current().pid()
    // same pid, start instant from a different era: not this process
    plantLease(dir, s"pid=$pid@$host start=123456789 token=ghost", 0)
    var ran = false
    AtomicSwap.withLease(spark, dir, staleMs = 3600000) { ran = true }
    assert(ran, "a recycled-pid lease must be reclaimable without waiting " +
      "out the staleness window")
    plantLease(dir, s"pid=$pid@$host start=123456789 token=ghost", 0)
    assert(AtomicSwap.breakLease(spark, dir, staleMs = 3600000))
    // and the REAL start instant still counts as provably live
    val start = ProcessHandle.current().info().startInstant()
    assume(start.isPresent)
    plantLease(dir,
      s"pid=$pid@$host start=${start.get.toEpochMilli} token=self", 0)
    intercept[AtomicSwap.LeaseHeldException] {
      AtomicSwap.withLease(spark, dir, staleMs = 0) { () }
    }
    assert(!AtomicSwap.breakLease(spark, dir, staleMs = 0))
  }

  test("mutual-exclusion stress: many threads churning acquire/release " +
    "cycles on ONE artifact never overlap inside the body — and every " +
    "thread eventually gets through (no lost lease, no leak)") {
    for (iter <- 1 to stressIters) {
      val dir = tmp("stress") + "/art"
      fs.mkdirs(new Path(dir))
      val threads = 8
      val entriesEach = 5
      val inBody = new AtomicInteger(0)
      val maxInBody = new AtomicInteger(0)
      val done = new AtomicInteger(0)
      val others = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = (0 until threads).map { _ =>
        new Thread(() => {
          var mine = 0
          try while (mine < entriesEach) {
            try {
              AtomicSwap.withLease(spark, dir) {
                val now = inBody.incrementAndGet()
                maxInBody.getAndUpdate(m => math.max(m, now))
                Thread.sleep(2)
                inBody.decrementAndGet()
              }
              mine += 1
              done.incrementAndGet()
            } catch {
              case _: AtomicSwap.LeaseHeldException => Thread.sleep(1) // retry
            }
          } catch { case t: Throwable => others.add(t) }
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join(120000))
      assert(others.isEmpty, s"[iter $iter] unexpected failures: $others")
      assert(done.get() == threads * entriesEach,
        s"[iter $iter] every cycle must eventually acquire " +
          s"(got ${done.get()})")
      assert(maxInBody.get() == 1,
        s"[iter $iter] two holders overlapped (max ${maxInBody.get()})")
      assert(!fs.exists(new Path(s"$dir/_writer_lease")),
        s"[iter $iter] no leaked lease")
      assert(fs.listStatus(new Path(dir)).forall(st =>
        !st.getPath.getName.endsWith(".crc")),
        s"[iter $iter] lease churn must leave no .crc sidecar behind")
    }
  }

  test("claimStale TOCTOU guard: a claim adjudicated on OLD lease bytes " +
    "that lands on a RECREATED fresh lease restores the fresh holder and " +
    "fails — a reclaim only ever evicts the exact lease it adjudicated") {
    val dir = tmp("toctou") + "/art"
    val root = new Path(dir)
    fs.mkdirs(root)
    val lease = new Path(s"$dir/_writer_lease")
    // the contender adjudicated THIS stale holder...
    val adjudicated = "pid=1@some-other-host"
    // ...but by claim time a fresh holder's lease sits at the path
    plantLease(dir, "pid=42@fresh-host start=99 token=fresh", 0)
    assert(!AtomicSwap.claimStale(fs, root, lease, adjudicated),
      "a claim must fail when the lease bytes are not the adjudicated ones")
    assert(fs.exists(lease), "the fresh holder's lease must be restored")
    assert(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      fs.open(lease)), "UTF-8").contains("token=fresh"),
      "the restored lease must carry the fresh holder's identity")
    assert(fs.listStatus(root).forall(st =>
      !st.getPath.getName.startsWith("_writer_lease.stale-")),
      "the mismatch path must not leak its tombstone")
    // and the happy path: matching bytes claim cleanly
    assert(AtomicSwap.claimStale(fs, root, lease,
      new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
        fs.open(lease)), "UTF-8")))
    assert(!fs.exists(lease))
  }

  test("breakLease reports false on a lost claim race, not 'free': with " +
    "no lease present it is trivially true, but a mismatched claim " +
    "(fresh holder recreated since adjudication) leaves the holder " +
    "intact — callers re-adjudicate instead of assuming the artifact " +
    "is unlocked") {
    val dir = tmp("bl") + "/art"
    fs.mkdirs(new Path(dir))
    assert(AtomicSwap.breakLease(spark, dir), "no lease → trivially broken")
    // provably-live holder: refuse
    val start = ProcessHandle.current().info().startInstant()
    assume(start.isPresent)
    val host = java.net.InetAddress.getLocalHost.getHostName
    plantLease(dir, s"pid=${ProcessHandle.current().pid()}@$host " +
      s"start=${start.get.toEpochMilli} token=self", 0)
    assert(!AtomicSwap.breakLease(spark, dir, staleMs = 0))
    // stale cross-host holder: broken, exactly once
    plantLease(dir, "pid=9@gone-host", 7200000)
    assert(AtomicSwap.breakLease(spark, dir, staleMs = 3600000))
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
  }

  test("autoBuckets: an RDD-backed input (Catalyst stats = the " +
    "defaultSizeInBytes sentinel) builds at the floor bucket count, not " +
    "the 4096 cap") {
    val dir = tmp("autob") + "/index"
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .where($"doc_id" < 60)
      .localCheckpoint() // LogicalRDD: sizeInBytes falls back to sentinel
    Similarity.buildBm25Index(docs, dir, maxDf = 1000) // buckets = auto
    val b = spark.read.parquet(s"$dir/meta").select($"n_buckets")
      .head().getInt(0)
    assert(b == 32,
      s"sentinel-stats build must use the floor bucket count, got $b")
  }
}
