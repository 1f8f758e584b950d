package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Staged-rename COMMIT PROTOCOL for multi-component parquet artifacts
  * (the BM25 index's four tables, the ANN index's five) — the discipline
  * that makes in-place index maintenance crash-safe. An updater writes
  * every merged component to a sibling staging directory FIRST (the
  * originals are still live and untouched, so the merge plan can read
  * them lazily with no lineage checkpointing), then calls [[commit]]:
  *
  *   1. a `_swap_commit` marker listing the staged components is written;
  *   2. each component is swapped by rename (live → old-backup,
  *      stage → live);
  *   3. the old backups are deleted;
  *   4. the marker is deleted last.
  *
  * Components may be NESTED paths (`postings/pbucket=3`) — the
  * partition-scoped merge unit: an updater that only touched a few
  * buckets stages and swaps exactly those, so per-batch write
  * amplification is O(touched buckets), not O(index). Flat components
  * stage at `_stage_<c>`; nested ones under a `_stage/` tree that mirrors
  * the live layout (which is what `partitionBy` writes produce), with
  * backups under `_old/`.
  *
  * Every crash window is repairable by [[recover]]: marker present means
  * the swap is in flight — re-running the rename sequence is idempotent
  * (a component whose stage dir is gone was already swapped); marker
  * absent means either nothing started (stale staging is discarded,
  * originals intact) or everything committed (stale backups are
  * discarded). At no point can a reader observe a component directory
  * half-written, and the old index is destroyed only after the new one is
  * durably on disk — the failure mode a plain `mode("overwrite")`
  * sequence (with only localCheckpoint backing the inputs) could not
  * survive. On an object store without atomic dir rename this maps to a
  * version-pointer flip; the marker/stage/old layout is the
  * filesystem-native equivalent.
  *
  * CONCURRENCY: the rename sequence is TOLERANT — each step re-checks
  * post-rename state instead of requiring its own rename to succeed, so
  * two recoverers racing over the same marker (two readers, or a reader
  * racing a live updater's commit) converge on the committed state
  * instead of one side throwing on a rename the other already performed.
  * Readers still only repair when a marker proves a swap was in flight
  * (recover(cleanStale = false) is a no-op otherwise — a pure read needs
  * no write permission on a healthy index). */
object AtomicSwap {

  /** Staging directory for one component of the artifact at `path`. */
  def stageDir(path: String, component: String): String =
    if (component.contains("/")) s"$path/_stage/$component"
    else s"$path/_stage_$component"

  private val MarkerName = "_swap_commit"

  private def stagePath(root: Path, c: String): Path =
    if (c.contains("/")) new Path(root, s"_stage/$c")
    else new Path(root, s"_stage_$c")

  private def oldPath(root: Path, c: String): Path =
    if (c.contains("/")) new Path(root, s"_old/$c")
    else new Path(root, s"_old_$c")

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Swap all staged components into place (see class doc). Requires
    * every component to have been written to its [[stageDir]]. */
  def commit(spark: SparkSession, path: String,
             components: Seq[String]): Unit = {
    require(components.nonEmpty, "nothing to commit")
    val (fs, root) = fsOf(spark, path)
    components.foreach { c =>
      require(fs.exists(stagePath(root, c)),
        s"component $c not staged under $path")
    }
    val marker = new Path(root, MarkerName)
    val out = fs.create(marker, true)
    try out.write(components.mkString("\n").getBytes(UTF_8))
    finally out.close()
    swapStaged(fs, root, components)
  }

  /** The idempotent, race-tolerant rename sequence — shared by [[commit]]
    * and a [[recover]] that finds the marker mid-flight. Renames never
    * `require` their own success; the post-state is what's asserted, so a
    * concurrent recoverer that already performed a step is tolerated. */
  private def swapStaged(fs: FileSystem, root: Path,
                         components: Seq[String]): Unit = {
    components.foreach { c =>
      val live = new Path(root, c)
      val old = oldPath(root, c)
      val stage = stagePath(root, c)
      if (fs.exists(stage)) { // already swapped on a previous attempt if not
        if (fs.exists(live) && !fs.exists(old)) {
          if (old.getParent != root) fs.mkdirs(old.getParent)
          // A failed rename is tolerable ONLY if the post-state proves a
          // racing recoverer performed it (old exists, or live is gone).
          // Otherwise live still holds the OLD data and proceeding would
          // skip the stage→live swap, pass the exists(live) check on stale
          // data, and then DELETE the staged new component — a silently
          // lost commit. Fail loudly on a genuine fs error instead.
          if (!fs.rename(live, old))
            require(fs.exists(old) || !fs.exists(live),
              s"rename(live, old) for $c at $root failed with live still " +
                "present and no backup — fs error, refusing to drop the " +
                "staged update")
        }
        if (!fs.exists(live)) {
          if (live.getParent != root) fs.mkdirs(live.getParent)
          // Same discipline: a failed stage→live rename is only tolerable
          // if someone else completed it (stage gone, live present).
          if (!fs.rename(stage, live))
            require(!fs.exists(stage) && fs.exists(live),
              s"rename(stage, live) for $c at $root failed with the staged " +
                "component still present — fs error, refusing to proceed")
        }
        require(fs.exists(live), s"swap for $c at $root left no live dir")
      }
    }
    components.foreach { c =>
      fs.delete(oldPath(root, c), true)
      fs.delete(stagePath(root, c), true)
    }
    // nested staging/backup trees: everything under them belonged to this
    // commit (one updater per artifact dir — the standing contract), so a
    // leftover tree is write-side residue (_SUCCESS markers, empty parents)
    fs.delete(new Path(root, "_stage"), true)
    fs.delete(new Path(root, "_old"), true)
    fs.delete(new Path(root, MarkerName), false)
  }

  private val LeaseName = "_writer_lease"

  /** Staleness window after which a lease whose holder stopped
    * HEARTBEATING (the lease file's modification time — [[withLease]]
    * re-touches it on a cadence while its body runs) is presumed crashed
    * and may be reclaimed. Live holders heartbeat every
    * [[HeartbeatMs]] ≪ this, so a healthy long-running compaction is
    * never at risk; 15 min bounds how long a crashed cross-host holder
    * can wedge an artifact (a SAME-host crashed holder is detected
    * immediately via its pid). */
  val DefaultLeaseStaleMs: Long = 15 * 60 * 1000L

  /** Lease heartbeat cadence (a single cheap `setTimes` metadata call). */
  private val HeartbeatMs: Long = 10 * 1000L

  /** Exception a second concurrent updater gets — fail-fast, never a
    * corrupted staging tree. */
  final class LeaseHeldException(path: String, holder: String)
    extends IllegalStateException(
      s"another updater holds the writer lease on $path ($holder); " +
        "concurrent index updates are not supported — retry after it " +
        s"finishes, or run AtomicSwap.breakLease($path) if its holder " +
        "crashed (refused while the holder is provably alive)")

  private def leasePath(root: Path) = new Path(root, LeaseName)

  private def localHostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "localhost" }

  /** The recorded holder string (`pid=N@host`), or a placeholder when the
    * lease vanished or is unreadable mid-check. */
  private def readHolder(fs: FileSystem, lease: Path): String =
    try {
      val in = fs.open(lease)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray, UTF_8)
      } finally in.close()
    } catch { case _: java.io.IOException => "unknown holder" }

  private val HolderRe = "pid=(\\d+)@(\\S+)".r

  /** True when the recorded holder is PROVABLY alive: it names a pid on
    * THIS host and that pid is running. A holder on another host is never
    * provably alive from here — heartbeat age is the only cross-host
    * liveness signal. */
  private def holderProvablyLive(holder: String): Boolean =
    HolderRe.findFirstMatchIn(holder).exists { m =>
      m.group(2) == localHostName &&
        (try ProcessHandle.of(m.group(1).toLong)
          .map[Boolean](_.isAlive).orElse(false)
        catch { case _: NumberFormatException => false })
    }

  /** True when the recorded holder PROVABLY crashed: a pid on this host
    * that is no longer running. (Cross-host holders are never provably
    * dead — only stale.) */
  private def holderProvablyDead(holder: String): Boolean =
    HolderRe.findFirstMatchIn(holder).exists { m =>
      m.group(2) == localHostName &&
        (try !ProcessHandle.of(m.group(1).toLong)
          .map[Boolean](_.isAlive).orElse(false)
        catch { case _: NumberFormatException => false })
    }

  /** Milliseconds since the lease's last heartbeat, or 0 when unreadable
    * (vanished mid-check — treat as fresh, the next acquire re-checks). */
  private def leaseAgeMs(fs: FileSystem, lease: Path): Long =
    try math.max(0L,
      System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime)
    catch { case _: java.io.IOException => 0L }

  /** Force-release a lease whose holder crashed — the documented recovery
    * path for a wedged artifact. REFUSES (returns false) while the holder
    * is provably alive (same-host running pid), and also while a
    * cross-host / unparseable holder is still inside its staleness window
    * (its heartbeat may just be slow). Returns true when the lease was
    * removed (or was already gone). The NEXT writer's own `withLease`
    * runs [[recover]], repairing any swap the dead holder left in
    * flight. */
  def breakLease(spark: SparkSession, path: String,
                 staleMs: Long = DefaultLeaseStaleMs): Boolean = {
    val (fs, root) = fsOf(spark, path)
    val lease = leasePath(root)
    if (!fs.exists(lease)) return true
    val holder = readHolder(fs, lease)
    if (holderProvablyLive(holder)) false // never break a running holder
    else if (holderProvablyDead(holder) || leaseAgeMs(fs, lease) >= staleMs) {
      fs.delete(lease, false)
      true
    } else false
  }

  /** WRITER-WRITER mutual exclusion for one artifact directory. The swap
    * protocol above makes reader-vs-writer races safe, but two concurrent
    * UPDATERS would interleave their staging trees on convention alone —
    * so every mutating entry point (update/remove/compact) runs its whole
    * stage→commit sequence under this lease. Acquisition is an atomic
    * `create(overwrite = false)` of a `_writer_lease` file: exactly one
    * writer wins; the loser throws [[LeaseHeldException]] immediately with
    * the winner's identity, before writing a single staged byte. The lease
    * is released in a `finally`, AFTER commit's marker removal, so a crash
    * mid-commit leaves both the marker (repairable by [[recover]]) and the
    * lease (telling the next writer a repair may be pending).
    *
    * LIVENESS: while the body runs, a daemon heartbeat re-touches the
    * lease file every [[HeartbeatMs]]; a contending writer that finds the
    * lease PROVABLY DEAD (same-host pid gone) or STALE (no heartbeat for
    * `staleMs`) reclaims it — atomic re-create decides any reclaim race —
    * and first runs [[recover]] to repair whatever swap the dead holder
    * left in flight. A provably-live or still-heartbeating holder is
    * never broken. Failure to record the holder identity after winning
    * the create releases the lease before rethrowing (no orphan), and a
    * create failure raises [[LeaseHeldException]] only when the lease
    * demonstrably exists — a transient fs error propagates as itself. */
  def withLease[A](spark: SparkSession, path: String,
                   staleMs: Long = DefaultLeaseStaleMs)(body: => A): A = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lease = leasePath(root)
    val holder = s"pid=${ProcessHandle.current().pid()}@$localHostName"

    def tryCreate(): Option[org.apache.hadoop.fs.FSDataOutputStream] =
      try Some(fs.create(lease, false)) // atomic: fails if the lease exists
      catch {
        case e: java.io.IOException =>
          if (fs.exists(lease)) None // genuinely held — caller adjudicates
          else throw e // transient fs error, not a held lease
      }

    var reclaimed = false
    val out = tryCreate().getOrElse {
      val existing = readHolder(fs, lease)
      val dead = holderProvablyDead(existing)
      val stale = !holderProvablyLive(existing) &&
        leaseAgeMs(fs, lease) >= staleMs
      if (dead || stale) {
        fs.delete(lease, false)
        reclaimed = true
        // atomic re-create decides a reclaim race: exactly one contender
        // wins; the rest see a fresh lease and fail held as usual
        tryCreate().getOrElse(
          throw new LeaseHeldException(path, readHolder(fs, lease)))
      } else throw new LeaseHeldException(path, existing)
    }
    // no orphan: once create succeeded, ANY failure before the body's own
    // try/finally is entered must release the lease
    try {
      try out.write(holder.getBytes(UTF_8)) finally out.close()
    } catch { case e: Throwable => fs.delete(lease, false); throw e }

    val beat = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(math.min(HeartbeatMs, math.max(staleMs / 3, 1L)))
        try fs.setTimes(lease, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () } // missed beat, not fatal
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$path")
    beat.setDaemon(true)
    beat.start()
    try {
      // a reclaimed lease means its holder died mid-update: repair any
      // in-flight swap before the body stages anything on top of it
      if (reclaimed) recover(spark, path)
      body
    } finally {
      beat.interrupt()
      fs.delete(lease, false)
    }
  }

  /** Repair an interrupted [[commit]]. `cleanStale = false` (read-side
    * callers) only FINISHES a marked in-flight swap and never deletes
    * staging leftovers, so a reader racing a concurrent updater's staging
    * phase cannot destroy it — and performs no writes at all when no
    * marker is present. */
  def recover(spark: SparkSession, path: String,
              cleanStale: Boolean = true): Unit = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) return
    val marker = new Path(root, MarkerName)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val body = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
        new String(buf.toByteArray, UTF_8)
      } finally in.close()
      swapStaged(fs, root, body.split("\n").toSeq.filter(_.nonEmpty))
    } else if (cleanStale) {
      fs.listStatus(root).toSeq.foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_stage") || n.startsWith("_old"))
          fs.delete(st.getPath, true)
      }
    }
  }
}
