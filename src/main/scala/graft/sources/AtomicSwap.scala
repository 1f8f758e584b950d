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
    * every component to have been written to its [[stageDir]]. When the
    * calling process holds the artifact's writer lease (it registered via
    * [[withLease]]), the lease is FENCE-CHECKED first: the file must
    * still record this holder's token, else the lease was reclaimed
    * while we ran (holder paused / heartbeats failing past the staleness
    * window) and swapping now would interleave with the reclaimer — the
    * commit aborts with [[LeaseLostException]] before the marker is
    * written, leaving the live artifact untouched. */
  def commit(spark: SparkSession, path: String,
             components: Seq[String]): Unit = {
    require(components.nonEmpty, "nothing to commit")
    val (fs, root) = fsOf(spark, path)
    fenceCheck(fs, root, path)
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

  /** Exception a FENCED-OUT holder gets at commit time: its lease was
    * reclaimed while the body ran (long pause, sustained heartbeat
    * failures past the staleness window). The staged tree is abandoned
    * unswapped — the reclaimer owns the artifact now; re-run the update
    * after it finishes. */
  final class LeaseLostException(path: String, nowHolder: String)
    extends IllegalStateException(
      s"writer lease on $path no longer records this holder " +
        s"(now: $nowHolder) — it was reclaimed as stale while this " +
        "update ran; refusing to swap staged components over the " +
        "reclaimer's. Re-run the update once the current holder finishes.")

  private def leasePath(root: Path) = new Path(root, LeaseName)

  private def localHostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "localhost" }

  /** The recorded holder string (`pid=N@host start=MS token=UUID`), or a
    * placeholder when the lease vanished or is unreadable mid-check. */
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
  private val StartRe = "start=(\\d+)".r

  /** This process's start instant (epoch ms) — recorded in the lease so
    * a recycled pid (same number, different process) is distinguishable
    * from the real holder. Absent on JVMs that can't report it. */
  private def selfStartMs: Option[Long] = {
    val s = ProcessHandle.current().info().startInstant()
    if (s.isPresent) Some(s.get.toEpochMilli) else None
  }

  /** Three-valued same-host liveness: Some(true) = the RECORDED holder
    * process is provably running here; Some(false) = provably gone (pid
    * absent, or the pid's start instant mismatches the recorded one — a
    * recycled pid is NOT the holder, so the lease must not wedge
    * forever); None = cross-host or unparseable, only heartbeat age can
    * adjudicate. Start-instant comparison tolerates 1 s of rounding
    * (procfs reports jiffies). */
  private def holderLiveness(holder: String): Option[Boolean] =
    HolderRe.findFirstMatchIn(holder).flatMap { m =>
      if (m.group(2) != localHostName) None
      else {
        val pid = try Some(m.group(1).toLong)
        catch { case _: NumberFormatException => None }
        pid.map { p =>
          val ph = ProcessHandle.of(p)
          if (!ph.isPresent || !ph.get.isAlive) false
          else StartRe.findFirstMatchIn(holder) match {
            case Some(rec) =>
              val actual = ph.get.info().startInstant()
              // recorded start present: the live pid is the holder only
              // if its start matches; an unreadable actual start can't
              // prove a recycle, so keep the legacy pid-alive answer
              !actual.isPresent ||
                math.abs(actual.get.toEpochMilli - rec.group(1).toLong) <= 1000L
            case None => true // legacy lease without a start instant
          }
        }
      }
    }

  private def holderProvablyLive(holder: String): Boolean =
    holderLiveness(holder).contains(true)

  private def holderProvablyDead(holder: String): Boolean =
    holderLiveness(holder).contains(false)

  /** NIO path of a local (`file:` scheme) Hadoop path. */
  private def nioPath(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  /** Hadoop's LocalFileSystem is a ChecksumFileSystem: files written
    * through `fs.create` gain a `.<name>.crc` sidecar whose maintenance
    * shells out (chmod) and races concurrent lease churn — the round-15
    * flake was a losing contender escaping with `ExitCodeException:
    * chmod ._writer_lease.crc` instead of [[LeaseHeldException]]. Lease
    * files on `file:` are therefore written ONLY through NIO (no sidecar
    * exists to race), and every NIO create/move also drops any sidecar a
    * legacy/Hadoop writer left behind, so a later `fs.open` of a fresh
    * NIO-written lease can't be checksummed against stale bytes. */
  private def dropCrcSidecar(lease: Path): Unit = {
    val crc = new Path(lease.getParent, s".${lease.getName}.crc")
    try java.nio.file.Files.deleteIfExists(nioPath(crc))
    catch { case _: java.io.IOException => () }
  }

  /** Atomically CLAIM an existing (adjudicated stale/dead) lease file:
    * rename it to a unique tombstone — on every FileSystem rename is
    * atomic and fails when the source is gone, so exactly one of N
    * racing contenders wins and the losers learn it cleanly (the old
    * delete-then-recreate reclaim let a loser's queued delete remove the
    * winner's fresh lease, yielding two concurrent writers).
    *
    * `expectedHolder` closes the adjudication TOCTOU: between a
    * contender's stale-read and its rename, the winner of a PREVIOUS
    * claim may already have renamed the old lease away and recreated a
    * FRESH one in its place — renaming that away would evict a live
    * holder. So a claim is valid only if the tombstone still carries the
    * exact bytes that were adjudicated stale; on mismatch the tombstone
    * is restored (atomic rename back, else exclusive re-create with its
    * content) and the claim fails. On `file:` the rename goes through
    * NIO ATOMIC_MOVE so no ChecksumFileSystem sidecar is touched. A true
    * return means this caller owns the reclaim of the adjudicated
    * lease. */
  private[graft] def claimStale(fs: FileSystem, root: Path, lease: Path,
                                expectedHolder: String): Boolean = {
    val tomb = new Path(root,
      s"$LeaseName.stale-${java.util.UUID.randomUUID()}")
    val local = fs.getScheme == "file"
    def mv(src: Path, dst: Path): Boolean =
      if (local)
        try {
          java.nio.file.Files.move(nioPath(src), nioPath(dst),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.io.IOException => false }
      else
        try fs.rename(src, dst)
        catch { case _: java.io.IOException => false }
    val won = mv(lease, tomb)
    if (won && local) dropCrcSidecar(lease)
    if (!won) false
    else {
      val got = readHolder(fs, tomb)
      if (got == expectedHolder) { fs.delete(tomb, false); true }
      else {
        // the rename landed on a lease RECREATED since adjudication —
        // the displaced holder is live, not stale: restore it
        if (!mv(tomb, lease)) {
          // a third contender already holds the path; re-materialize the
          // displaced holder's bytes only if the slot is free, else drop
          // the tombstone (the displaced holder's commit-time token
          // fence still protects the artifact)
          if (local)
            try java.nio.file.Files.write(nioPath(lease),
              got.getBytes(UTF_8),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            catch { case _: java.io.IOException => () }
          else
            try {
              val o = fs.create(lease, false)
              try o.write(got.getBytes(UTF_8)) finally o.close()
            } catch { case _: java.io.IOException => () }
          try fs.delete(tomb, false)
          catch { case _: java.io.IOException => () }
        }
        false
      }
    }
  }

  /** In-process registry of leases THIS process holds: qualified artifact
    * root → the unique token its lease file records. [[commit]] uses it
    * to fence: before writing the swap marker it re-reads the lease and
    * requires its own token, so a holder whose lease was reclaimed
    * mid-body (paused past staleMs, heartbeats failing) aborts instead
    * of swapping over the reclaimer. */
  private val heldLeases =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Commit-time fence (see [[heldLeases]]): no-op when this process
    * did not register a lease for `root` (direct commit callers manage
    * their own exclusion). Re-arms the heartbeat (one setTimes) before
    * adjudicating so a commit issued right at the staleness edge
    * refreshes its claim first. */
  private def fenceCheck(fs: FileSystem, root: Path, path: String): Unit = {
    val token = heldLeases.get(fs.makeQualified(root).toString)
    if (token != null) {
      val lease = leasePath(root)
      try fs.setTimes(lease, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () } // adjudicated by content
      val content =
        try { if (fs.exists(lease)) readHolder(fs, lease) else "(no lease)" }
        catch { case _: java.io.IOException => "(unreadable lease)" }
      if (!content.contains(token))
        throw new LeaseLostException(path, content)
    }
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
      // atomic rename-claim, not delete: a delete adjudicated on the OLD
      // lease could land on a contender's freshly re-created one
      // (TOCTOU). The claim result ALONE is the answer: a lost race
      // means a contender is becoming the next holder — report "not
      // broken" and let the caller re-adjudicate, never "free" while
      // someone is mid-acquisition.
      claimStale(fs, root, lease, holder)
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
    * lease PROVABLY DEAD (same-host pid gone, or the pid's start instant
    * mismatching the recorded one — a recycled pid is not the holder) or
    * STALE (no heartbeat for `staleMs`) reclaims it: an atomic
    * rename-to-tombstone decides any reclaim race (exactly one renamer
    * wins; losers throw [[LeaseHeldException]] — delete-then-recreate
    * would let a loser's delete land on the winner's fresh lease), then
    * the winner runs [[recover]] to repair whatever swap the dead holder
    * left in flight. A provably-live or still-heartbeating holder is
    * never broken. FENCING: the lease records a unique token; [[commit]]
    * re-verifies the lease file still records it before swapping, so a
    * holder reclaimed mid-body (long pause, heartbeats failing past
    * staleMs) aborts with [[LeaseLostException]] instead of mutating the
    * artifact under the reclaimer. Failure to record the holder identity
    * after winning the create releases the lease before rethrowing (no
    * orphan), and a create failure raises [[LeaseHeldException]] only
    * when the lease demonstrably exists — a transient fs error
    * propagates as itself. */
  def withLease[A](spark: SparkSession, path: String,
                   staleMs: Long = DefaultLeaseStaleMs)(body: => A): A = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lease = leasePath(root)
    val token = java.util.UUID.randomUUID().toString
    val holder = s"pid=${ProcessHandle.current().pid()}@$localHostName" +
      selfStartMs.map(ms => s" start=$ms").getOrElse("") + s" token=$token"

    // Atomic create-exclusive of the lease, returning the holder-record
    // writer. Hadoop's LOCAL create(overwrite=false) is CHECK-then-create
    // — the round-15 mutual-exclusion stress spec caught three concurrent
    // winners under churn — so the file: scheme acquires through NIO
    // Files.createFile (O_EXCL: atomic across threads AND processes) and
    // writes the holder through NIO too, never reopening via the
    // ChecksumFileSystem: the old `fs.create(lease, true)` reopen both
    // raced the `.crc` sidecar's chmod (the round-15 ExitCodeException
    // flake) and could silently clobber a racer's recreated lease. The
    // holder write opens WRITE-only (no CREATE): if a racing claim
    // renamed this fresh lease away mid-acquisition, the write fails as
    // a LOST RACE instead of re-creating over the claimant. Cluster
    // filesystems (HDFS, object stores' conditional put) implement
    // exclusive create natively, and a FileAlreadyExistsException there
    // means definitively held AT CREATE TIME — never re-adjudicated via
    // exists(), which under churn can already be false again and would
    // misreport a correctly-lost race as a transient fs error.
    def tryCreate(): Option[Array[Byte] => Unit] =
      if (fs.getScheme == "file") {
        val local = nioPath(lease)
        try {
          java.nio.file.Files.createFile(local) // O_EXCL: one atomic winner
          dropCrcSidecar(lease) // any sidecar here is a dead holder's orphan
          Some { bytes =>
            java.nio.file.Files.write(local, bytes,
              java.nio.file.StandardOpenOption.WRITE,
              java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
            ()
          }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => None
        }
      } else
        try {
          val out = fs.create(lease, false)
          Some { bytes => try out.write(bytes) finally out.close() }
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case e: java.io.IOException =>
            if (fs.exists(lease)) None // genuinely held — caller adjudicates
            else throw e // transient fs error, not a held lease
        }

    var reclaimed = false
    val writeHolder = tryCreate().getOrElse {
      val existing = readHolder(fs, lease)
      val dead = holderProvablyDead(existing)
      val stale = !holderProvablyLive(existing) &&
        leaseAgeMs(fs, lease) >= staleMs
      if (dead || stale) {
        // atomic rename-claim: exactly one contender owns the reclaim,
        // and only of the exact lease bytes that were adjudicated stale
        if (!claimStale(fs, root, lease, existing))
          throw new LeaseHeldException(path, readHolder(fs, lease))
        reclaimed = true
        tryCreate().getOrElse(
          throw new LeaseHeldException(path, readHolder(fs, lease)))
      } else throw new LeaseHeldException(path, existing)
    }
    // no orphan: once create succeeded, ANY failure before the body's own
    // try/finally is entered must release the lease and rethrow
    // CLASSIFIED — a vanished lease means it was claimed away mid-write
    // (a lost race, nothing of ours remains to clean)
    try writeHolder(holder.getBytes(UTF_8))
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new LeaseHeldException(path, readHolder(fs, lease))
      case e: Throwable =>
        try {
          if (fs.getScheme == "file")
            java.nio.file.Files.deleteIfExists(nioPath(lease))
          else fs.delete(lease, false)
        } catch { case _: java.io.IOException => () }
        throw e
    }
    val leaseKey = fs.makeQualified(root).toString
    heldLeases.put(leaseKey, token)

    val beat = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(math.min(HeartbeatMs, math.max(staleMs / 3, 1L)))
        try fs.setTimes(lease, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () } // missed beat — commit's
        // fence re-read adjudicates whether the lease was lost meanwhile
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
      heldLeases.remove(leaseKey, token)
      // release only OUR lease: after a mid-body reclaim the file records
      // the reclaimer — deleting it would unlock a live holder
      try {
        if (fs.exists(lease) && readHolder(fs, lease).contains(token))
          fs.delete(lease, false)
      } catch { case _: java.io.IOException => () }
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
