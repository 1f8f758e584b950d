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

  /** Exception a second concurrent updater gets — fail-fast, never a
    * corrupted staging tree. */
  final class LeaseHeldException(path: String, holder: String)
    extends IllegalStateException(
      s"another updater holds the writer lease on $path ($holder); " +
        "concurrent index updates are not supported — retry after it " +
        s"finishes, or delete $path/$LeaseName if its holder crashed")

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
    * lease (telling the next writer a repair may be pending). A lease with
    * no marker after a crash is stale residue; the error message names the
    * file to delete — fail-fast and explicit beats silently stealing a
    * lease whose holder may still be alive. */
  def withLease[A](spark: SparkSession, path: String)(body: => A): A = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lease = new Path(root, LeaseName)
    val holder = s"pid=${ProcessHandle.current().pid()}@" +
      java.net.InetAddress.getLocalHost.getHostName
    val out =
      try fs.create(lease, false) // atomic: fails if the lease exists
      catch {
        case _: java.io.IOException =>
          val existing =
            try {
              val in = fs.open(lease)
              try {
                val buf = new java.io.ByteArrayOutputStream()
                org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
                new String(buf.toByteArray, UTF_8)
              } finally in.close()
            } catch { case _: java.io.IOException => "unknown holder" }
          throw new LeaseHeldException(path, existing)
      }
    try out.write(holder.getBytes(UTF_8)) finally out.close()
    try body
    finally fs.delete(lease, false)
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
