package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** The commit-protocol SEAM under [[AtomicSwap]] (round-15 verdict task
  * 4 — object-store portability as code, not a caveat).
  *
  * [[AtomicSwap]]'s stage→marker→rename sequence assumes the store gives
  * an ATOMIC DIRECTORY RENAME (HDFS, POSIX filesystems, Azure ADLS2
  * hierarchical namespace). S3-class object stores have no rename at all
  * — "rename" is copy+delete, and a reader can observe the half-copied
  * live prefix, which breaks the protocol's core invariant. What those
  * stores DO give is a CONDITIONAL PUT on a single object
  * (`If-None-Match: *` for create-exclusive, `If-Match: <etag>` for
  * compare-and-swap — S3, GCS, and ABFS all expose one). The correct
  * commit there is a VERSION-POINTER FLIP (the Iceberg/Delta discipline):
  *
  *   1. move the staged components into an immutable per-commit version
  *      directory (`_v_<uuid>/<component>`) — this move is copy+delete
  *      and NOT atomic, which is SAFE because both endpoints are private
  *      to the single lease-holding writer (no reader resolves them);
  *   2. compare-and-swap the ONE `_current` pointer object from the
  *      exact bytes read at commit start to the new component→version
  *      map — the single atomic step, covering all components at once
  *      (readers flip between two fully-materialized versions, never a
  *      partial state);
  *   3. garbage-collect version directories the pointer no longer
  *      references.
  *
  * Both protocols share the same API (stage → commit → resolve →
  * recover) so CommitProtocolSpec drives the same swap/recover/lease
  * scenarios through each:
  *
  *  - [[CommitProtocol.Rename]] — the default; delegates verbatim to
  *    [[AtomicSwap]]. Use on HDFS-like stores (atomic rename).
  *    `resolve` is the identity: components live at stable paths.
  *  - [[CommitProtocol.ConditionalPut]] — the pointer-flip protocol.
  *    Use on S3-class stores (no atomic rename, CAS put available).
  *    `resolve` reads the pointer. The CAS primitive here is
  *    FILESYSTEM-SIMULATED (an O_EXCL lock file around
  *    read-compare-write — the same atomicity a real store provides
  *    server-side via `If-Match`); a production S3 binding would swap
  *    [[CommitProtocol.conditionalPut]] for the store's native call and
  *    change nothing above it.
  *
  * Crash analysis for ConditionalPut (every window maps to a
  * [[CommitProtocol.ConditionalPut.recover]] case):
  *  - crash mid-move (step 1): pointer unchanged → OLD version fully
  *    live; recover (write-side) deletes unreferenced `_v_*` and stage
  *    residue.
  *  - crash between CAS and GC (step 2→3): NEW version fully live;
  *    recover deletes the now-unreferenced old version dirs.
  *  - read-side recover (`cleanStale = false`) performs NO writes ever:
  *    the pointer is consistent at every instant, so a reader needs no
  *    repair — mirroring AtomicSwap's read-side discipline.
  *
  * The writer LEASE is protocol-independent: acquisition is already
  * "conditional put shaped" (exclusive create = `If-None-Match: *`), so
  * [[AtomicSwap.withLease]] works unchanged over both stores — the spec
  * drives its mutual-exclusion case through both protocols' commits. */
sealed trait CommitProtocol {
  /** Where the caller writes component `c`'s staged bytes. */
  def stageDir(path: String, component: String): String
  /** Atomically publish the staged components (all-or-nothing). */
  def commit(spark: SparkSession, path: String,
             components: Seq[String]): Unit
  /** The directory a reader should load component `c` from NOW. */
  def resolve(spark: SparkSession, path: String, component: String): String
  /** Repair/clean after a crash. `cleanStale = false` (read-side) must
    * finish a provably in-flight commit at most — never delete staging a
    * live writer may still own. */
  def recover(spark: SparkSession, path: String,
              cleanStale: Boolean = true): Unit
}

object CommitProtocol {

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** HDFS-class stores (atomic rename): [[AtomicSwap]] verbatim. */
  case object Rename extends CommitProtocol {
    def stageDir(path: String, component: String): String =
      AtomicSwap.stageDir(path, component)
    def commit(spark: SparkSession, path: String,
               components: Seq[String]): Unit =
      AtomicSwap.commit(spark, path, components)
    def resolve(spark: SparkSession, path: String,
                component: String): String = s"$path/$component"
    def recover(spark: SparkSession, path: String,
                cleanStale: Boolean): Unit =
      AtomicSwap.recover(spark, path, cleanStale)
  }

  private val PointerName = "_current"

  /** Read the pointer object: component → version-dir name. Absent
    * pointer = empty artifact (first commit publishes it). Returns the
    * RAW bytes too — the CAS expects the exact bytes read. */
  private def readPointer(fs: FileSystem,
                          root: Path): (Map[String, String], Option[String]) = {
    val p = new Path(root, PointerName)
    if (!fs.exists(p)) (Map.empty, None)
    else {
      val in = fs.open(p)
      val body = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray, UTF_8)
      } finally in.close()
      val map = body.split("\n").iterator.filter(_.contains("\t")).map { l =>
        val Array(c, v) = l.split("\t", 2); (c, v)
      }.toMap
      (map, Some(body))
    }
  }

  /** The store's single-object atomicity primitive: put `bytes` at
    * `path` iff its current content is exactly `expect` (None = must not
    * exist — `If-None-Match: *`; Some(e) = `If-Match`-style CAS).
    * SIMULATED here with an O_EXCL lock file around read-compare-write —
    * the same linearization a real store provides server-side. Returns
    * false on a lost race or mismatched precondition. */
  private[graft] def conditionalPut(fs: FileSystem, path: Path,
                                      bytes: Array[Byte],
                                      expect: Option[String]): Boolean = {
    val lock = new Path(path.getParent, s".${path.getName}.cas-lock")
    val local = fs.getScheme == "file"
    def lockAcquire(): Boolean =
      if (local)
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(lock.toUri.getPath)); true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    val deadline = System.nanoTime() + 30e9.toLong
    var locked = lockAcquire()
    while (!locked && System.nanoTime() < deadline) {
      Thread.sleep(5); locked = lockAcquire()
    }
    require(locked, s"CAS lock on $path wedged (simulation only)")
    try {
      val current =
        if (!fs.exists(path)) None
        else {
          val in = fs.open(path)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
            Some(new String(buf.toByteArray, UTF_8))
          } finally in.close()
        }
      if (current != expect) false
      else {
        if (local) {
          // NIO end-to-end on file: (no ChecksumFileSystem sidecar —
          // same reasoning as the lease path, AtomicSwap round-16)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path.toUri.getPath), bytes)
        } else {
          val out = fs.create(path, true)
          try out.write(bytes) finally out.close()
        }
        true
      }
    } finally {
      if (local)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(lock.toUri.getPath))
      else fs.delete(lock, false)
    }
  }

  /** S3-class stores (no atomic rename; conditional put available):
    * immutable version directories + one CAS'd pointer object. */
  case object ConditionalPut extends CommitProtocol {
    // same staging layout as Rename so callers are protocol-agnostic;
    // the staged tree is private to the lease holder either way
    def stageDir(path: String, component: String): String =
      AtomicSwap.stageDir(path, component)

    private def stagePath(root: Path, c: String): Path =
      if (c.contains("/")) new Path(root, s"_stage/$c")
      else new Path(root, s"_stage_$c")

    def commit(spark: SparkSession, path: String,
               components: Seq[String]): Unit = {
      require(components.nonEmpty, "nothing to commit")
      val (fs, root) = fsOf(spark, path)
      components.foreach { c =>
        require(fs.exists(stagePath(root, c)),
          s"component $c not staged under $path")
      }
      val (oldMap, oldBytes) = readPointer(fs, root)
      val vdir = s"_v_${java.util.UUID.randomUUID()}"
      // step 1: move staged → immutable version dir. Copy+delete (the
      // only "move" an object store has) — NON-atomic, which is safe:
      // both endpoints are private to this (leased) writer until the
      // pointer flips.
      components.foreach { c =>
        val dst = new Path(root, s"$vdir/$c")
        fs.mkdirs(dst.getParent)
        require(FileUtil.copy(fs, stagePath(root, c), fs, dst, true, true,
          fs.getConf), s"staging move for $c failed")
      }
      // step 2: ONE atomic visibility flip for all components
      val newMap = oldMap ++ components.map(_ -> vdir)
      val body = newMap.toSeq.sorted.map { case (c, v) => s"$c\t$v" }
        .mkString("\n")
      if (!conditionalPut(fs, new Path(root, PointerName),
        body.getBytes(UTF_8), oldBytes))
        throw new IllegalStateException(
          s"pointer CAS on $path failed: a concurrent commit moved " +
            "_current since this commit read it — with the writer lease " +
            "held this indicates lease loss; re-run the update")
      // step 3: GC versions the pointer no longer references
      gcUnreferenced(fs, root, newMap)
      fs.delete(new Path(root, "_stage"), true)
    }

    def resolve(spark: SparkSession, path: String,
                component: String): String = {
      val (fs, root) = fsOf(spark, path)
      val (map, _) = readPointer(fs, root)
      map.get(component) match {
        case Some(v) => s"$path/$v/$component"
        case None => s"$path/$component" // never committed via pointer
      }
    }

    private def gcUnreferenced(fs: FileSystem, root: Path,
                               referenced: Map[String, String]): Unit = {
      val live = referenced.values.toSet
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_v_") && !live.contains(n))
          fs.delete(st.getPath, true)
      }
    }

    def recover(spark: SparkSession, path: String,
                cleanStale: Boolean): Unit = {
      // the pointer is consistent at every instant — there is never an
      // in-flight state to FINISH, so read-side recover is a pure no-op
      // (mirrors AtomicSwap.recover(cleanStale = false))
      if (!cleanStale) return
      val (fs, root) = fsOf(spark, path)
      if (!fs.exists(root)) return
      val (map, _) = readPointer(fs, root)
      gcUnreferenced(fs, root, map)
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_stage")) fs.delete(st.getPath, true)
      }
    }
  }
}
