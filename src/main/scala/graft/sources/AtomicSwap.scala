package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Staged-rename COMMIT PROTOCOL for multi-component parquet artifacts
  * (the BM25 index's four tables, the ANN index's five) — the discipline
  * that makes in-place index maintenance crash-safe. An updater writes
  * every merged component to a sibling `_stage_<c>` directory FIRST (the
  * originals are still live and untouched, so the merge plan can read
  * them lazily with no lineage checkpointing), then calls [[commit]]:
  *
  *   1. a `_swap_commit` marker listing the staged components is written;
  *   2. each component is swapped by rename (live → `_old_<c>`,
  *      `_stage_<c>` → live);
  *   3. the `_old_*` backups are deleted;
  *   4. the marker is deleted last.
  *
  * Every crash window is repairable by [[recover]]: marker present means
  * the swap is in flight — re-running the rename sequence is idempotent
  * (a component whose stage dir is gone was already swapped); marker
  * absent means either nothing started (stale `_stage_*` is discarded,
  * originals intact) or everything committed (stale `_old_*` is
  * discarded). At no point can a reader observe a component directory
  * half-written, and the old index is destroyed only after the new one is
  * durably on disk — the failure mode a plain `mode("overwrite")`
  * sequence (with only localCheckpoint backing the inputs) could not
  * survive. On an object store without atomic dir rename this maps to a
  * version-pointer flip; the marker/stage/old layout is the
  * filesystem-native equivalent. */
object AtomicSwap {

  /** Staging directory for one component of the artifact at `path`. */
  def stageDir(path: String, component: String): String =
    s"$path/_stage_$component"

  private val MarkerName = "_swap_commit"

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
      require(fs.exists(new Path(root, s"_stage_$c")),
        s"component $c not staged under $path")
    }
    val marker = new Path(root, MarkerName)
    val out = fs.create(marker, true)
    try out.write(components.mkString("\n").getBytes(UTF_8))
    finally out.close()
    swapStaged(fs, root, components)
  }

  /** The idempotent rename sequence — shared by [[commit]] and a
    * [[recover]] that finds the marker mid-flight. */
  private def swapStaged(fs: FileSystem, root: Path,
                         components: Seq[String]): Unit = {
    components.foreach { c =>
      val live = new Path(root, c)
      val old = new Path(root, s"_old_$c")
      val stage = new Path(root, s"_stage_$c")
      if (fs.exists(stage)) { // already swapped on a previous attempt if not
        if (fs.exists(live)) {
          require(!fs.exists(old), s"inconsistent swap state for $c at $root")
          require(fs.rename(live, old), s"backup rename failed for $c")
        }
        require(fs.rename(stage, live), s"stage rename failed for $c")
      }
    }
    components.foreach(c => fs.delete(new Path(root, s"_old_$c"), true))
    fs.delete(new Path(root, MarkerName), false)
  }

  /** Repair an interrupted [[commit]]. `cleanStale = false` (read-side
    * callers) only FINISHES a marked in-flight swap and never deletes
    * `_stage_*` leftovers, so a reader racing a concurrent updater's
    * staging phase cannot destroy it. */
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
        if (n.startsWith("_stage_") || n.startsWith("_old_"))
          fs.delete(st.getPath, true)
      }
    }
  }
}
