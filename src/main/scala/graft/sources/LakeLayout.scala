package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout writer: the data-organization step that decides whether every
  * later 100 TB query scans the whole corpus or 1% of it.
  *
  * Two levers, both free at read time forever after:
  *
  *  - **Directory partitioning** (`partitionBy`): queries filtering on a
  *    partition column never open the other directories — partition pruning
  *    happens in the driver against file paths, before any I/O.
  *  - **Sort-within-files** (`sortWithinPartitions`): parquet keeps min/max
  *    stats per row group; sorting the sort columns makes those ranges
  *    disjoint and tight, so predicate pushdown skips whole row groups
  *    instead of post-filtering every page.
  *
  * The write repartitions into EXACTLY `filesPerPartition` tasks keyed on
  * an id hash-bucket FIRST (explicit partition count — a count-less
  * `repartition(cols…)` is fair game for AQE partition coalescing, which
  * collapses small stages and with them the file layout): each task holds
  * one bucket's slice of every partition value and writes at most one file
  * per directory, so a directory gets ≤ `filesPerPartition` files
  * regardless of cluster size. Without this, every one of T shuffle tasks
  * writes into every directory — T×P small files, the classic lake-rot
  * failure. The knob trades file count against per-file size / write
  * parallelism — at 100 TB set it so files land in the 128 MB–1 GB range.
  */
object LakeLayout {

  def writeOptimized(docs: DataFrame, path: String,
                     partitionCols: Seq[String] = Seq("lang"),
                     sortCols: Seq[String] = Seq("n_chars"),
                     filesPerPartition: Int = 1,
                     idCol: String = "doc_id"): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    val bucket = pmod(xxhash64(col(idCol)), lit(filesPerPartition.toLong))
    docs
      .repartition(filesPerPartition, bucket)
      // partition cols lead the in-task sort so each directory's slice is
      // contiguous, then the stat columns so row-group min/max are tight
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read the layout back: partition discovery re-derives the partition
    * columns from directory names; filters on them prune directories,
    * filters on sort columns push down to row-group stats. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Morton (Z-order) key: interleave the bits of two already-bucketized
    * dimensions (each in `[0, 2^bits)`) so that ranges of EITHER dimension
    * map to a bounded number of key-prefix ranges. Bit `i` of `a` lands at
    * key position `2i+1`, bit `i` of `b` at `2i` — the key's top bit pair
    * is (a's MSB, b's MSB). Pure integer shifts/masks: codegen-friendly in
    * Spark and replayed exactly by the same expression in SQL. */
  def zorderKey2(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i)
    }.reduce(_ + _)
  }

  /** File-skipping report comparing a LINEAR layout (files = ranges of
    * dimension `a` only — what a 1-D sort gives you) against a Z-ORDER
    * layout (files = Morton-key prefix ranges) for two box predicates: a
    * mid-range slice of `a` (all `b`) and a mid-range slice of `b` (all
    * `a`). This is the manifest-level simulation (the [[compactionPlan]]
    * pattern — never touches data bytes): every doc is assigned its file
    * under each layout, per-file min/max bucket stats are aggregated
    * exactly the way parquet row-group stats would be, and a file is HIT
    * when its [min,max] box intersects the predicate box — the same
    * interval test a scan planner runs against footer stats.
    *
    * The point at 100 TB: a 1-D sort prunes perfectly on its sort key and
    * not at all on anything else; Z-order pays a constant factor on the
    * first dimension to make EVERY interleaved dimension prunable. The
    * physical path is `repartitionByRange(zkey) + sortWithinPartitions
    * (zkey)` at write time ([[writeOptimized]]'s slot-in replacement when
    * queries filter on more than one column); this report is the
    * skipping evidence computed relationally, so it oracle-checks exactly.
    *
    * Output: one row per (layout, box): total files, files hit, and rows
    * inside hit files (the bytes a scan would actually read). */
  def zorderSkippingReport(docs: DataFrame, aCol: String, bCol: String,
                           bits: Int = 8, zFileShift: Int = 10,
                           linFileShift: Int = 2,
                           boxLoBucket: Int = 64, boxHiBucket: Int = 95): DataFrame = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val n = 1L << bits
    val mm = docs.agg(
      min(col(aCol)).as("amin"), max(col(aCol)).as("amax"),
      min(col(bCol)).as("bmin"), max(col(bCol)).as("bmax"))
    // equal-width bucketize onto [0, 2^bits): ((v - vmin) * 2^bits) DIV
    // (vmax - vmin + 1) — exact BIGINT floor-div, no clamp needed (the
    // numerator stays strictly below 2^bits * (span + 1)); the one-row
    // min/max aggregate broadcasts against the corpus
    val withB = docs.select(col(aCol).as("va"), col(bCol).as("vb"))
      .crossJoin(broadcast(mm))
      .select(
        ((col("va") - col("amin")) * n).as("na"),
        (col("amax") - col("amin") + 1).as("da"),
        ((col("vb") - col("bmin")) * n).as("nb"),
        (col("bmax") - col("bmin") + 1).as("db"))
      .select(expr("na DIV da").as("ab"), expr("nb DIV db").as("bb"))
    val zkey = zorderKey2(col("ab"), col("bb"), bits)
    val assigned = withB.select(
      col("ab"), col("bb"),
      shiftright(zkey, zFileShift).as("zfile"),
      shiftright(col("ab"), linFileShift).as("lfile"))
    // unpivot to (layout, file_no) rows BEFORE aggregating: one corpus
    // scan and one shuffle produce both layouts' file stats
    val stats = assigned
      .select(explode(array(
          struct(lit("zorder").as("layout"), col("zfile").as("file_no")),
          struct(lit("linear").as("layout"), col("lfile").as("file_no")))).as("lf"),
        col("ab"), col("bb"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_no").as("file_no"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ab")).as("fa_min"), max(col("ab")).as("fa_max"),
        min(col("bb")).as("fb_min"), max(col("bb")).as("fb_max"))
    // both boxes against every file row in ONE aggregation: cross the
    // (layouts × files)-sized stats table with the 2-row literal box table
    // (a broadcast of constants, not data) so the corpus is scanned once,
    // not once per box
    val spark = docs.sparkSession
    val maxBucket = (1 << bits) - 1
    val boxes = Seq(
      ("a", boxLoBucket, boxHiBucket, 0, maxBucket),
      ("b", 0, maxBucket, boxLoBucket, boxHiBucket))
    val boxesDf = boxes.map { case (bx, alo, ahi, blo, bhi) =>
      spark.range(1).select(lit(bx).as("box"), lit(alo).as("alo"),
        lit(ahi).as("ahi"), lit(blo).as("blo"), lit(bhi).as("bhi"))
    }.reduce(_ unionByName _)
    val hit = col("fa_max") >= col("alo") && col("fa_min") <= col("ahi") &&
      col("fb_max") >= col("blo") && col("fb_min") <= col("bhi")
    stats.crossJoin(broadcast(boxesDf))
      .groupBy(col("layout"), col("box"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(hit, 1L).otherwise(0L)).as("files_hit"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_hit"))
      .select(col("layout"), col("box"), col("files_total"),
        col("files_hit"), col("rows_hit"))
  }

  /** Compaction plan over a file manifest `(dir, file, bytes)` — the
    * OPTIMIZE step of lake maintenance: small files accrete per directory
    * (streaming appends, changeset MERGEs), and scan cost degrades with
    * per-file overhead until someone coalesces them. Greedy contiguous
    * grouping in file-name order: a file joins the current group while the
    * group's size BEFORE it is under `targetBytes` (groups are ≥ target
    * only via their last member — the packSequences budget rule, on
    * bytes). Output one row per planned output file: `(dir, group_no,
    * n_files, group_bytes, first_file, last_file)`; `n_files = 1` groups
    * are already-compact files the plan leaves untouched.
    *
    * Plan shape: one per-dir window (prefix sum in name order) + one hash
    * agg — manifest-sized, never touches data bytes. */
  def compactionPlan(files: DataFrame, targetBytes: Long,
                     dirCol: String = "dir", fileCol: String = "file",
                     bytesCol: String = "bytes"): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dirCol)).orderBy(col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    files
      .withColumn("_cum", sum(col(bytesCol)).over(w))
      .withColumn("group_no",
        expr(s"(_cum - $bytesCol) DIV ${targetBytes}L"))
      .groupBy(col(dirCol).as("dir"), col("group_no"))
      .agg(count(lit(1)).as("n_files"), sum(col(bytesCol)).as("group_bytes"),
        min(col(fileCol)).as("first_file"), max(col(fileCol)).as("last_file"))
  }

  /** The parquet data-file manifest of one directory: (dir, file, bytes),
    * in name order — [[compactionPlan]]'s input, from a real listing. */
  def parquetManifest(spark: SparkSession, path: String): Seq[(String, String, Long)] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (path, st.getPath.getName, st.getLen))
      .sortBy(_._2)
  }

  /** Execute a [[compactionPlan]] against a REAL parquet directory — the
    * apply half of the OPTIMIZE pair (the plan/apply split every lake
    * maintenance loop runs; the same build/apply lifecycle the
    * template-strip family follows): list the directory's data files into
    * the manifest, plan greedy groups at `targetBytes`, rewrite every
    * MULTI-file group as one file, and leave already-compact single-file
    * groups physically untouched. Repeated applies CONVERGE (file count
    * strictly decreases until every group is a single file) but one pass
    * is not always a fixpoint: merging small files re-encodes parquet
    * pages, so an output file can land under the byte budget its inputs
    * summed past, and the next pass may group it further — the spec pins
    * convergence within a couple of passes, row-identical throughout.
    *
    * Scale posture: the plan is MANIFEST-sized, so collecting it driver
    * side is the bounded-control-table exception (the trainer-merge-table
    * precedent), never a data collect; each group rewrite is a distributed
    * read of exactly that group's files plus a single-task write, so the
    * data plane cost is one read+write of the small-file bytes and groups
    * rewrite independently. Replacement is write-staged/delete/rename
    * within the directory — a production lake runs this swap under a
    * transaction log (Delta/Iceberg OPTIMIZE); the self-contained form
    * keeps the operator dependency-free and the spec pins row-identity
    * across it. Crash safety rides a PER-GROUP MANIFEST MARKER: before
    * the compacted file is renamed into place, a `_compact_manifest_g*`
    * marker records the target name and the member files it supersedes;
    * members are deleted only after the rename, and the marker is removed
    * last. A crash anywhere in that window is repaired by
    * [[recoverCompaction]] — target present means the swap is completed
    * (remaining members dropped), target absent means it never started
    * (marker and staging discarded, originals intact) — so an interrupted
    * apply can never leave rows PERMANENTLY double-counted. READ CONTRACT:
    * in the crash window after the rename but before the member deletes
    * finish, a direct parquet scan of the directory sees both the
    * compacted file and surviving members; readers that must be exact
    * across crashes run [[recoverCompaction]] (public, marker-gated — a
    * no-op on a healthy directory, the AtomicSwap reader-side pattern)
    * before scanning. Returns the applied plan:
    * (dir, group_no, n_files_in, group_bytes, compacted 0/1). */
  def compactionApply(spark: SparkSession, path: String,
                      targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, hPath)
    val files = parquetManifest(spark, path)
    val plan = compactionPlan(
      files.toDF("dir", "file", "bytes"), targetBytes).collect()
    plan.filter(_.getAs[Long]("n_files") > 1L).foreach { g =>
      val gno = g.getAs[Long]("group_no")
      val first = g.getAs[String]("first_file")
      val last = g.getAs[String]("last_file")
      // groups are contiguous in name order, so membership is the name range
      val members = files.map(_._2).filter(f => f >= first && f <= last)
      val tmp = new Path(path, s"_compact_g$gno")
      spark.read.parquet(members.map(f => s"$path/$f"): _*)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val out = fs.listStatus(tmp).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      require(out.size == 1, s"group $gno staged ${out.size} files, wanted 1")
      // MANIFEST → RENAME → DELETE → UNMARK: the marker (target name +
      // superseded members) is durably on disk before the output becomes
      // visible, so every crash window is repairable by recoverCompaction
      // — never data loss, never permanent row duplication. Output name
      // ends in .parquet (first does) and sorts deterministically.
      val target = new Path(path, s"compact-g$gno-$first")
      val marker = new Path(path, s"_compact_manifest_g$gno")
      val mo = fs.create(marker, true)
      try mo.write((target.getName +: members).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally mo.close()
      require(fs.rename(out.head.getPath, target),
        s"group $gno: rename ${out.head.getPath} -> $target failed; " +
          "originals left untouched")
      members.foreach(f => fs.delete(new Path(path, f), false))
      fs.delete(tmp, true)
      fs.delete(marker, false)
    }
    plan.toSeq.map(g => (g.getString(0), g.getLong(1), g.getLong(2),
        g.getLong(3), if (g.getLong(2) > 1L) 1L else 0L))
      .toDF("dir", "group_no", "n_files_in", "group_bytes", "compacted")
  }

  /** Repair an interrupted [[compactionApply]] from its on-disk markers —
    * PUBLIC so read paths can restore row-exactness before scanning (the
    * AtomicSwap reader-side recover pattern): a marker is the only state
    * in which a direct scan could double-count rows, and without one this
    * is a pure listing (no writes). */
  def recoverCompaction(spark: SparkSession, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    recoverCompaction(
      hPath.getFileSystem(spark.sparkContext.hadoopConfiguration), hPath)
  }

  /** [[recoverCompaction]] core: for each leftover `_compact_manifest_g*`,
    * if the recorded target file EXISTS the swap had committed — finish it
    * by deleting any member files still present; if it does NOT exist the
    * swap never started — the originals are intact and the marker is
    * stale. Either way the marker and any `_compact_g*` staging dir are
    * removed, restoring the directory to a row-exact state. */
  private def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                dir: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && name.startsWith("_compact_manifest_g")) {
        val in = fs.open(st.getPath)
        val body = try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        val lines = body.split("\n").toSeq.filter(_.nonEmpty)
        if (lines.nonEmpty && fs.exists(new Path(dir, lines.head)))
          lines.tail.foreach(f => fs.delete(new Path(dir, f), false))
        fs.delete(st.getPath, false)
      } else if (st.isDirectory && name.startsWith("_compact_g")) {
        fs.delete(st.getPath, true)
      }
    }
  }
}
