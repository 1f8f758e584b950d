package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The full result (including the second scale point's
  * per-query map and rep spreads) is written to SPARK_GRAFT_BENCH_OUT
  * (default `bench_out.json` in the CWD); the stdout line carries everything
  * except `queries2`/spreads and rounds timings to milliseconds, so it stays
  * well under the driver's log-tail window — round 2's stdout line grew past
  * that window and the driver parsed nothing.
  * If SPARK_GRAFT_BENCH_SF2 names a second existing scale dir (default
  * sf0.01), the suite is re-run there and recorded under `sf2`/`total2`/
  * `failed2` (stdout) + `queries2` (file) — two scale points make per-query
  * scaling slopes visible.
  *
  * WALL-BUDGET CONTRACT (round-14 verdict task 1 — that round's gate run
  * timed out at the driver's cap and reported NOTHING):
  *  - cells that will be medianed anyway get NO untimed warmup rep (the
  *    first timed rep is the warmup; the median of 3 absorbs it — measured
  *    ~720 s/run saved). "Will be medianed" = named artifact/high-variance
  *    sets ∪ cells whose committed-envelope time exceeds
  *    [[WarmSkipThresholdS]]; cells with no envelope entry (new queries)
  *    keep the warmup rep.
  *  - SPARK_GRAFT_BENCH_DEADLINE_S (default 3000) bounds the run: past the
  *    deadline every remaining cell degrades to single-rep (recorded under
  *    `degraded`), and past 1.2× the deadline remaining cells are skipped
  *    outright (recorded under `skipped`) — a slow run truncates, it never
  *    times out silently.
  *  - the file artifact is rewritten after EVERY cell (flagged
  *    `"partial":true` until the run completes), and a JVM shutdown hook
  *    emits the stdout line + artifact for whatever completed, so even a
  *    SIGTERM'd run yields a parseable result.
  *  - SPARK_GRAFT_BENCH_ONLY subset runs are stamped `"only":[...]` in both
  *    lines; tools/promote_envelope.py and tools/bench_delta.py refuse to
  *    treat such an artifact as a full suite. */
object Bench {
  /** Minimal JSON string escaper for interpolated values (paths, query
    * names): backslash, quote, control chars. */
  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }
  private def jstr(s: String): String = "\"" + esc(s) + "\""
  private def r3(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Queries that write (or stage-and-read) filesystem artifacts in-query;
    * their timings get median-of-3 treatment in [[main]]. */
  private val artifactQueries = Set(
    "ta_bpe_artifact", "ta_wordpiece_artifact", "ta_unigram_artifact",
    "dedup_pairs_artifact",
    "sim_bm25_index", "src_orc_roundtrip", "layout_pruned_scan",
    "e2e_corpus_from_artifact", "stream_near_dup", "stream_curate",
    "stream_decontam", "stream_dq", "src_schema_evolution",
    "stream_sessions", "src_csv_roundtrip",
    "ann_build_index", "ann_ivfpq_index", "stream_attribution",
    "stream_attribution_outer", "web_template_incr", "stream_template_strip",
    "src_corrupt_records", "layout_compaction_apply", "ta_hashed_incr",
    "stream_quality_nb", "sim_bm25_incr", "src_custom_source",
    "ann_index_incr", "stream_bm25_incr", "mm_phash_incr",
    "stream_custom_source", "stream_ann_incr", "ann_index_del",
    "sim_bm25_del", "e2e_image_pipeline", "stream_bm25_takedown",
    "stream_ann_takedown", "sim_bm25_compact", "ann_index_compact",
    "dedup_pairs_del", "stream_neardup_takedown", "stream_bm25_autocompact",
    "stream_ann_autocompact", "sim_bm25_sharded", "ann_ivfpq_sharded",
    "stream_bm25_sharded", "stream_ann_sharded")

  /** Measured high-variance queries (cache staging, state stores, session
    * position): single timings swing 2-3× across identical quiet runs
    * (round-7 adjudication), so they cry wolf through the bench_delta gate.
    * Medianed like the artifact set. */
  private val highVarianceQueries = Set(
    "sql_minhash_pairs", "sql_ann_topk", "a16_corpus_health",
    "dedup_lsh_eval",
    // round-8 adjudication: committed 2.4 s cells re-measured 3.3-4.5 s
    // across a driver run AND a quiet session with no code change — JIT /
    // session-position sensitive, so median them too
    "ta_wordpiece_segment", "ta_wordpiece_fertility")

  /** A cell whose committed-envelope time exceeds this is going to be
    * medianed anyway (the >1 s dynamic rule), so its untimed warmup rep is
    * pure wall — skip it. Slightly under 1 s so borderline cells err on
    * the skip side (they then get a FORCED median, keeping their committed
    * value a warm median either way). */
  private val WarmSkipThresholdS = 0.9

  /** Per-query envelope times for this scale dir from the committed
    * baseline artifact (queries = its `sf` point, queries2 = its `sf2`),
    * used ONLY to decide which cells skip the warmup rep — any value is
    * protocol-safe because a skipped-warmup cell is always medianed. */
  private def envelopeTimes(dir: String): Map[String, Double] =
    try {
      val f = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_baseline.json"))
      if (!f.isFile) Map.empty
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        def m(field: String): Map[String, Double] = {
          val n = node.get(field)
          if (n == null || !n.isObject) Map.empty
          else {
            val names = n.fieldNames()
            val b = Map.newBuilder[String, Double]
            while (names.hasNext) {
              val k = names.next(); b += k -> n.get(k).asDouble()
            }
            b.result()
          }
        }
        def text(field: String): String =
          Option(node.get(field)).map(_.asText("")).getOrElse("")
        if (text("sf") == dir) m("queries")
        else if (text("sf2") == dir) m("queries2")
        else { // unknown dir (custom SF): be conservative, use the max
          val a = m("queries"); val b = m("queries2")
          (a.keySet ++ b.keySet).map(k =>
            k -> math.max(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))).toMap
        }
      }
    } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "3000")
      .toDouble
    val startNs = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - startNs) / 1e9
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")

    // ------------------------------------------------------------ state
    // One mutable result board, updated cell-by-cell under `lock`, so the
    // shutdown hook (SIGTERM from a wall-capped driver) can always emit a
    // parseable snapshot of whatever completed.
    final class Point {
      var results = Vector.empty[(String, Double)]
      var failed = List.empty[String]
      var spreads = Vector.empty[(String, Seq[Double])]
      var degraded = List.empty[String] // past-deadline single-rep cells
      var skipped = List.empty[String] // past-hard-deadline unrun cells
    }
    val lock = new Object
    val p1 = new Point; val p2 = new Point
    var sf2Ran = false
    var finished = false
    var hookFired = false
    val sf2 = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF2", "/root/testdata/sf0.01")

    def qJson(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => jstr(k) + ":" + r3(v) }.mkString("{", ",", "}")
    def fJson(f: List[String]): String =
      f.reverse.map(jstr).mkString("[", ",", "]")
    def sJson(m: Seq[(String, Seq[Double])]): String =
      m.map { case (k, v) =>
        jstr(k) + ":" + v.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")

    def render(partial: Boolean): (String, String) = {
      val onlyPart = only.map(o =>
        s""","only":${o.toSeq.sorted.map(jstr).mkString("[", ",", "]")}""")
        .getOrElse("")
      val partialPart = if (partial) ""","partial":true""" else ""
      val sf2Head =
        if (sf2Ran)
          s""","sf2":${jstr(sf2)},"total2":${r3(p2.results.map(_._2).sum)},"failed2":${fJson(p2.failed)}"""
        else ""
      val head =
        s"""{"metric":"total","value":${r3(p1.results.map(_._2).sum)},"unit":"sec","queries":${qJson(p1.results)},"failed":${fJson(p1.failed)},"sf":${jstr(sfDir)}""" +
          sf2Head +
          s""","deadline_s":${r3(deadlineS)},"elapsed_s":${r3(elapsedS)}""" +
          s""","degraded_n":${p1.degraded.size + p2.degraded.size},"skipped_n":${p1.skipped.size + p2.skipped.size}""" +
          onlyPart + partialPart
      val stdoutLine = head + "}"
      // one-time per-session template builds (SparkEntry.stagedTemplate):
      // the build-vs-maintain split the lifecycle cells no longer pay per
      // rep stays visible in the artifact
      val staged = {
        import scala.jdk.CollectionConverters._
        SparkEntry.stagedBuildSeconds.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => jstr(k) + ":" + r3(v) }
          .mkString("{", ",", "}")
      }
      val fileTail =
        (if (sf2Ran) s""","queries2":${qJson(p2.results)},"spread2":${sJson(p2.spreads)}""" else "") +
          s""","spread":${sJson(p1.spreads)}""" +
          s""","degraded":${fJson(p1.degraded)},"degraded2":${fJson(p2.degraded)}""" +
          s""","skipped":${fJson(p1.skipped)},"skipped2":${fJson(p2.skipped)}""" +
          s""","staged_builds":$staged}"""
      (stdoutLine, head + fileTail)
    }

    def writeArtifact(partial: Boolean): String = {
      val (stdoutLine, fileLine) = render(partial)
      try Files.writeString(Paths.get(outFile), fileLine + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] write $outFile failed: $e") }
      stdoutLine
    }

    // fail OPEN: a driver that SIGTERMs a too-slow run still gets the
    // stdout JSON line and the file artifact for everything that completed.
    // hookFired makes the hook and the normal exit mutually exclusive, so
    // stdout always ends with exactly one COMPLETE line (a SIGTERM'd main
    // thread racing its own final println could otherwise truncate it).
    val hook = new Thread(() => lock.synchronized {
      if (!finished) { hookFired = true; println(writeArtifact(partial = true)) }
    }, "graft-bench-emit-on-shutdown")
    Runtime.getRuntime.addShutdownHook(hook)

    // ------------------------------------------------------------ suite
    // Each scale point gets a FRESH session: a large suite accumulates
    // generated classes, broadcast blocks, and listener state that only a
    // stopped context + full GC release — measured in-session drift of 2×
    // on random queries otherwise (the second scale point inherited all of
    // the first's garbage).
    def runSuite(dir: String, point: Point): Unit = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warmup: touch every table once so per-query timings measure the
      // operators, not file-listing / reader / codegen session init
      Tables.names.foreach { n =>
        try Tables.load(spark, dir, n).count() catch { case _: Throwable => () }
      }
      // stage sql_minhash_pairs' once-per-session signature/band caches in
      // the UNTIMED warmup: its timed reps then measure the serve path the
      // committed baseline cell claims (the staging cost is a per-snapshot
      // index build, not a per-query cost — round-10 verdict task 2)
      try SparkEntry.stageSqlMinhash(spark, dir)
      catch { case _: Throwable => () }
      val envelope = envelopeTimes(dir)
      // a cell is medianed when: named set member, committed-envelope time
      // says it will cross the 1 s dynamic threshold, or its first timed
      // rep does. Every medianed cell SKIPS the untimed warmup rep — the
      // median absorbs the cold first rep (round-14 verdict task 1a).
      def namedSlow(name: String): Boolean =
        artifactQueries(name) || highVarianceQueries(name)
      def envelopeSlow(name: String): Boolean =
        envelope.get(name).exists(_ > WarmSkipThresholdS)
      // one UNTIMED rep of each cell that will be SINGLE-rep timed (the
      // sql_minhash fix generalized — round-11 verdict task 5): committed
      // baseline cells must be warm, not codegen-cold first invocations.
      // SPARK_GRAFT_BENCH_WARMUP=0 skips it (quick local iteration).
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") == "1") {
        var warmGc = 0
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter(q => selected(q._1))
          .filterNot(q => namedSlow(q._1) || envelopeSlow(q._1))
          .foreach { case (name, fn) =>
            if (elapsedS <= deadlineS) {
              warmGc += 1
              if (warmGc >= 5) { System.gc(); warmGc = 0 }
              try { fn(spark, dir).queryExecution.toRdd.count(); () }
              catch { case _: Throwable => () }
            } else lock.synchronized {
              // a deadline-skipped warmup means this single-rep cell will
              // be timed codegen-COLD — record it as degraded so the
              // artifact never presents a cold value as warm (and
              // promote_envelope's reject_non_full refuses the run)
              if (!point.degraded.contains(name)) point.degraded ::= name
              writeArtifact(true)
            }
          }
        System.gc()
      }
      var sinceGc = 0
      // sorted name order: queries is a HashMap, so adding one entry would
      // otherwise reshuffle the whole suite's execution (and JIT-warmup)
      // order and make per-query timings incomparable across rounds
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => selected(q._1)).foreach { case (name, fn) =>
        if (elapsedS > deadlineS * 1.2) {
          // hard deadline: a pathological run truncates loudly instead of
          // timing out silently — the artifact names what it never ran
          lock.synchronized { point.skipped ::= name; writeArtifact(true) }
        } else {
          // a full GC every few queries lets the ContextCleaner reap
          // broadcasts and the JVM unload dead generated classes — with a
          // large heap no GC happens naturally and both pile up (outside
          // the timed window; costs ~0.1 s each)
          sinceGc += 1
          if (sinceGc >= 5) { System.gc(); sinceGc = 0 }
          // toRdd forces the full physical plan (projections, sorts) — a
          // bare count() would let Catalyst prune the operators measured
          try {
            def rep(): Double = {
              val t0 = System.nanoTime()
              fn(spark, dir).queryExecution.toRdd.count()
              (System.nanoTime() - t0) / 1e9
            }
            val t1 = rep()
            // DYNAMIC median-of-3: every cell above ~1 s earns two more
            // timed reps — the FS-heavy streaming pipelines and index
            // builds are exactly the set that swings 2-6× under a
            // concurrent JVM (round-13's single-rep gate artifact reported
            // phantom 2-5.6× regressions that re-measured at envelope
            // level). The sub-second tail stays single-rep (it had the
            // warmup rep instead); envelope-slow cells that skipped their
            // warmup are FORCED to median so their committed value is a
            // warm median either way. Past the soft deadline everything
            // degrades to single-rep and says so.
            val wantMedian =
              t1 > 1.0 || namedSlow(name) || envelopeSlow(name)
            val pastSoft = elapsedS > deadlineS
            val times =
              if (wantMedian && !pastSoft) Seq(t1, rep(), rep()).sorted
              else Seq(t1)
            lock.synchronized {
              if (wantMedian && pastSoft && !point.degraded.contains(name))
                point.degraded ::= name
              // rep spread goes to the file artifact so pollution is
              // self-evident: a wide [min,med,max] on a flagged cell says
              // "noisy run", a tight one says "real change"
              if (times.length > 1) point.spreads :+= (name -> times)
              point.results :+= (name -> times(times.length / 2))
              writeArtifact(true) // incremental: every cell lands on disk
            }
          } catch { case _: Throwable =>
            lock.synchronized { point.failed ::= name; writeArtifact(true) }
          }
        }
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
    }

    runSuite(sfDir, p1)
    // gate the sf2 section on "the sf2 suite was run", not on results
    // being non-empty — an all-queries-failed sf2 run must still emit
    // failed2, or it would be indistinguishable from sf2 not configured
    if (sf2 != sfDir && Files.isDirectory(Paths.get(sf2))) {
      sf2Ran = true
      runSuite(sf2, p2)
    }

    lock.synchronized {
      if (!hookFired) {
        finished = true
        println(writeArtifact(partial = false))
      }
    }
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () } // already shutting down
  }
}
