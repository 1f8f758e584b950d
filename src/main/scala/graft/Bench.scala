package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The full result (including the second scale point's
  * per-query map) is written to SPARK_GRAFT_BENCH_OUT (default
  * `bench_out.json` in the CWD); the stdout line carries everything except
  * `queries2` and rounds timings to milliseconds, so it stays well under the
  * driver's log-tail window — round 2's stdout line grew past that window
  * and the driver parsed nothing.
  * If SPARK_GRAFT_BENCH_SF2 names a second existing scale dir (default
  * sf0.01), the suite is re-run there and recorded under `sf2`/`total2`/
  * `failed2` (stdout) + `queries2` (file) — two scale points make per-query
  * scaling slopes visible. */
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
    "stream_ann_autocompact")

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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // (succeeded timings, failed names) — a failed query's partial elapsed
    // time is NOT recorded, so totals and scaling slopes only ever compare
    // fully-run queries.
    // Each scale point gets a FRESH session: a 50-query suite accumulates
    // generated classes, broadcast blocks, and listener state that only a
    // stopped context + full GC release — measured in-session drift of 2×
    // on random queries otherwise (the second scale point inherited all of
    // the first's garbage).
    def runSuite(dir: String)
        : (Map[String, Double], List[String], Map[String, Seq[Double]]) = {
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
      // one UNTIMED rep of EVERY query before any timing starts (the
      // sql_minhash fix generalized — round-11 verdict task 5): committed
      // baseline cells must be warm medians, not codegen-cold first
      // invocations — the envelope was ~2× loose on exactly the newest
      // queries because their cells were first-run cold, so a real ~1.8×
      // regression there would have sailed through the delta gate.
      // SPARK_GRAFT_BENCH_WARMUP=0 skips it (quick local iteration).
      // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the suite — for protocol
      // A/Bs (e.g. the loaded-vs-quiet median validation) where a
      // full-suite run per arm would cost 20 minutes each. Normal gate
      // runs leave it unset.
      val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      def selected(name: String): Boolean = only.forall(_.contains(name))
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") == "1") {
        var warmGc = 0
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter(q => selected(q._1)).foreach { case (_, fn) =>
          warmGc += 1
          if (warmGc >= 5) { System.gc(); warmGc = 0 }
          try { fn(spark, dir).queryExecution.toRdd.count(); () }
          catch { case _: Throwable => () }
        }
        System.gc()
      }
      var failed = List.empty[String]
      var sinceGc = 0
      val spreads = scala.collection.mutable.Map.empty[String, Seq[Double]]
      // sorted name order: queries is a HashMap, so adding one entry would
      // otherwise reshuffle the whole suite's execution (and JIT-warmup)
      // order and make per-query timings incomparable across rounds
      val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => selected(q._1)).flatMap { case (name, fn) =>
        // a full GC every few queries lets the ContextCleaner reap
        // broadcasts and the JVM unload dead generated classes — with a
        // large heap no GC happens naturally and both pile up (outside the
        // timed window; costs ~0.1 s each)
        // every 5 (was 10): the round-5 clustering queries (localCheckpoint
        // iterations) raise inter-GC garbage enough that neighbors measured
        // 2-4× slower in-suite than isolated; ~0.1 s per GC is cheap
        sinceGc += 1
        if (sinceGc >= 5) { System.gc(); sinceGc = 0 }
        // toRdd forces the full physical plan (projections, sorts) — a bare
        // count() would let Catalyst prune the very operators being measured
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
          // concurrent JVM, and round 13's single-rep gate artifact
          // reported phantom 2-5.6× regressions that re-measured at
          // envelope level in a quiet window. The sub-second tail stays
          // single-rep to bound total wall time; the named sets keep
          // forcing 3 reps even when a lucky first rep lands under 1 s.
          val times =
            if (t1 > 1.0 || artifactQueries(name) || highVarianceQueries(name))
              Seq(t1, rep(), rep()).sorted
            else Seq(t1)
          // rep spread goes to the file artifact so pollution is
          // self-evident: a wide [min,med,max] on a flagged cell says
          // "noisy run", a tight one says "real change"
          if (times.length > 1) spreads(name) = times
          Some(name -> times(times.length / 2))
        } catch { case _: Throwable => failed ::= name; None }
      }.toMap
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      (results, failed, spreads.toMap)
    }

    def qJson(m: Map[String, Double]): String =
      m.map { case (k, v) => jstr(k) + ":" + r3(v) }.mkString("{", ",", "}")
    def fJson(f: List[String]): String = f.map(jstr).mkString("[", ",", "]")
    def sJson(m: Map[String, Seq[Double]]): String =
      m.map { case (k, v) =>
        jstr(k) + ":" + v.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")

    val (results, failed, spread) = runSuite(sfDir)
    val total = if (results.nonEmpty) results.values.sum else 0.0

    val sf2 = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF2", "/root/testdata/sf0.01")
    // gate the sf2 section on "the sf2 suite was run", not on r2.nonEmpty —
    // an all-queries-failed sf2 run must still emit failed2, or it would be
    // indistinguishable from sf2 not being configured
    val sf2Ran = sf2 != sfDir && Files.isDirectory(Paths.get(sf2))
    val (r2, f2, spread2) =
      if (sf2Ran) runSuite(sf2)
      else (Map.empty[String, Double], List.empty[String],
        Map.empty[String, Seq[Double]])
    val sf2Head =
      if (sf2Ran)
        s""","sf2":${jstr(sf2)},"total2":${r3(r2.values.sum)},"failed2":${fJson(f2)}"""
      else ""

    val head =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${qJson(results)},"failed":${fJson(failed)},"sf":${jstr(sfDir)}$sf2Head"""
    val stdoutLine = head + "}"
    // rep spreads (sorted [min,med,max] per medianed cell) ride only the
    // FILE artifact — the stdout line must stay inside the driver's
    // log-tail window
    val fileLine =
      if (sf2Ran)
        head + s""","queries2":${qJson(r2)},"spread":${sJson(spread)},"spread2":${sJson(spread2)}}"""
      else head + s""","spread":${sJson(spread)}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(outFile), fileLine + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: $e") }
    println(stdoutLine)
  }
}
