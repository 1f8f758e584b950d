package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural regression net over EVERY registered query: builds each
  * physical plan at sf0.001 and rejects join shapes that do not survive
  * scale. A cartesian or nested-loop join sneaking into a previously
  * equi-joined query is exactly the class of regression that stays green on
  * correctness and detonates at 100 TB. */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  // deliberately quadratic / tiny-side product queries, with the reason
  private val allowedProducts: Map[String, String] = Map(
    "dedup_embedding" -> "all-pairs regime by design (allowQuadratic opt-in)",
    "ann_topk" -> "brute-force baseline: broadcast query side x corpus",
    "ann_eval" -> "embeds the ann_topk brute-force ground truth (broadcast product)",
    "ann_ndcg" -> "embeds the ann_topk brute-force ground truth (broadcast product)",
    "ann_topk_int8" -> "quantized brute-force: broadcast query side x corpus",
    "ann_ivf" -> "query x centroid table product (10 x nCells rows)",
    "ann_ivf_det" -> "query x centroid table product (10 x nCells rows)",
    "ann_ivfpq" -> "query x coarse-centroid table product (10 x 2^planes rows)",
    "ann_ivfpq_index" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the artifact)",
    "ann_silhouette" -> "vector x centroid table product (n x 2^planes broadcast rows — the O(n·k) simplified-silhouette term itself)",
    "ta_keywords" -> "corpus-size one-row aggregate rides along broadcast",
    "sim_tfidf" -> "corpus-size one-row aggregate rides along broadcast (idf)",
    "sim_bm25" -> "one-row (n_docs, tot_len) stats ride along broadcast",
    "sim_rrf" -> "embeds sim_bm25's one-row stats broadcast",
    "sim_bm25_index" -> "one-row index stats artifact rides along broadcast",
    "sim_bm25_sharded" -> "same artifact query shape over the shard fan-out: one-row merged stats broadcast",
    "stream_bm25_sharded" -> "same shard fan-out query shape after the streamed per-shard merges: one-row merged stats broadcast",
    "ann_ivfpq_sharded" -> "query x coarse-centroid table product (10 x 2^planes rows, reconstructed from the shards' merged coarse sums)",
    "stream_ann_sharded" -> "query x coarse-centroid table product (10 x 2^planes rows, reconstructed from the stream-maintained shards' merged coarse sums)",
    "sim_bm25_incr" -> "same artifact query shape after the incremental merge: one-row stats broadcast",
    "stream_bm25_incr" -> "same artifact query shape after the streamed merges: one-row stats broadcast",
    "stream_bm25_autocompact" -> "same artifact query shape after the policy-folded streamed merges: one-row stats broadcast",
    "ann_index_incr" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the updated artifact)",
    "stream_ann_incr" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the stream-maintained artifact)",
    "stream_ann_autocompact" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the policy-folded artifact)",
    "ann_index_del" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the post-delete artifact)",
    "stream_ann_takedown" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the stream-deleted artifact)",
    "stream_ann_takedown_batched" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the pool-deleted artifact)",
    "ann_index_compact" -> "query x coarse-centroid table product (10 x 2^planes rows, read from the compacted artifact)",
    "sim_bm25_compact" -> "same artifact query shape after compaction: one-row stats broadcast",
    "sim_bm25_del" -> "same artifact query shape after the deletion merge: one-row stats broadcast",
    "stream_bm25_takedown" -> "same artifact query shape after the streamed deletes: one-row stats broadcast",
    "stream_bm25_takedown_batched" -> "same artifact query shape after the pooled streamed deletes: one-row stats broadcast",
    "mix_hard_triplets" -> "embeds sim_bm25's one-row stats broadcast",
    "dedup_cluster_labels" -> "corpus-size one-row aggregate rides along broadcast (idf)",
    "mix_temperature" -> "one-row totals aggregate rides along broadcast",
    "mix_importance" -> "one-row (n_tgt, n_raw) totals ride along broadcast",
    "mix_epoch_plan" -> "one-row totals aggregate rides along broadcast",
    "mix_unimax" -> "one-row (m, fill-level) aggregates ride along broadcast",
    "mix_quota" -> "one-row token-total aggregate rides along broadcast",
    "ver_drift" -> "token-total one-row aggregate rides along broadcast",
    "ta_pmi" -> "one-row bigram-total aggregate rides along broadcast",
    "a17_cms_counts" -> "one-row CMS sketch rides along broadcast",
    "a22_mg_heavy_hitters" -> "one-row corpus token total rides along broadcast (the N/(k+1) guarantee line)",
    "ta_train_lsq_score" -> "one-row trained model rides along broadcast",
    "ta_train_lsq_eval" -> "one-row trained model rides along broadcast",
    "ta_train_hashed" -> "one-row prior + one-row default-weight model rows ride along broadcast (the weight table itself is a broadcast EQUI-join)",
    "ta_hashed_incr" -> "same NB scoring shape over the frozen artifact: one-row prior/default broadcasts",
    "ta_hashed_eval" -> "same NB scoring shape rolled up per source: one-row prior/default broadcasts",
    "ta_train_stump" -> "one-row totals + one-row best-threshold broadcasts",
    "layout_zorder" -> "one-row dim min/max + 2-row literal box table ride along broadcast",
    "ta_zipf" -> "one-row rank-1 frequency rides along broadcast",
    "mine_bitext" -> "per-language-pair candidate block: src lang x broadcast tgt lang (the ANN-index stand-in at eval scale) + one-row NN-sum broadcasts",
    "mine_bitext_ann" -> "src lang x broadcast 2^planes-row centroid table (the probe ranking product; candidates themselves are cell equi-joined)",
    "ann_pca" -> "64-row vector / one-row max / one-row EVR ride along broadcast each power step",
    "dq_audit" -> "one-row FK-violation count x one-row table total (both sides single-row broadcasts)",
    "q22_idle_accounts" -> "one-row global-balance aggregate rides along broadcast",
    "ann_whiten" -> "embeds ann_pca's broadcast one-row rides + its own one-row |l|^2 / n broadcasts",
    "sql_ann_topk" -> "brute-force baseline through spark.sql: broadcast query side x corpus (ann_topk's shape)")

  test("no unplanned cartesian or nested-loop join in any registered query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hasProduct =
          plan.contains("CartesianProduct") || plan.contains("NestedLoopJoin")
        if (hasProduct && !allowedProducts.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unplanned product join in: ${offenders.mkString(", ")}")
  }

  test("dedupClustersStar fixpoint costs one aggregate action per round") {
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // chain of 3 + an isolated pair: converges in 2 star rounds
      val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
      val got = operators.Dedup.dedupClustersStar(pairs)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
      // the listener bus is asynchronous: poll until the count is stable
      // for a full second (a fixed sleep can undercount on a loaded host
      // and pass the bound vacuously), bounded at 15 s
      var stableSince = System.nanoTime()
      var last = jobs.get()
      val deadline = System.nanoTime() + 15_000_000_000L
      while (System.nanoTime() - stableSince < 1_000_000_000L &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = jobs.get()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      // jobs must have been delivered at all — a zero count means the
      // listener never attached and the bound below would pass vacuously
      assert(jobs.get() >= 10, s"only ${jobs.get()} jobs delivered")
      // calibrated canary (AQE runs each shuffle stage as its own job, so
      // the absolute numbers are larger than the action count): the
      // single-aggregate signature fixpoint measures 29 jobs on this input;
      // the previous count+count+except fixpoint measured 37. A bound
      // between the two catches a regression to multi-action detection.
      assert(jobs.get() <= 32,
        s"${jobs.get()} jobs — fixpoint test regressed beyond 1 action/round")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("corpusHealth reads the corpus exactly once — no self-joins") {
    val plan = operators.Summaries.corpusHealth(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan") && l.contains("parquet"))
    assert(scans == 1, s"expected 1 corpus scan, found $scans:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"one-scan report must not join the corpus against itself:\n$plan")
  }

  test("bpeFertility is one corpus scan with no join — n_syms/ws_words/source " +
    "come from a single projection") {
    val plan = operators.TextAnalysis.bpeFertility(
      Tables.documents(spark, sfDir), Seq(("t", "h"), ("th", "e")))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan") && l.contains("parquet"))
    assert(scans == 1, s"expected 1 corpus scan, found $scans:\n$plan")
    assert(!plan.contains("Join"),
      s"fertility must not join the corpus back to itself on doc_id:\n$plan")
  }

  test("zipfRanks tops-k via TakeOrderedAndProject — no global sort of the vocab") {
    val plan = operators.TextAnalysis.zipfRanks(
      Tables.documents(spark, sfDir), maxExp = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-k must be per-partition heaps + driver merge:\n$plan")
  }

  test("lorenzDeciles windows are source-partitioned — no single-partition exchange") {
    val plan = operators.Mixing.lorenzDeciles(
      Tables.documents(spark, sfDir), metric = "ws")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"per-source ranking must not serialize the corpus:\n$plan")
  }

  test("priorityReturns executes the EXISTS as a LEFT SEMI join (no " +
    "distinct-then-inner-join double shuffle)") {
    val plan = operators.Relational.priorityReturns(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"EXISTS must plan as a semi join:\n$plan")
    assert(!plan.toLowerCase.contains("distinct"),
      s"semi join must not be emulated via distinct+inner:\n$plan")
  }

  test("Q21 answers EXISTS + NOT-EXISTS with ONE per-order aggregate — " +
    "no fact-table self-join, top-k via TakeOrderedAndProject") {
    val plan = operators.Relational.soleFaultSuppliers(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the decorrelation scans lineitem twice (fault rows + per-order agg)
    // but must never join it to itself row-to-row on a non-equi condition
    assert(!plan.contains("NestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"correlated subqueries must decorrelate to the per-order agg:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"supplier top-k must be per-partition heaps + driver merge:\n$plan")
  }

  test("Q20 reaches the supplier dim as a LEFT SEMI join — no " +
    "distinct-then-inner duplicate-row blowup") {
    val plan = operators.Relational.dominantShareSuppliers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"the qualifying-supplier IN must plan as a semi join:\n$plan")
  }

  test("contrastiveTriplets joins pairs against a top-3-per-bucket " +
    "candidate table, not the whole bucketed corpus") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val plan = operators.Mixing.contrastiveTriplets(docs, pairs, numBuckets = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the <=3/bucket candidate side must broadcast:\n$plan")
    // the top-3 reduction runs BEFORE the join: a window bounds each
    // bucket's contribution so join fan-out is <=3 per pair at any scale
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected the per-bucket top-3 window below the join:\n$plan")
  }

  test("kCore peel fixpoint costs one aggregate action per round") {
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // chain 1-2-3-4 peels away in two rounds under k=2; triangle
      // 10-11-12 is the 2-core that survives
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
      val got = operators.Graphs.kCore(pairs, k = 2)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 2L), (11L, 2L), (12L, 2L)))
      var stableSince = System.nanoTime()
      var last = jobs.get()
      val deadline = System.nanoTime() + 15_000_000_000L
      while (System.nanoTime() - stableSince < 1_000_000_000L &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = jobs.get()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      assert(jobs.get() >= 5, s"only ${jobs.get()} jobs delivered")
      // calibrated like the clustering canary: the signature fixpoint
      // measures 24 jobs on this input; the previous per-round
      // count(old)+count(new) pair adds one action (plus its AQE stage
      // jobs) per round. A bound between the two catches a regression to
      // multi-action convergence detection.
      assert(jobs.get() <= 27,
        s"${jobs.get()} jobs — peel fixpoint regressed beyond 1 action/round")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("lake layout: partition pruning opens only the filtered directory") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-spec-").toString
    val docs = Tables.documents(spark, sfDir)
    sources.LakeLayout.writeOptimized(docs, dir,
      partitionCols = Seq("lang"), sortCols = Seq("n_chars"),
      filesPerPartition = 2)
    val filtered = sources.LakeLayout.read(spark, dir)
      .where(col("lang") === "en")
    // the plan prunes on the partition column, before any file I/O
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition filter in plan:\n$plan")
    // only lang=en files are touched: every file path read carries lang=en,
    // and the bucketed write bounds them at filesPerPartition
    val files = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.toSeq)
    assert(files.length <= 2, s"${files.length} files for one partition value")
    // a sort-column predicate reaches the parquet scan (row-group pruning)
    val ranged = sources.LakeLayout.read(spark, dir).where(col("n_chars") < 50L)
    val rplan = ranged.queryExecution.executedPlan.toString
    assert(rplan.contains("PushedFilters") && rplan.contains("LessThan(n_chars"),
      s"n_chars not pushed:\n$rplan")
    // and the round-trip is lossless
    val back = sources.LakeLayout.read(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars"))
      .isEmpty)
  }

  test("compaction plan groups real listed files contiguously under the byte target") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // a deliberately fragmented layout: 4 files per partition directory
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    sources.LakeLayout.writeOptimized(Tables.documents(spark, sfDir), dir,
      partitionCols = Seq("lang"), sortCols = Seq("n_chars"),
      filesPerPartition = 4)
    // the real manifest: (partition dir, file name, bytes) off the disk
    val manifest = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => (p.getParent.getFileName.toString, p.getFileName.toString,
        java.nio.file.Files.size(p)))
      .toSeq
    val perDir = manifest.groupBy(_._1)
    assert(perDir.nonEmpty && perDir.forall(_._2.size <= 4))
    assert(perDir.exists(_._2.size > 1), "layout produced no fragmentation")
    val target = manifest.map(_._3).max + 1 // every group must take >= 2 files
    val plan = sources.LakeLayout.compactionPlan(
        manifest.toDF("dir", "file", "bytes"), target)
      .as[(String, Long, Long, Long, String, String)].collect()
    // full coverage, contiguity, and the budget rule: a group's size stays
    // under target + one file (only the boundary-crossing member overshoots)
    assert(plan.map(_._3).sum == manifest.size)
    val maxFile = manifest.map(_._3).max
    plan.groupBy(_._1).foreach { case (d, groups) =>
      val sorted = groups.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$d groups overlap")
        case _ =>
      }
      sorted.foreach(g => assert(g._4 <= target + maxFile,
        s"$d group ${g._2} oversize: ${g._4}"))
    }
  }

  test("no tokenizer regexp inside a lambda in token/shingle explode plans") {
    // the explode-filter pitfall's regression net: Generate's inferred
    // size()>0 filter substitutes child expressions when pushed down. The
    // per-ROW duplicates it creates are collapsed by whole-stage codegen's
    // subexpression elimination, but CSE cannot hoist INTO a higher-order
    // function's lambda — a tokenize that lands inside `lambdafunction`
    // re-runs per array ELEMENT (measured 27× on the shingle chain).
    // Every plan node line with a lambda must therefore be regexp-free,
    // and total tokenize mentions stay bounded (the broken SQL chain
    // carried 12).
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    def audit(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      p.linesIterator.foreach { line =>
        assert(!(line.contains("lambdafunction") &&
            line.contains("regexp_replace")),
          s"$tag: tokenizer inlined into a lambda (per-element re-run):\n" +
            line.take(800))
      }
      val n = "regexp_replace".r.findAllIn(p).length
      assert(n <= 4, s"$tag: $n tokenize mentions in the plan (CSE bound)")
    }
    audit("explodeTokens",
      TextFunctions.explodeTokens(docs, "t", "doc_id"))
    audit("shingleTable", operators.Dedup.shingleTable(docs, 3))
    audit("ngramDiversity", operators.TextAnalysis.ngramDiversity(docs, 3))
    audit("minhashTable", operators.Dedup.minhashTable(docs, 3, 16))
  }

  test("exact-dup windows shuffle the 8-byte content hash — no exchange " +
    "carries the document text or the full normalized string") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = Tables.documents(spark, sfDir)
    def audit(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.foreach {
        case e: ShuffleExchangeExec =>
          val carried = e.output.map(_.name).toSet
          assert(!carried.contains("text") && !carried.contains("norm"),
            s"$tag: exchange ships the document body (${carried.mkString(",")})")
        case _ =>
      }
    }
    audit("exactDuplicates", operators.Dedup.exactDuplicates(docs))
    audit("corpusHealth", operators.Summaries.corpusHealth(docs))
    audit("crossSourceDupMatrix", operators.Dedup.crossSourceDupMatrix(docs))
    // soft dedup: every exchange carries (doc_id, h)-shaped rows, never
    // the shingle STRING (hashed before the first shuffle) or the text
    audit("softDedupWeights", operators.Dedup.softDedupWeights(docs, 3))
  }

  test("softDedupWeights exchanges never carry the shingle string") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = Tables.documents(spark, sfDir)
    val plan = operators.Dedup.softDedupWeights(docs, 3)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.foreach {
      case e: ShuffleExchangeExec =>
        val carried = e.output.map(_.name).toSet
        assert(!carried.contains("sh") && !carried.contains("toks"),
          s"exchange ships shingle/token strings (${carried.mkString(",")})")
      case _ =>
    }
  }

  test("templateLineStrip: the df agg is the only shuffled leg (hash " +
    "longs, no line strings); strip set + doc counts ride broadcasts; " +
    "the rewrite has no reassembly exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = Tables.documents(spark, sfDir)
    val qe = operators.WebCuration.templateLineStrip(docs).queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.foreach {
      case e: ShuffleExchangeExec =>
        // every exchange is an agg leg: (source, h) / (source, n_docs) /
        // (source, bl) rows — `source` is the one permitted string; line
        // text, token arrays, and document text never shuffle
        val strings = e.output
          .filter(_.dataType.catalogString.contains("string"))
          .map(_.name).toSet
        assert(strings.subsetOf(Set("source")),
          s"exchange ships line/doc strings: ${strings.mkString(",")}")
      case _ =>
    }
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"strip set must reach the rewrite as a broadcast:\n${s.take(2000)}")
  }
}
