package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{ArticleOps, Summaries, Relational}
import graft.operators.Summaries.{exactSum, fx}

/** Driver contract — SURVEY.md §7.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (names keyed to the
  * inventory IDs); each has a DuckDB oracle in `oracleSql` mirroring the
  * computation expression-for-expression. Determinism rules used throughout:
  *  - every query ends in an ORDER BY on a unique key;
  *  - double aggregates use per-row fixed-point `floor(x*scale+0.5)::BIGINT`
  *    then integer sums (order-independent, bit-identical cross-engine);
  *  - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Engine tunables; every threshold/size below comes from here, so a
    * deployment retunes via a config file (`GRAFT_CONFIG=/path/to.yaml`)
    * without recompiling. Defaults (no file) equal the constants the DuckDB
    * oracles are written against. */
  val cfg: GraftConfig =
    sys.env.get("GRAFT_CONFIG").map(GraftConfig.load).getOrElse(GraftConfig.default)

  /** Flagship query on sf=0.001 — the reference's E2 pipeline shape
    * (scan → validate → clean → derive metadata → per-source summary). */
  def entry(spark: SparkSession): DataFrame =
    queries("e2e_pipeline")(spark, "/root/testdata/sf0.001")

  /** Fixed staging dir for in-query persisted artifacts (merge tables,
    * pair graphs, ORC/lake round-trips). A FIXED, parameter-keyed path —
    * NOT a fresh `createTempDirectory` per run: fresh dirs made
    * artifact-query bench numbers mostly tempdir allocation + page-cache
    * noise (`ta_bpe_artifact` swung 3.8 ↔ 15.7 s between identical runs).
    * `fresh = true` deletes first (build queries — each run re-writes);
    * `fresh = false` lets a consumer reuse an artifact a sibling build
    * query already staged THIS code version (the key embeds the build
    * parameters, so a config change never reads a stale artifact). */
  private def stagedDir(name: String, sfDir: String, key: String,
                        fresh: Boolean): String = {
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.stage.root",
        sys.props("java.io.tmpdir") + "/graft-stage"))
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val dir = root.resolve(s"$name-$sf-$key")
    if (fresh && java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) {
        _.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    java.nio.file.Files.createDirectories(dir)
    dir.toString
  }

  /** Staging dirs BUILT during this JVM session. A consumer query (e.g.
    * `e2e_corpus_from_artifact`) reuses a sibling build query's artifact
    * only when it was written by THIS session's code — never a leftover
    * from an earlier run of a different build, which could silently serve
    * stale results to the correctness gate. */
  private val stagedThisSession: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Seconds spent building each session TEMPLATE (see [[stagedTemplate]]),
    * keyed `name-key`. PUBLIC so Bench surfaces the one-time build costs
    * in its artifact (`staged_builds`) — the build-vs-maintain split stays
    * visible instead of the cells just getting silently faster. */
  val stagedBuildSeconds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private val templateLock = new Object

  /** Session-wide TEMPLATE staging for the index-LIFECYCLE cells
    * (round-15 verdict task 6). The `stream_*` / `*_incr` / `*_del` /
    * `*_compact` cells' names claim MAINTENANCE, but each invocation also
    * paid the shared base-index build inside the timed window — at sf0.1
    * that build is the dominant fixed cost, and several cells build the
    * IDENTICAL base (the full-corpus ANN index four times, the
    * three-quarters BM25 base three times). The base is now built ONCE
    * per session per (name, sf, key) into a pristine template directory;
    * each invocation starts from a filesystem COPY of it ([[copyTree]]),
    * so timed reps measure maintenance + copy, not rebuild. Content-safe
    * because the builds are deterministic — the oracles' update==rebuild
    * claims already rely on exactly that — and the copy preserves bytes.
    * The 100 TB reading: a real deployment builds its base index once
    * per corpus snapshot and runs MANY maintenance cycles against it;
    * per-cycle cost is what these cells exist to measure. */
  private def stagedTemplate(name: String, sfDir: String, key: String)
                            (build: String => Unit): String =
    templateLock.synchronized {
      val tmplKey = s"tmpl:$name:$sfDir:$key"
      if (!stagedThisSession.contains(tmplKey)) {
        val t0 = System.nanoTime()
        val freshDir = stagedDir(s"tmpl-$name", sfDir, key, fresh = true)
        build(freshDir)
        stagedBuildSeconds.put(s"$name-$key", (System.nanoTime() - t0) / 1e9)
        stagedThisSession.add(tmplKey)
      }
      stagedDir(s"tmpl-$name", sfDir, key, fresh = false)
    }

  // ---- shared base-index templates (each built once per session; see
  // stagedTemplate). The grouping mirrors the builds the lifecycle cells
  // share: the full-corpus ANN index serves four cells, the
  // three-quarters bases serve three each. ----

  /** Full-corpus IVF+PQ index — base of the ANN takedown/compaction
    * cells. */
  private def annFullTemplate(s: SparkSession, d: String): String =
    stagedTemplate("ann-full", d, "p4m8b4r1") { t =>
      operators.Similarity.buildAnnIndex(Tables.embeddings(s, d), t)
    }

  /** Three-quarters IVF+PQ index + the incoming quarter as a 3-file
    * stream source — base of the ANN incremental/autocompact cells. */
  private def ann75Template(s: SparkSession, d: String): String =
    stagedTemplate("ann-75", d, "p4m8b4r1") { t =>
      val emb = Tables.embeddings(s, d)
      operators.Similarity.buildAnnIndex(
        emb.where(col("vec_id") % 4 =!= 0), s"$t/index")
      emb.where(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding"))
        .repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Full-corpus BM25 index — base of the BM25 takedown/compaction
    * cells. */
  private def bm25FullTemplate(s: SparkSession, d: String): String =
    stagedTemplate("bm25-full", d, "v1") { t =>
      operators.Similarity.buildBm25Index(Tables.documents(s, d), t,
        maxDf = cfg.retrievalMaxDf)
    }

  /** Three-quarters BM25 index + the incoming quarter as a 3-file stream
    * source — base of the BM25 incremental/autocompact cells. */
  private def bm2575Template(s: SparkSession, d: String): String =
    stagedTemplate("bm25-75", d, "v2") { t =>
      val docs = Tables.documents(s, d)
      operators.Similarity.buildBm25Index(
        docs.where(col("doc_id") % 4 =!= 0), s"$t/index",
        maxDf = cfg.retrievalMaxDf)
      docs.where(col("doc_id") % 4 === 0).select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Full-corpus 4-shard IVF+PQ index — base of the sharded ANN serving
    * cell. */
  private def annShardedTemplate(s: SparkSession, d: String): String =
    stagedTemplate("ann-shfull", d, "p4m8b4r1-s4") { t =>
      operators.Similarity.buildAnnIndexSharded(Tables.embeddings(s, d),
        t, shards = 4)
    }

  /** Three-quarters 2-shard IVF+PQ index + the quarter as a 2-file
    * stream source — base of the sharded ANN maintenance cell. */
  private def annSharded75Template(s: SparkSession, d: String): String =
    stagedTemplate("ann-sh75", d, "p4m8b4r1-s2") { t =>
      val emb = Tables.embeddings(s, d)
      operators.Similarity.buildAnnIndexSharded(
        emb.where(col("vec_id") % 4 =!= 0), s"$t/index", shards = 2)
      emb.where(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding"))
        .repartition(2).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Zipf-corpus 4-shard BM25 index — base of the sharded BM25 serving
    * cell. */
  private def bm25ShardedZipfTemplate(s: SparkSession, d: String): String =
    stagedTemplate("bm25-shzipf", d, "v1-s4") { t =>
      operators.Similarity.buildBm25IndexSharded(
        operators.TextAnalysis.syntheticZipfCorpus(Tables.documents(s, d)),
        t, shards = 4, maxDf = cfg.retrievalMaxDf)
    }

  /** Three-quarters 2-shard BM25 index + the quarter as a 2-file stream
    * source — base of the sharded BM25 maintenance cell. */
  private def bm25Sharded75Template(s: SparkSession, d: String): String =
    stagedTemplate("bm25-sh75", d, "v1-s2") { t =>
      val docs = Tables.documents(s, d)
      operators.Similarity.buildBm25IndexSharded(
        docs.where(col("doc_id") % 4 =!= 0), s"$t/index", shards = 2,
        maxDf = cfg.retrievalMaxDf)
      docs.where(col("doc_id") % 4 === 0).select(col("doc_id"), col("text"))
        .repartition(2).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Partitioned minhash signature index (+ members sibling) of the
    * existing half, with the takedown requests as a 3-file stream source
    * — base of the streamed signature-takedown cell. */
  private def minhashTakedownTemplate(s: SparkSession, d: String): String =
    stagedTemplate("mh-takedown", d, "n3k16-m7") { t =>
      val docs = Tables.documents(s, d)
      operators.Dedup.minhashTable(
          docs.where(col("doc_id") < 400), cfg.ngramN, cfg.minhashK)
        .withColumn("batch_id", pmod(col("doc_id"), lit(3L)))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$t/index")
      operators.Dedup.buildMinhashMembers(s, s"$t/index")
      docs.where(col("doc_id") % 7 === 5 && col("doc_id") < 400)
        .select(col("doc_id"))
        .repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Persisted train-shingle universe + the eval split as a 3-file
    * stream source — base of the streaming decontamination cell. */
  private def decontamStreamTemplate(s: SparkSession, d: String): String =
    stagedTemplate("decon-stream", d, "n8o5000") { t =>
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.shingleUniverse(train, cfg.decontamNgramN)
        .write.parquet(s"$t/universe")
      evalDocs.select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Persisted per-source quality thresholds + the corpus as a 3-file
    * stream source — base of the streaming curation cell. */
  private def curateStreamTemplate(s: SparkSession, d: String): String =
    stagedTemplate("curate-stream", d, "p60s16") { t =>
      val docs = Tables.documents(s, d)
      operators.TextAnalysis.qualityThresholds(docs, 60)
        .write.parquet(s"$t/thresholds")
      docs.repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** The corpus (doc_id, text) as a 3-file stream source — base of the
    * streaming near-dup cell. */
  private def neardupSrcTemplate(s: SparkSession, d: String): String =
    stagedTemplate("ndup-src", d, "n3k16b4") { t =>
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(s"$t/src")
    }

  /** Recursive NIO copy of a template tree into a working directory. */
  private def copyTree(src: String, dst: String): Unit = {
    val s0 = java.nio.file.Paths.get(src)
    val d0 = java.nio.file.Paths.get(dst)
    java.nio.file.Files.createDirectories(d0)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(s0)) { st =>
      st.iterator().asScala.foreach { p =>
        val t = d0.resolve(s0.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** Stage `sql_minhash_pairs`' signature/band caches ONCE PER SESSION per
    * sf dir (the stagedThisSession pattern): the eager CACHE TABLE builds +
    * SQL-path JIT cost ~8 s on a session's first invocation — the
    * persisted-dedup-index posture says the index is built once per corpus
    * snapshot and queries only probe it. PUBLIC so Bench's warmup stages it
    * before any timed rep: the timed query then measures the SERVE path
    * alone (the number the committed baseline cell claims), instead of the
    * staging cost landing inside whichever rep runs first. The caches stay
    * alive for the session (k=16 longs/doc ≈ 0.1% of corpus size); a
    * different sf dir in the same session restages. */
  def stageSqlMinhash(s: SparkSession, d: String): Unit = {
    graft.plans.GraftExtensions.register(s)
    val stageKey = s"sqlmh:$d"
    if (stagedThisSession.contains(stageKey)) return
    import scala.jdk.CollectionConverters._
    stagedThisSession.asScala.filter(_.startsWith("sqlmh:"))
      .foreach(stagedThisSession.remove)
    Tables.documents(s, d).createOrReplaceTempView("graft_docs_sql")
    // drop views BEFORE re-caching: UNCACHE alone leaves the temp view
    // behind and the next CACHE TABLE AS throws TempTableAlreadyExists
    // (re-invocation in one session — the interactive-user path).
    // REVERSE dependency order (bk reads mh, mh reads shs): resolving a
    // view whose upstream is already gone fails analysis, so dependents
    // go first; dropTempView also uncaches, no UNCACHE round needed.
    Seq("graft_bk_sql", "graft_mh_sql", "graft_shs_sql").foreach { v =>
      s.catalog.dropTempView(v)
    }
    // STAGE the shingle ARRAY behind its own eager cache before anything
    // explodes it: Generate's inferred `size(shs) > 0` filter substitutes
    // its child expressions when pushed down, so an inline chain re-runs
    // split/regexp per shingle ELEMENT inside the filter — measured 22 s
    // for the signature build vs 0.8 s for the identical Scala chain at
    // sf0.1. The cache boundary makes the filter read a materialized
    // column instead. (The Scala path dodges this by binding `toks` as
    // an attribute — Dedup.shingleTable's two-projection shape.)
    s.sql("""
      CACHE TABLE graft_shs_sql AS
      SELECT doc_id, array_distinct(CASE WHEN size(toks) < 3
          THEN CAST(array() AS array<string>)
          ELSE transform(sequence(0, size(toks) - 3),
            i -> concat_ws(' ', element_at(toks, i + 1),
              element_at(toks, i + 2), element_at(toks, i + 3))) END) AS shs
      FROM (
        SELECT doc_id,
          split(trim(regexp_replace(text, '\\s+', ' ')), ' ') AS toks
        FROM graft_docs_sql)
    """)
    s.sql("""
      CACHE TABLE graft_mh_sql AS
      SELECT doc_id, pe.i, pe.mh
      FROM (
        SELECT doc_id, graft_minhash(h, 16) AS sig
        FROM (
          SELECT doc_id, graft_hash(sh) AS h
          FROM (
            SELECT doc_id, explode(shs) AS sh
            FROM graft_shs_sql))
        GROUP BY doc_id)
      LATERAL VIEW posexplode(sig) pe AS i, mh
    """)
    // the band-key table is cached too: the candidate self-join reads it
    // twice, and an uncached reference would re-aggregate per side
    s.sql("""
      CACHE TABLE graft_bk_sql AS
      SELECT doc_id, CAST(i / 4 AS INT) AS band,
          array_join(transform(array_sort(collect_list(struct(i, mh))),
            x -> CAST(x.mh AS STRING)), '-') AS bkey
      FROM graft_mh_sql GROUP BY doc_id, CAST(i / 4 AS INT)
    """)
    // the staging cache fed the two eager builds above; the final select
    // reads only mh/bk, so free its MEMORY (mh/bk stay cached for the
    // session). The view itself must stay defined: the mh view's stored
    // plan references it by name and is re-analyzed per reference —
    // analysis needs the view to resolve even though the cached
    // InMemoryRelation means it never re-executes.
    s.sql("UNCACHE TABLE IF EXISTS graft_shs_sql")
    stagedThisSession.add(stageKey)
  }

  /** Per-invocation run id for streaming queries that reuse a staged
    * source but need a FRESH checkpoint + sink each run (a reused
    * checkpoint would see committed offsets and stream nothing). */
  private val streamRunCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh checkpoint+sink dir under a staged source, deleting any prior
    * `run*` dirs first — Bench's medianed reps plus Verify would otherwise
    * accumulate orphaned checkpoint/output dirs in tmp for the life of the
    * staging key. Only the returned (newest) run ever exists. */
  private def freshRunDir(stage: String, prefix: String = "run"): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(stage)
    // Files.list/walk streams hold open directory handles — close them
    // (Using) or every bench rep leaks an fd the state stores compete for
    val prior = scala.util.Using.resource(java.nio.file.Files.list(root)) {
      _.iterator().asScala.toList
        .filter(_.getFileName.toString.startsWith(prefix))
    }
    prior.foreach { p =>
      scala.util.Using.resource(java.nio.file.Files.walk(p)) {
        _.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    s"$stage/$prefix${streamRunCounter.incrementAndGet()}"
  }

  /** Staged source + runner shared by the two stream_attribution queries:
    * the purchase/click feed written as TWO time slices split at the
    * (approximate) median ts — one tiny aggregate instead of the previous
    * single-partition ntile global sort, and one fewer micro-batch per
    * stream (each micro-batch of a stream-stream join pays state-store
    * setup, so batch count, not row count, dominated this harness).
    * Slice 1 is entirely ≤ slice 2 in event time, which is all the file
    * source's mod-time ordering + watermark need. The last slice also
    * carries one watermark-driving SENTINEL per stream (purchase under
    * user −1, click under user −2, both at global max ts + 90 min — past
    * every real purchase's interval end plus the 10-minute watermark
    * delay): sentinels never join (distinct fake users, so the inner
    * query's match-only output is untouched), and they push the GLOBAL
    * watermark — the minimum across both input streams — far enough that
    * the left-outer run flushes every real null-leg row in Spark's final
    * no-data micro-batch. The returned frame filters them (user_id ≥ 0). */
  private def runStagedAttribution(s: SparkSession, d: String,
                                   joinType: String): DataFrame = {
    val key = "w60-s2x"
    val probe = stagedDir("stream-attr", d, key, fresh = false)
    val stage =
      if (stagedThisSession.contains(probe)) probe
      else {
        val p0 = stagedDir("stream-attr", d, key, fresh = true)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
          .where(col("event_type").isin("purchase", "click"))
        val cutUs = ev.agg(expr(
          "approx_percentile(unix_micros(cast(ts as timestamp)), 0.5)"))
          .head().getLong(0)
        val tsu = unix_micros(col("ts").cast("timestamp"))
        val sentinels = ev.agg(max(col("ts")).as("mts"))
          .select(explode(array(
            struct(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
              (col("mts") + expr("INTERVAL 90 MINUTES")).as("ts"),
              lit("purchase").as("event_type")),
            struct(lit(-2L).as("event_id"), lit(-2L).as("user_id"),
              (col("mts") + expr("INTERVAL 90 MINUTES")).as("ts"),
              lit("click").as("event_type")))).as("e"))
          .select(col("e.*"))
        Seq(ev.where(tsu <= cutUs),
            ev.where(tsu > cutUs).unionByName(sentinels)).foreach { sl =>
          sl.coalesce(1).write.mode("append").parquet(s"$p0/src")
          Thread.sleep(10)
        }
        stagedThisSession.add(p0)
        p0
      }
    val run = freshRunDir(stage, s"run-$joinType-")
    val schema = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type")).schema
    def src() = streaming.Streams.fileSource(s, s"$stage/src", schema,
      maxFilesPerTrigger = 1)
    // A stream-stream join maintains FOUR state stores (two per side), so
    // per-micro-batch setup cost is 4 × shuffle-partitions × batches —
    // with the suite's 32 partitions that dwarfed the actual join work at
    // this input size. 8 partitions is plenty for the joined volume; the
    // checkpoint is fresh each run, so the partitioning is free to differ
    // from the session default (restored right after).
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try
      streaming.Streams.runAttributionToParquet(s,
          src().where(col("event_type") === "purchase"),
          src().where(col("event_type") === "click"),
          s"$run/out", s"$run/ck", windowMinutes = 60, joinType = joinType)
        .awaitTermination()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.read.parquet(s"$run/out").where(col("user_id") >= 0L)
  }

  /** Shared by `decontaminate` and `decontam_pairs` (their oracles mirror
    * this construction EXACTLY — keep it in one place): hash-split the
    * corpus, then plant contaminated eval docs as copies of every 7th train
    * doc under an offset id (the synthetic corpus has no organic cross-split
    * copies, so planting makes both oracles non-vacuous — the u1/ta_pii
    * pattern). Returns (train, evalDocs). */
  private def plantedEvalSplit(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val split = operators.Mixing.withSplit(Tables.documents(s, d),
      trainPct = cfg.splitTrainPct, valPct = cfg.splitValPct)
    val train = split.where(col("split") === "train")
      .select(col("doc_id"), col("text"), col("source"))
    val evalDocs = split.where(col("split") === "test")
      .select(col("doc_id"), col("text"))
      .unionByName(train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    (train, evalDocs)
  }

  /** The e2e_corpus assembly downstream of the pair graph: connected-
    * components canonical filter → hash split → decontaminate eval vs
    * train → pack into BPE-token sequences. Shared by `e2e_corpus` (pairs
    * computed in-plan) and `e2e_corpus_from_artifact` (pairs read from the
    * persisted parquet artifact) — both must produce identical results. */
  private def e2eCorpusFromPairs(valid: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = operators.Dedup.dedupClusters(pairs)
    val canonical = valid.join(
      clusters.where(col("id") =!= col("canonical_id"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val split = operators.Mixing.withSplit(canonical,
      trainPct = cfg.splitTrainPct, valPct = cfg.splitValPct)
    val train = split.where(col("split") === "train")
    val evalDocs = split.where(col("split") =!= "train")
    // the eval side here is a corpus-scale 20% split, not a curated eval
    // set — take the shuffle membership join, not the broadcast hint
    val cleanEval = operators.Decontaminate.cleanEval(train, evalDocs,
      cfg.decontamNgramN, cfg.decontamMinOverlapX10000,
      broadcastEval = false)
    operators.Mixing.packSequences(train.unionByName(cleanEval),
        cfg.packTokenBudget, metric = "bpe",
        partitionCols = Seq("split", "source"))
      .orderBy(col("split"), col("source"), col("seq_no"))
  }

  /** SemDeDup cluster count = 2^semanticPlanes. One shared constant so the
    * `dedup_semantic` Spark call and its oracle SQL cannot drift (the
    * dedup_lsh_eval lesson); not a GraftConfig knob because the oracle
    * requires the default config anyway. */
  private val semanticPlanes = 6

  /** Exactly 10 whitespace tokens — one full `wordsPerLine = 10` line, so a
    * planted doc's body chunks stay aligned with its source doc's chunks. */
  private[graft] val boilerplateLine =
    "graft boiler plate header line repeated across all planted docs"

  /** Line-dedup planting: every 5th doc gains a copy (`doc_id + 100000`)
    * prefixed with the shared boilerplate line. Mirrored verbatim in the
    * `dedup_lines` oracle. */
  private def plantedBoilerplate(docs: DataFrame): DataFrame =
    docs.unionByName(
      docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit(boilerplateLine), lit(" "), col("text")).as("text"),
          col("lang"), col("source"), col("n_chars")))

  /** Span-dedup planting: every 10th doc gains a stitched copy
    * (`doc_id + 600000`) made of two verbatim token slices of itself
    * (tokens 1-40 and 61-80, 1-based) — two diagonals of consecutive shared
    * 8-grams against the source doc, with a boundary that must NOT chain
    * them into one run. Mirrored verbatim in the `dedup_spans` oracle. */
  private def plantedSpanCopies(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 600000L).as("doc_id"),
          concat_ws(" ",
            concat_ws(" ", slice(toks, 1, 40)),
            concat_ws(" ", slice(toks, 61, 20))).as("text")))
  }

  /** LSH-eval planting: every 4th doc (with ≥ 20 tokens) gains a PREFIX
    * copy (`doc_id + 1000000`, the planting offset every other planting
    * uses — large enough to clear real doc_ids at any tested SF) keeping
    * 4..9 tenths of its tokens (tenths
    * cycle with ⌊doc_id/4⌋), so the exact-Jaccard truth set spans bands
    * ~3..9 instead of the synthetic corpus's all-or-nothing 0/9 split —
    * the S-curve needs pairs on BOTH sides of the LSH threshold to be
    * informative. A prefix's shingles are a subset of the full doc's, so
    * J = (p-2)/(L-2) ≈ the kept fraction, deterministically. Mirrored
    * verbatim in the `dedup_lsh_eval` oracle. */
  private def plantedPrefixCopies(docs: DataFrame): DataFrame = {
    val tenths = lit(4L) + pmod(floor(col("doc_id") / 4).cast("long"), lit(6L))
    val p = floor(size(col("toks")) * tenths / 10).cast("int")
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.where(col("doc_id") % 4 === 0)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(col("toks"), lit(1), p)).as("text")))
  }

  /** Canonicalization-ladder planting: four copy classes, each detectable
    * only from its ladder level on — every 11th doc gains a double-spaced
    * copy (whitespace level), every 13th a non-breaking-space copy
    * (unicode level), every 17th an uppercased copy (casefold level),
    * every 19th a punctuation-appended copy (alnum level). Offsets 1M/2M/
    * 3M/4M keep the classes disjoint. Mirrored verbatim in the
    * `dedup_canon_ladder` oracle. */
  private def plantedCanonVariants(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), " ", "  ").as("text")))
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          regexp_replace(col("text"), " ", "\u00A0").as("text")))
      .unionByName(docs.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          upper(col("text")).as("text")))
      .unionByName(docs.where(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" !!!")).as("text")))

  /** Length-outlier planting: every 23rd doc gains a 10× concatenated copy
    * (`doc_id + 1000000`) — the glitch/aggregation-artifact length profile
    * the MAD detector must flag. `text || ' '` repeated keeps the token
    * count exactly 10× (no boundary-word merges). Mirrored verbatim in the
    * `ta_length_outliers` oracle. */
  private def plantedLongDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("source"))
      .unionByName(docs.where(col("doc_id") % 23 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          repeat(concat(col("text"), lit(" ")), 10).as("text"),
          col("source")))

  /** Web-artifact planting for the Gopher/C4 filter queries (the
    * synthetic corpus has no punctuation, newlines, or boilerplate, so
    * the published web-cleaning rules would be vacuous on it): every 3rd
    * doc gains three proper sentences (periods + two distinct Gopher
    * stop words), every 7th a line block (two bullet lines, an
    * ellipsis-trailing line, one full sentence line), every 11th the
    * lorem-ipsum + `{` kill markers. Deterministic from doc_id; mirrored
    * verbatim in the `web_gopher` / `web_c4` / `e2e_web_curate`
    * oracles. */
  private def plantedWebDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" The data works with the table. It ends well. The story holds."))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit("\n- first bullet item here\n- second bullet item here\n" +
          "this line trails off with more and more...\n" +
          "This sentence closes the page properly today."))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        lit("\nlorem ipsum { and more filler")).otherwise(lit(""))))

  /** Repetition planting for the Gopher A1.1 repetition-half query:
    * every 4th doc a duplicated LINE pair, every 5th a duplicated
    * PARAGRAPH pair, every 6th a triple-repeated 6-gram phrase, every
    * 9th a 12×-repeated 2-gram. Deterministic from doc_id; mirrored
    * verbatim in the `web_gopher_rep` oracle. Against the 48-553-char
    * corpus these plants are large enough that some (not all) planted
    * docs fail their rule — verdict columns carry both outcomes. */
  private def plantedRepDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 4 === 0,
        lit("\nRepeated line of filler text.\nRepeated line of filler text."))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        lit("\n\nSame paragraph body appears twice on this page." +
          "\n\nSame paragraph body appears twice on this page."))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        lit(" alpha beta gamma delta epsilon zeta" * 3)).otherwise(lit("")),
      when(col("doc_id") % 9 === 0,
        lit(" red blue" * 12)).otherwise(lit(""))))

  /** Template planting for the strip queries: a chunk-aligned 10-token
    * per-source nav header prepended to every other GENERATION
    * (`(doc_id / 20) % 2 == 0`). The generation index is orthogonal to the
    * testdata's `source = src(doc_id % 20)` striping — a doc_id-parity
    * plant would header entire sources (df 100%) and leave others empty;
    * this one gives EVERY source a 50% within-source df (≫ the 20% bar)
    * with unplanted survivors in the same source. Deterministic; mirrored
    * verbatim in the `web_template_strip` / `web_template_incr`
    * oracles. */
  private def plantedTemplateDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      when(floor(col("doc_id") / 20) % 2 === 0,
        concat(col("source"),
          lit(" portal navigation header menu about contact terms privacy copyright "),
          col("text")))
        .otherwise(col("text")).as("text"))

  /** Format-true HTML page planted per document (the synthetic corpus has
    * no HTML, so the S5 pathway's input is synthesized as a REAL page):
    * head with title/style/script, a comment, a heading, the document text
    * as a paragraph, and — deterministically by doc_id — a pure-navigation
    * link bar (link density 100, must be DROPPED), a prose paragraph with
    * an embedded link (density ~16, must be KEPT), and an entity-encoded
    * footer. Mirrored verbatim in the `web_html_text` / `s8` oracles. */
  private def plantedHtmlPage: Column =
    concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><style>p{color:#333;}</style><script>var x=1;</script>" +
        "</head><body><!-- generated --><h1>"),
      col("source"), lit(" page</h1><p>"), col("text"), lit("</p>"),
      when(col("doc_id") % 2 === 0,
        lit("<div><a href=\"/home\">Home</a> <a href=\"/about\">About</a> " +
          "<a href=\"/contact\">Contact</a></div>")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(
          lit("<p>See the <a href=\"/more\">full report</a> and the notes " +
            "that go with it for details about "),
          col("lang"), lit(" coverage and methodology.</p>")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        lit("<p>Footer &amp; legal &lt;terms&gt;&nbsp;apply.</p>"))
        .otherwise(lit("")),
      lit("</body></html>"))

  /** Snapshot-v2 planting for the versioning queries: drop every 10th doc,
    * append a drift marker to every 7th's text, re-add every 13th under a
    * shifted id. Mirrored verbatim in the `ver_diff` / `ver_drift`
    * oracles. */
  private def snapshotV2(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" drifted marker token")))
          .otherwise(col("text")))
      .unionByName(
        docs.where(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- scans / lookups (S1, S4, F3, F7) ----
    "s1_scan_stubs" -> ((s, d) =>
      ArticleOps.stubScan(Tables.documents(s, d))
        .orderBy(col("doc_id")).limit(100)),

    "s4_point_lookup" -> ((s, d) =>
      ArticleOps.pointLookup(Tables.documents(s, d), 42L)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // ---- projections / derivations (P2/P3/P11, P5, P7, P8, U1) ----
    "p3_article_metadata" -> ((s, d) =>
      ArticleOps.withMetadata(ArticleOps.validated(Tables.documents(s, d)))
        .select(col("doc_id"), col("content_length"), col("clean_length"),
          col("word_count"), col("line_count"), col("url"))
        .orderBy(col("doc_id"))),

    "p5_url_construct" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), articleUrl(col("p_name")).as("url"))
        .orderBy(col("p_partkey"))),

    "p7_clean_text" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), normalizeWhitespace(col("text")).as("clean_text"))
        .orderBy(col("doc_id"))),

    "p8_category_cleanup" -> ((s, d) => {
      val toks = tokens(col("text"))
      val cats = concat(
        transform(slice(toks, 1, 5), t => concat(lit("Category:"), t)),
        array(lit(""), lit("Category:  ")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(cleanCategories(cats), "|").as("categories"))
        .orderBy(col("doc_id"))
    }),

    "u1_wikitext_strip" -> ((s, d) => {
      val clean = normalizeWhitespace(col("text"))
      val wt = concat(
        lit("{{Infobox|a="), col("lang"), lit("}} '''"),
        substring(clean, 1, 30), lit("''' see [[Target|"), col("source"),
        lit("]] and [["), col("lang"), lit("]]<ref name=x>r</ref> ==h== "),
        substring(clean, 31, 50))
      Tables.documents(s, d)
        .select(col("doc_id"), wikitextToPlain(wt).as("plain_text"))
        .orderBy(col("doc_id"))
    }),

    // ---- filters / validation (F1-F5) ----
    "f1_validate" -> ((s, d) =>
      ArticleOps.validated(Tables.documents(s, d))
        .groupBy(col("source")).agg(count(lit(1)).as("valid_docs"))
        .orderBy(col("source"))),

    // F6 — empty-revisions predicate (reference drops pages with no
    // revisions, `src/mediawiki_client.py:143-145`). The documents table has
    // no revisions column, so one is constructed deterministically (doc_id
    // % 3 revisions per page — the u1 planting pattern): pages whose array
    // is empty are filtered out, survivors report their revision count.
    "f6_empty_revisions" -> ((s, d) => {
      val revs = slice(tokens(col("text")), lit(1), (col("doc_id") % 3).cast("int"))
      Tables.documents(s, d)
        .withColumn("revisions", revs)
        .where(size(col("revisions")) > 0)
        .select(col("doc_id"), size(col("revisions")).cast("long").as("n_revisions"))
        .orderBy(col("doc_id"))
    }),

    // ---- joins / dedup-shaped set ops (J1-J3) ----
    // customers with no large order — the queue's "not yet processed" anti-join
    "j1_antijoin_dedup" -> ((s, d) =>
      ArticleOps.antiJoinNew(
        Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
          .withColumnRenamed("c_custkey", "o_custkey"),
        Tables.orders(s, d).where(col("o_totalprice") > 300000), "o_custkey")
        .withColumnRenamed("o_custkey", "c_custkey")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "j2_union_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      ArticleOps.idempotentUnion(
        docs.where(col("source").isin("src0", "src1")).select(col("doc_id")),
        docs.where(col("source").isin("src1", "src2")).select(col("doc_id")),
        "doc_id")
        .orderBy(col("doc_id"))
    }),

    "j3_enrich_join" -> ((s, d) =>
      ArticleOps.enrich(
        Tables.embeddings(s, d).select(col("vec_id").as("doc_id"), col("label")),
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("content_length")),
        "doc_id")
        .select(col("doc_id"), col("lang"), col("label"), col("content_length"))
        .orderBy(col("doc_id"))),

    // hot-key salting: docs join a tiny per-lang dim on the (very skewed)
    // lang key with the large side salted and the dim replicated per salt
    // — row-identical to the plain join (the oracle runs the plain join);
    // the manual fallback for keys too hot even for AQE skew splitting
    "skew_salted_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val langStats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("lang_docs"),
          sum(length(col("text")).cast("long")).as("lang_chars"))
      operators.Skew.saltedJoin(docs.select(col("doc_id"), col("lang")),
          langStats, "lang", salts = 8)
        .select(col("doc_id"), col("lang"), col("lang_docs"), col("lang_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- aggregations (A1-A3, A7) ----
    "a1_corpus_summary" -> ((s, d) =>
      Summaries.corpusSummary(Tables.documents(s, d))),

    "a2_source_summary" -> ((s, d) =>
      Summaries.sourceSummary(Tables.documents(s, d)).orderBy(col("source"))),

    "a3_status_counts" -> ((s, d) =>
      Summaries.statusCounts(Tables.orders(s, d), "o_orderstatus")
        .orderBy(col("o_orderstatus"))),

    "a7_event_window" -> ((s, d) =>
      Summaries.eventWindowCounts(Tables.events(s, d), cfg.windowMinutes)
        .orderBy(col("win_start"), col("event_type"))),

    "a8_props_summary" -> ((s, d) => Relational.propsSummary(s, d)),

    // P6 — timestamp → ISO-8601 normalization (reference
    // `src/production_mediawiki_client.py:162-172`)
    "p6_timestamp_normalize" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("order_iso"))
        .orderBy(col("o_orderkey"))),

    // S8/S9 — per-row rendition dispatch ('wikitext'|'html'|'plain'|
    // 'summary', reference `src/enhanced_mediawiki_client.py:93-102`;
    // the summary rendition — lead sentence of the normalized text — is the
    // wikipedia-lib summary at `src/enhanced_mediawiki_client.py:277-303`):
    // rendition is selected by a format column, derived lazily — only the
    // chosen branch is computed. The html pathway is REAL since round 10:
    // the reference's S5 fetches page HTML (`src/mediawiki_client.py:
    // 173-213`), so html-format docs fetch their (planted format-true)
    // page and run WebCuration.htmlToText over it — script/style/comment
    // drop, block-tag line breaks, inline-tag strip, entity decode,
    // link-density line gate — instead of the former '<p>'||text||'</p>'
    // synthesis
    "s8_format_dispatch" -> ((s, d) => {
      val fmt = when(col("doc_id") % 4 === 0, "wikitext")
        .when(col("doc_id") % 4 === 1, "html")
        .when(col("doc_id") % 4 === 2, "plain").otherwise("summary")
      Tables.documents(s, d)
        .withColumn("format", fmt)
        .withColumn("rendition",
          when(col("format") === "plain", normalizeWhitespace(col("text")))
            .when(col("format") === "html",
              operators.WebCuration.htmlToText(plantedHtmlPage,
                cfg.htmlMaxLinkDensityX100))
            .when(col("format") === "summary",
              substring_index(normalizeWhitespace(col("text")), ". ", 1))
            .otherwise(col("text")))
        .select(col("doc_id"), col("format"), col("rendition"))
        .orderBy(col("doc_id"))
    }),

    // HTML→text extraction report (S5's real pathway, the
    // trafilatura/jusText-style extractor every web pipeline runs before
    // any text stage) over planted format-true pages: head furniture +
    // comments dropped, block tags become line breaks, the pure-nav link
    // bar (density 100) is dropped while the prose line with an embedded
    // link (~16) survives, entities decode. Map-only regexp chain — no
    // exchange ever carries the page
    "web_html_text" -> ((s, d) =>
      operators.WebCuration.htmlTextReport(
          Tables.documents(s, d).select(col("doc_id"), plantedHtmlPage.as("html")),
          cfg.htmlMaxLinkDensityX100)
        .orderBy(col("doc_id"))),

    // P10 — storage-document JSON serialization (reference
    // `src/data_processor.py:85-103`)
    "p10_to_json" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("source"))).as("doc_json"))
        .orderBy(col("doc_id"))),

    // U4/A1 — explode + exact distinct (the reference's unique_categories,
    // `src/data_processor.py:128-131`), per language
    "a4_unique_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("unique_tokens"))
        .orderBy(col("lang"))),

    // scalable variant of a4: HLL sketch instead of exact distinct — the
    // 100 TB form. HLL internals differ across engines, so the sketch
    // VALUE can't be oracle-compared; instead the query emits the exact
    // distinct count alongside a `within_5pct` accuracy verdict (HLL++
    // default rsd = 0.05; the estimate is deterministic — registers are
    // max-merged, so partitioning can't change the result) and DuckDB
    // recomputes the exact side + literal TRUE. A sketch drifting past
    // its advertised error now FAILS the driver gate instead of hiding
    // behind a rows-only check (round-15 verdict task 5).
    "a9_approx_distinct" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("exact_unique_tokens"),
          approx_count_distinct(col("tok")).as("hll"))
        .select(col("lang"), col("exact_unique_tokens"),
          (abs(col("hll") - col("exact_unique_tokens")) * 100 <=
            col("exact_unique_tokens") * 5).as("within_5pct"))
        .orderBy(col("lang"))),

    // ---- relational workload (J3 at scale: Q1/Q3/Q5/Q6-shaped) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_top_orders" -> ((s, d) => Relational.topRevenueOrders(s, d, 10)),
    "q5_region_revenue" -> ((s, d) => Relational.regionRevenue(s, d)),
    "q6_revenue_forecast" -> ((s, d) => Relational.revenueForecast(s, d)),

    // multi-level totals: ROLLUP (region, nation) + grand total in one pass
    "q8_rollup" -> ((s, d) =>
      Relational.rollupRevenue(s, d).orderBy(col("region"), col("nation"))),

    "q7_window_rank" -> ((s, d) =>
      Relational.topOrderPerCustomer(s, d, 1)
        .orderBy(col("o_custkey"), col("o_orderkey"))),

    // grouped top-k via the one-pass bounded-heap aggregate
    // (plans.TopKAgg): partial aggregation compacts every map task to <= k
    // entries per group BEFORE the shuffle — the scale form of q7's window
    // ranking (which shuffles and sorts every row). Oracle: the window form.
    "q9_topk_agg" -> ((s, d) => {
      val t = Tables.orders(s, d).select(col("o_custkey"),
        fx(col("o_totalprice"), 100L).as("p_x100"), col("o_orderkey"))
      t.groupBy(col("o_custkey"))
        .agg(graft.plans.TopKAgg.topK(col("p_x100"), col("o_orderkey"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("r", "e")))
        .select(col("o_custkey"), (col("r") + 1).cast("long").as("rn"),
          col("e.v").as("o_totalprice_x100"), col("e.id").as("o_orderkey"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // TPC-H Q4-shaped EXISTS, executed as a LEFT SEMI join: the probe side
    // short-circuits on first match inside the join — no distinct-then-join
    // double shuffle, and the returnflag predicate is pushed to the scan
    "q4_priority_semijoin" -> ((s, d) => Relational.priorityReturns(s, d)),

    // nation × year revenue matrix via groupBy().pivot(values) — the
    // long→wide reshape surface; fixed year list keeps the schema a plan
    // property and the pivot one-pass
    "q10_pivot" -> ((s, d) =>
      Relational.nationYearPivot(s, d).orderBy(col("n_name"))),

    // TPC-H Q14 shape: pushed shipdate window + broadcast part dim + ONE
    // conditional aggregation; the share as exact BIGINT integer division
    "q11_promo_revenue" -> ((s, d) => Relational.promoRevenue(s, d)),

    // TPC-H Q9 shape: fact × two stacked broadcast dims (supplier →
    // nation), grouped on (nation, ship year) — one shuffle total
    "q12_supplier_revenue" -> ((s, d) =>
      Relational.supplierNationRevenue(s, d)),

    // INTERSECT/EXCEPT set algebra (planned as distinct + semi/anti
    // joins); the custkey checksum makes the oracle membership-sensitive
    "j4_set_ops" -> ((s, d) => Relational.setOpsReport(s, d)),

    // CUBE over (segment, status): the lattice-complete grouping sibling
    // of q8's ROLLUP, grouping_id disambiguating subtotal rows
    "q16_cube" -> ((s, d) =>
      Relational.cubeRevenue(s, d)
        .orderBy(col("gid"), col("segment"), col("status"))),

    // TPC-H Q13 shape: LEFT join surfaces the zero-order customers, then a
    // second aggregation over per-customer counts — the outer-join +
    // double-agg report family
    "q13_order_histogram" -> ((s, d) =>
      Relational.orderCountHistogram(s, d)),

    // blocked fuzzy entity resolution over part names: distinct-name
    // vocabulary, last-token blocking, levenshtein gate — the record-
    // linkage worklist (ASCII data keeps DuckDB byte-lev == Spark char-lev)
    "er_fuzzy_names" -> ((s, d) =>
      operators.Dedup.fuzzyNameMatch(Tables.part(s, d), "p_name", maxDist = 2)
        .orderBy(col("name_a"), col("name_b"))),

    // rolling 5-event row-window mean per user — the moving-aggregate
    // family next to the time windows; exact fixed-point, one per-user
    // window
    "a23_rolling_mean" -> ((s, d) =>
      Relational.rollingMean(s, d, nPrev = 4)
        .select(col("event_id"), col("user_id"), col("roll_sum_x100"),
          col("roll_n"), col("roll_mean_x100"))
        .orderBy(col("event_id"))),

    // TPC-H Q19 shape: OR of conjunctive (brand, size, qty) branches
    // across the lineitem x part broadcast join
    "q15_disjunctive" -> ((s, d) => Relational.disjunctiveRevenue(s, d)),

    // TPC-H Q17 shape: correlated per-part average decorrelated into one
    // partkey agg + equi-join; exact rational compare (no rounded mean)
    "q17_small_quantity" -> ((s, d) => Relational.smallQuantityRevenue(s, d)),

    // TPC-H Q18 shape: HAVING on the per-order quantity sum BEFORE the
    // joins, so only qualifying orders (broadcast) meet orders/customer
    "q18_large_orders" -> ((s, d) =>
      Relational.largeVolumeOrders(s, d).orderBy(col("o_orderkey"))),

    // TPC-H Q22 shape: scalar-subquery broadcast (exact integer mean
    // compare) + LEFT ANTI join against urgent orders, per segment
    "q22_idle_accounts" -> ((s, d) =>
      Relational.idleAccounts(s, d).orderBy(col("c_mktsegment"))),

    // TPC-H Q20 shape: correlated-aggregate IN-subquery chain decorrelated
    // into colocated partkey aggs + rational compare + LEFT SEMI to the dim
    "q20_dominant_share" -> ((s, d) =>
      Relational.dominantShareSuppliers(s, d)),

    // TPC-H Q21 shape: EXISTS + NOT-EXISTS self-joins answered by ONE
    // per-order aggregate (n_supp, n_fault_supp) instead of two shuffles
    "q21_sole_fault" -> ((s, d) => Relational.soleFaultSuppliers(s, d)),

    // source-centroid cosine matrix: distribution-level near-dup sources
    // (cos of exact per-source SUM vectors — the /n cancels)
    "ann_source_matrix" -> ((s, d) =>
      operators.Similarity.sourceSimilarityMatrix(Tables.documents(s, d),
          Tables.embeddings(s, d))
        .orderBy(col("source_a"), col("source_b"))),

    // top principal component of the embedding cloud: exact-integer
    // scatter matrix + 8 power steps — the anisotropy/whitening diagnostic
    "ann_pca" -> ((s, d) =>
      operators.Similarity.principalComponent(Tables.embeddings(s, d),
          iters = 8)
        .orderBy(col("d"))),

    // cross-lingual bitext mining (en→de): margin-criterion alignment —
    // cosine relative to both sides' k-NN mean — over the per-language-
    // pair candidate block; exact integer margin, best match per src doc
    "mine_bitext" -> ((s, d) =>
      operators.Similarity.bitextMine(Tables.documents(s, d),
          Tables.embeddings(s, d), "en", "de", k = 4,
          minMarginX1000000 = 1000000L)
        .orderBy(col("src_id"))),

    // the 100 TB bitext form: the target language indexed by the
    // deterministic coarse quantizer, sources probe nProbe cells, only
    // cell members are scored — candidates are n·nProbe/2^planes, never
    // the cross product; same margin core, fully oracle-replayed
    "mine_bitext_ann" -> ((s, d) =>
      operators.Similarity.bitextMineAnn(Tables.documents(s, d),
          Tables.embeddings(s, d), "en", "de", k = 4,
          minMarginX1000000 = 1000000L,
          planes = cfg.bitextPlanes, nProbe = cfg.bitextNProbe)
        .orderBy(col("src_id"))),

    // ---- published web-curation filter families (Gopher + C4) ----
    // per-doc Gopher quality heuristics over the web-artifact-planted
    // corpus: seven signals, seven rule verdicts, the combined gate
    "web_gopher" -> ((s, d) =>
      operators.WebCuration.gopherQualityReport(
          plantedWebDocs(Tables.documents(s, d)),
          operators.WebCuration.CurationThresholds.fromConfig(cfg))
        .orderBy(col("doc_id"))),

    // per-doc C4 cleaning: terminal-punctuation + >=5-word line filter,
    // the three page gates, and the cleaned text
    "web_c4" -> ((s, d) =>
      operators.WebCuration.c4Filter(plantedWebDocs(Tables.documents(s, d)),
          operators.WebCuration.CurationThresholds.fromConfig(cfg))
        .orderBy(col("doc_id"))),

    // the per-source curation funnel: raw -> Gopher -> C4 -> both ->
    // exact-dedup canonical survivors + surviving token volume, in one
    // scan + one hash-keyed window
    "e2e_web_curate" -> ((s, d) =>
      operators.WebCuration.curationFunnel(
          plantedWebDocs(Tables.documents(s, d)),
          operators.WebCuration.CurationThresholds.fromConfig(cfg))
        .orderBy(col("source"))),

    // HTML extraction COMPOSED with the Gopher gate — extract first,
    // rule-filter the extracted text (the order a real crawl pipeline
    // runs them): two map-only expression stages fused into one scan
    "web_html_curate" -> ((s, d) =>
      operators.WebCuration.gopherQualityReport(
          Tables.documents(s, d).select(col("doc_id"),
            operators.WebCuration.htmlToText(plantedHtmlPage,
              cfg.htmlMaxLinkDensityX100).as("text")),
          operators.WebCuration.CurationThresholds.fromConfig(cfg))
        .orderBy(col("doc_id"))),

    // the CRAWL-TO-CORPUS flagship: URL filter (pre-fetch) → HTML
    // extraction → Gopher form gate, composed in pipeline order with a
    // per-source funnel readout — how many records each stage admits and
    // the surviving token volume. URL gate and extraction are
    // map-only/broadcast; the only shuffle is the final per-source agg
    // (the id-keyed gopher join broadcasts its slim report side)
    "e2e_web_pipeline" -> ((s, d) => {
      import s.implicits._
      // TLD by GENERATION (doc_id/20), orthogonal to the source = doc_id%20
      // striping — a doc_id%4 TLD would block entire sources wholesale and
      // make the per-source funnel all-or-nothing
      val gen = floor(col("doc_id") / 20) % 4
      val tld = when(gen === 0, ".tracker.biz")
        .when(gen === 1, ".news.org")
        .when(gen === 2, ".example.com")
        .otherwise(".spamfarm.net")
      val url = concat(lit("http://"), col("source"), tld, lit("/page/"),
        col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("?session=casino-bonus"))
          .otherwise(concat(lit("?id="), col("doc_id"))))
      val pages = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), url.as("url"),
          plantedHtmlPage.as("html"))
      val filtered = operators.WebCuration.urlFilter(pages,
        Seq("spamfarm.net", "tracker.biz").toDF("domain"),
        Seq("casino", "lottery"))
      val extracted = filtered.where(!col("blocked"))
        .select(col("doc_id"),
          operators.WebCuration.htmlToText(col("html"),
            cfg.htmlMaxLinkDensityX100).as("text"))
      val gr = operators.WebCuration.gopherQualityReport(extracted,
          operators.WebCuration.CurationThresholds.fromConfig(cfg))
        .select(col("doc_id"), col("pass"), col("n_words"))
      filtered.select(col("doc_id"), col("source"), col("blocked"))
        .join(gr, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(!col("blocked"), 1L).otherwise(0L)).as("n_url_pass"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_gopher"),
          coalesce(sum(when(col("pass"), col("n_words"))), lit(0L))
            .as("gopher_ws_tokens"))
        .orderBy(col("source"))
    }),

    // the Gopher A1.1 REPETITION half over repetition-planted docs:
    // duplicated line/paragraph fractions (+ character fractions), top
    // 2-4-gram character mass, duplicated 5-10-gram positional character
    // coverage — 13 signals, 13 verdicts, the combined gate, all map-only
    // (one codegen'd token pass; the oracle takes the relational
    // explode→count→union form, so the cross-check is non-circular)
    "web_gopher_rep" -> ((s, d) =>
      operators.WebCuration.gopherRepetitionReport(
          plantedRepDocs(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // URL-level dedup — the crawl-collapse stage that runs BEFORE any
    // content is parsed: canonicalize (case/default-port/fragment/
    // tracking-param/param-order/trailing-slash normalization), then one
    // window on the canonical URL. URLs are synthesized deterministically
    // from (doc_id, source, lang) with every messiness the canonicalizer
    // handles; the oracle mirrors the same construction
    "web_url_canon" -> ((s, d) => {
      val n = (col("doc_id") % 100).cast("string")
      val url = concat(
        when(col("doc_id") % 3 === 0, lit("HTTPS://")).otherwise(lit("http://")),
        lit("WWW."), upper(col("source")), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0, lit(":443"))
          .when(col("doc_id") % 5 === 0, lit(":80"))
          .when(col("doc_id") % 7 === 0, lit(":8080"))
          .otherwise(lit("")),
        lit("/wiki/"), col("lang"), lit("/Doc-"), n,
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit("?utm_source=feed&sort=asc&id="), n))
          .otherwise(concat(lit("?id="), n, lit("&ref=rss&sort=asc"))),
        lit("#sec"), (col("doc_id") % 5).cast("string"))
      operators.WebCuration.urlDedup(
          Tables.documents(s, d).select(col("doc_id"), url.as("url")))
        .orderBy(col("doc_id"))
    }),

    // URL FILTERING — the pre-fetch stage (C4 §2.2 URL bad-word drop;
    // RefinedWeb/FineWeb domain blocklists): planted per-doc URLs across
    // four TLD families, two of them blocklisted, plus a planted keyword
    // query-string on every 7th doc; domain verdict wins over keyword.
    // Map-only + one broadcast — the cheapest filter in the funnel (no
    // fetch, no body, no parse for a dropped record)
    "web_url_filter" -> ((s, d) => {
      import s.implicits._
      val tld = when(col("doc_id") % 4 === 0, ".tracker.biz")
        .when(col("doc_id") % 4 === 1, ".news.org")
        .when(col("doc_id") % 4 === 2, ".example.com")
        .otherwise(".spamfarm.net")
      val url = concat(lit("http://"), col("source"), tld, lit("/page/"),
        col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("?session=casino-bonus"))
          .otherwise(concat(lit("?id="), col("doc_id"))))
      operators.WebCuration.urlFilter(
          Tables.documents(s, d).select(col("doc_id"), url.as("url")),
          Seq("spamfarm.net", "tracker.biz").toDF("domain"),
          Seq("casino", "lottery"))
        .select(col("doc_id"), col("url"), col("domain"),
          col("block_reason"), col("blocked"))
        .orderBy(col("doc_id"))
    }),

    // per-source template line strip: a 10-token per-source nav header is
    // planted on half of EVERY source's docs (50% within-source df ≫ the
    // 20% bar), chunk-aligned as line 0 — the strip must remove it from
    // every planted doc while the unplanted half of the same source
    // survives untouched. One (source, hash) exchange; the rewrite is
    // map-only behind a broadcast strip set
    "web_template_strip" -> ((s, d) =>
      operators.WebCuration.templateLineStrip(
          plantedTemplateDocs(Tables.documents(s, d)),
          cfg.templateWordsPerLine, cfg.templateMinDfPct, cfg.templateMinDfDocs)
        .orderBy(col("doc_id"))),

    // the serving half of the template lifecycle: the strip set is built
    // from the BASE three-quarters of the corpus (generations
    // (doc_id/20) % 4 != 0 — every source keeps planted AND unplanted
    // base docs, so each source's header clears the bar at ~33% base df),
    // persisted as a parquet artifact, and applied FROZEN to the incoming
    // quarter — incoming generation 0 is fully planted, so every incoming
    // doc must arrive cleansed by a set it never contributed to. New
    // batches cost one map-only scan regardless of snapshot size
    "web_template_incr" -> ((s, d) => {
      val planted = plantedTemplateDocs(Tables.documents(s, d))
      val gen = floor(col("doc_id") / 20) % 4
      val dir = stagedDir("tmplset", d,
        s"w${cfg.templateWordsPerLine}-p${cfg.templateMinDfPct}" +
          s"-d${cfg.templateMinDfDocs}", fresh = true)
      operators.WebCuration.templateStripSet(planted.where(gen =!= 0),
          cfg.templateWordsPerLine, cfg.templateMinDfPct, cfg.templateMinDfDocs)
        .write.mode("overwrite").parquet(dir)
      stagedThisSession.add(dir)
      operators.WebCuration.templateApplyStrip(planted.where(gen === 0),
          s.read.parquet(dir), cfg.templateWordsPerLine)
        .orderBy(col("doc_id"))
    }),

    // the STREAMING leg of the template lifecycle (8th driven pipeline):
    // micro-batches of the incoming quarter cleansed against the frozen
    // strip-set artifact trained once on the base three-quarters — same
    // split, same artifact, so the accumulated output shares
    // web_template_incr's oracle verbatim. Source + artifact stage once
    // per session; the stream itself re-runs fully each invocation
    // against a fresh checkpoint/sink (the stream_sessions discipline)
    "stream_template_strip" -> ((s, d) => {
      val key = s"w${cfg.templateWordsPerLine}-p${cfg.templateMinDfPct}" +
        s"-d${cfg.templateMinDfDocs}-s3"
      val probe = stagedDir("stream-tmpl", d, key, fresh = false)
      val stage =
        if (stagedThisSession.contains(probe)) probe
        else {
          val p = stagedDir("stream-tmpl", d, key, fresh = true)
          val planted = plantedTemplateDocs(Tables.documents(s, d))
          val gen = floor(col("doc_id") / 20) % 4
          operators.WebCuration.templateStripSet(planted.where(gen =!= 0),
              cfg.templateWordsPerLine, cfg.templateMinDfPct,
              cfg.templateMinDfDocs)
            .write.mode("overwrite").parquet(s"$p/stripset")
          planted.where(gen === 0).repartition(3)
            .write.mode("overwrite").parquet(s"$p/src")
          stagedThisSession.add(p)
          p
        }
      val run = freshRunDir(stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("source", org.apache.spark.sql.types.StringType)
        .add("text", org.apache.spark.sql.types.StringType)
      streaming.Streams.streamingTemplateStrip(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/stripset", s"$run/out", s"$run/ck",
          cfg.templateWordsPerLine)
        .awaitTermination()
      s.read.parquet(s"$run/out")
        .select(col("doc_id"), col("source"), col("n_lines"),
          col("n_boiler"), col("kept_text"))
        .orderBy(col("doc_id"))
    }),

    // SOFT dedup: keep every doc, weight it by 1/mean shingle document
    // frequency — repeated content contributes ~once in expectation
    // without the hard-dedup cliff. Exchanges carry only (doc_id, h)
    "dedup_soft_weights" -> ((s, d) =>
      operators.Dedup.softDedupWeights(Tables.documents(s, d), cfg.ngramN)
        .orderBy(col("doc_id"))),

    // fuzzy pairs → connected components → canonical spelling per cluster
    // (the ER lifecycle's merge step, over the SAME cluster machinery the
    // doc near-dup pipeline uses — min label propagation is type-generic)
    "er_fuzzy_clusters" -> ((s, d) => {
      val pairs = operators.Dedup.fuzzyNameMatch(Tables.part(s, d),
        "p_name", maxDist = 2)
      val names = Tables.part(s, d)
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_entities"))
      operators.Dedup.dedupClusters(pairs, "name_a", "name_b")
        .select(col("id").as("name"), col("canonical_id").as("canonical"))
        .join(names, Seq("name"))
        .orderBy(col("name"))
    }),

    // column profile (the audit's exploratory sibling): nulls + exact
    // distinct cardinality per column, one aggregation pass
    "dq_profile" -> ((s, d) =>
      operators.DataQuality.profile("orders", Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))),

    // whitening report: project out the ann_pca component, exact
    // before/after per-dim variance — retained_ppm ≈ 0 along the component
    "ann_whiten" -> ((s, d) =>
      operators.Similarity.whitenReport(Tables.embeddings(s, d), iters = 8)
        .orderBy(col("d"))),

    // declarative data-quality audit (the Deequ/expectations layer): row
    // predicates + key uniqueness compile to ONE agg pass per table, FK
    // checks to one anti-join each; the lineitem (orderkey, lineno) "PK"
    // is genuinely non-unique in this data — the audit must SAY so
    "dq_audit" -> ((s, d) => {
      import operators.DataQuality._
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      auditAll(Seq(
        audit("lineitem", Tables.lineitem(s, d), Seq(
          RowRule("discount_in_range",
            col("l_discount") >= 0.0 && col("l_discount") <= 0.2),
          RowRule("quantity_positive", col("l_quantity") > 0.0),
          UniqueRule("pk_order_line", Seq("l_orderkey", "l_linenumber")),
          RefRule("fk_orderkey", "l_orderkey", orders, "o_orderkey"))),
        audit("orders", orders, Seq(
          RowRule("totalprice_positive", col("o_totalprice") > 0.0),
          RowRule("status_domain",
            col("o_orderstatus").isin("O", "F", "P")),
          UniqueRule("pk_orderkey", Seq("o_orderkey")),
          RefRule("fk_custkey", "o_custkey", customer, "c_custkey"))),
        audit("customer", customer, Seq(
          UniqueRule("pk_custkey", Seq("c_custkey")),
          RowRule("mktsegment_present",
            col("c_mktsegment").isNotNull && col("c_mktsegment") =!= ""))),
        audit("documents", Tables.documents(s, d), Seq(
          UniqueRule("pk_doc_id", Seq("doc_id")),
          RowRule("nchar_consistent",
            col("n_chars") === length(col("text")).cast("long")),
          RowRule("lang_domain",
            col("lang").isin("en", "de", "fr", "es", "zh"))))))
    }),

    // correlated scalar subqueries through spark.sql: Catalyst decorrelates
    // each per-customer aggregate into a grouped aggregate + broadcast
    // equi-join (.explain: two HashAggregate legs, both joined broadcast —
    // a hand-fused DataFrame build would compute sum+count in ONE agg; the
    // point of this query is the SQL surface, not the minimal plan). The
    // above-average test is all-BIGINT (2·p·n > 3·Σp at ×100 scale), so
    // the boundary rows are engine-exact — a float avg() comparison would
    // hash-flap on ties.
    "q2_above_avg_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_sql")
      s.sql("""
        SELECT o.o_custkey, count(*) AS n_above,
               max(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS max_price_x100
        FROM graft_orders_sql o
        WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) * 2 *
              (SELECT count(*) FROM graft_orders_sql i WHERE i.o_custkey = o.o_custkey)
            > 3 * (SELECT sum(CAST(floor(i.o_totalprice * 100 + 0.5) AS BIGINT))
                   FROM graft_orders_sql i WHERE i.o_custkey = o.o_custkey)
        GROUP BY o.o_custkey
        ORDER BY o.o_custkey
      """)
    }),

    // second-order stats from exact integer sums (fixed-point technique)
    "a10_correlation" -> ((s, d) =>
      Relational.valueCorrelation(s, d).orderBy(col("event_type"))),

    // positional (lower) median — interpolation-free, engine-agnostic
    "a11_median" -> ((s, d) =>
      Relational.medianValue(s, d).orderBy(col("event_type"))),

    // session windows, batch form: lag + cumulative-sum gap splitting
    "a12_sessions" -> ((s, d) =>
      Relational.sessionize(s, d, cfg.sessionGapMinutes)
        .orderBy(col("user_id"), col("session_idx"))),

    // session windows via Spark's NATIVE session_window operator — the
    // built-in form of a12's composed lag/cumsum sessionization. Verified
    // boundary semantics (OperatorsSpec): session_window MERGES an event at
    // exactly gap distance (splits only when diff > gap) — the same rule as
    // the composed form, so the oracle shares a12's split predicate.
    // Aggregates are real event times, not window bounds (window end =
    // last event + gap, an artifact).
    "a12b_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("tsc", col("ts").cast("timestamp"))
        .groupBy(col("user_id"),
          session_window(col("tsc"), s"${cfg.sessionGapMinutes} minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("tsc"))).as("start_us"),
          max(unix_micros(col("tsc"))).as("end_us"))
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .orderBy(col("user_id"), col("start_us"))),

    // as-of join via the custom Catalyst operator (AsOfJoinPlan + Strategy
    // + sort-merge AsOfJoinExec): each purchase matched to the user's
    // latest click at-or-before it. Composite time keys make the tie
    // semantics deterministic and identical to the composed union+window
    // formulation the DuckDB oracle runs: the left key's MaxValue
    // tie-component admits clicks AT the purchase timestamp, and among
    // clicks tied on tsu the largest event_id wins (right side sorted by
    // the composite, exec holds the last row scanned). AsOfJoinSpec
    // asserts this operator equals the composed window form.
    "a13_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tsu"),
          struct(col("tsu"), lit(Long.MaxValue).as("tie")).as("tkey"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("last_click_id"),
          col("user_id").as("c_user"), col("tsu").as("last_click_tsu"),
          struct(col("tsu"), col("event_id").as("tie")).as("ckey"))
      graft.plans.AsOfJoin.asofJoin(s, purchases, clicks,
          "user_id", "c_user", "tkey", "ckey")
        .select(col("event_id"), col("user_id"), col("tsu"),
          col("last_click_id"), col("last_click_tsu"))
        .orderBy(col("event_id"))
    }),

    // A14 — bounded range join (attribution window): clicks within the
    // trailing 5 minutes of each purchase. Bucketed equi-join form — a
    // naive inequality join would plan as a per-key cartesian.
    "a14_range_join" -> ((s, d) =>
      Relational.purchaseClickWindow(s, d, cfg.windowMinutes)
        .orderBy(col("event_id"))),

    // ---- sink layout (K1/K2) ----
    "k1_batch_layout" -> ((s, d) =>
      ArticleOps.batchLayout(
        ArticleOps.validated(Tables.documents(s, d)).select(col("doc_id")),
        "doc_id", cfg.batchSize)
        .select(col("doc_id"), col("file_index"), col("batch_id"), col("file_name"))
        .orderBy(col("doc_id"))),

    // ---- dedup suite (north-star: exact, minhash-LSH, simhash, n-gram, embedding) ----
    "dedup_exact" -> ((s, d) =>
      operators.Dedup.exactDuplicates(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // which sources duplicate which: a planted 'mirror' source copying
    // every 5th doc lights up one off-diagonal cell per victim source —
    // the de-weighting signal before mixing
    "dedup_source_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.unionByName(
        docs.where(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L)
          .withColumn("source", lit("mirror")))
      operators.Dedup.crossSourceDupMatrix(planted)
        .orderBy(col("dup_source"), col("canonical_source"))
    }),

    // CCNet/RefinedWeb-style line-level dedup: boilerplate planted onto every
    // 5th doc (a fixed 10-token header + the full original text) must vanish —
    // the header survives only its first occurrence, and every body line of a
    // planted doc duplicates its source doc's lines, so planted docs dedup to
    // n_kept = 0 while originals are untouched.
    "dedup_lines" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.lineDedup(plantedBoilerplate(docs), wordsPerLine = 10)
        .orderBy(col("doc_id"))
    }),

    "dedup_ngram" -> ((s, d) =>
      operators.Dedup.ngramJaccardPairs(Tables.documents(s, d), cfg.ngramN,
          cfg.minJaccardX10000,
          docFreqCap =
            if (cfg.ngramDocFreqCap > 0) Some(cfg.ngramDocFreqCap) else None)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the near-dup pair graph as a persisted artifact (the sim_bm25_index
    // pattern): build once over the validated corpus, read the parquet back
    // — the shared prefix every downstream consumer (clustering, safe
    // splits, triplet mining, verdict) can fan out from without redoing
    // the shingle self-join
    "dedup_pairs_artifact" -> ((s, d) => {
      val dir = stagedDir("pairs", d,
        s"n${cfg.ngramN}-j${cfg.minJaccardX10000}", fresh = true)
      operators.Dedup.buildPairsArtifact(
        ArticleOps.validated(Tables.documents(s, d))
          .select(col("doc_id"), col("text"), col("source")),
        dir, cfg.ngramN, cfg.minJaccardX10000)
      stagedThisSession.add(dir)
      operators.Dedup.pairsFromArtifact(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // pair-graph DELETION — the takedown leg for the persisted artifact
    // every downstream consumer fans out from: docs doc_id ≡ 5 (mod 7)
    // removed from the pair graph in place (two anti-joins through the
    // atomic swap — a pair is evidence about both members, so any pair
    // touching a deleted doc goes; survivor scores are pairwise facts
    // and do not move)
    "dedup_pairs_del" -> ((s, d) => {
      val dir = stagedDir("pairsdel", d,
        s"n${cfg.ngramN}-j${cfg.minJaccardX10000}-m7", fresh = true)
      operators.Dedup.buildPairsArtifact(
        ArticleOps.validated(Tables.documents(s, d))
          .select(col("doc_id"), col("text"), col("source")),
        dir, cfg.ngramN, cfg.minJaccardX10000)
      operators.Dedup.removeFromPairsArtifact(s, dir,
        Tables.documents(s, d).where(col("doc_id") % 7 === 5)
          .select(col("doc_id")))
      stagedThisSession.add(dir)
      operators.Dedup.pairsFromArtifact(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // exact-substring shared-span detection (Lee et al.): every 10th doc
    // gains a planted doc (`doc_id + 600000`) stitched from two verbatim
    // token slices of it (tokens 1-40 and 61-80), so each planted pair must
    // show the two islands (runs of ~33 and ~13 consecutive shared 8-grams,
    // truncated by short docs) — copying that whole-doc Jaccard cannot see.
    "dedup_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.sharedSpans(plantedSpanCopies(docs),
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // within-doc self-copy: every 10th doc gains a sibling (doc_id +
    // 700000) that LOOPS its first 30 tokens twice — a diag-30 internal
    // run of ~23 consecutive repeated 8-grams that bigram repetition
    // ratios can't localize
    "dedup_self_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = tokens(col("text"))
      val looped = docs.select(col("doc_id"), col("text")).unionByName(
        docs.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 700000L).as("doc_id"),
            concat_ws(" ",
              concat_ws(" ", slice(toks, 1, 30)),
              concat_ws(" ", slice(toks, 1, 30))).as("text")))
      operators.Dedup.selfSpans(looped, cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_id"))
    }),

    // winnowing (MOSS) fingerprint dedup over the same stitched planting as
    // dedup_spans: ~2/(w+1) of shingles stored, with GUARANTEED collision
    // for any shared run of >= w+n-1 tokens (MinHash is only probabilistic)
    "dedup_winnow" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.winnowingPairs(plantedSpanCopies(docs),
          cfg.decontamNgramN, w = 4, minCommon = 2L)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // the doc-level action of span dedup: per-doc fraction of shingle
    // positions covered by qualifying shared runs (planted stitched docs
    // approach full coverage, organic docs stay near 0); every doc reports
    "dedup_span_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.spanCoverage(plantedSpanCopies(docs),
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_id"))
    }),

    // incremental span maintenance: the originals' persisted positional
    // index probed by the planted copies as the "new" batch — must equal
    // the batch spans restricted to pairs with a new member
    "dedup_spans_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = plantedSpanCopies(docs)
      val existing = operators.Dedup.spanIndex(
        planted.where(col("doc_id") < 600000L), cfg.decontamNgramN)
      operators.Dedup.sharedSpansIncremental(existing,
          planted.where(col("doc_id") >= 600000L),
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // span-index DELETION — the span family's takedown leg: half the
    // planted sources (doc_id ≡ 0 mod 20) are removed from the persisted
    // positional index (one anti-join; positions are per-doc facts), then
    // the planted copies probe the survivor index: the deleted sources'
    // island pairs vanish, the surviving half's remain bit-identical
    "dedup_spans_del" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = plantedSpanCopies(docs)
      val existing = operators.Dedup.spanIndex(
        planted.where(col("doc_id") < 600000L), cfg.decontamNgramN)
      val survivors = operators.Dedup.removeFromSpanIndex(existing,
        planted.where(col("doc_id") < 600000L && col("doc_id") % 20 === 0)
          .select(col("doc_id")))
      operators.Dedup.sharedSpansIncremental(survivors,
          planted.where(col("doc_id") >= 600000L),
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // the span-dedup ACTION: cut the copied tokens out of the LATER doc
    // (keep-first), leave everything else in place — each planted stitched
    // copy (doc_id + 600000) must lose its two verbatim islands while its
    // source doc comes through untouched
    "dedup_span_removal" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.removeSharedSpans(plantedSpanCopies(docs),
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_id"))
    }),

    // jaccard decile histogram: the threshold-tuning curve over all
    // shingle-sharing candidate pairs (no cutoff)
    "dedup_sim_histogram" -> ((s, d) =>
      operators.Dedup.jaccardHistogram(Tables.documents(s, d), cfg.ngramN)
        .orderBy(col("decile"))),

    // quality-aware survivor per near-dup cluster: keep the cleanest copy,
    // not the smallest id
    "dedup_best_survivor" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = operators.Dedup.dedupClusters(
        operators.Dedup.ngramJaccardPairs(docs, cfg.ngramN, cfg.minJaccardX10000))
      operators.Dedup.bestSurvivors(docs, clusters)
        .orderBy(col("cluster_id"))
    }),

    // cluster labels: top-3 cluster-tf × corpus-idf terms per near-dup
    // cluster — the readable line of the dedup report
    "dedup_cluster_labels" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = operators.Dedup.dedupClusters(
        operators.Dedup.ngramJaccardPairs(docs, cfg.ngramN, cfg.minJaccardX10000))
      operators.Dedup.clusterLabels(docs, clusters, 3)
        .orderBy(col("cluster_id"), col("rank"))
    }),

    // the per-doc KEEP/DROP verdict: exact dup → near-dup cluster →
    // span-copy coverage, first failing reason wins (auditable)
    "dedup_verdict" -> ((s, d) =>
      operators.Dedup.dedupVerdict(Tables.documents(s, d),
          cfg.ngramN, cfg.minJaccardX10000,
          cfg.decontamNgramN, cfg.spanMinRun)
        .orderBy(col("doc_id"))),

    "dedup_minhash" -> ((s, d) =>
      operators.Dedup.minhashPairs(Tables.documents(s, d), cfg.ngramN,
        cfg.minhashK, cfg.minhashBands, cfg.minEstJaccardX100)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the SQL extension surface end-to-end: the MinHash-LSH near-dup
    // pipeline written entirely in spark.sql(...) against the registered
    // graft_hash + graft_minhash functions — a SQL-only user must get the
    // byte-identical oracle result the Scala API (dedup_minhash) gets.
    // The signature table is materialized as an eagerly-cached temp view
    // (nested subqueries, not CTEs: WITH-CTE ids are renumbered per
    // analysis, so a CTE-bearing cached view never sameResult-matches its
    // own references — the banding and both estimate legs would each
    // re-run the corpus chain, measured 79 s vs ~2 s at sf0.1). Caching
    // the k-longs-per-doc signatures is the persisted-dedup-index posture
    // (~0.1% of corpus size at 100 TB).
    // second pure-SQL extension-surface rep: brute-force cosine top-k
    // written entirely in spark.sql over graft_dot — byte-identical to the
    // Scala ann_topk plan (same oracle verbatim). The unit-vector table is
    // staged behind one eager cache so the window's ORDER BY and the
    // output projection don't each recompute the normalize transform.
    "sql_ann_topk" -> ((s, d) => {
      graft.plans.GraftExtensions.register(s)
      Tables.embeddings(s, d).createOrReplaceTempView("graft_emb_sql")
      s.catalog.dropTempView("graft_vn_sql") // re-invocation guard
      s.sql("""
        CACHE TABLE graft_vn_sql AS
        SELECT vec_id, transform(v, x -> x / nrm) AS vn
        FROM (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm
          FROM (SELECT vec_id,
              transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM graft_emb_sql))
      """)
      // materialize the (tiny) top-k result EAGERLY, then free the cached
      // unit-vector table: an abandoned eager cache would hold executor
      // memory for the rest of the session and skew later query timings
      val out = s.sql("""
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
          cos_x1000000
        FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY graft_dot(q.vn, e.vn) DESC, e.vec_id) AS rank,
            CAST(floor(graft_dot(q.vn, e.vn) * 1000000.0 + 0.5) AS BIGINT)
              AS cos_x1000000
          FROM graft_vn_sql q JOIN graft_vn_sql e
            ON q.vec_id < 10 AND q.vec_id <> e.vec_id)
        WHERE rank <= 5
        ORDER BY query_id, rank
      """).localCheckpoint()
      s.catalog.dropTempView("graft_vn_sql")
      out
    }),

    "sql_minhash_pairs" -> ((s, d) => {
      stageSqlMinhash(s, d)
      val out = s.sql("""
        WITH mh AS (SELECT doc_id, i, mh FROM graft_mh_sql),
        bk AS (SELECT doc_id, band, bkey FROM graft_bk_sql),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        est AS (SELECT doc_a, doc_b,
            sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS matches
          FROM cand
          JOIN mh ma ON ma.doc_id = doc_a
          JOIN mh mb ON mb.doc_id = doc_b AND mb.i = ma.i
          GROUP BY doc_a, doc_b)
        SELECT doc_a, doc_b,
          CAST(floor(100.0 * matches / 16 + 0.5) AS BIGINT) AS est_jaccard_x100
        FROM est
        WHERE CAST(floor(100.0 * matches / 16 + 0.5) AS BIGINT) >= 50
        ORDER BY doc_a, doc_b
      """).localCheckpoint()
      // mh/bk stay cached for the session (see stageSqlMinhash): ~20k slim
      // rows at sf0.1 — the persisted index a re-invoking user would probe
      out
    }),

    // incremental index maintenance: pairs involving the "new" half of the
    // corpus (doc_id >= 400) probed against the persisted signature index
    // of the existing half — equals the batch run restricted to new-member
    // pairs, at O(new x collisions) cost
    "dedup_minhash_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val existingSigs = operators.Dedup.minhashTable(
        docs.where(col("doc_id") < 400), cfg.ngramN, cfg.minhashK)
      operators.Dedup.minhashPairsIncremental(existingSigs,
          docs.where(col("doc_id") >= 400),
          cfg.ngramN, cfg.minhashK, cfg.minhashBands, cfg.minEstJaccardX100)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // signature-index DELETION — the near-dup family's takedown leg
    // (right-to-be-forgotten for the dedup artifact): docs doc_id ≡ 5
    // (mod 7) are removed from the persisted signature index of the
    // existing half by one index-sized anti-join (signatures carry no
    // global statistic — nothing to decrement), then the new half probes
    // the survivor index. Pairs equal the batch run over the survivor
    // corpus restricted to new-member pairs; a deleted doc can never
    // resurface as a near-dup partner (the no-residue spec pins it)
    "dedup_minhash_del" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val existingSigs = operators.Dedup.minhashTable(
        docs.where(col("doc_id") < 400), cfg.ngramN, cfg.minhashK)
      val survivors = operators.Dedup.removeFromMinhashIndex(existingSigs,
        docs.where(col("doc_id") % 7 === 5 && col("doc_id") < 400)
          .select(col("doc_id")))
      operators.Dedup.minhashPairsIncremental(survivors,
          docs.where(col("doc_id") >= 400),
          cfg.ngramN, cfg.minhashK, cfg.minhashBands, cfg.minEstJaccardX100)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // the 15th driven pipeline: streaming near-dup index TAKEDOWN —
    // delete requests stream in as 3 micro-batches against the persisted
    // batch_id-partitioned signature index (the streaming near-dup
    // tier's layout); each batch rewrites ONLY the partitions holding a
    // removed doc's rows. Idempotent by construction (no ledger); the
    // survivor probe equals the one-shot delete — dedup_minhash_del's
    // oracle verbatim
    "stream_neardup_takedown" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stage = stagedDir("stream-mh-takedown", d, "n3k16-m7-s3",
        fresh = true)
      // index + the slim doc→partition members sibling + request source
      // staged from the session template (the members probe is the
      // round-12 scale row's linear-term fix)
      copyTree(minhashTakedownTemplate(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
      streaming.Streams.streamingNearDupTakedown(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Dedup.minhashPairsIncrementalSigs(
          s.read.parquet(s"$stage/index")
            .select(col("doc_id"), col("i"), col("mh")),
          operators.Dedup.minhashTable(
            docs.where(col("doc_id") >= 400), cfg.ngramN, cfg.minhashK),
          cfg.minhashK, cfg.minhashBands, cfg.minEstJaccardX100)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // the measured LSH S-curve: candidate recall of the banded MinHash
    // probe against exact n-gram Jaccard truth, per Jaccard decile — the
    // (k, bands) tuning evidence you read BEFORE committing a 100 TB dedup
    // run. Truth threshold 3000, well below the 5000 dedup cut, and the
    // planted prefix copies spread true pairs across bands ~3..9, so the
    // curve's knee (recall rising through the threshold) is visible.
    "dedup_lsh_eval" -> ((s, d) =>
      operators.Dedup.lshCandidateEval(
          plantedPrefixCopies(Tables.documents(s, d)), cfg.ngramN,
          cfg.minhashK, cfg.minhashBands, minJaccardX10000 = 3000)
        .orderBy(col("jaccard_band"))),

    // the canonicalization ladder over the variant-planted corpus: which
    // normalization level (raw → ws → unicode → casefold → alnum) reveals
    // how much duplication — the "what is THE canonical text" decision
    // instrument; each planted class becomes a dup exactly at its level
    "dedup_canon_ladder" -> ((s, d) =>
      operators.Dedup.canonicalizationLadder(
          plantedCanonVariants(Tables.documents(s, d)))
        .orderBy(col("level"))),

    // asymmetric containment scoring over the prefix-planted corpus: the
    // planted prefix copies score containment 10000 (their shingles are a
    // strict subset of the source doc's) while Jaccard reads only the kept
    // fraction — the gap Jaccard-threshold dedup structurally misses
    "dedup_containment" -> ((s, d) =>
      operators.Dedup.containmentPairs(
          plantedPrefixCopies(Tables.documents(s, d)), cfg.ngramN,
          minContainX10000 = 8000)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the 32-bit fingerprint TABLE (one-pass SimHashAgg) — the compact
    // per-doc signature; pairing runs ONLY through the 60-bit banded path
    // below (8-bit bands on a 32-bit hash go quadratic past ~100k docs —
    // measured 15× slower at 500k, so the 32-bit pair path was removed)
    "dedup_simhash" -> ((s, d) =>
      operators.Dedup.simhashTable(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // the 60-bit scale-path sibling: same hamming<=3 semantics, 15-bit
    // bands cut random band collisions 128x (32-bit/8-bit banding is
    // quadratic-prone past ~100k docs — measured at sf10-syn)
    "dedup_simhash60" -> ((s, d) =>
      operators.Dedup.simhashPairs60(Tables.documents(s, d),
          cfg.simhashMaxHamming)
        .orderBy(col("doc_a"), col("doc_b"))),

    // threshold 0.4 is below the quadratic-safe floor — the explicit opt-in
    // is the point: this query demonstrates the all-pairs regime knowingly
    "dedup_embedding" -> ((s, d) =>
      operators.Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), 400000L,
          allowQuadratic = true)
        .orderBy(col("vec_a"), col("vec_b"))),

    // embedding near-dup in the regime LSH banding is for (cos ≥ 0.9,
    // O(n) output): the corpus plus one planted near-copy per vector
    // (the synthetic embeddings top out at cos ≈ 0.6, so copies are
    // planted deterministically). Candidates from a (table, bucket)
    // equi-join — no cross join; the oracle runs the all-pairs form, so a
    // hash match proves 100% banding recall.
    "dedup_embedding_lsh" -> ((s, d) =>
      operators.Dedup.embeddingNearDupPairsBanded(
        operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
        cfg.minCosX1000000, cfg.lshPlanes, cfg.lshTables, cfg.embeddingDim)
        .orderBy(col("vec_a"), col("vec_b"))),

    // SemDeDup (Abbas et al. 2023): deterministic k-means (hyperplane seed
    // + one exact-integer Lloyd round) scopes the cosine check WITHIN each
    // cluster — Σ|c|² pair cost instead of n², the published semantic-dedup
    // recipe at web scale. Survivor rank = farthest-from-centroid; planted
    // near-copies supply the ≥0.9-cos regime. Fully oracle-mirrored,
    // k-means and all (same planted corpus as dedup_embedding_lsh).
    "dedup_semantic" -> ((s, d) =>
      operators.Dedup.semanticDedup(
        operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
        cfg.minCosX1000000, planes = semanticPlanes, dim = cfg.embeddingDim)
        .orderBy(col("vec_id"))),

    // connected components over the banded near-dup pairs: the transitive
    // closure that turns pairwise matches into per-cluster canonical ids —
    // the keep/drop decision of a dedup pipeline. Oracle: recursive-CTE
    // min-reachable-id over the same (all-pairs) pair list.
    "dedup_clusters" -> ((s, d) =>
      operators.Dedup.dedupClusters(
        operators.Dedup.embeddingNearDupPairsBanded(
          operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
          cfg.minCosX1000000, cfg.lshPlanes, cfg.lshTables, cfg.embeddingDim),
        "vec_a", "vec_b")
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))),

    // the corpus-UPDATE path one stage after dedup_minhash_incr: cluster
    // the base corpus's pairs first, then fold the planted copies' pairs
    // into the existing assignment — must equal batch clustering of all
    // pairs (the same oracle), at |clustered|+|new| edge cost
    "dedup_clusters_incr" -> ((s, d) => {
      // both the old-pair and new-pair branches read this — checkpoint so
      // the banded-LSH pipeline runs once, not once per branch
      val pairs = operators.Dedup.embeddingNearDupPairsBanded(
        operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
        cfg.minCosX1000000, cfg.lshPlanes, cfg.lshTables, cfg.embeddingDim)
        .localCheckpoint()
      val existing = operators.Dedup.dedupClustersStar(
        pairs.where(col("vec_a") < 1000000L && col("vec_b") < 1000000L),
        "vec_a", "vec_b")
      operators.Dedup.dedupClustersIncremental(existing,
          pairs.where(col("vec_a") >= 1000000L || col("vec_b") >= 1000000L),
          "vec_a", "vec_b")
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // the dedup report headline: clusters by size over the near-dup
    // component output (planted copies make 2-clusters, organic chains more)
    "dedup_cluster_sizes" -> ((s, d) =>
      operators.Dedup.clusterSizeHistogram(
        operators.Dedup.dedupClusters(
          operators.Dedup.embeddingNearDupPairsBanded(
            operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
            cfg.minCosX1000000, cfg.lshPlanes, cfg.lshTables, cfg.embeddingDim),
          "vec_a", "vec_b"))
        .orderBy(col("cluster_size"))),

    // same clustering contract via the O(log)-round large-star/small-star
    // decomposition — the variant that survives long chains at scale
    "dedup_clusters_star" -> ((s, d) =>
      operators.Dedup.dedupClustersStar(
        operators.Dedup.embeddingNearDupPairsBanded(
          operators.Dedup.withNearCopies(Tables.embeddings(s, d)),
          cfg.minCosX1000000, cfg.lshPlanes, cfg.lshTables, cfg.embeddingDim),
        "vec_a", "vec_b")
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))),

    // ---- similarity search (brute-force baseline + LSH scale path) ----
    "ann_topk" -> ((s, d) =>
      operators.Similarity.bruteForceTopK(Tables.embeddings(s, d), cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))),

    // IVF ANN (k-means coarse quantizer). K-means isn't reproducible
    // cross-engine, so the neighbor LIST can't be oracle-compared;
    // instead the query emits a per-query recall@k verdict against the
    // engine's own exact brute-force top-k (`recall_floor_met`: hits*100
    // >= floor*k, integer arithmetic) and DuckDB recomputes the query-id
    // roster + literal TRUE. A quantizer regression that drops recall
    // below the floor now FAILS the driver gate instead of hiding behind
    // a rows-only check (round-15 verdict task 5). Two verdicts: per
    // query, `found_any` (a probe that returns zero true neighbors is
    // broken machinery, not noise — measured per-query minimum is 2/5);
    // corpus-wide, aggregate recall >= 60% (measured 78% at sf0.01, 90%
    // at sf0.001 — a single unlucky query can't flip it, a real
    // quantizer regression does). Trains
    // on a 25% sample by default (`ann.ivf_train_fraction`): at scale
    // the 8 Lloyd passes over the training set are the query's dominant
    // cost, and quantizer quality needs only a representative sample —
    // assignment still covers all.
    "ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ivf = operators.Similarity.ivfTopK(emb, cfg.annQueries, cfg.annK,
        trainFraction = cfg.ivfTrainFraction)
      val exact = operators.Similarity.bruteForceTopK(emb, cfg.annQueries, cfg.annK)
      val hits = exact.select(col("query_id"), col("neighbor_id"))
        .join(ivf.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
      exact.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .withColumn("h", coalesce(col("hits"), lit(0L)))
        .select(col("query_id"), lit(cfg.annK.toLong).as("k"),
          (col("h") >= 1L).as("found_any"),
          (sum(col("h")).over(Window.partitionBy()) * 100 >=
            sum(lit(cfg.annK.toLong)).over(Window.partitionBy()) * 60)
            .as("recall_floor_met"))
        .orderBy(col("query_id"))
    }),

    // deterministic IVF (fixed hyperplane coarse quantizer + exact
    // fixed-point centroid sums) — the fully oracle-checked sibling of
    // ann_ivf: same probe/rank machinery, reproducible cells
    "ann_ivf_det" -> ((s, d) =>
      operators.Similarity.ivfTopKDet(Tables.embeddings(s, d), cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))),

    "ann_lsh" -> ((s, d) =>
      operators.Similarity.lshTopK(Tables.embeddings(s, d), 10, 5, planes = 4, tables = 2)
        .orderBy(col("query_id"), col("rank"))),

    // index-evaluation harness: recall@5 and reciprocal rank of the LSH
    // index against the exact baseline, per query — how a deployment tunes
    // tables/planes/nProbe on a sampled ground truth
    "ann_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      operators.Similarity.annEval(
          operators.Similarity.bruteForceTopK(emb, cfg.annQueries, cfg.annK),
          operators.Similarity.lshTopK(emb, cfg.annQueries, cfg.annK,
            planes = 4, tables = 2),
          cfg.annK)
        .orderBy(col("query_id"))
    }),

    // position-sensitive index evaluation: binary nDCG@k of the LSH index
    // vs the exact baseline, precomputed integer log-discount weights
    "ann_ndcg" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      operators.Similarity.ndcgEval(
          operators.Similarity.bruteForceTopK(emb, cfg.annQueries, cfg.annK),
          operators.Similarity.lshTopK(emb, cfg.annQueries, cfg.annK,
            planes = 4, tables = 2),
          cfg.annK)
        .orderBy(col("query_id"))
    }),

    // int8-quantized ANN (4× smaller vectors; integer dots make the
    // approximate ranking bit-reproducible, so this one IS oracle-exact)
    "ann_topk_int8" -> ((s, d) =>
      operators.Similarity.bruteForceTopKQuantized(Tables.embeddings(s, d),
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))),

    // product-quantization ANN: 8 subspaces × 4-bit codes = 64× index
    // compression, ADC scoring via a broadcast lookup table; deterministic
    // codebooks (hyperplane cells + exact integer means) and integer ADC
    // entries make the ranking oracle-exact
    "ann_pq" -> ((s, d) =>
      operators.Similarity.pqTopK(Tables.embeddings(s, d),
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))),

    // IVF + PQ composed (the production FAISS-style index layout): the
    // deterministic coarse probe bounds the candidate set, integer ADC
    // over 64×-compressed codes ranks it, exact re-rank on the shortlist
    "ann_ivfpq" -> ((s, d) =>
      operators.Similarity.ivfPqTopK(Tables.embeddings(s, d),
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))),

    // the IVF+PQ index TRAINED ONCE and persisted (buildAnnIndex): cell
    // map, coarse centroids, PQ codes, codebook, and re-rank vectors as
    // parquet — the artifact that ships at 100 TB (one train per corpus
    // snapshot, every search after is probe-only). Returns the persisted
    // cell assignment read back from the artifact; the oracle replays the
    // deterministic coarse quantizer.
    "ann_build_index" -> ((s, d) => {
      val dir = stagedDir("annidx", d, "p4m8b4r1", fresh = true)
      operators.Similarity.buildAnnIndex(Tables.embeddings(s, d), dir)
      stagedThisSession.add(dir)
      s.read.parquet(s"$dir/cells")
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy(col("vec_id"))
    }),

    // probe-only search against the persisted ANN index — must equal
    // ann_ivfpq byte-for-byte (same oracle SQL verbatim; shared serve
    // path). When ann_build_index ran earlier in the session (Bench's
    // sorted order guarantees it) this times the SERVE leg alone —
    // the artifact-pays-off evidence for the ANN family; standalone
    // (Verify's arbitrary order) it builds first, staying self-contained.
    "ann_ivfpq_index" -> ((s, d) => {
      val dir = stagedDir("annidx", d, "p4m8b4r1", fresh = false)
      if (!stagedThisSession.contains(dir)) {
        operators.Similarity.buildAnnIndex(Tables.embeddings(s, d), dir)
        stagedThisSession.add(dir)
      }
      operators.Similarity.annQueryIndex(s, dir, cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SHARD-PARALLEL ANN serving — the 100 TB shape: ONE shared training
    // pass (the frozen PQ codebook copies into every shard, FAISS's
    // shard-the-inverted-lists discipline), vec rows hash-split into 4
    // complete sub-indexes with independent leases/segment logs; the
    // fan-out query reconstructs the global probe order bit-exactly from
    // the shards' mergeable integer coarse sums, so shard count changes
    // no score — the UNSHARDED oracle SQL verbatim
    "ann_ivfpq_sharded" -> ((s, d) => {
      val dir = stagedDir("annshard", d, "p4m8b4r1-s4", fresh = true)
      copyTree(annShardedTemplate(s, d), dir)
      operators.Similarity.annQueryIndexSharded(s, dir,
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 19th driven pipeline: stream_bm25_sharded's ANN twin — the
    // incoming embedding quarter routed by vec hash into sub-indexes,
    // each absorbing through its own exactly-once ledger with the SHARED
    // frozen codebook; the drained fan-out probe equals the one-shot
    // incremental update of one artifact (ann_index_incr's oracle
    // verbatim). The BENCH shape is 2 shards × 2 micro-batches — shard
    // count is layout, not semantics (this query's own theorem), and
    // every lease/swap round is fixed FS cost, so the 4×3 shape tripled
    // under the median protocol was pure gate wall (round-14 verdict
    // task 2); the full 4-shard replay/idempotence claims live in
    // ShardedIndexSpec.
    "stream_ann_sharded" -> ((s, d) => {
      val stage = stagedDir("stream-ann-sh", d, "p4m8b4r1-m2-s2", fresh = true)
      copyTree(annSharded75Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
      streaming.Streams.streamingAnnUpdateSharded(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.annQueryIndexSharded(s, s"$stage/index",
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // INCREMENTAL ANN index maintenance — the artifact family's last
    // missing lifecycle leg (BM25/minhash/spans/NB each have one): index
    // built on the base three-quarters, the incoming quarter ABSORBED by
    // updateAnnIndex with FROZEN quantizers (fixed coarse hyperplanes;
    // batch vectors PQ-encoded by argmin against the serving codebook —
    // nothing re-trained, batch scanned once, merge index-sized; the
    // mergeable coarse_sums table keeps probe-order centroids rebuild-
    // exact), then queried. The oracle replays the frozen-quantizer
    // contract end to end. Query ids 0, 4, 8 are themselves
    // incrementally-added vectors, so the probe exercises the merged
    // index both ways
    "ann_index_incr" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = stagedDir("annincr", d, "p4m8b4r1-m4", fresh = true)
      copyTree(s"${ann75Template(s, d)}/index", dir)
      operators.Similarity.updateAnnIndex(s, dir,
        emb.where(col("vec_id") % 4 === 0))
      stagedThisSession.add(dir)
      operators.Similarity.annQueryIndex(s, dir, cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // index DELETION — the takedown / right-to-be-forgotten leg: vectors
    // vec_id ≡ 3 (mod 7), vec_id ≥ 10 removed from the full-corpus index
    // with no rebuild (index-sized work: anti-joins + exact integer
    // subtraction of the deleted vectors' coarse sums, recomputed from
    // the index itself). The probe then equals the frozen-training index
    // over the survivors — the oracle trains PQ on the FULL corpus and
    // serves the survivor set only
    "ann_index_del" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = stagedDir("anndel", d, "p4m8b4r1-m7", fresh = true)
      copyTree(annFullTemplate(s, d), dir)
      operators.Similarity.removeFromAnnIndex(s, dir,
        emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 10)
          .select(col("vec_id")))
      stagedThisSession.add(dir)
      operators.Similarity.annQueryIndex(s, dir, cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN LSM COMPACTION — the vector twin of sim_bm25_compact: after the
    // same takedown as ann_index_del, fold the segment log (tombstones
    // drop physically, sums collapse to their aggregate, quantizers
    // untouched); the probe must be bit-identical to the uncompacted
    // index (ann_index_del's oracle verbatim)
    "ann_index_compact" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = stagedDir("anncompact", d, "p4m8b4r1-m7", fresh = true)
      copyTree(annFullTemplate(s, d), dir)
      operators.Similarity.removeFromAnnIndex(s, dir,
        emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 10)
          .select(col("vec_id")))
      operators.Similarity.compactAnnIndex(s, dir)
      stagedThisSession.add(dir)
      operators.Similarity.annQueryIndex(s, dir, cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // per-cluster simplified silhouette over the deterministic k-means —
    // the cluster-quality readout consulted BEFORE paying for
    // dedup_semantic's within-cluster pair joins (O(n·k), centroid-based;
    // same planes/cells as the SemDeDup clustering)
    "ann_silhouette" -> ((s, d) =>
      operators.Dedup.clusterSilhouette(Tables.embeddings(s, d),
          planes = semanticPlanes, dim = cfg.embeddingDim)
        .orderBy(col("cell"))),

    // sparse text ANN: per-doc top-3 most similar documents by TF-IDF
    // cosine over 3-gram shingles (inverted-index self-join, df-capped) —
    // the text-side sibling of the dense-embedding tiers above
    "sim_tfidf" -> ((s, d) =>
      operators.Similarity.tfidfNeighbors(Tables.documents(s, d), 3,
          maxDf = cfg.retrievalMaxDf)
        .orderBy(col("doc_id"), col("rank"))),

    // embedding-free ANN: feature-hashed (hashing-trick) 64-dim signed
    // shingle-count vectors, cosine top-5 for the first 10 doc ids —
    // dense-ANN-shaped similarity with no embedding model in sight
    "sim_hashed" -> ((s, d) =>
      operators.Similarity.hashedNeighbors(Tables.documents(s, d),
          nQueries = 10, k = 5)
        .orderBy(col("query_id"), col("rank"))),

    // ---- text analysis (lang-id, quality, tokens, fingerprints) ----
    "ta_langid" -> ((s, d) =>
      operators.TextAnalysis.langId(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    "ta_quality" -> ((s, d) =>
      operators.TextAnalysis.quality(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    "ta_tokens" -> ((s, d) =>
      operators.TextAnalysis.tokenCounts(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    "ta_fingerprint" -> ((s, d) =>
      operators.TextAnalysis.fingerprints(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // per-doc top-5 salient terms, integer-exact TF-IDF (no log, so the
    // idf factor is bit-identical cross-engine)
    "ta_keywords" -> ((s, d) =>
      operators.TextAnalysis.keywords(Tables.documents(s, d), 5)
        .orderBy(col("doc_id"), col("rank"))),

    // PII scrub pass over text with deterministically planted PII (the
    // synthetic corpus has none — the planting makes the oracle
    // non-vacuous, same pattern as u1's constructed wikitext)
    "ta_pii" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or https://site"), col("doc_id").cast("string"),
        lit(".example/p?q=1 tel +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      operators.TextAnalysis.piiScan(Tables.documents(s, d), planted)
        .orderBy(col("doc_id"))
    }),

    // repetition signals — the repeated-n-gram quality filter (boilerplate /
    // machine-generated text repeats itself)
    "ta_repetition" -> ((s, d) =>
      operators.TextAnalysis.repetition(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // per-doc 8-gram novelty: fraction of a doc's distinct shingles found
    // nowhere else in the corpus — the doc-level memorization-risk signal
    "ta_novelty" -> ((s, d) =>
      operators.TextAnalysis.novelty(Tables.documents(s, d), 8)
        .orderBy(col("doc_id"))),

    // per-source n-gram type–token diversity: the boilerplate detector —
    // a templated source collapses distinct/total even when doc-level
    // dup signals stay quiet
    "ta_diversity" -> ((s, d) =>
      operators.TextAnalysis.ngramDiversity(Tables.documents(s, d), cfg.ngramN)
        .orderBy(col("source"))),

    // robust per-source length outliers: exact nearest-rank median + MAD
    // of token counts, flag docs beyond 4 MADs — the truncation/glitch
    // detector; the planted 10x-concatenated copies must all be flagged
    "ta_length_outliers" -> ((s, d) =>
      operators.TextAnalysis.lengthOutliers(
          plantedLongDocs(Tables.documents(s, d)), k = 4)
        .orderBy(col("doc_id"))),

    // per-source unigram Gini impurity: token-distribution CONCENTRATION
    // (ta_diversity measures type breadth; this measures how evenly the
    // mass spreads) — pure rational arithmetic, no libm log
    "ta_gini" -> ((s, d) =>
      operators.TextAnalysis.tokenGini(Tables.documents(s, d))
        .orderBy(col("source"))),

    // k-anonymity audit over the (source, lang, length-bucket)
    // quasi-identifiers: equivalence-class sizes + the <k at-risk flag —
    // the release-review privacy table next to ta_pii
    "ta_k_anonymity" -> ((s, d) =>
      operators.TextAnalysis.kAnonymity(Tables.documents(s, d),
          k = 10L, bucketWidth = 200L)
        .orderBy(col("source"), col("lang"), col("len_bucket"))),

    // Flesch reading-ease per source in exact rational arithmetic, over
    // the same planted sentence boundaries as ta_sentences (the corpus
    // text has none); syllables ≈ vowel-group runs
    "ta_readability" -> ((s, d) => {
      val planted = Tables.documents(s, d).withColumn("text",
        regexp_replace(
          regexp_replace(col("text"), " (spark|data|join) ", ". $1 "),
          " (table|row) ", "! $1 "))
      operators.TextAnalysis.readability(planted).orderBy(col("source"))
    }),

    // rank-frequency readout at power-of-two ranks — the Zipf-naturalness
    // instrument (natural text halves ratio_ppm per row; templated text
    // flattens or cliffs)
    "ta_zipf" -> ((s, d) =>
      operators.TextAnalysis.zipfRanks(Tables.documents(s, d), maxExp = 10)
        .orderBy(col("rank"))),

    // WordPiece-style substring vocabulary: top-200 substrings (len <= 4)
    // of distinct words, scored by corpus occurrences — the OTHER
    // tokenizer-training family next to ta_bpe_train
    "ta_wordpiece_vocab" -> ((s, d) =>
      operators.TextAnalysis.wordpieceVocab(Tables.documents(s, d), 200, 4)
        .orderBy(col("term"))),

    // greedy longest-match fertility per source under that vocabulary —
    // the tokenizer bake-off row against ta_bpe_fertility; segmentation
    // runs on DISTINCT words only, the corpus is billed via a count join
    "ta_wordpiece_fertility" -> ((s, d) =>
      operators.TextAnalysis.wordpieceFertility(Tables.documents(s, d), 200, 4)
        .orderBy(col("source"))),

    // per-doc WordPiece bill (ta_bpe_segment's twin): pieces + unknowns
    // per document via the broadcast distinct-word piece table
    "ta_wordpiece_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.TextAnalysis.wordpieceSegmentCounts(docs,
          operators.TextAnalysis.wordpieceVocab(docs, 200, 4), 4)
        .orderBy(col("doc_id"))
    }),

    // the persisted-vocab lifecycle: train the WordPiece vocabulary, write
    // it as a parquet artifact, reload, and bill the corpus from the loaded
    // copy — the round trip must not change a single count
    "ta_wordpiece_artifact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("wpvocab", d, "k200l4", fresh = true)
      operators.TextAnalysis.saveWordpieceVocab(
        operators.TextAnalysis.wordpieceVocab(docs, 200, 4), dir)
      operators.TextAnalysis.wordpieceFertilityFrom(docs,
          operators.TextAnalysis.loadWordpieceVocab(s, dir), 4)
        .orderBy(col("source"))
    }),

    // unigram-LM OPTIMAL decoding per doc — the THIRD tokenizer family:
    // Viterbi DP (min pieces, tie-break min unknowns, exact integer
    // scores) against the same substring vocabulary WordPiece greedy uses,
    // as ONE codegen'd expression over distinct words
    "ta_unigram_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.TextAnalysis.unigramSegmentCounts(docs,
          operators.TextAnalysis.collectVocabTerms(
            operators.TextAnalysis.wordpieceVocab(docs, 200, 4)))
        .orderBy(col("doc_id"))
    }),

    // the bake-off's third fertility row (BPE merges / WordPiece greedy /
    // unigram optimal over the SAME corpus): optimal decoding can only
    // lower pieces-per-word vs greedy — the spec pins the inequality
    "ta_unigram_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.TextAnalysis.unigramFertilityFrom(docs,
          operators.TextAnalysis.collectVocabTerms(
            operators.TextAnalysis.wordpieceVocab(docs, 200, 4)))
        .orderBy(col("source"))
    }),

    // the artifact lifecycle CROSSES tokenizer families: the SAME parquet
    // vocabulary WordPiece persists is loaded and decoded optimally — the
    // round trip must not change a single count
    "ta_unigram_artifact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("univocab", d, "k200l4", fresh = true)
      operators.TextAnalysis.saveWordpieceVocab(
        operators.TextAnalysis.wordpieceVocab(docs, 200, 4), dir)
      operators.TextAnalysis.unigramFertilityFrom(docs,
          operators.TextAnalysis.collectVocabTerms(
            operators.TextAnalysis.loadWordpieceVocab(s, dir)))
        .orderBy(col("source"))
    }),

    // incremental containment maintenance: the prefix-copy batch probes the
    // persisted shingle index of the original corpus — equals the batch run
    // restricted to new-member pairs, at O(new x collisions) cost
    "dedup_containment_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val existing = operators.Dedup.shingleTable(
          docs.select(col("doc_id"), col("text")), cfg.ngramN)
        .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
      val newDocs = plantedPrefixCopies(docs).where(col("doc_id") >= 1000000L)
      operators.Dedup.containmentPairsIncremental(existing, newDocs,
          cfg.ngramN, minContainX10000 = 8000)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // lake compaction plan over a manifest proxy (dir = source, file =
    // zero-padded doc id, bytes = n_chars): greedy contiguous byte-budget
    // groups per directory
    "layout_compaction" -> ((s, d) =>
      sources.LakeLayout.compactionPlan(
          Tables.documents(s, d).select(
            col("source").as("dir"),
            lpad(col("doc_id").cast("string"), 6, "0").as("file"),
            col("n_chars").as("bytes")),
          targetBytes = 2000L)
        .orderBy(col("dir"), col("group_no"))),

    // the APPLY half of lake OPTIMIZE (closing the plan/apply pair like
    // template-strip did): the corpus written deliberately fragmented
    // (16 files), compacted at a quarter-of-total byte target — multi-file
    // groups rewritten to one file each, single-file groups untouched —
    // then read back. The round-trip must be lossless (the oracle reads
    // the table directly); file-count reduction + idempotence are
    // spec-pinned (not SQL-expressible)
    "layout_compaction_apply" -> ((s, d) => {
      val dir = stagedDir("compactapply", d, "f16", fresh = true)
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        .repartition(16).write.mode("overwrite").parquet(dir)
      val total = sources.LakeLayout.parquetManifest(s, dir).map(_._3).sum
      sources.LakeLayout.compactionApply(s, dir, math.max(1L, total / 4))
      s.read.parquet(dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Z-order vs linear layout, measured: bucketize (n_chars, doc_id) to
    // 8 bits each, assign every doc its file under both layouts (Morton
    // key prefix vs n_chars-range), and report files/rows a mid-range box
    // predicate on EITHER dimension would touch. Linear prunes its sort
    // key only (8/64 files on the length box, all 64 on the id box);
    // Z-order prunes both (16/64 each) — the multi-dimension layout
    // decision quantified from the manifest alone
    "layout_zorder" -> ((s, d) =>
      sources.LakeLayout.zorderSkippingReport(
          Tables.documents(s, d), "n_chars", "doc_id")
        .orderBy(col("layout"), col("box"))),

    // ORC round-trip: the corpus through the other columnar format —
    // write + schema-enforced read must be lossless
    // schema evolution: two batches written with DIFFERENT schemas (batch 2
    // adds n_chars), read back through mergeSchema + partition discovery —
    // old rows surface with the new column null-filled (reported as -1),
    // the additive-column lifecycle a long-lived lake table goes through
    "src_schema_evolution" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("schevo", d, "v2", fresh = true)
      docs.select(col("doc_id"), col("source"))
        .where(col("doc_id") % 2 === 0)
        .write.parquet(s"$dir/t/batch=1")
      docs.select(col("doc_id"), col("source"), col("n_chars"))
        .where(col("doc_id") % 2 =!= 0)
        .write.parquet(s"$dir/t/batch=2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/t")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(-1L)).as("n_chars"),
          col("batch").cast("long").as("batch"))
        .orderBy(col("doc_id"))
    }),

    "src_orc_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("orc", d, "rt", fresh = true)
      sources.Formats.write(docs, dir, "orc")
      sources.Formats.read(s, dir, "orc", docs.schema)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // CSV round-trip: the row-oriented exchange format, configured lossless
    // (quotes/escape/multiLine — the corpus text carries commas, quotes and
    // newlines); read back through the SAME full text column so the check
    // exercises the quoting path, then project the summary columns
    "src_csv_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("csvrt", d, "rt", fresh = true)
      sources.Formats.write(docs, dir, "csv")
      sources.Formats.read(s, dir, "csv", docs.schema)
        .select(col("doc_id"), col("source"), col("n_chars"),
          length(col("text")).cast("long").as("text_len"))
        .orderBy(col("doc_id"))
    }),

    // batch corrupt-record ingest — the BATCH sibling of the streaming
    // dead-letter split, matching the reference's failed-article
    // quarantine (src/main.py:122-135): a planted-dirty JSON dir (every
    // 13th doc's line is malformed — truncated JSON on even ids, non-JSON
    // garbage on odd) reads back PERMISSIVE with _corrupt_record. Valid
    // rows survive intact per source; malformed lines group under
    // '_quarantine' with their raw bytes preserved VERBATIM (corrupt_chars
    // proves it) — the read never dies, the job keeps going
    "src_corrupt_records" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val docs = Tables.documents(s, d)
      val dir = stagedDir("jsondirty", d, "m13", fresh = true)
      val line = when(col("doc_id") % 13 === 0,
          when(col("doc_id") % 2 === 0,
            concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"truncated")))
            .otherwise(concat(lit("### corrupt record "), col("doc_id"))))
        .otherwise(to_json(struct(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text"))))
      docs.select(line.as("value")).write.mode("overwrite").text(dir)
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("source", StringType).add("n_chars", LongType)
        .add("text", StringType)
      sources.Formats.readJsonQuarantine(s, dir, schema)
        .groupBy(when(col("_corrupt_record").isNotNull, "_quarantine")
          .otherwise(col("source")).as("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
          coalesce(sum(length(col("_corrupt_record")).cast("long")), lit(0L))
            .as("corrupt_chars"))
        .orderBy(col("source"))
    }),

    // the CUSTOM DataSourceV2 connector (S1's continuation-cursor mapping,
    // SURVEY §2.1): corpus staged once per session into the chunk format,
    // read back through graft-corpus with a pushed doc_id range + lang
    // equality and a pruned projection — row-identical to the same
    // filter/projection over the parquet table. The reader applies pushed
    // filters before base64-decoding text, so the pruned/filtered scan
    // reads strictly less than the full table (DataSourceV2Spec pins the
    // plan-side evidence; this oracle pins the values)
    "src_custom_source" -> ((s, d) => {
      val dir = stagedDir("dsv2", d, "chunks8", fresh = false)
      if (!stagedThisSession.contains(dir)) {
        sources.CorpusSourceV2.stage(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("lang"), col("text")), dir, chunks = 8)
        stagedThisSession.add(dir)
      }
      s.read.format("graft-corpus").option("path", dir).load()
        .where(col("lang") === "en" && col("doc_id") < 400)
        .select(col("doc_id"), col("source"),
          length(col("text")).cast("long").as("text_chars"))
        .orderBy(col("doc_id"))
    }),

    // lake layout round-trip: write the corpus lang-partitioned +
    // length-sorted, read it back through partition pruning (the scan
    // only opens lang=en/ — PlanAuditSpec proves the file count)
    "layout_pruned_scan" -> ((s, d) => {
      val dir = stagedDir("layout", d, "opt", fresh = true)
      sources.LakeLayout.writeOptimized(Tables.documents(s, d), dir)
      sources.LakeLayout.read(s, dir)
        .where(col("lang") === "en")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // unicode cleanup over planted dirty text (curly quotes, long dash,
    // NBSP, zero-width, a control char): canonicalization before
    // hash-based dedup
    "p13_normalize_unicode" -> ((s, d) => {
      val dirty = concat(lit("\u201Cquoted\u201D \u2013 "), col("text"),
        lit("\u00A0tail\u200B\u0007"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          normalizeUnicode(dirty).as("clean"))
        .select(col("doc_id"), contentHash(col("clean")).as("clean_hash"),
          length(col("clean")).cast("long").as("clean_len"))
        .orderBy(col("doc_id"))
    }),

    // redirect-chain resolution (the set form of the reference's F5
    // redirect hop): planted chains doc_id → doc_id-1 within each 8-block,
    // resolved to the chain end by O(log) pointer doubling
    "p12_redirect_resolve" -> ((s, d) => {
      val redirects = Tables.documents(s, d)
        .where(col("doc_id") % 8 =!= 0)
        .select(col("doc_id").as("id"), (col("doc_id") - 1).as("target"))
      ArticleOps.resolveRedirects(redirects).orderBy(col("id"))
    }),

    // 2-core of the hub-star + hub-CYCLE doc graph: every leaf peels, the
    // closed hub cycle survives at degree 2 (a path would peel to nothing)
    "graph_kcore" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hubs = docs.groupBy(col("source")).agg(min(col("doc_id")).as("hub"))
      val mem = docs.join(hubs, Seq("source"))
        .where(col("doc_id") =!= col("hub"))
        .select(col("doc_id").as("doc_a"), col("hub").as("doc_b"))
      val hw = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
      val ring = hubs.withColumn("nxt", lead(col("hub"), 1).over(hw))
        .where(col("nxt").isNotNull)
        .select(col("hub").as("doc_a"), col("nxt").as("doc_b"))
      val wrap = hubs.agg(expr("max_by(hub, source)").as("doc_a"),
        expr("min_by(hub, source)").as("doc_b"))
      operators.Graphs.kCore(mem.unionByName(ring).unionByName(wrap), k = 2)
        .orderBy(col("node"))
    }),

    // personalized PageRank on the same planted doc graph, seeded at the
    // doc-0 hub: rank mass must concentrate around the seed's community
    "graph_ppr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hubs = docs.groupBy(col("source")).agg(min(col("doc_id")).as("hub"))
      val mem = docs.join(hubs, Seq("source"))
        .where(col("doc_id") =!= col("hub"))
        .select(col("doc_id").as("x"), col("hub").as("y"))
      val star = mem.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(mem.select(col("y").as("src"), col("x").as("dst")))
      val hw = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
      val ring0 = hubs.withColumn("nxt", lead(col("hub"), 1).over(hw))
        .where(col("nxt").isNotNull)
        .select(col("hub").as("src"), col("nxt").as("dst"))
      val ring = ring0.unionByName(
        ring0.select(col("dst").as("src"), col("src").as("dst")))
      val edges = star.unionByName(ring).withColumn("w", lit(1L))
      val seeds = docs.where(col("doc_id") === 0L)
        .select(col("doc_id").as("node"))
      operators.Graphs.graphRankPersonalized(edges, seeds, iters = 10)
        .orderBy(col("node"))
    }),

    // per-node triangle counts over the near-dup pair graph: clique
    // (template family) vs chain (drift) — the dedup-report distinction
    "graph_triangles" -> ((s, d) => {
      val pairs = operators.Dedup.ngramJaccardPairs(Tables.documents(s, d),
        cfg.ngramN, cfg.minJaccardX10000)
      operators.Graphs.triangleCounts(pairs).orderBy(col("node"))
    }),

    // TextRank: fixed-point integer PageRank over the word co-occurrence
    // graph, 10 damped rounds — graph-centrality keyword ranking; the
    // oracle replays the identical integer recurrence as unrolled CTEs
    "ta_textrank" -> ((s, d) =>
      operators.TextAnalysis.textRank(Tables.documents(s, d),
        vocabCap = 500, iters = 10, k = 50)),

    // general graphRank over a planted doc graph (per-source hub stars +
    // a hub ring): hubs must outrank leaves; the full rank vector is
    // hash-gated against the unrolled-CTE replay
    "graph_rank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hubs = docs.groupBy(col("source")).agg(min(col("doc_id")).as("hub"))
      val mem = docs.join(hubs, Seq("source"))
        .where(col("doc_id") =!= col("hub"))
        .select(col("doc_id").as("x"), col("hub").as("y"))
      val star = mem.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(mem.select(col("y").as("src"), col("x").as("dst")))
      val hw = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
      val ring0 = hubs.withColumn("nxt", lead(col("hub"), 1).over(hw))
        .where(col("nxt").isNotNull)
        .select(col("hub").as("src"), col("nxt").as("dst"))
      val ring = ring0.unionByName(
        ring0.select(col("dst").as("src"), col("src").as("dst")))
      operators.Graphs
        .graphRank(star.unionByName(ring).withColumn("w", lit(1L)), iters = 10)
        .orderBy(col("node"))
    }),

    // PageRank over edges EXTRACTED FROM WIKITEXT — the composition a wiki
    // analysis actually runs (parse [[links]] → edge list → rank), not a
    // pre-made edge table: planted markup gives every doc a hub link +
    // successor link, ArticleOps.wikiLinkEdges parses them (piped labels,
    // red links past the corpus edge kept as rank sinks), graphRank runs
    // the same 10-round fixed-point recurrence as graph_rank
    "graph_wikilinks" -> ((s, d) => {
      val h = col("doc_id") - (col("doc_id") % 8)
      val wt = concat(lit("See "),
        when(col("doc_id") % 8 =!= 0,
          concat(lit("[[Doc-"), h, lit("|hub page]] and "))).otherwise(lit("")),
        lit("[[Doc-"), col("doc_id") + 1, lit("]] for more details."))
      val edges = ArticleOps.wikiLinkEdges(
        Tables.documents(s, d).select(col("doc_id"), wt.as("wt")), col("wt"))
      operators.Graphs.graphRank(edges.withColumn("w", lit(1L)), iters = 10)
        .orderBy(col("node"))
    }),

    // degree assortativity over the same planted graph: hub-and-spoke
    // structure must report strongly NEGATIVE r (hubs bond to leaves) —
    // the one-number structural summary next to rank/triangles/k-core
    "graph_assortativity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hubs = docs.groupBy(col("source")).agg(min(col("doc_id")).as("hub"))
      val mem = docs.join(hubs, Seq("source"))
        .where(col("doc_id") =!= col("hub"))
        .select(col("doc_id").as("x"), col("hub").as("y"))
      val star = mem.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(mem.select(col("y").as("src"), col("x").as("dst")))
      val hw = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
      val ring0 = hubs.withColumn("nxt", lead(col("hub"), 1).over(hw))
        .where(col("nxt").isNotNull)
        .select(col("hub").as("src"), col("nxt").as("dst"))
      val ring = ring0.unionByName(
        ring0.select(col("dst").as("src"), col("src").as("dst")))
      operators.Graphs.assortativity(star.unionByName(ring))
    }),

    // community detection by deterministic label propagation over the
    // same planted doc graph: per-source star communities must coalesce
    // onto their hub labels, with the min label flooding the hub ring —
    // the near-linear community primitive next to rank/triangles/k-core
    "graph_communities" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hubs = docs.groupBy(col("source")).agg(min(col("doc_id")).as("hub"))
      val mem = docs.join(hubs, Seq("source"))
        .where(col("doc_id") =!= col("hub"))
        .select(col("doc_id").as("x"), col("hub").as("y"))
      val star = mem.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(mem.select(col("y").as("src"), col("x").as("dst")))
      val hw = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
      val ring0 = hubs.withColumn("nxt", lead(col("hub"), 1).over(hw))
        .where(col("nxt").isNotNull)
        .select(col("hub").as("src"), col("nxt").as("dst"))
      val ring = ring0.unionByName(
        ring0.select(col("dst").as("src"), col("src").as("dst")))
      operators.Graphs.labelPropagation(star.unionByName(ring), iters = 4)
        .orderBy(col("node"))
    }),

    // corpus top-k vocabulary (tokenizer-training precursor): hash agg +
    // TakeOrderedAndProject — no global sort
    "ta_vocab" -> ((s, d) =>
      operators.TextAnalysis.vocabulary(Tables.documents(s, d), 100)),

    // first BPE merge iteration: adjacent char-pair counts weighted by
    // word frequency — the tokenizer-training primitive proper
    "ta_bpe_pairs" -> ((s, d) =>
      operators.TextAnalysis.bpePairCounts(Tables.documents(s, d), 50)),

    // the full iterative BPE trainer, 5 merge rounds: each round counts
    // pairs over the checkpointed vocab, picks the (cnt DESC, x, y) top
    // pair, and greedily re-segments — the merge table IS the tokenizer
    // artifact; the oracle replays every round
    "ta_bpe_train" -> ((s, d) =>
      operators.TextAnalysis.bpeTrain(Tables.documents(s, d), 5)
        .orderBy(col("merge_no"))),

    // inference with the trained tokenizer: apply the 5 merges in order to
    // every token and bill per-doc BPE symbols (the oracle re-trains and
    // re-applies, so train → segment round-trips cross-engine). Runs the
    // codegen'd one-expression segmenter; the fold-equivalence spec pins
    // it to the composed form the oracle mirrors.
    "ta_bpe_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = operators.TextAnalysis.bpeTrain(docs, 5)
        .orderBy(col("merge_no")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      operators.TextAnalysis.bpeSegmentCountsFast(docs, merges)
        .orderBy(col("doc_id"))
    }),

    // the tokenizer as a persisted artifact: train once, write the merge
    // table, segment anywhere from the parquet — the production tokenizer
    // lifecycle (the sim_bm25_index pattern); must equal ta_bpe_segment
    "ta_bpe_artifact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("bpe-merges", d, "m5", fresh = true)
      operators.TextAnalysis.saveBpeMerges(
        operators.TextAnalysis.bpeTrain(docs, 5), dir)
      operators.TextAnalysis.bpeSegmentCountsFast(docs,
          operators.TextAnalysis.loadBpeMerges(s, dir))
        .orderBy(col("doc_id"))
    }),

    // tokenizer fertility per source: BPE symbols per whitespace word —
    // the multilingual-fairness metric (trained merges, codegen'd apply)
    "ta_bpe_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = operators.TextAnalysis.bpeTrain(docs, 5)
        .orderBy(col("merge_no")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      operators.TextAnalysis.bpeFertility(docs, merges)
        .orderBy(col("source"))
    }),

    // Count-Min sketch term counts probed at the exact top-20 vocabulary:
    // the frequency sketch (HLL=a9, KLL=a15b siblings); sum-merged
    // counters make it partitioning-independent, hence oracle-EXACT
    "a17_cms_counts" -> ((s, d) =>
      operators.TextAnalysis.cmsTermCounts(Tables.documents(s, d))),

    // sentence-shape stats over planted sentence boundaries (the corpus
    // text has none): Gopher-style document-form signals
    "ta_sentences" -> ((s, d) => {
      val planted = Tables.documents(s, d).withColumn("text",
        regexp_replace(
          regexp_replace(col("text"), " (spark|data|join) ", ". $1 "),
          " (table|row) ", "! $1 "))
      operators.TextAnalysis.sentenceStats(planted).orderBy(col("doc_id"))
    }),

    // sliding sentence-window RAG passages (w=3, stride=2 — overlap 1)
    // over the same planted sentence boundaries as ta_sentences
    "rag_passages" -> ((s, d) => {
      val planted = Tables.documents(s, d).withColumn("text",
        regexp_replace(
          regexp_replace(col("text"), " (spark|data|join) ", ". $1 "),
          " (table|row) ", "! $1 "))
      operators.TextAnalysis.ragPassages(planted, w = 3, stride = 2)
        .orderBy(col("doc_id"), col("passage_idx"))
    }),

    // language-consistency audit: per (source, declared lang), classifier
    // agreement / abstention / mismatch counts
    "ta_lang_mismatch" -> ((s, d) =>
      operators.TextAnalysis.langMismatchReport(Tables.documents(s, d))
        .orderBy(col("source"), col("actual_lang"))),

    // quality calibration: per (source, within-source quality quartile),
    // dup burden + quality/char mass — does the score separate the corpus?
    "ta_quality_calibration" -> ((s, d) =>
      operators.TextAnalysis.qualityCalibration(Tables.documents(s, d))
        .orderBy(col("source"), col("quartile"))),

    // closed-form model TRAINING in one aggregation pass: 3×3 integer
    // normal equations solved exactly by Cramer's rule — the distillation
    // step of a quality-filter pipeline, with training itself
    // oracle-checked bit for bit (no SGD loop, no floats, no learning rate)
    "ta_train_lsq" -> ((s, d) =>
      operators.Classifier.leastSquaresFit(
        operators.Classifier.shapeFeatures(Tables.documents(s, d)))),

    // the trained model scoring its training corpus (broadcast one-row
    // model): per-doc margin, prediction, correctness
    "ta_train_lsq_score" -> ((s, d) => {
      val feats = operators.Classifier.shapeFeatures(Tables.documents(s, d))
      operators.Classifier.leastSquaresScore(feats,
          operators.Classifier.leastSquaresFit(feats))
        .orderBy(col("doc_id"))
    }),

    // the model card: per-source accuracy of the distilled classifier
    "ta_train_lsq_eval" -> ((s, d) => {
      val feats = operators.Classifier.shapeFeatures(Tables.documents(s, d))
      operators.Classifier.accuracyBySource(
          operators.Classifier.leastSquaresScore(feats,
            operators.Classifier.leastSquaresFit(feats)))
        .orderBy(col("source"))
    }),

    // fastText-style hashed-ngram Naive Bayes — the model-based quality
    // filter DCLM/CCNet-class pipelines actually run: token+bigram
    // occurrences hashed into a fixed 1024-bucket space, add-one-smoothed
    // log-odds weights fixed to ×1e6 BIGINT, scored back over the corpus
    // (per-doc log-posterior odds + prediction). The oracle replays
    // TRAINING end to end — counts, totals, weights, prior — not just the
    // scoring pass. One bounded groupBy + broadcast weight join; the
    // corpus never shuffles on anything wider than ids
    "ta_train_hashed" -> ((s, d) => {
      val feats = operators.Classifier.hashedNgramFeatures(
        Tables.documents(s, d), buckets = 1024)
      operators.Classifier.hashedNBScore(feats,
          operators.Classifier.hashedNBFit(feats, buckets = 1024))
        .select(col("doc_id"), col("label"), col("score_x1e6"),
          col("predicted"), col("correct"))
        .orderBy(col("doc_id"))
    }),

    // the SERVING split of the hashed NB — the deployment shape of a
    // fastText-class quality filter (train once on a labeled snapshot,
    // freeze the ~1k-row model as a parquet artifact, score every future
    // batch against it): model trained on the base three-quarters,
    // persisted, read back FROZEN, scored over the incoming quarter.
    // Unseen buckets take the model's default weight — the coalesce leg
    // ta_train_hashed's train==score case never exercises
    "ta_hashed_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("nbmodel", d, "b1024-m4", fresh = true)
      operators.Classifier.hashedNBFit(
          operators.Classifier.hashedNgramFeatures(
            docs.where(col("doc_id") % 4 =!= 0), 1024), 1024)
        .write.mode("overwrite").parquet(dir)
      stagedThisSession.add(dir)
      operators.Classifier.hashedNBScore(
          operators.Classifier.hashedNgramFeatures(
            docs.where(col("doc_id") % 4 === 0), 1024),
          s.read.parquet(dir))
        .select(col("doc_id"), col("label"), col("score_x1e6"),
          col("predicted"), col("correct"))
        .orderBy(col("doc_id"))
    }),

    // the NB model card: per-source accuracy of the distilled hashed-ngram
    // classifier (the lsq eval's sibling over the richer feature family)
    "ta_hashed_eval" -> ((s, d) => {
      val feats = operators.Classifier.hashedNgramFeatures(
        Tables.documents(s, d), 1024)
      operators.Classifier.accuracyBySource(
          operators.Classifier.hashedNBScore(feats,
            operators.Classifier.hashedNBFit(feats, 1024)))
        .orderBy(col("source"))
    }),

    // the 9th driven streaming pipeline: hashed-NB scoring of a live doc
    // stream against the frozen model artifact — same base-train /
    // incoming-score split as ta_hashed_incr, so the accumulated stream
    // output shares its oracle verbatim. Model + source slices stage once
    // per session; the stream re-runs fully per invocation
    "stream_quality_nb" -> ((s, d) => {
      val key = "b1024-m4-s3"
      val probe = stagedDir("stream-nb", d, key, fresh = false)
      val stage =
        if (stagedThisSession.contains(probe)) probe
        else {
          val p = stagedDir("stream-nb", d, key, fresh = true)
          val docs = Tables.documents(s, d)
          operators.Classifier.hashedNBFit(
              operators.Classifier.hashedNgramFeatures(
                docs.where(col("doc_id") % 4 =!= 0), 1024), 1024)
            .write.mode("overwrite").parquet(s"$p/model")
          docs.where(col("doc_id") % 4 === 0)
            .select(col("doc_id"), col("source"), col("text"))
            .repartition(3).write.mode("overwrite").parquet(s"$p/src")
          stagedThisSession.add(p)
          p
        }
      val run = freshRunDir(stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("source", org.apache.spark.sql.types.StringType)
        .add("text", org.apache.spark.sql.types.StringType)
      streaming.Streams.streamingNBScore(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/model", s"$run/out", s"$run/ck", 1024)
        .awaitTermination()
      s.read.parquet(s"$run/out")
        .select(col("doc_id"), col("label"), col("score_x1e6"),
          col("predicted"), col("correct"))
        .orderBy(col("doc_id"))
    }),

    // decision-stump training: the exact best keep/drop threshold on the
    // cheap word-count signal against the teacher label, all candidates
    // evaluated in one prefix-sum pass over the distinct-value table
    "ta_train_stump" -> ((s, d) =>
      operators.Classifier.stumpFit(
        Tables.documents(s, d).select(
          graft.functions.TextFunctions.wordCount(col("text")).cast("long")
            .as("f"),
          operators.Classifier.qualityLabel().as("y")))),

    // Misra-Gries heavy hitters. The survivor set BELOW the N/(k+1)
    // guarantee line is merge-order dependent, so the raw sketch can't be
    // oracle-compared; instead the query emits, for every term the
    // guarantee REQUIRES to survive (exact freq > N/(k+1) — a
    // deterministic roster DuckDB recomputes), whether MG found it
    // (`mg_found`) and whether its estimate sits inside the guaranteed
    // band true-N/(k+1) <= est <= true (`bound_ok`), all in integer
    // arithmetic. A sketch losing a guaranteed hitter or over-counting
    // now FAILS the driver gate instead of hiding behind a rows-only
    // check (round-15 verdict task 5); MgSpec still pins the mechanism.
    "a22_mg_heavy_hitters" -> ((s, d) => {
      val mgK = 32
      val docs = Tables.documents(s, d)
      val mg = operators.TextAnalysis.mgHeavyHitters(docs, mgK)
      val terms = explodeTokens(docs, "term").where(col("term") =!= "")
      val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
      val tot = terms.agg(count(lit(1)).as("n_tot"))
      exact.crossJoin(broadcast(tot))
        .where(col("exact_cnt") * (mgK + 1) > col("n_tot"))
        .join(mg, Seq("term"), "left")
        .select(col("term"), col("exact_cnt"),
          col("est_cnt").isNotNull.as("mg_found"),
          (col("est_cnt").isNotNull && col("est_cnt") <= col("exact_cnt") &&
            col("est_cnt") * (mgK + 1) >=
              col("exact_cnt") * (mgK + 1) - col("n_tot")).as("bound_ok"))
        .orderBy(col("exact_cnt").desc, col("term"))
    }),

    // common user journeys: top-20 time-ordered event-type trigrams
    "a20_event_paths" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      operators.Relational.eventPaths(ev, n = 3, k = 20)
    }),

    // daily volume anomalies per event type: integer-exact 2-sigma flags
    "a21_volume_anomaly" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      operators.Relational.volumeAnomalies(ev)
        .orderBy(col("event_type"), col("day"))
    }),

    // ordered funnel: view → click-after-view → purchase-after-that-click,
    // per-user earliest-time frontier; k slim user-level joins, never an
    // events-with-events self-join
    "a18_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      operators.Relational.funnel(ev, Seq("view", "click", "purchase"))
        .orderBy(col("step_no"))
    }),

    // weekly retention triangle: cohort = first-active epoch-week,
    // activity counted on the DISTINCT (user, week) frame
    "a19_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      operators.Relational.retentionCohorts(ev)
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // bigram LM model table — the persisted artifact a CCNet-style LM
    // quality filter trains once and scores corpora against
    "ta_lm_model" -> ((s, d) =>
      operators.TextAnalysis.bigramModel(Tables.documents(s, d))
        .orderBy(col("x"), col("y"))),

    // LM quality score: mean fixed-point bigram probability per doc under
    // the corpus bigram model (+ the most surprising bigram)
    "ta_lm_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.TextAnalysis.lmScore(docs,
          operators.TextAnalysis.bigramModel(docs))
        .orderBy(col("doc_id"))
    }),

    // CCNet bucketing: per-LANGUAGE LM-score tertiles (head/middle/tail) —
    // the published keep-head-and-middle curation policy's input column;
    // per-language cuts so weakly-modeled languages aren't under-selected
    "ta_ccnet_buckets" -> ((s, d) =>
      operators.TextAnalysis.ccnetBuckets(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // PMI collocations: top adjacent-token pairs by fixed-point likelihood
    // ratio cnt·N/(c(x)·c(y)) — the multiword-expression detector; min-count
    // floor kills the rare-pair pathology
    "ta_pmi" -> ((s, d) =>
      operators.TextAnalysis.pmiCollocations(Tables.documents(s, d),
        minCount = 5L, k = 50)),

    // blocklist scrub: per-doc occurrence count + matched terms + keep/flag/
    // drop verdict for a literal wordlist (the C4-style content gate)
    "ta_blocklist" -> ((s, d) =>
      operators.TextAnalysis.blocklistScrub(Tables.documents(s, d),
          terms = Seq("dup", "slow", "unsafe"))
        .orderBy(col("doc_id"))),

    // the blocklist as a TABLE (broadcast join against the token explode)
    // — the 10^4-10^6-term scale path; row-identical to the literal form,
    // so it shares ta_blocklist's oracle verbatim
    "ta_blocklist_join" -> ((s, d) => {
      import s.implicits._
      operators.TextAnalysis.blocklistScrubJoin(Tables.documents(s, d),
          Seq("dup", "slow", "unsafe").toDF("term"))
        .orderBy(col("doc_id"))
    }),

    // composite quality gate (C4/Gopher-style rules): keep/drop + the first
    // failing rule as an auditable reason
    "ta_quality_filter" -> ((s, d) =>
      operators.TextAnalysis.qualityFilter(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // per-rule gate ablation: marginal violations, sole-blocker counts (the
    // docs a rule ALONE costs), and first-match attribution — the
    // threshold-tuning instrument read before touching qualityFilter knobs
    "ta_gate_ablation" -> ((s, d) =>
      operators.TextAnalysis.gateAblation(Tables.documents(s, d))
        .orderBy(col("rule"))),

    // relative quality gate: keep each source's top 60% by quality score
    // (per-source nearest-rank threshold, ties at the cut survive)
    "ta_quality_pct" -> ((s, d) =>
      operators.TextAnalysis.qualityPercentileGate(Tables.documents(s, d), 60)
        .orderBy(col("doc_id"))),

    // decontamination forensics: WHICH train doc leaked into which eval doc
    // (≥ minCommon shared 8-gram shingles) — the info needed to drop train
    // offenders instead of shrinking the eval set. Same split + planting as
    // `decontaminate`, so every planted copy must attribute to its source.
    "decontam_pairs" -> ((s, d) => {
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.attributionPairs(train, evalDocs,
          cfg.decontamNgramN, cfg.decontamMinCommon,
          broadcastEval = false) // split-shaped eval side, as above
        .orderBy(col("eval_doc"), col("train_doc"))
    }),

    // canary-string audit: benchmark sentinel GUIDs planted into every
    // 50th / 77th doc (the u1 planting pattern — the synthetic corpus has
    // no organic canaries); substring match, per (source, canary) counts
    "decontam_canary" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs.select(col("source"),
        when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" CANARY-GUID-aa11bb22")))
          .when(col("doc_id") % 77 === 0,
            concat(col("text"), lit(" CANARY-GUID-cc33dd44")))
          .otherwise(col("text")).as("text"))
      operators.Decontaminate.canaryScan(planted,
          Seq("CANARY-GUID-aa11bb22", "CANARY-GUID-cc33dd44"))
        .orderBy(col("source"), col("canary"))
    }),

    // the remedy-deciding rollup over the attribution pairs: which SOURCE
    // is leaking the benchmark (drop/de-weight the source) vs isolated
    // per-doc copies (drop the docs) — per source, flagged-doc counts,
    // touched eval docs, shared-shingle mass, and flagged_ppm
    "decontam_by_source" -> ((s, d) => {
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.contaminationBySource(train, evalDocs,
          cfg.decontamNgramN, cfg.decontamMinCommon,
          broadcastEval = false)
        .orderBy(col("source"))
    }),

    // ---- multimodal plumbing: binary payload + typed metadata + REAL
    // header-parse decode (PNG IHDR / JPEG SOF walk / WAV chunk walk over
    // planted format-true bytes; Spark round-trips the bytes, the oracle
    // recomputes expectations from the planting formulas) ----
    "mm_media_features" -> ((s, d) =>
      operators.Multimodal.mediaFeatures(s, Tables.documents(s, d))
        .orderBy(col("media_id"))),

    // image resize over the binary column: real header parse → integer
    // fit-inside plan → real container re-encode → re-parse proof; the
    // oracle recomputes the plan from the planting formulas while Spark
    // actually rewrites the bytes
    "mm_resize" -> ((s, d) =>
      operators.Multimodal.resizeImages(s,
          operators.Multimodal.toMediaTable(s, Tables.documents(s, d)),
          maxW = 128, maxH = 128)
        .orderBy(col("media_id"))),

    // uniform frame-sampling schedule parsed from the real ISO-BMFF
    // duration: k integer ticks per video, bounded explode
    "mm_frame_sample" -> ((s, d) =>
      operators.Multimodal.sampleFrames(s,
          operators.Multimodal.toMediaTable(s, Tables.documents(s, d)), k = 8)
        .orderBy(col("media_id"), col("frame_idx"))),

    // sample-accurate audio chunk schedule parsed from the real WAV
    // data-chunk layout: non-overlapping 256-frame windows, each with the
    // byte offset a featurizer seeks to — the audio twin of
    // mm_frame_sample
    "mm_audio_chunks" -> ((s, d) =>
      operators.Multimodal.audioChunks(s,
          operators.Multimodal.toMediaTable(s, Tables.documents(s, d)),
          chunkFrames = 256L)
        .orderBy(col("media_id"), col("chunk_no"))),

    // perceptual image dedup — the multimodal family's dedup signal:
    // planted near-dup bitmaps (4-member groups share dims + base
    // pattern, sparse per-member perturbation) wrapped in REAL PNG/JPEG
    // containers, average-hash fingerprinted from the actual body bytes
    // (8×8 sampled grid, mean-relative bits, four 16-bit bands), paired
    // through the banded equi-join + exact-Hamming probe (the
    // simhashPairs60 shape — never all-pairs). The oracle replays hash
    // and probe from the closed-form planting formulas
    "mm_phash_pairs" -> ((s, d) =>
      operators.Multimodal.phashPairsFromDocs(s, Tables.documents(s, d),
        minBandMatches = cfg.phashMinBandMatches)
        .orderBy(col("doc_a"), col("doc_b"))),

    // incremental image dedup: the persisted fingerprint index of the
    // existing images (media_id % 4 <> 3) probed by the new batch's
    // fingerprints at O(new × collisions) — equals the batch pHash run
    // restricted to pairs involving a new image (each planted near-dup
    // group pairs a base member with a new member, so the whole planted
    // signal crosses the index boundary)
    "mm_phash_incr" -> ((s, d) => {
      val bands = operators.Multimodal.imagePHash(s,
        operators.Multimodal.phashImageTable(s, Tables.documents(s, d)))
      val dir = stagedDir("phashidx", d, "v1", fresh = true)
      bands.where(col("media_id") % 4 =!= 3)
        .write.mode("overwrite").parquet(dir)
      stagedThisSession.add(dir)
      operators.Multimodal.phashPairsIncremental(
          s.read.parquet(dir), bands.where(col("media_id") % 4 === 3),
          minBandMatches = cfg.phashMinBandMatches)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // fingerprint-index DELETION — the image modality's takedown leg:
    // images media_id ≡ 1 (mod 8) are removed from the persisted band
    // index (one anti-join; fingerprints are per-image facts), then the
    // new quarter probes the survivor index: pairs equal the batch run
    // over the survivors restricted to new-member pairs — a taken-down
    // image can never resurface as a near-dup partner
    "mm_phash_del" -> ((s, d) => {
      val bands = operators.Multimodal.imagePHash(s,
        operators.Multimodal.phashImageTable(s, Tables.documents(s, d)))
      val survivors = operators.Multimodal.removeFromPhashIndex(
        bands.where(col("media_id") % 4 =!= 3),
        bands.where(col("media_id") % 8 === 1).select(col("media_id")))
      operators.Multimodal.phashPairsIncremental(survivors,
          bands.where(col("media_id") % 4 === 3),
          minBandMatches = cfg.phashMinBandMatches)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- streaming pipelines, driven end-to-end (AvailableNow) ----
    // These RUN the Structured Streaming foreachBatch pipelines — file
    // source split into micro-batches, checkpointed, output read back —
    // so their bench rows track the streaming legs' throughput, not just
    // the batch operators they compose (the stream==batch StreamingSpec
    // cases prove the equivalence these oracles rely on).

    // the IMAGE-modality curation flagship: plant/decode real containers
    // → aHash fingerprints → banded near-dup pairs → O(log) star
    // clustering to canonical image ids → per-source dedup funnel
    // (images, canonical survivors, dropped dups) — the e2e_corpus shape
    // closed for the image modality, every stage an already-verified
    // operator composed into one plan
    "e2e_image_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = operators.Multimodal.phashPairsFromDocs(s, docs,
        minBandMatches = cfg.phashMinBandMatches)
      val clusters = operators.Dedup
        .dedupClustersStar(pairs, "doc_a", "doc_b")
      val imgs = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("source"))
      imgs.join(clusters, imgs("doc_id") === clusters("id"), "left")
        .select(col("source"),
          (coalesce(col("canonical_id"), col("doc_id")) === col("doc_id"))
            .cast("long").as("canon"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("canon")).as("n_canonical"),
          (count(lit(1)) - sum(col("canon"))).as("n_dropped"))
        .orderBy(col("source"))
    }),

    // the flagship's SCALE PATH: identical funnel through exact-
    // fingerprint pre-collapse — the banded join runs over distinct
    // fingerprints only (sf10-syn: 8k reps instead of 167k images; the
    // within-group quadratic pair mass never materializes) and star
    // clustering consumes rep-pairs ∪ member-edges, whose connected
    // components equal the full pair graph's. Same oracle verbatim
    "e2e_image_pipeline_scaled" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = operators.Multimodal.phashCollapsedEdges(
        operators.Multimodal.imagePHash(s,
          operators.Multimodal.phashImageTable(s, docs)),
        minBandMatches = cfg.phashMinBandMatches)
      val clusters = operators.Dedup
        .dedupClustersStar(edges, "doc_a", "doc_b")
      val imgs = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("source"))
      imgs.join(clusters, imgs("doc_id") === clusters("id"), "left")
        .select(col("source"),
          (coalesce(col("canonical_id"), col("doc_id")) === col("doc_id"))
            .cast("long").as("canon"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("canon")).as("n_canonical"),
          (count(lit(1)) - sum(col("canon"))).as("n_dropped"))
        .orderBy(col("source"))
    }),

    // the 11th driven pipeline runs through the CUSTOM DataSourceV2
    // connector's MicroBatchStream face: readStream over the staged chunk
    // corpus (offset = last-consumed chunk name, the persisted
    // continuation cursor), accumulated to parquet — the drained output
    // must be row-identical to the parquet table the chunks were staged
    // from
    "stream_custom_source" -> ((s, d) => {
      val stage = stagedDir("dsv2", d, "chunks8", fresh = false)
      if (!stagedThisSession.contains(stage)) {
        sources.CorpusSourceV2.stage(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("lang"), col("text")), stage, chunks = 8)
        stagedThisSession.add(stage)
      }
      val run = freshRunDir(stage)
      val q = s.readStream.format("graft-corpus").option("path", stage)
        .load()
        .select(col("doc_id"), col("source"), col("lang"),
          length(col("text")).cast("long").as("text_chars"))
        .writeStream.format("parquet")
        .option("path", s"$run/out")
        .option("checkpointLocation", s"$run/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$run/out").orderBy(col("doc_id"))
    }),

    // streaming near-dup: per-batch MinHash signatures appended to the
    // persisted index, new-vs-all band probe per micro-batch; the pair
    // stream over all batches must equal the one-shot batch minhashPairs
    "stream_near_dup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val stage = stagedDir("stream-ndup", d, "n3k16b4", fresh = true)
      copyTree(neardupSrcTemplate(s, d), stage)
      streaming.Streams.streamingNearDup(s,
          streaming.Streams.fileSource(s, s"$stage/src", docs.schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/pairs", s"$stage/ck")
        .awaitTermination()
      s.read.parquet(s"$stage/pairs")
        .select(col("doc_a"), col("doc_b"), col("est_jaccard_x100"))
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // streaming curation: per-source quality thresholds persisted once,
    // each micro-batch gated against them and hash-sharded on the way to
    // partitioned parquet — the continuous-ingest shape of ta_quality_pct
    "stream_curate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stage = stagedDir("stream-curate", d, "p60s16", fresh = true)
      copyTree(curateStreamTemplate(s, d), stage)
      streaming.Streams.streamingCurate(s,
          streaming.Streams.fileSource(s, s"$stage/src", docs.schema,
            maxFilesPerTrigger = 1),
          s"$stage/thresholds", s"$stage/out", s"$stage/ck", numShards = 16)
        .awaitTermination()
      s.read.parquet(s"$stage/out")
        // shard comes back via partition-column inference (int32) — re-cast
        // to the BIGINT the operator emitted
        .select(col("doc_id"), col("source"), col("quality_x10000"),
          col("q_threshold"), col("shard").cast("long").as("shard"))
        .orderBy(col("doc_id"))
    }),

    // streaming data-quality audit (the 5th driven pipeline): micro-batch
    // additive rule classes only (row predicates + static-ref FK — the
    // deliberately-absent `zh` makes fk_lang a REAL nonzero finding);
    // accumulated per-batch reports sum to the batch audit exactly
    "stream_dq" -> ((s, d) => {
      import s.implicits._
      import operators.DataQuality._
      val docs = Tables.documents(s, d)
      val stage = stagedDir("stream-dq", d, "r3", fresh = true)
      docs.repartition(3).write.mode("overwrite").parquet(s"$stage/src")
      val langs = Seq("en", "de", "fr", "es").toDF("lang") // zh absent
      val rules = Seq(
        RowRule("nchar_consistent",
          col("n_chars") === length(col("text")).cast("long")),
        RowRule("text_nonempty", length(col("text")) > 0),
        RefRule("fk_lang", "lang", langs, "lang"))
      streaming.Streams.streamingAudit(s,
          streaming.Streams.fileSource(s, s"$stage/src", docs.schema,
            maxFilesPerTrigger = 1),
          "documents", rules, s"$stage/out", s"$stage/ck")
        .awaitTermination()
      s.read.parquet(s"$stage/out")
        .groupBy(col("table_name"), col("check_name"))
        .agg(sum(col("violations")).as("violations"),
          sum(col("total")).as("total"))
        .withColumn("pass", col("violations") === 0L)
        .orderBy(col("check_name"))
    }),

    // streaming session windows driven end-to-end (the 4th driven
    // pipeline): time-sliced files keep the watermark trailing the data,
    // a far-future sentinel event per user flushes every real session
    // closed (the sentinel's own singleton session never emits), so the
    // accumulated Append output equals the batch session_window result —
    // a12b's oracle verbatim.
    // The slice files are STAGED ONCE per session (the from-artifact
    // discipline): the global ntile sort and 3 sequential slice writes are
    // test-harness cost, not operator cost — they were ~half the query's
    // time and re-ran on every invocation (Bench now medians 3 reps). The
    // STREAM itself re-runs fully every invocation against a fresh
    // checkpoint/output, so what is timed warm is the real pipeline:
    // 3 micro-batches (was 8 — slice count only shapes the harness; the
    // sentinel slice still arrives last, so emitted sessions are
    // identical) through the session-window state store.
    // stream-stream ATTRIBUTION join driven end-to-end (the 6th driven
    // pipeline): purchases and clicks as two watermarked file-source
    // streams over the same time-sliced files, the interval-bounded inner
    // join (the state-eviction bound), accumulated output equals the
    // batch bounded-range inner join exactly — time-ordered slices mean
    // the earlier click is always already in state when its purchase
    // arrives, so no flush sentinel is needed
    "stream_attribution" -> ((s, d) =>
      runStagedAttribution(s, d, "inner")
        .orderBy(col("event_id"), col("click_id"))),

    // LEFT OUTER stream-stream attribution — the state-expiry semantics
    // the inner join never exercises: an unmatched purchase emits with a
    // null click_id ONLY once the watermark proves no qualifying click
    // can still arrive. Accumulated output must equal the batch LEFT
    // bounded-range join (oracle below); StreamingSpec additionally pins
    // that every null-leg row appears exactly once.
    "stream_attribution_outer" -> ((s, d) =>
      runStagedAttribution(s, d, "left_outer")
        .orderBy(col("event_id"), col("click_id"))),

    "stream_sessions" -> ((s, d) => {
      val key = s"g${cfg.sessionGapMinutes}-s3"
      val probe = stagedDir("stream-sessions", d, key, fresh = false)
      val stage =
        if (stagedThisSession.contains(probe)) probe
        else {
          val p = stagedDir("stream-sessions", d, key, fresh = true)
          val ev = Tables.events(s, d)
            .select(col("user_id"), col("ts"), col("event_id"))
          // every user gets the SAME sentinel timestamp (global max +
          // 2 days): the final watermark is sentinel − delay, so no
          // sentinel session's `end + gap` is ever behind it — per-user
          // sentinels would leak, since early users' sentinels close
          // against the global watermark
          val gmax = ev.agg(max(col("ts")).as("mts"))
          val sent = ev.select(col("user_id")).distinct()
            .crossJoin(broadcast(gmax))
            .select(col("user_id"),
              (col("mts") + expr("INTERVAL 2 DAYS")).as("ts"),
              lit(-1L).as("event_id"))
          val all = ev.unionByName(sent)
          // sequential time-sliced writes: the file source orders by mod
          // time, so each micro-batch covers the next slice and the
          // watermark never passes unseen events (see StreamingSpec's
          // sliced-write rationale); the ntile assignment is materialized
          // ONCE so the slice writes don't re-run the global sort
          val sliced = all.withColumn("_p", ntile(3).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("ts"), col("event_id"))))
            .localCheckpoint()
          (1 to 3).foreach { n =>
            sliced.where(col("_p") === n).drop("_p").coalesce(1)
              .write.mode("append").parquet(s"$p/src")
            Thread.sleep(10)
          }
          stagedThisSession.add(p)
          p
        }
      // fresh checkpoint + sink per run: the streaming query genuinely
      // reprocesses all slices every invocation (a reused checkpoint would
      // see committed offsets and stream nothing)
      val run = freshRunDir(stage)
      // schema from the live table projection (no job) — events.ts has
      // shipped as both TIMESTAMP and TIMESTAMP_NTZ across testdata
      // generations, so a hardcoded type would break on regen
      val schema = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id")).schema
      streaming.Streams.runSessionsToParquet(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$run/out", s"$run/ck", gapMinutes = cfg.sessionGapMinutes)
        .awaitTermination()
      s.read.parquet(s"$run/out")
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    // streaming decontamination: the persisted train shingle universe is
    // probed per micro-batch of arriving eval docs; the accumulated report
    // must equal the batch overlapReport (same oracle SQL) — the
    // continuous-holdout-screening shape of `decontaminate`
    "stream_decontam" -> ((s, d) => {
      val (_, evalDocs) = plantedEvalSplit(s, d)
      val stage = stagedDir("stream-decon", d, "n8o5000", fresh = true)
      copyTree(decontamStreamTemplate(s, d), stage)
      val ev = evalDocs.select(col("doc_id"), col("text"))
      streaming.Streams.streamingDecontaminate(s,
          streaming.Streams.fileSource(s, s"$stage/src", ev.schema,
            maxFilesPerTrigger = 1),
          s"$stage/universe", s"$stage/report", s"$stage/ck",
          cfg.decontamNgramN, cfg.decontamMinOverlapX10000)
        .awaitTermination()
      s.read.parquet(s"$stage/report")
        .select(col("doc_id"), col("n_sh"), col("n_hit"),
          col("overlap_x10000"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // ---- corpus assembly: split / mixture reweighting / packing ----
    // all RNG-free (portable hash of the doc id), so assignment is stable
    // across runs, engines, and partitionings — the reproducibility a
    // 100 TB split needs (seeded rand() is not repartition-stable)
    "mix_split" -> ((s, d) =>
      operators.Mixing.withSplit(Tables.documents(s, d),
          trainPct = cfg.splitTrainPct, valPct = cfg.splitValPct)
        .groupBy(col("source"), col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("split"))),

    "mix_sample" -> ((s, d) =>
      operators.Mixing.sampleBySource(Tables.documents(s, d),
          Map("src0" -> 100, "src1" -> 25), defaultPct = 50)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))),

    // leakage-proof split: near-dup clusters (3-gram Jaccard pairs →
    // connected components) split as ONE unit — a doc and its near-copy
    // can never straddle train/test
    "mix_split_safe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = operators.Dedup.dedupClusters(
        operators.Dedup.ngramJaccardPairs(docs, cfg.ngramN, cfg.minJaccardX10000))
      operators.Mixing.withClusterSafeSplit(docs, clusters,
          trainPct = cfg.splitTrainPct, valPct = cfg.splitValPct)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // writer-side shard assignment: reproducible hash sharding into 16
    // output shards + the balance report (docs and BPE tokens per shard)
    "mix_shards" -> ((s, d) =>
      operators.Mixing.shardSummary(Tables.documents(s, d), 16, metric = "bpe")
        .orderBy(col("shard"))),

    // one-row shard-balance verdict: max/min/mean tokens per shard and the
    // max/mean skew ratio — the straggler bound a 100 TB shard-out reads
    "mix_shard_skew" -> ((s, d) =>
      operators.Mixing.shardSkew(Tables.documents(s, d), 16, metric = "bpe")),

    // serpentine balanced sharding — the ordered sibling of mix_shards'
    // hash dealing: global (tokens desc, id) rank via distributed
    // zipWithIndex, boustrophedon rounds; the spec pins spread ≤ hash
    "mix_shards_lpt" -> ((s, d) =>
      operators.Mixing.lptShards(Tables.documents(s, d), 16, metric = "bpe")
        .orderBy(col("shard"))),

    // the compute bill of three batch-formation policies (naive hash order
    // vs power-of-two length bands vs exact length order): batches, useful
    // tokens, billed cost n×max, padding ppm — why length bucketing exists
    "pack_waste" -> ((s, d) =>
      operators.Mixing.batchPaddingReport(Tables.documents(s, d), 8, "bpe")
        .orderBy(col("policy"))),

    // the dataset card in ONE long-format plan: per source, the volume /
    // quality / concentration / diversity instruments side by side —
    // the artifact a corpus snapshot publishes next to its data
    "e2e_dataset_card" -> ((s, d) =>
      operators.Summaries.datasetCard(Tables.documents(s, d), cfg.ngramN)
        .orderBy(col("source"), col("metric"))),

    // token-concentration Lorenz deciles per source: cumulative token share
    // of the top-d/10 docs by length — the inequality curve a length-cap /
    // chunking-policy review reads
    "mix_lorenz" -> ((s, d) =>
      operators.Mixing.lorenzDeciles(Tables.documents(s, d), metric = "ws")
        .orderBy(col("source"), col("decile"))),

    // exact-k uniform sample by smallest salted hash (TakeOrderedAndProject
    // — per-partition heaps, no global sort); deterministic unlike sample()
    "mix_sample_k" -> ((s, d) =>
      operators.Mixing.sampleExactK(Tables.documents(s, d), 25)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))),

    // token-budget sampling: mixtures are specified in tokens, not docs —
    // per source, keep docs in salted-hash order until the BPE-token
    // budget is crossed (src0 gets 1200 tokens, everyone else 600 —
    // roughly half of each source's ~1400-token volume at sf0.01)
    "mix_token_budget" -> ((s, d) =>
      operators.Mixing.sampleByTokenBudget(Tables.documents(s, d),
          Map("src0" -> 1200L), defaultBudget = 600L, metric = "bpe")
        .select(col("doc_id"), col("source"), col("tok_cnt"), col("cum_tokens"))
        .orderBy(col("doc_id"))),

    // largest-remainder (Hamilton) apportionment: whole-token per-source
    // quotas summing EXACTLY to the budget (10007 chosen indivisible so
    // the remainder distribution is exercised)
    "mix_quota" -> ((s, d) =>
      operators.Mixing.quotaAllocation(Tables.documents(s, d), 10007L)
        .orderBy(col("source"))),

    // soft-dedup token budgeting: per-source raw vs duplicate-discounted
    // token mass (Σ wc·weight) — what a mixture planner budgets against
    // when repeated content is reweighted instead of removed
    "mix_soft_budget" -> ((s, d) =>
      operators.Mixing.softTokenBudget(Tables.documents(s, d), cfg.ngramN)
        .orderBy(col("source"))),

    // length-bucketed batches: power-of-two token-length bands, salted-hash
    // batch fill, per-batch padding-waste accounting
    "pack_batches" -> ((s, d) =>
      operators.Mixing.lengthBucketedBatches(Tables.documents(s, d),
          batchSize = 8, metric = "bpe")
        .orderBy(col("band"), col("batch_no"))),

    // semantic decontamination: planted near-copy eval vectors must be
    // flagged against their train sources by banded cross-side LSH +
    // exact cosine (the paraphrase leak n-grams can't see)
    "decontam_semantic" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
      val evalSide = operators.Dedup.withNearCopies(base)
        .where(col("vec_id") >= 1000000L)
      operators.Decontaminate.semanticOverlap(base, evalSide, 900000L)
        .orderBy(col("eval_id"), col("train_id"))
    }),

    // per-dimension embedding stats: the embedding-space drift monitor
    "ann_dim_stats" -> ((s, d) =>
      operators.Similarity.embeddingStats(Tables.embeddings(s, d))
        .orderBy(col("dim"))),

    // per-label mean pairwise cosine via the centroid identity — the O(d)
    // one-pass compactness readout (collapsed label ⇒ near-dup mass) read
    // BEFORE paying for SemDeDup clustering
    "ann_diversity" -> ((s, d) =>
      operators.Similarity.labelDiversity(Tables.embeddings(s, d))
        .orderBy(col("label"))),

    // BM25 lexical retrieval: docs 0-4 as query bags over the inverted
    // index, fixed-point integer scoring, df-capped postings. Runs over
    // the Zipfian synthetic corpus (engine-exact doc_id-derived re-text,
    // ~8k-term log-uniform vocabulary): the driver table's ~31-term
    // vocabulary df-caps away entirely past sf0.01, which made this cell
    // correct-but-empty at bench scale — head terms now cap away like
    // true stopwords while the mid-frequency tail genuinely ranks
    "sim_bm25" -> ((s, d) =>
      operators.Similarity.bm25TopK(
          operators.TextAnalysis.syntheticZipfCorpus(Tables.documents(s, d)),
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5,
          maxDf = cfg.retrievalMaxDf)
        .orderBy(col("query_id"), col("rank"))),

    // snippet extraction: the 10-token window with the most query-term
    // hits per doc (earliest on ties) — retrieval's display half
    "sim_snippets" -> ((s, d) =>
      operators.Similarity.snippets(
          Tables.documents(s, d).where(col("doc_id") < 50),
          queryTerms = Seq("spark", "join", "data"), windowTokens = 10)
        .orderBy(col("doc_id"))),

    // the BM25 index as a persisted artifact: build postings/doclen/stats
    // once, query without touching the corpus — must equal sim_bm25 exactly
    "sim_bm25_index" -> ((s, d) => {
      val dir = stagedDir("bm25", d, "v2-zipf", fresh = true)
      operators.Similarity.buildBm25Index(
        operators.TextAnalysis.syntheticZipfCorpus(Tables.documents(s, d)),
        dir, maxDf = cfg.retrievalMaxDf)
      operators.Similarity.bm25QueryIndex(s, dir,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SHARD-PARALLEL BM25 serving — the 100 TB shape: the corpus splits
    // by doc hash into 4 complete sub-indexes (independent leases and
    // segment logs; per-shard maintenance cost tracks the slice, never
    // the total); the query fans out and merges df/n_docs/tot_len as
    // associative integer sums, so shard count changes no score — the
    // UNSHARDED oracle SQL verbatim
    "sim_bm25_sharded" -> ((s, d) => {
      val dir = stagedDir("bm25shard", d, "v1-zipf-s4", fresh = true)
      copyTree(bm25ShardedZipfTemplate(s, d), dir)
      operators.Similarity.bm25QueryIndexSharded(s, dir,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 18th driven pipeline: streaming maintenance of the SHARDED
    // index — the base corpus built as sub-indexes, the incoming
    // quarter arriving as a micro-batch stream, each batch routed by
    // doc hash and absorbed through the owning shards' OWN exactly-once
    // ledgers (shards proceed independently — the parallel-maintenance
    // claim); the drained fan-out query equals the full-corpus rebuild
    // (sim_bm25_incr's oracle verbatim). BENCH shape: 2 shards × 2
    // micro-batches (see stream_ann_sharded's note — the 4×3 shape was
    // pure fixed-FS gate wall; ShardedIndexSpec keeps the 4-shard
    // claims).
    "stream_bm25_sharded" -> ((s, d) => {
      val stage = stagedDir("stream-bm25-sh", d, "v1-m2-s2", fresh = true)
      copyTree(bm25Sharded75Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
      streaming.Streams.streamingBm25UpdateSharded(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.bm25QueryIndexSharded(s, s"$stage/index",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // INCREMENTAL index maintenance — the retrieval family's missing
    // lifecycle leg (minhash/decontam/template/NB all have one): index
    // built on the base three-quarters, the incoming quarter ABSORBED by
    // updateBm25Index as an O(batch) segment append (new text scanned
    // once, nothing existing rewritten; df/doclen/stats aggregate from
    // the mergeable segments at query time, so cap eviction is decided
    // from the true merged counts), then queried. The oracle is the
    // FULL-corpus BM25 replay — update == rebuild is the whole claim.
    // Query ids 0 and 4 are themselves incrementally-added docs, so the
    // query bags exercise the merged postings both ways
    "sim_bm25_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("bm25incr", d, "v2-m4", fresh = true)
      copyTree(s"${bm2575Template(s, d)}/index", dir)
      operators.Similarity.updateBm25Index(s, dir,
        docs.where(col("doc_id") % 4 === 0))
      operators.Similarity.bm25QueryIndex(s, dir,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // BM25 index DELETION — the takedown leg lexical-side: docs doc_id ≡
    // 5 (mod 7) removed from the full-corpus index with no corpus access
    // (the deleted docs' own posting rows supply the per-term df
    // decrements); scoring over the survivors is exact, evicted terms
    // stay conservatively evicted (the documented upper-bound rule). The
    // oracle replays BM25 over the survivor corpus with the survivor df
    "sim_bm25_del" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("bm25del", d, "v1-m7", fresh = true)
      copyTree(bm25FullTemplate(s, d), dir)
      operators.Similarity.removeFromBm25Index(s, dir,
        docs.where(col("doc_id") % 7 === 5).select(col("doc_id")))
      stagedThisSession.add(dir)
      operators.Similarity.bm25QueryIndex(s, dir,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSM COMPACTION — the fold that amortizes the O(batch) appends and
    // O(deleted) takedowns: after the same takedown as sim_bm25_del, the
    // segment log (base + tombstones + negative decrements) is folded to
    // a single base segment — masked rows drop physically, the tombstone
    // tier empties — and the query must be bit-identical to the
    // uncompacted index (sim_bm25_del's oracle verbatim)
    "sim_bm25_compact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = stagedDir("bm25compact", d, "v2-m7", fresh = true)
      copyTree(bm25FullTemplate(s, d), dir)
      operators.Similarity.removeFromBm25Index(s, dir,
        docs.where(col("doc_id") % 7 === 5).select(col("doc_id")))
      operators.Similarity.compactBm25Index(s, dir)
      stagedThisSession.add(dir)
      operators.Similarity.bm25QueryIndex(s, dir,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 13th driven pipeline: streaming TAKEDOWN — delete requests
    // stream in as 3 micro-batches and each applies to the persisted
    // full-corpus index. Deletion is idempotent by construction (an
    // already-removed id has nothing left to subtract), so no ledger is
    // needed and the drained index equals the one-shot delete — the
    // oracle is sim_bm25_del's verbatim
    "stream_bm25_takedown" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stage = stagedDir("stream-takedown", d, "v1-m7-s3", fresh = true)
      copyTree(bm25FullTemplate(s, d), s"$stage/index")
      docs.where(col("doc_id") % 7 === 5).select(col("doc_id"))
        .repartition(3).write.mode("overwrite").parquet(s"$stage/src")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
      streaming.Streams.streamingTakedown(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.bm25QueryIndex(s, s"$stage/index",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the BATCHED takedown trigger — the scale cadence for frequent tiny
    // requests: each applied delete pays an index read to derive its df
    // decrements, but deletion is idempotent + associative, so pooling k
    // request batches into ONE applied delete divides that read cost by
    // k correctness-free. The 3 micro-batches stash to the pending pool
    // and apply as a single delete at the 3rd; the explicit post-stream
    // flush drains any tail. Equals the per-batch cadence and the
    // one-shot delete — sim_bm25_del's oracle verbatim
    "stream_bm25_takedown_batched" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stage = stagedDir("stream-takedown-b", d, "v1-m7-s3-b3",
        fresh = true)
      copyTree(bm25FullTemplate(s, d), s"$stage/index")
      docs.where(col("doc_id") % 7 === 5).select(col("doc_id"))
        .repartition(3).write.mode("overwrite").parquet(s"$stage/src")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
      streaming.Streams.streamingTakedown(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck", batchEvery = 3)
        .awaitTermination()
      streaming.Streams.flushPendingTakedowns(s, s"$stage/index")
      operators.Similarity.bm25QueryIndex(s, s"$stage/index",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 10th driven streaming pipeline: BM25 index maintenance — the
    // incoming quarter arrives as a 3-micro-batch file stream and each
    // batch is absorbed into the persisted base index through the
    // exactly-once updateBm25IndexOnce ledger (replayed batch_ids no-op —
    // the dedupe layer the append-only contract defers to, driven live).
    // The drained artifact equals the full rebuild, so the accumulated
    // result shares sim_bm25_incr's full-corpus oracle verbatim. The
    // index is MUTATED by the run, so it stages fresh per invocation
    "stream_bm25_incr" -> ((s, d) => {
      val stage = stagedDir("stream-bm25", d, "v1-m4-s3", fresh = true)
      copyTree(bm2575Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
      streaming.Streams.streamingBm25Update(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.bm25QueryIndex(s, s"$stage/index",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the streamed maintenance loop with the LSM MERGE POLICY live:
    // same 3-batch absorb as stream_bm25_incr, but the in-loop
    // auto-compaction (fold when any component exceeds 2 segments) folds
    // the log mid-stream — read fan-in stays bounded while answers stay
    // bit-identical (compaction preserves them), so this shares
    // sim_bm25_incr's full-corpus rebuild oracle verbatim
    "stream_bm25_autocompact" -> ((s, d) => {
      val stage = stagedDir("stream-bm25-ac", d, "v2-m4-s3-c2", fresh = true)
      copyTree(bm2575Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
      streaming.Streams.streamingBm25Update(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck", autoCompactSegments = 2)
        .awaitTermination()
      operators.Similarity.bm25QueryIndex(s, s"$stage/index",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 12th driven pipeline: streaming ANN maintenance — the vector
    // twin of stream_bm25_incr: the incoming embedding quarter arrives as
    // a 3-micro-batch file stream, each batch absorbed into the persisted
    // base IVF+PQ index through the exactly-once ledger with FROZEN
    // quantizers. Per-vector argmin codes + associative coarse sums make
    // batch order immaterial, so the drained artifact equals the one-shot
    // incremental update and the query shares ann_index_incr's oracle
    // verbatim
    "stream_ann_incr" -> ((s, d) => {
      val stage = stagedDir("stream-ann", d, "p4m8b4r1-s3", fresh = true)
      copyTree(ann75Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
      streaming.Streams.streamingAnnUpdate(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.annQueryIndex(s, s"$stage/index",
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the ANN maintenance loop with the LSM merge policy live — the
    // vector twin of stream_bm25_autocompact: mid-stream folds bound the
    // segment log while the drained probe stays bit-identical to the
    // one-shot incremental update (ann_index_incr's oracle verbatim)
    "stream_ann_autocompact" -> ((s, d) => {
      val stage = stagedDir("stream-ann-ac", d, "p4m8b4r1-s3-c2", fresh = true)
      copyTree(ann75Template(s, d), stage)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
      streaming.Streams.streamingAnnUpdate(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck", autoCompactSegments = 2)
        .awaitTermination()
      operators.Similarity.annQueryIndex(s, s"$stage/index",
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the 14th driven pipeline: streaming ANN TAKEDOWN — the vector twin
    // of stream_bm25_takedown: delete requests stream in as 3
    // micro-batches and each applies to the persisted full-corpus IVF+PQ
    // index. Deletion is idempotent by construction (an already-removed
    // id has no rows left to anti-join, its coarse sums were already
    // subtracted), so no ledger is needed and the drained index equals
    // the one-shot delete — the oracle is ann_index_del's verbatim
    "stream_ann_takedown" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stage = stagedDir("stream-ann-takedown", d, "p4m8b4r1-m7-s3",
        fresh = true)
      copyTree(annFullTemplate(s, d), s"$stage/index")
      emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 10)
        .select(col("vec_id"))
        .repartition(3).write.mode("overwrite").parquet(s"$stage/src")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType)
      streaming.Streams.streamingAnnTakedown(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck")
        .awaitTermination()
      operators.Similarity.annQueryIndex(s, s"$stage/index",
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the BATCHED ANN takedown trigger — stream_bm25_takedown_batched's
    // vector twin: 3 request micro-batches pool in the pending sibling
    // and apply as ONE delete (one bucket-pruned negative-sums read
    // instead of three); idempotent + associative deletion makes the
    // drained index equal the one-shot delete — ann_index_del's oracle
    // verbatim
    "stream_ann_takedown_batched" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stage = stagedDir("stream-ann-takedown-b", d, "p4m8b4r1-m7-s3-b3",
        fresh = true)
      copyTree(annFullTemplate(s, d), s"$stage/index")
      emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 10)
        .select(col("vec_id"))
        .repartition(3).write.mode("overwrite").parquet(s"$stage/src")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType)
      streaming.Streams.streamingAnnTakedown(s,
          streaming.Streams.fileSource(s, s"$stage/src", schema,
            maxFilesPerTrigger = 1),
          s"$stage/index", s"$stage/ck", batchEvery = 3)
        .awaitTermination()
      streaming.Streams.flushPendingAnnTakedowns(s, s"$stage/index")
      operators.Similarity.annQueryIndex(s, s"$stage/index",
          cfg.annQueries, cfg.annK)
        .orderBy(col("query_id"), col("rank"))
    }),

    // hybrid retrieval: RRF-fuse the BM25 lexical ranking with the
    // feature-hashed vector ranking for the same query docs
    "sim_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lex = operators.Similarity.bm25TopK(docs,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10,
          maxDf = cfg.retrievalMaxDf)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val vec = operators.Similarity.hashedNeighbors(docs, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      operators.Similarity.rrfFuse(Seq(lex, vec), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // contrastive triplets: near-dup pairs become (anchor, positive) with
    // a hash-ring-bucketed deterministic negative — embedding-training
    // data mined straight from the dedup pair graph
    "mix_triplets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = operators.Dedup.ngramJaccardPairs(docs, cfg.ngramN, cfg.minJaccardX10000)
      operators.Mixing.contrastiveTriplets(docs, pairs, numBuckets = 64)
        .orderBy(col("anchor_id"), col("positive_id"))
    }),

    // temperature (α = ½) mixture weights: the multilingual upsampling
    // formula, exact cross-engine via integer ⌊√tokens⌋ before the sum
    "mix_temperature" -> ((s, d) =>
      operators.Mixing.temperatureWeights(Tables.documents(s, d))
        .orderBy(col("source"))),

    // DSIR-style importance reweighting: src0 plays the curated target
    // corpus; every other doc is scored by its hashed-bigram likelihood
    // ratio against src0's distribution, top-100 kept per source
    "mix_importance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Mixing.importanceWeights(
          raw = docs.where(col("source") =!= "src0"),
          target = docs.where(col("source") === "src0"))
        .orderBy(col("doc_id"))
    }),

    // the training plan: a 100k-token budget allocated by the temperature
    // weights, with per-source epoch counts (>1.0 epoch = repeats)
    "mix_epoch_plan" -> ((s, d) =>
      operators.Mixing.epochPlan(Tables.documents(s, d), budgetTokens = 100000L)
        .orderBy(col("source"))),

    // UniMax allocation: uniform budget spread capped at 2 epochs per
    // source — closed-form waterfilling; the budget is sized so small
    // sources cap out and the remainder re-spreads (non-trivial level)
    "mix_unimax" -> ((s, d) =>
      operators.Mixing.unimaxPlan(Tables.documents(s, d),
          budgetTokens = 52000L, maxEpochs = 2)
        .orderBy(col("source"))),

    // DoReMi-style domain reweighting: 5 multiplicative-weights rounds from
    // the token-share reference mixture, upweighting domains whose mean
    // quality deficit exceeds the corpus mean (the deterministic excess-loss
    // proxy) — linearized MW update, floor-renormalized to ppm per round
    "mix_doremi" -> ((s, d) =>
      operators.Mixing.doremiWeights(Tables.documents(s, d), steps = 5)
        .orderBy(col("source"))),

    // round-robin interleave: training order dealing one doc per source
    // per round, hash-shuffled within each source
    "mix_interleave" -> ((s, d) =>
      operators.Mixing.interleaveSources(Tables.documents(s, d))
        .select(col("doc_id"), col("source"), col("rr_rank"))
        .orderBy(col("rr_rank"), col("source"), col("doc_id"))),

    // curriculum order: interleave upgraded with a quality phase — the
    // best within-source quartile deals first, sources still interleaved
    // within each phase; quality is the inlined map-only score (no
    // corpus self-join), both windows partition by source
    "mix_curriculum" -> ((s, d) =>
      operators.Mixing.curriculumOrder(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // hard-negative triplets: anchor's top BM25 hit outside its dup
    // cluster — the dense-retrieval negative-mining recipe
    "mix_hard_triplets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = operators.Dedup.ngramJaccardPairs(docs, cfg.ngramN, cfg.minJaccardX10000)
      operators.Mixing.hardNegativeTriplets(docs, pairs, bmK = 20)
        .orderBy(col("anchor_id"), col("positive_id"))
    }),

    // per-source doc cap (the per-domain cap): at most 10 docs per source
    // survive, chosen by salted hash — the one-pass bounded heap compacts
    // each map task to <= k entries per source, no corpus-wide window sort
    "mix_source_cap" -> ((s, d) =>
      operators.Mixing.capPerSource(Tables.documents(s, d), 10)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // packing budgets use the BPE-ish token metric — the count a subword
    // tokenizer would bill — not whitespace words (MixingSpec covers both)
    "pack_sequences" -> ((s, d) =>
      operators.Mixing.packSequences(Tables.documents(s, d), cfg.packTokenBudget,
          metric = "bpe")
        .orderBy(col("source"), col("seq_no"))),

    // concat-and-chunk packing (docs SPAN sequence boundaries — every
    // sequence but each source's last holds exactly the budget)
    "pack_split" -> ((s, d) =>
      operators.Mixing.packSequencesSplit(Tables.documents(s, d),
          cfg.packTokenBudget, metric = "bpe")
        .orderBy(col("source"), col("seq_no"))),

    // doc-boundary offsets inside packed sequences — the block-diagonal
    // attention-mask artifact (one row per (sequence, contributing doc))
    "pack_boundaries" -> ((s, d) =>
      operators.Mixing.packBoundaries(Tables.documents(s, d),
          cfg.packTokenBudget, metric = "bpe")
        .orderBy(col("source"), col("seq_no"), col("doc_id"))),

    // sliding-window chunking (the training/RAG long-doc splitter): 32-token
    // windows every 24 tokens — map-only, zero shuffle
    "pack_chunks" -> ((s, d) =>
      operators.Mixing.chunkDocuments(Tables.documents(s, d),
          chunkTokens = 32, strideTokens = 24)
        .orderBy(col("doc_id"), col("chunk_no"))),

    // snapshot diff against a deterministically perturbed v2 (drop 10%,
    // drift every 7th doc's text, re-add every 13th under a shifted id) —
    // the dataset release-notes query
    "ver_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Versioning.corpusDiff(docs, snapshotV2(docs))
        .orderBy(col("doc_id"))
    }),

    // MERGE a changeset into the snapshot: planted replace (%10=1 →
    // uppercased), insert (%10=2 under a new id), delete (%10=0); the
    // base anti-joins the slim change-id list, untouched docs never move
    "ver_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val reps = docs.where(col("doc_id") % 10 === 1)
        .withColumn("text", upper(col("text"))).withColumn("op", lit("upsert"))
      val adds = docs.where(col("doc_id") % 10 === 2)
        .withColumn("doc_id", col("doc_id") + 700000L)
        .withColumn("text", concat(lit("new: "), col("text")))
        .withColumn("op", lit("upsert"))
      val dels = docs.where(col("doc_id") % 10 === 0).withColumn("op", lit("delete"))
      operators.Versioning
        .applyChanges(docs, reps.unionByName(adds).unionByName(dels))
        .select(col("doc_id"), contentHash(col("text")).as("text_hash"))
        .orderBy(col("doc_id"))
    }),

    // term-distribution drift between the same two snapshots: top-50 movers
    // by absolute per-million rate change
    "ver_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Versioning.termDrift(docs, snapshotV2(docs), 50)
    }),

    // length-distribution drift: per (source, decile), exact nearest-rank
    // length quantiles of v1 vs v2 — the KS-style monitor term drift
    // can't see (same planting as ver_diff/ver_drift)
    "ver_length_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Versioning.lengthDrift(docs, snapshotV2(docs))
        .orderBy(col("source"), col("decile"))
    }),

    // modality coverage: per source, valid-text and embedding-join
    // completeness — the audit every embedding-based stage depends on
    "mm_coverage" -> ((s, d) =>
      Summaries.modalityCoverage(Tables.documents(s, d), Tables.embeddings(s, d))
        .orderBy(col("source"))),

    // the end-of-run dashboard: per-source doc counts, validity, exact-dup
    // burden, mean quality, language spread, token volume — one plan
    "a16_corpus_health" -> ((s, d) =>
      Summaries.corpusHealth(Tables.documents(s, d))
        .orderBy(col("source"))),

    // exact positional percentiles of doc length per source (nearest-rank,
    // integer target arithmetic — engine-agnostic like a11's median)
    "a15_percentiles" -> ((s, d) =>
      operators.Summaries.lengthPercentiles(Tables.documents(s, d))
        .orderBy(col("source"), col("pct"))),

    // sketch sibling: approx_percentile's mergeable summary — the 100 TB
    // form. Sketch internals differ across engines AND merge order can
    // shift which element is returned, so the VALUE can't be
    // oracle-compared; what the GK summary guarantees regardless of merge
    // order is rank error <= N/accuracy. The query therefore emits, per
    // (source, pct), the group size and whether the approx value's exact
    // rank window [rank_lo+1, rank_hi] overlaps the target-rank band
    // p*n/100 +- (n/accuracy + 2) (integer arithmetic; +-2 absorbs the
    // floor/ceil convention gap between engines) — and DuckDB recomputes
    // (source, pct, n) + literal TRUE. A sketch violating its rank-error
    // contract now FAILS the driver gate (round-15 verdict task 5).
    "a15b_approx_percentiles" -> ((s, d) => {
      val acc = 10000L
      val t = Tables.documents(s, d)
        .select(col("source"), length(col("text")).cast("long").as("v"))
      val ap = operators.Summaries
        .approxLengthPercentiles(Tables.documents(s, d))
      val n = t.groupBy(col("source")).agg(count(lit(1)).as("n"))
      ap.join(t.withColumnRenamed("source", "src"),
          col("source") === col("src"), "left")
        .groupBy(col("source"), col("pct"), col("approx_value"))
        .agg(sum(when(col("v") < col("approx_value"), 1L).otherwise(0L))
            .as("rank_lo"),
          sum(when(col("v") <= col("approx_value"), 1L).otherwise(0L))
            .as("rank_hi"))
        .join(n, Seq("source"))
        .select(col("source"), col("pct"), col("n"),
          ((col("rank_lo") + 1) * (100 * acc) <=
            col("pct") * col("n") * acc + (col("n") + 2 * acc) * 100 &&
            col("rank_hi") * (100 * acc) >=
              col("pct") * col("n") * acc - (col("n") + 2 * acc) * 100)
            .as("rank_err_ok"))
        .orderBy(col("source"), col("pct"))
    }),

    // eval-set decontamination: flag test-split docs whose 8-gram shingles
    // substantially occur anywhere in the train split (planted docs must
    // flag at overlap 10000, organic test docs stay near 0 — 8-grams are
    // copying evidence, not shared vocabulary)
    // broadcastEval = false: this demo's eval side is the corpus's test
    // SPLIT (grows with the corpus), not a fixed curated eval set — same
    // scale reasoning as e2e_corpus. The broadcast form is proven
    // result-identical by the OperatorsSpec parity test.
    "decontaminate" -> ((s, d) => {
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.overlapReport(train, evalDocs,
          cfg.decontamNgramN, cfg.decontamMinOverlapX10000,
          broadcastEval = false)
        .orderBy(col("doc_id"))
    }),

    // SURGICAL decontamination: cut the verbatim eval-overlapping spans out
    // of train docs (8-gram runs of >= 5) instead of dropping whole docs —
    // the planted full-copy train docs come back nearly empty, organically
    // overlapping docs lose only the leaked span
    "decontam_span_removal" -> ((s, d) => {
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.removeContaminatedSpans(train, evalDocs,
          cfg.decontamNgramN, minRun = 5, broadcastEval = false)
        .orderBy(col("doc_id"))
    }),

    // the Bloom-prefiltered form: a filter built from the eval shingle
    // universe prunes the train scan BEFORE the distinct/join shuffle (the
    // explicit runtime-filter pattern). Bit-identical to `decontaminate` —
    // same planted split, same oracle — because Bloom filters have no false
    // negatives and the exact join culls the false positives.
    "decontam_bloom" -> ((s, d) => {
      val (train, evalDocs) = plantedEvalSplit(s, d)
      operators.Decontaminate.overlapReportBloom(train, evalDocs,
          cfg.decontamNgramN, cfg.decontamMinOverlapX10000)
        .orderBy(col("doc_id"))
    }),

    // ---- flagship corpus-assembly pipeline: the engine's actual purpose
    // as ONE plan — validate → n-gram near-dup pairs → connected-components
    // canonical filter (keep one survivor per dup cluster) → hash split →
    // decontaminate eval vs train (drop leaked eval docs) → pack the
    // surviving corpus into BPE-token training sequences per (split,
    // source). Every stage is the already-oracle-checked operator; this
    // query gates their composition.
    "e2e_corpus" -> ((s, d) => {
      val valid = ArticleOps.validated(Tables.documents(s, d))
        .select(col("doc_id"), col("text"), col("source"))
      val pairs = operators.Dedup.ngramJaccardPairs(valid, cfg.ngramN,
        cfg.minJaccardX10000)
      e2eCorpusFromPairs(valid, pairs)
    }),

    // e2e_corpus with the pair graph consumed from the persisted artifact
    // instead of recomputed in-plan — the shared-prefix reuse path: at
    // 100 TB the shingle self-join is the pipeline's most expensive stage,
    // so it runs once per corpus snapshot and every consumer (this
    // assembly, triplet mining, the verdict) reads the parquet. Must equal
    // e2e_corpus exactly (same oracle; artifact==direct spec in
    // OperatorsSpec).
    // Consumes the SAME staged artifact `dedup_pairs_artifact` builds
    // (identical input: validated corpus, same cfg key). When that build
    // ran earlier in this session — Bench's sorted order guarantees it —
    // this query times the CONSUME leg alone, demonstrating the artifact
    // actually paying off vs e2e_corpus's in-plan pair graph. Standalone
    // (Verify order is arbitrary, or a lone DebugMain run) it builds
    // first, so it stays self-contained for the correctness gate.
    "e2e_corpus_from_artifact" -> ((s, d) => {
      val valid = ArticleOps.validated(Tables.documents(s, d))
        .select(col("doc_id"), col("text"), col("source"))
      val dir = stagedDir("pairs", d,
        s"n${cfg.ngramN}-j${cfg.minJaccardX10000}", fresh = false)
      if (!stagedThisSession.contains(dir)) {
        operators.Dedup.buildPairsArtifact(valid, dir, cfg.ngramN,
          cfg.minJaccardX10000)
        stagedThisSession.add(dir)
      }
      e2eCorpusFromPairs(valid, operators.Dedup.pairsFromArtifact(s, dir))
    }),

    // the complementary assembly POLICY: keep near-duplicates (training
    // diversity) but make leakage impossible at split time — validate →
    // per-source quality percentile gate → near-dup clusters → CLUSTER-SAFE
    // split (a dup cluster is one split unit) → pack. Where e2e_corpus
    // drops dups then decontaminates, this keeps them and removes the leak
    // by construction.
    "e2e_corpus_safe" -> ((s, d) => {
      val valid = ArticleOps.validated(Tables.documents(s, d))
        .select(col("doc_id"), col("text"), col("source"))
      val gated = valid.join(
        operators.TextAnalysis.qualityPercentileGate(valid, 60)
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val clusters = operators.Dedup.dedupClusters(
        operators.Dedup.ngramJaccardPairs(gated, cfg.ngramN, cfg.minJaccardX10000))
      operators.Mixing.packSequences(
          operators.Mixing.withClusterSafeSplit(gated, clusters,
            trainPct = cfg.splitTrainPct, valPct = cfg.splitValPct),
          cfg.packTokenBudget, metric = "bpe",
          partitionCols = Seq("split", "source"))
        .orderBy(col("split"), col("source"), col("seq_no"))
    }),

    // ---- flagship end-to-end pipeline (E1/E2 shape) ----
    "e2e_pipeline" -> ((s, d) =>
      ArticleOps.withMetadata(ArticleOps.validated(Tables.documents(s, d)))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("doc_count"),
          sum(col("content_length")).as("total_content_length"),
          (sum(col("clean_length")) / count(lit(1))).as("avg_clean_length"),
          sum(col("word_count")).as("total_words"),
          countDistinct(col("lang")).as("unique_langs"))
        .orderBy(col("source")))
  )

  /** DuckDB oracles — each mirrors its query expression-for-expression.
    * DuckDB dialect notes: regexp_replace needs the 'g' flag for global
    * replace; backreferences are `\1` not `$1`; `/` on integers is double
    * division (same as Spark). */
  def oracleSql: Map[String, String] = {
    // The SQL below is written against the DEFAULT config: several oracle
    // constants (shingle n, minhash k / bands, thresholds) are literal in
    // the text while the Spark queries read them from `cfg`, so a
    // GRAFT_CONFIG override would silently break oracle parity — queries
    // still run retuned, but correctness verification is only defined at
    // the defaults. Fail loudly here instead of hash-mismatching later.
    require(cfg == GraftConfig.default,
      "oracleSql mirrors the DEFAULT GraftConfig; unset GRAFT_CONFIG to " +
        "run oracle verification (overridden queries are not comparable " +
        "against the baked-in oracle constants)")
    // shared SQL fragments
    val norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    def normOf(c: String) = s"trim(regexp_replace($c, '\\s+', ' ', 'g'))"
    val toks = s"string_split($norm, ' ')"
    val wordCnt = s"CASE WHEN $norm = '' THEN 0 ELSE len($toks) END"
    // distinct word-n-gram shingles from a `toks` list column (mirrors
    // TextFunctions.shinglesFromToks)
    def shinglesOfN(n: Int) =
      s"list_distinct(CASE WHEN len(toks) < $n THEN [] " +
        s"ELSE list_transform(range(0, len(toks) - ${n - 1}), " +
        s"i -> ${(1 to n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")}) END)"
    val shinglesOf = shinglesOfN(3)
    // the web-artifact planting (mirrors plantedWebDocs verbatim)
    val webTextSql =
      "(text" +
        " || CASE WHEN doc_id % 3 = 0 THEN" +
        " ' The data works with the table. It ends well. The story holds.'" +
        " ELSE '' END" +
        " || CASE WHEN doc_id % 7 = 0 THEN" +
        " chr(10) || '- first bullet item here'" +
        " || chr(10) || '- second bullet item here'" +
        " || chr(10) || 'this line trails off with more and more...'" +
        " || chr(10) || 'This sentence closes the page properly today.'" +
        " ELSE '' END" +
        " || CASE WHEN doc_id % 11 = 0 THEN" +
        " chr(10) || 'lorem ipsum { and more filler' ELSE '' END)"
    // the planted format-true HTML page (mirrors plantedHtmlPage verbatim)
    val htmlPageSql =
      "'<html><head><title>Doc ' || doc_id || '</title><style>p{color:#333;}</style>" +
        "<script>var x=1;</script></head><body><!-- generated --><h1>' || source || " +
        "' page</h1><p>' || text || '</p>'" +
        " || CASE WHEN doc_id % 2 = 0 THEN '<div><a href=\"/home\">Home</a> " +
        "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></div>' ELSE '' END" +
        " || CASE WHEN doc_id % 3 = 0 THEN '<p>See the <a href=\"/more\">full report</a> " +
        "and the notes that go with it for details about ' || lang || " +
        "' coverage and methodology.</p>' ELSE '' END" +
        " || CASE WHEN doc_id % 5 = 0 THEN " +
        "'<p>Footer &amp; legal &lt;terms&gt;&nbsp;apply.</p>' ELSE '' END" +
        " || '</body></html>'"
    // HTML→text extraction chain (mirrors WebCuration.htmlToText /
    // htmlTextReport) over a prior CTE `hpage(doc_id, html)`; ends in
    // hxe(doc_id, n_lines, n_kept_lines, plain_text). RE2-safe regexes
    // shared character-for-character with the Spark side
    val htmlBlockReSql =
      "(?i)</?(?:header|footer|article|section|blockquote|table|title|html|" +
        "head|body|div|ul|ol|li|tr|td|th|br|hr|p|h[1-6])(?:\\s[^>]*)?/?>"
    val htmlDecodeSql = "replace(replace(replace(replace(replace(replace(t, " +
      "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', ''''), '&amp;', '&')"
    val htmlExtractCtes =
      s"""hx1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '(?s)<!--.*?-->', ' ', 'g') AS h FROM hpage),
         |hx2 AS (SELECT doc_id, regexp_replace(h, '$htmlBlockReSql', chr(10), 'g') AS h FROM hx1),
         |hxl AS (SELECT doc_id, unnest(string_split(h, chr(10))) AS line,
         |    generate_subscripts(string_split(h, chr(10)), 1) AS i FROM hx2),
         |hxt AS (SELECT doc_id, i,
         |    ${normOf("regexp_replace(line, '(?s)<[^>]*>', ' ', 'g')")} AS t,
         |    coalesce(${normOf("regexp_replace(array_to_string(regexp_extract_all(line, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '(?s)<[^>]*>', ' ', 'g')")}, '') AS a
         |  FROM hxl),
         |hxf AS (SELECT doc_id, i, t,
         |    CASE WHEN length(t) = 0 THEN 0
         |      ELSE CAST(floor((100.0::DOUBLE) * length(a) / length(t) + 0.5) AS BIGINT) END AS ld
         |  FROM hxt WHERE t <> ''),
         |hxk AS (SELECT doc_id, i, ld, ${normOf(htmlDecodeSql)} AS out_line FROM hxf),
         |hxe AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
         |    sum(CASE WHEN ld <= 50 THEN 1 ELSE 0 END)::BIGINT AS n_kept_lines,
         |    coalesce(string_agg(out_line, chr(10) ORDER BY i) FILTER (WHERE ld <= 50), '') AS plain_text
         |  FROM hxk GROUP BY doc_id)""".stripMargin
    // incremental template strip (df bar computed over the BASE split
    // only — (doc_id // 20) % 4 <> 0, n_docs likewise base-scoped — then
    // applied frozen to the incoming quarter): shared verbatim by
    // web_template_incr (batch apply) and stream_template_strip (the
    // streaming apply accumulates the SAME result against the SAME
    // artifact, so the oracle is identical)
    val templateIncrSql =
      s"""WITH planted AS (SELECT doc_id, source,
         |  CASE WHEN (doc_id // 20) % 2 = 0
         |    THEN source || ' portal navigation header menu about contact terms privacy copyright ' || text
         |    ELSE text END AS text FROM documents),
         |base AS (SELECT * FROM planted WHERE (doc_id // 20) % 4 <> 0),
         |inc AS (SELECT * FROM planted WHERE (doc_id // 20) % 4 = 0),
         |tb AS (SELECT doc_id, source,
         |  string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks FROM base),
         |lb0 AS (SELECT doc_id, source, toks,
         |  unnest(range(0, (len(toks) + 9) // 10)) AS i FROM tb),
         |lb AS (SELECT doc_id, source,
         |  array_to_string(toks[(i*10+1)::INT : (i*10+10)::INT], ' ') AS line FROM lb0),
         |nd AS (SELECT source, count(*)::BIGINT AS n_docs FROM base GROUP BY source),
         |df AS (SELECT source, line, count(DISTINCT doc_id)::BIGINT AS df
         |  FROM lb GROUP BY source, line),
         |bl AS (SELECT df.source, df.line FROM df JOIN nd USING (source)
         |  WHERE df.df >= 2 AND df.df * 100 >= 20 * nd.n_docs),
         |ti AS (SELECT doc_id, source,
         |  string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks FROM inc),
         |li0 AS (SELECT doc_id, source, toks,
         |  unnest(range(0, (len(toks) + 9) // 10)) AS i FROM ti),
         |li AS (SELECT doc_id, source, i::BIGINT AS line_no,
         |  array_to_string(toks[(i*10+1)::INT : (i*10+10)::INT], ' ') AS line FROM li0),
         |k AS (SELECT li.doc_id, li.source, li.line_no, li.line,
         |    (bl.line IS NOT NULL) AS boiler
         |  FROM li LEFT JOIN bl ON li.source = bl.source AND li.line = bl.line)
         |SELECT doc_id, source, count(*)::BIGINT AS n_lines,
         |  sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
         |  coalesce(string_agg(line, ' ' ORDER BY line_no)
         |    FILTER (WHERE NOT boiler), '') AS kept_text
         |FROM k GROUP BY doc_id, source ORDER BY doc_id""".stripMargin
    // Gopher form-rule report over a prior CTE `p(doc_id, text)` (mirrors
    // WebCuration.gopherQualityReport at default thresholds); shared by
    // web_gopher (planted raw text) and web_html_curate (extracted text)
    val gopherReportSql =
      s"""nn AS (SELECT doc_id, text, ${normOf("text")} AS norm FROM p),
         |t AS (SELECT doc_id, text, norm,
         |    (CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END)::BIGINT AS n_words,
         |    string_split(norm, ' ') AS toks,
         |    string_split(text, chr(10)) AS lines FROM nn),
         |sig AS (SELECT doc_id, n_words,
         |    CASE WHEN n_words = 0 THEN 0::BIGINT
         |      ELSE CAST(floor((100.0::DOUBLE) * (len(norm) - (n_words - 1))::DOUBLE / n_words + 0.5) AS BIGINT) END AS mwl_x100,
         |    CAST(floor((10000.0::DOUBLE) * (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE / greatest(n_words, 1) + 0.5) AS BIGINT) AS sym_ratio_x10000,
         |    CAST(floor((10000.0::DOUBLE) * len(list_filter(lines, l -> ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %'))::DOUBLE / len(lines) + 0.5) AS BIGINT) AS bullet_ratio_x10000,
         |    CAST(floor((10000.0::DOUBLE) * len(list_filter(lines, l -> rtrim(l) LIKE '%...'))::DOUBLE / len(lines) + 0.5) AS BIGINT) AS ellipsis_ratio_x10000,
         |    CAST(floor((10000.0::DOUBLE) * len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))::DOUBLE / greatest(n_words, 1) + 0.5) AS BIGINT) AS alpha_ratio_x10000,
         |    len(list_intersect(toks, ['the','be','to','of','and','that','have','with']))::BIGINT AS n_stopwords
         |  FROM t)
         |SELECT doc_id, n_words, mwl_x100, sym_ratio_x10000,
         |  bullet_ratio_x10000, ellipsis_ratio_x10000, alpha_ratio_x10000,
         |  n_stopwords,
         |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
         |  (mwl_x100 >= 300 AND mwl_x100 <= 1000) AS r_mean_word_len,
         |  (sym_ratio_x10000 <= 1000) AS r_symbol_ratio,
         |  (bullet_ratio_x10000 <= 9000) AS r_bullet_lines,
         |  (ellipsis_ratio_x10000 <= 3000) AS r_ellipsis_lines,
         |  (alpha_ratio_x10000 >= 8000) AS r_alpha_words,
         |  (n_stopwords >= 2) AS r_stopwords,
         |  (n_words >= 50 AND n_words <= 100000
         |    AND mwl_x100 >= 300 AND mwl_x100 <= 1000
         |    AND sym_ratio_x10000 <= 1000 AND bullet_ratio_x10000 <= 9000
         |    AND ellipsis_ratio_x10000 <= 3000 AND alpha_ratio_x10000 >= 8000
         |    AND n_stopwords >= 2) AS pass
         |FROM sig ORDER BY doc_id""".stripMargin
    // portable char-polynomial hash (mirrors TextFunctions.charPolyHash)
    def poly(e: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), " +
        s"c -> unicode(c)::BIGINT)), (a, b) -> (a*31 + b) % 1000000007)"
    // wide content-identity hash (mirrors TextFunctions.contentHash): two
    // independent folds combined injectively as h1*(1e9+9)+h2 — used
    // wherever a FULL document's identity is the key (exact dedup,
    // funnels, snapshot diffs), never for shingles/salts
    def poly2(e: String) = {
      def fold(base: Int, m: Long) =
        s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), " +
          s"c -> unicode(c)::BIGINT)), (a, b) -> (a*$base + b) % $m)"
      s"(${fold(31, 1000000007L)} * 1000000009 + ${fold(131, 1000000009L)})"
    }
    // ---- Gopher A1.1 repetition-half machinery (mirrors
    // WebCuration.repCols / GopherRepetitionExpr) over a prior CTE
    // `p(doc_id, text, ...)`. Deliberately the RELATIONAL form (explode
    // n-grams with positions → per-doc counts → top pick / duplicated-
    // position DISTINCT union) where the Spark side is one map-only
    // expression pass — a non-circular cross-check. Ends in a CTE
    // `repsig(doc_id, 13 signal columns)`; `repPassSql` is the combined
    // 13-rule gate over those columns.
    def repFrac(num: String, den: String) =
      s"CASE WHEN $den = 0 THEN 0 ELSE CAST(floor((10000.0::DOUBLE) * ($num) / ($den) + 0.5) AS BIGINT) END"
    val repCtes: String = {
      def ngramOf(n: Int) =
        s"CASE WHEN len(toks) < $n THEN [] ELSE list_transform(range(0, len(toks) - ${n - 1}), " +
          s"i -> ${(1 to n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")}) END"
      val perN = (2 to 10).map { n =>
        val base =
          s"""rn$n AS (SELECT doc_id, unnest(l) AS ng, generate_subscripts(l, 1) - 1 AS i FROM (
             |  SELECT doc_id, ${ngramOf(n)} AS l FROM rtk))""".stripMargin
        if (n <= 4)
          s"""$base,
             |rt$n AS (SELECT doc_id, cnt * (len(ng) - ${n - 1}) AS topc FROM (
             |    SELECT doc_id, ng, cnt, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, ng) AS rk
             |    FROM (SELECT doc_id, ng, count(*)::BIGINT AS cnt FROM rn$n GROUP BY doc_id, ng))
             |  WHERE rk = 1)""".stripMargin
        else
          s"""$base,
             |rd$n AS (SELECT doc_id, ng FROM (SELECT doc_id, ng, count(*) AS c FROM rn$n GROUP BY doc_id, ng) WHERE c >= 2),
             |rc$n AS (SELECT v.doc_id, sum(len(rtp.tok))::BIGINT AS dupc FROM (
             |    SELECT DISTINCT g.doc_id AS doc_id, g.i + u.x AS pos
             |    FROM rn$n g JOIN rd$n dd ON g.doc_id = dd.doc_id AND g.ng = dd.ng
             |    CROSS JOIN (SELECT unnest(range(0, $n)) AS x) u) v
             |  JOIN rtp ON rtp.doc_id = v.doc_id AND rtp.pos = v.pos
             |  GROUP BY v.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""rtk AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM p),
         |rtp AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS pos FROM rtk),
         |rtc AS (SELECT doc_id, sum(len(tok))::BIGINT AS totc FROM rtp GROUP BY doc_id),
         |rlp AS (SELECT doc_id,
         |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls,
         |    list_filter(list_transform(string_split_regex(text, '\\n\\n+'), q -> trim(regexp_replace(q, '\\s+', ' ', 'g'))), q -> q <> '') AS ps
         |  FROM p),
         |rlf AS (SELECT doc_id,
         |    len(ls)::BIGINT AS nl, len(list_distinct(ls))::BIGINT AS nld,
         |    coalesce(list_sum(list_transform(ls, l -> len(l))), 0)::BIGINT AS lc,
         |    coalesce(list_sum(list_transform(list_distinct(ls), l -> len(l))), 0)::BIGINT AS lcd,
         |    len(ps)::BIGINT AS np, len(list_distinct(ps))::BIGINT AS npd,
         |    coalesce(list_sum(list_transform(ps, q -> len(q))), 0)::BIGINT AS pc,
         |    coalesce(list_sum(list_transform(list_distinct(ps), q -> len(q))), 0)::BIGINT AS pcd
         |  FROM rlp),
         |$perN,
         |repsig AS (SELECT rlf.doc_id,
         |    ${repFrac("nl - nld", "nl")} AS dup_line_frac_x10000,
         |    ${repFrac("lc - lcd", "lc")} AS dup_line_char_frac_x10000,
         |    ${repFrac("np - npd", "np")} AS dup_para_frac_x10000,
         |    ${repFrac("pc - pcd", "pc")} AS dup_para_char_frac_x10000,
         |    ${(2 to 4).map(n => repFrac(s"coalesce(rt$n.topc, 0)", "rtc.totc") + s" AS top${n}_char_frac_x10000").mkString(",\n    ")},
         |    ${(5 to 10).map(n => repFrac(s"coalesce(rc$n.dupc, 0)", "rtc.totc") + s" AS dup${n}_char_frac_x10000").mkString(",\n    ")}
         |  FROM rlf
         |  JOIN rtc ON rtc.doc_id = rlf.doc_id
         |  ${(2 to 4).map(n => s"LEFT JOIN rt$n ON rt$n.doc_id = rlf.doc_id").mkString("\n  ")}
         |  ${(5 to 10).map(n => s"LEFT JOIN rc$n ON rc$n.doc_id = rlf.doc_id").mkString("\n  ")})""".stripMargin
    }
    val repPassSql: String =
      "dup_line_frac_x10000 <= 3000 AND dup_line_char_frac_x10000 <= 2000" +
        " AND dup_para_frac_x10000 <= 3000 AND dup_para_char_frac_x10000 <= 2000" +
        " AND top2_char_frac_x10000 <= 2000 AND top3_char_frac_x10000 <= 1800" +
        " AND top4_char_frac_x10000 <= 1600 AND dup5_char_frac_x10000 <= 1500" +
        " AND dup6_char_frac_x10000 <= 1400 AND dup7_char_frac_x10000 <= 1300" +
        " AND dup8_char_frac_x10000 <= 1200 AND dup9_char_frac_x10000 <= 1100" +
        " AND dup10_char_frac_x10000 <= 1000"
    // the repetition planting (mirrors plantedRepDocs verbatim)
    val repTextSql =
      "(text" +
        " || CASE WHEN doc_id % 4 = 0 THEN" +
        " chr(10) || 'Repeated line of filler text.'" +
        " || chr(10) || 'Repeated line of filler text.' ELSE '' END" +
        " || CASE WHEN doc_id % 5 = 0 THEN" +
        " chr(10) || chr(10) || 'Same paragraph body appears twice on this page.'" +
        " || chr(10) || chr(10) || 'Same paragraph body appears twice on this page.'" +
        " ELSE '' END" +
        " || CASE WHEN doc_id % 6 = 0 THEN" +
        s" '${" alpha beta gamma delta epsilon zeta" * 3}' ELSE '' END" +
        " || CASE WHEN doc_id % 9 = 0 THEN" +
        s" '${" red blue" * 12}' ELSE '' END)"
    // WordPiece segmentation replay (substring vocab build + greedy
    // longest-match as a recursive CTE) over a `tok` CTE providing `w` —
    // shared by the fertility, artifact, and per-doc segment oracles
    val wpSegCtes =
      s"""words AS (SELECT w, count(*)::BIGINT AS freq FROM tok WHERE w <> '' GROUP BY w),
         |subs AS (SELECT unnest(flatten(list_transform(range(1, len(w)+1),
         |    s -> list_transform(range(1, least(4, len(w)-s+1)+1),
         |      l -> substr(w, s, l))))) AS term, freq FROM words),
         |vocab AS (SELECT term FROM (SELECT term, sum(freq)::BIGINT AS cnt
         |  FROM subs GROUP BY term ORDER BY cnt DESC, term LIMIT 200)),
         |seg AS (
         |  SELECT w, 0::BIGINT AS pos, 0::BIGINT AS pieces, 0::BIGINT AS unknowns FROM words
         |  UNION ALL
         |  SELECT w, pos + coalesce(m, 1), pieces + 1,
         |    unknowns + (CASE WHEN m IS NULL THEN 1 ELSE 0 END)
         |  FROM (SELECT w, pos, pieces, unknowns,
         |      (SELECT max(len(v.term))::BIGINT FROM vocab v
         |        WHERE len(v.term) <= len(w) - pos
         |          AND v.term = substr(w, pos+1, len(v.term))) AS m
         |    FROM seg WHERE pos < len(w))),
         |pieces AS (SELECT w, pieces, unknowns FROM seg WHERE pos >= len(w))""".stripMargin

    // unigram-LM OPTIMAL (Viterbi) segmentation replay over a `tok` CTE
    // providing `w` — same substring vocab as wpSegCtes, then a recursive
    // state exploration instead of the greedy single path: every reachable
    // (pos, pieces, unknowns) state (UNION dedups; each step advances >= 1
    // char so it terminates), minimized as the encoded pieces*2^32 +
    // unknowns score ViterbiSegmentExpr uses. The unknown single-char step
    // exists only when no 1-char piece matches — when one matches the
    // matched step dominates, so the min is unchanged (mirrors the Scala
    // DP's always-offered-but-dominated candidate).
    val viterbiSegCtes =
      s"""words AS (SELECT w, count(*)::BIGINT AS freq FROM tok WHERE w <> '' GROUP BY w),
         |subs AS (SELECT unnest(flatten(list_transform(range(1, len(w)+1),
         |    s -> list_transform(range(1, least(4, len(w)-s+1)+1),
         |      l -> substr(w, s, l))))) AS term, freq FROM words),
         |vocab AS (SELECT term FROM (SELECT term, sum(freq)::BIGINT AS cnt
         |  FROM subs GROUP BY term ORDER BY cnt DESC, term LIMIT 200)),
         |vst AS (
         |  SELECT w, 0::BIGINT AS pos, 0::BIGINT AS pieces, 0::BIGINT AS unknowns FROM words
         |  UNION
         |  SELECT s.w, s.pos + ls.l, s.pieces + 1,
         |    s.unknowns + (CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
         |  FROM (SELECT * FROM vst WHERE pos < len(w)) s
         |  JOIN (SELECT unnest([1, 2, 3, 4])::BIGINT AS l) ls
         |    ON ls.l <= len(s.w) - s.pos
         |  LEFT JOIN vocab v ON v.term = substr(s.w, (s.pos+1)::INT, ls.l::INT)
         |  WHERE v.term IS NOT NULL OR ls.l = 1),
         |vbest AS (SELECT w, min(pieces*4294967296 + unknowns) AS sc
         |  FROM vst WHERE pos >= len(w) GROUP BY w),
         |vpieces AS (SELECT w, (sc // 4294967296)::BIGINT AS pieces,
         |  (sc % 4294967296)::BIGINT AS unknowns FROM vbest)""".stripMargin

    // top-principal-component power-iteration replay: exact-integer
    // scatter matrix, 8 unrolled v←round(Cv·100/max|Cv|) steps (MATERIALIZED
    // CTEs — DuckDB would otherwise inline the scatter join per step), the
    // same double-on-exact-integers scale divisions as the Spark side
    val pcaIters = 8
    val pcaOracleSql: String = {
      val head =
        """comp AS MATERIALIZED (
          |  SELECT vec_id, d - 1 AS d, CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS xi
          |  FROM (SELECT vec_id, unnest(embedding) AS x,
          |        generate_subscripts(embedding, 1) AS d FROM embeddings)),
          |nn AS (SELECT count(DISTINCT vec_id)::BIGINT AS n FROM comp),
          |sx AS (SELECT d, sum(xi)::BIGINT AS sx FROM comp GROUP BY d),
          |sxx AS (SELECT a.d AS d1, b.d AS d2, sum(a.xi * b.xi)::BIGINT AS sxx
          |  FROM comp a JOIN comp b ON a.vec_id = b.vec_id GROUP BY a.d, b.d),
          |cm AS MATERIALIZED (SELECT d1, d2, (nn.n * sxx - x1.sx * x2.sx)::BIGINT AS c
          |  FROM sxx CROSS JOIN nn
          |  JOIN sx x1 ON sxx.d1 = x1.d JOIN sx x2 ON sxx.d2 = x2.d),
          |v0 AS (SELECT d, 100::BIGINT AS v FROM sx)""".stripMargin
      val steps = (1 to pcaIters).map { t =>
        s"""w$t AS MATERIALIZED (SELECT d1 AS d, sum(c * v)::BIGINT AS w
           |  FROM cm JOIN v${t - 1} ON cm.d2 = v${t - 1}.d GROUP BY d1),
           |s$t AS (SELECT max(abs(w))::BIGINT AS mx FROM w$t),
           |v$t AS MATERIALIZED (SELECT d, CAST(floor(CAST(w AS DOUBLE) * 100.0 / CAST(mx AS DOUBLE) + 0.5) AS BIGINT) AS v
           |  FROM w$t, s$t)""".stripMargin
      }.mkString(",\n")
      val tail =
        s"""lo AS (SELECT d, CAST(floor(CAST(w AS DOUBLE) * 10000.0 / CAST(mx AS DOUBLE) + 0.5) AS BIGINT) AS loading_x10000
           |  FROM w$pcaIters, s$pcaIters),
           |tr AS (SELECT sum(c)::BIGINT AS trace FROM cm WHERE d1 = d2),
           |vt AS (SELECT sum(vv.v * lo.loading_x10000)::BIGINT AS vtw,
           |    sum(vv.v * vv.v)::BIGINT AS vtv
           |  FROM v${pcaIters - 1} vv JOIN lo ON vv.d = lo.d),
           |evr AS (SELECT CAST(floor(1000000.0 * (CAST(vtw AS DOUBLE) * CAST(mx AS DOUBLE))
           |    / (10000.0 * CAST(vtv AS DOUBLE) * CAST(trace AS DOUBLE)) + 0.5) AS BIGINT) AS evr_ppm
           |  FROM vt, s$pcaIters, tr)""".stripMargin
      s"WITH $head,\n$steps,\n$tail\n" +
        "SELECT lo.d AS d, loading_x10000, evr_ppm FROM lo, evr ORDER BY d"
    }

    // unigram fertility replay, shared by the direct and artifact-round-
    // trip forms (identical by the round-trip-must-not-change-a-count rule)
    val uniFertilitySql: String =
      s"""WITH RECURSIVE
         |t AS (SELECT source, $toks AS toks FROM documents),
         |tok AS (SELECT source, unnest(toks) AS w FROM t),
         |$viterbiSegCtes,
         |sw AS (SELECT source, w, count(*)::BIGINT AS freq FROM tok
         |  WHERE w <> '' GROUP BY source, w)
         |SELECT source, sum(freq)::BIGINT AS total_words,
         |  sum(freq*pieces)::BIGINT AS total_pieces,
         |  sum(freq*unknowns)::BIGINT AS total_unknowns,
         |  CAST(floor((10000.0::DOUBLE) * sum(freq*pieces)
         |    / greatest(sum(freq), 1)) AS BIGINT) AS fertility_x10000,
         |  CAST(floor((1000000.0::DOUBLE) * sum(freq*unknowns)
         |    / greatest(sum(freq*pieces), 1)) AS BIGINT) AS oov_ppm
         |FROM sw JOIN vpieces USING (w) GROUP BY source ORDER BY source""".stripMargin

    // ann_whiten: the pca replay's comp/nn/lo CTEs + projection removal and
    // exact before/after per-dim variances (same double-on-exact-integers
    // re-quantization as the Spark side)
    val annWhitenSql: String = {
      val withIdx = pcaOracleSql.lastIndexOf("\nSELECT lo.d AS d")
      pcaOracleSql.substring(0, withIdx) + ",\n" +
        """lo2 AS (SELECT d, loading_x10000 AS l FROM lo),
          |l2 AS (SELECT sum(l * l)::BIGINT AS l2 FROM lo2),
          |pj AS (SELECT vec_id, sum(xi * l)::BIGINT AS p
          |  FROM comp JOIN lo2 USING (d) GROUP BY vec_id),
          |wq AS (SELECT comp.d AS d, xi,
          |    CAST(floor(CAST(xi * l2.l2 - pj.p * lo2.l AS DOUBLE) / CAST(l2.l2 AS DOUBLE) + 0.5) AS BIGINT) AS xq
          |  FROM comp JOIN pj ON comp.vec_id = pj.vec_id
          |  JOIN lo2 ON comp.d = lo2.d CROSS JOIN l2),
          |vs AS (SELECT d, sum(xi * xi)::BIGINT AS sxx_o, sum(xi)::BIGINT AS sx_o,
          |    sum(xq * xq)::BIGINT AS sxx_w, sum(xq)::BIGINT AS sx_w
          |  FROM wq GROUP BY d),
          |vo AS (SELECT d, (nn.n * sxx_o - sx_o * sx_o)::BIGINT AS var_o,
          |    (nn.n * sxx_w - sx_w * sx_w)::BIGINT AS var_w
          |  FROM vs CROSS JOIN nn)
          |SELECT d, var_o, var_w,
          |  CAST(floor(1000000.0 * CAST(var_w AS DOUBLE) / CAST(greatest(var_o, 1) AS DOUBLE) + 0.5) AS BIGINT) AS retained_ppm
          |FROM vo ORDER BY d""".stripMargin
    }

    // the (source, word) billing join on top — shared verbatim by
    // `ta_wordpiece_fertility` and `ta_wordpiece_artifact` (the parquet
    // vocab round trip must not change a count)
    val wpFertilitySql =
      s"""WITH RECURSIVE
         |t AS (SELECT source, $toks AS toks FROM documents),
         |tok AS (SELECT source, unnest(toks) AS w FROM t),
         |$wpSegCtes,
         |sw AS (SELECT source, w, count(*)::BIGINT AS freq FROM tok
         |  WHERE w <> '' GROUP BY source, w)
         |SELECT source, sum(freq)::BIGINT AS total_words,
         |  sum(freq*pieces)::BIGINT AS total_pieces,
         |  sum(freq*unknowns)::BIGINT AS total_unknowns,
         |  CAST(floor((10000.0::DOUBLE) * sum(freq*pieces)
         |    / greatest(sum(freq), 1)) AS BIGINT) AS fertility_x10000,
         |  CAST(floor((1000000.0::DOUBLE) * sum(freq*unknowns)
         |    / greatest(sum(freq*pieces), 1)) AS BIGINT) AS oov_ppm
         |FROM sw JOIN pieces USING (w) GROUP BY source ORDER BY source""".stripMargin

    // the planted-eval-split contamination report — shared verbatim by
    // `decontaminate` (batch) and `stream_decontam` (the per-micro-batch
    // universe probe, whose accumulated report must equal the batch run)
    val decontamOracleSql =
      s"""WITH sp AS (SELECT doc_id, text, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents),
         |tr AS (SELECT doc_id, text FROM sp WHERE b < 80),
         |ev AS (SELECT doc_id, text FROM sp WHERE b >= 90
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM tr WHERE doc_id % 7 = 0),
         |trt AS (SELECT doc_id, $toks AS toks FROM tr),
         |trs AS (SELECT DISTINCT ${poly("sh")} AS h FROM
         |  (SELECT unnest(${shinglesOfN(8)}) AS sh FROM trt)),
         |evt AS (SELECT doc_id, $toks AS toks FROM ev),
         |evs AS (SELECT doc_id, ${poly("sh")} AS h FROM
         |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM evt)),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM evs GROUP BY doc_id),
         |hits AS (SELECT evs.doc_id, count(*)::BIGINT AS n_hit
         |  FROM evs JOIN trs ON evs.h = trs.h GROUP BY evs.doc_id),
         |rep AS (SELECT e.doc_id,
         |    coalesce(sizes.n_sh, 0)::BIGINT AS n_sh,
         |    coalesce(hits.n_hit, 0)::BIGINT AS n_hit
         |  FROM (SELECT doc_id FROM ev) e
         |  LEFT JOIN sizes ON e.doc_id = sizes.doc_id
         |  LEFT JOIN hits ON e.doc_id = hits.doc_id)
         |SELECT doc_id, n_sh, n_hit, overlap_x10000,
         |  (CASE WHEN overlap_x10000 >= 5000 THEN 1 ELSE 0 END)::BIGINT AS contaminated
         |FROM (SELECT doc_id, n_sh, n_hit,
         |  CAST(floor((10000.0::DOUBLE) * n_hit / greatest(n_sh, 1) + 0.5) AS BIGINT) AS overlap_x10000
         |  FROM rep)
         |ORDER BY doc_id""".stripMargin

    // blocklist scrub report — shared verbatim by the literal-array form
    // (`ta_blocklist`) and the broadcast-join form (`ta_blocklist_join`)
    val blocklistOracleSql =
      s"""WITH h AS (SELECT doc_id, source,
         |    len(list_filter($toks, t -> t IN ('dup','slow','unsafe')))::BIGINT AS n_hits,
         |    coalesce(array_to_string(list_sort(list_distinct(
         |      list_filter($toks, t -> t IN ('dup','slow','unsafe')))), ','), '') AS matched
         |  FROM documents)
         |SELECT doc_id, source, n_hits, matched,
         |  CASE WHEN n_hits = 0 THEN 'keep'
         |       WHEN n_hits <= 3 THEN 'flag'
         |       ELSE 'drop' END AS verdict
         |FROM h ORDER BY doc_id""".stripMargin

    // teacher label for the trainable-classifier family (mirrors
    // Classifier.qualityLabel at the default 2000 threshold)
    val labelY = {
      val enW = operators.TextAnalysis.stopwords.head._2
        .map(w => s"'$w'").mkString(",")
      s"""(CASE WHEN CAST(floor((10000.0::DOUBLE) *
         |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
         |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
         |        (4.0::DOUBLE) * len(list_filter($toks, t9 -> t9 IN ($enW)))
         |          / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) >= 2000
         |    THEN 1 ELSE 0 END)::BIGINT""".stripMargin
    }
    // hashed-ngram NB train + score with independent split predicates
    // (mirrors Classifier.hashedNgramFeatures/hashedNBFit/hashedNBScore):
    // weights and prior from the TRAIN split, scoring over the SCORE
    // split with LEFT JOIN + the both-classes-zero default weight for
    // buckets the training never saw — exactly Spark's coalesce leg
    def hashedNbSql(trainPred: String, scorePred: String): String = {
      def occ(src: String, cte: String) =
        s"""$cte AS (SELECT doc_id, y, ${poly("g")} % 1024 AS b FROM (
           |  SELECT doc_id, y, unnest(toks ||
           |      CASE WHEN len(toks) < 2 THEN []
           |        ELSE list_transform(range(0, len(toks) - 1),
           |          i -> toks[i+1] || ' ' || toks[i+2]) END) AS g
           |  FROM $src))""".stripMargin
      s"""WITH hbt0 AS (SELECT doc_id, $labelY AS y, $toks AS toks
         |  FROM documents WHERE $trainPred),
         |hbs0 AS (SELECT doc_id, $labelY AS y, $toks AS toks
         |  FROM documents WHERE $scorePred),
         |${occ("hbt0", "hbo")},
         |${occ("hbs0", "hso")},
         |hbc AS (SELECT b, sum(y)::BIGINT AS n1,
         |    (count(*) - sum(y))::BIGINT AS n0 FROM hbo GROUP BY b),
         |hbt AS (SELECT sum(y)::BIGINT AS t1,
         |    (count(*) - sum(y))::BIGINT AS t0 FROM hbo),
         |hbd AS (SELECT sum(y)::BIGINT AS d1,
         |    (count(*) - sum(y))::BIGINT AS d0 FROM hbt0),
         |hbw AS (SELECT b, CAST(floor(1000000.0 *
         |    (ln(((n1 + 1)::DOUBLE) / ((t1 + 1024)::DOUBLE))
         |     - ln(((n0 + 1)::DOUBLE) / ((t0 + 1024)::DOUBLE))) + 0.5) AS BIGINT) AS w
         |  FROM hbc, hbt),
         |hbdf AS (SELECT CAST(floor(1000000.0 *
         |    (ln((1)::DOUBLE / ((t1 + 1024)::DOUBLE))
         |     - ln((1)::DOUBLE / ((t0 + 1024)::DOUBLE))) + 0.5) AS BIGINT) AS dw
         |  FROM hbt),
         |hbp AS (SELECT CAST(floor(1000000.0 *
         |    (ln(((d1 + 1)::DOUBLE) / ((d1 + d0 + 2)::DOUBLE))
         |     - ln(((d0 + 1)::DOUBLE) / ((d1 + d0 + 2)::DOUBLE))) + 0.5) AS BIGINT) AS prior
         |  FROM hbd),
         |htf AS (SELECT doc_id, y, b, count(*)::BIGINT AS tf
         |  FROM hso GROUP BY doc_id, y, b),
         |hsw AS (SELECT doc_id, y, sum(tf * coalesce(w, dw))::BIGINT AS sw
         |  FROM htf LEFT JOIN hbw USING (b) CROSS JOIN hbdf
         |  GROUP BY doc_id, y)
         |SELECT doc_id, y AS label, (sw + prior)::BIGINT AS score_x1e6,
         |  (CASE WHEN sw + prior > 0 THEN 1 ELSE 0 END)::BIGINT AS predicted,
         |  (CASE WHEN (CASE WHEN sw + prior > 0 THEN 1 ELSE 0 END) = y
         |    THEN 1 ELSE 0 END)::BIGINT AS correct
         |FROM hsw, hbp ORDER BY doc_id""".stripMargin
    }
    // shape features + the closed-form least-squares model (mirrors
    // Classifier.shapeFeatures / leastSquaresFit): shared by the three
    // ta_train_lsq* oracles
    val lsqModelCtes = {
      val enW = operators.TextAnalysis.stopwords.head._2
        .map(w => s"'$w'").mkString(",")
      s"""sf AS (SELECT doc_id, source,
         |    (least(word_cnt, 200) // 8)::BIGINT AS x1,
         |    (least(100, CAST(floor((400.0::DOUBLE) * stop_hits /
         |        greatest(word_cnt, 1)) AS BIGINT)) // 4)::BIGINT AS x2,
         |    (CASE WHEN CAST(floor((10000.0::DOUBLE) *
         |      least(1.0::DOUBLE, (word_cnt::DOUBLE) / (200.0::DOUBLE)) *
         |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
         |        (4.0::DOUBLE) * stop_hits / greatest(word_cnt, 1))) + 0.5)
         |      AS BIGINT) >= 2000 THEN 1 ELSE 0 END)::BIGINT AS y
         |  FROM (SELECT doc_id, source, ($wordCnt)::BIGINT AS word_cnt,
         |      len(list_filter($toks, t9 -> t9 IN ($enW)))::BIGINT AS stop_hits
         |    FROM documents)),
         |ag AS (SELECT count(*)::BIGINT AS n,
         |    sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
         |    sum(x1*x1)::BIGINT AS s11, sum(x1*x2)::BIGINT AS s12,
         |    sum(x2*x2)::BIGINT AS s22, sum(y)::BIGINT AS sy,
         |    sum(x1*y)::BIGINT AS sy1, sum(x2*y)::BIGINT AS sy2 FROM sf),
         |gm AS (SELECT n, 100::BIGINT AS a00,
         |    (100*s1)//n AS a01, (100*s2)//n AS a02,
         |    (100*s11)//n AS a11, (100*s12)//n AS a12, (100*s22)//n AS a22,
         |    (100*sy)//n AS b0, (100*sy1)//n AS b1, (100*sy2)//n AS b2
         |  FROM ag),
         |model AS (SELECT n, a11, a12, a22,
         |  (a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02)
         |    + a02*(a01*a12 - a11*a02))::BIGINT AS det,
         |  ((a11*a22 - a12*a12)*b0 - (a01*a22 - a02*a12)*b1
         |    + (a01*a12 - a02*a11)*b2)::BIGINT AS w0_num,
         |  (-(a01*a22 - a12*a02)*b0 + (a00*a22 - a02*a02)*b1
         |    - (a00*a12 - a02*a01)*b2)::BIGINT AS w1_num,
         |  ((a01*a12 - a11*a02)*b0 - (a00*a12 - a01*a02)*b1
         |    + (a00*a11 - a01*a01)*b2)::BIGINT AS w2_num FROM gm)""".stripMargin
    }
    // unrolled fixed-point PageRank rounds (Graphs.graphRank's recurrence):
    // needs CTEs `edges` (src, dst, w) and `deg` (src, wdeg); emits r1..rN
    // building on r0 (nodeCol, rank)
    def prRounds(n: Int, nodeCol: String) = (1 to n).map { i =>
      s"r$i AS (SELECT e.dst AS $nodeCol,\n" +
        s"    CAST(150000 + (85 * sum((r.rank * e.w) // d.wdeg)) // 100 AS BIGINT) AS rank\n" +
        s"  FROM edges e JOIN r${i - 1} r ON e.src = r.$nodeCol\n" +
        s"  JOIN deg d ON d.src = e.src GROUP BY e.dst)"
    }.mkString(",\n")
    // personalized variant: per-node reset from a `rst` CTE (node, reset);
    // nodes can receive zero flow, so each round left-joins from `rst`
    def pprRounds(n: Int) = (1 to n).map { i =>
      s"r$i AS (SELECT rst.node AS node,\n" +
        s"    CAST(rst.reset + coalesce((85 * f.flow) // 100, 0) AS BIGINT) AS rank\n" +
        s"  FROM rst LEFT JOIN (SELECT e.dst AS node, sum((r.rank * e.w) // d.wdeg) AS flow\n" +
        s"    FROM edges e JOIN r${i - 1} r ON e.src = r.node\n" +
        s"    JOIN deg d ON d.src = e.src GROUP BY e.dst) f ON f.node = rst.node)"
    }.mkString(",\n")
    // unrolled label-propagation rounds (Graphs.labelPropagation's sync
    // recurrence): needs CTEs `es` (node, nbr — self-edges included) and
    // l0 (node, label); emits n1/l1..nN/lN
    def lpaRounds(n: Int) = (1 to n).map { i =>
      s"n$i AS (SELECT es.node AS node, l.label AS label, count(*)::BIGINT AS cnt\n" +
        s"  FROM es JOIN l${i - 1} l ON es.nbr = l.node GROUP BY es.node, l.label),\n" +
        s"l$i AS (SELECT node, label FROM (\n" +
        s"    SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn\n" +
        s"    FROM n$i) WHERE rn = 1)"
    }.mkString(",\n")
    // the iterative-BPE replay shared by ta_bpe_segment and
    // ta_bpe_fertility: v0 + `n` merge rounds + seg0..segN application CTEs
    def bpeSegCtes(rounds: Int): String = {
      def roundCtes(k: Int) =
        s"""p$k AS (SELECT syms[i+1] AS x, syms[i+2] AS y, sum(freq)::BIGINT AS cnt
           |  FROM (SELECT freq, syms, unnest(range(0, len(syms) - 1)) AS i
           |        FROM v${k - 1} WHERE len(syms) >= 2)
           |  GROUP BY 1, 2),
           |t$k AS (SELECT x, y, cnt FROM p$k ORDER BY cnt DESC, x, y LIMIT 1),
           |v$k AS (SELECT w, freq, list_filter(string_split(
           |    list_reduce(list_prepend('', syms), (acc, s) ->
           |      CASE WHEN ends_with(acc, chr(31) || t$k.x) AND s = t$k.y
           |           THEN substr(acc, 1, length(acc) - length(t$k.x) - 1) || chr(31) || t$k.x || t$k.y
           |           ELSE acc || chr(31) || s END), chr(31)), z -> z <> '') AS syms
           |  FROM v${k - 1} CROSS JOIN t$k)""".stripMargin
      def segCte(k: Int) =
        s"""seg$k AS (SELECT doc_id, list_filter(string_split(
           |    list_reduce(list_prepend('', syms), (acc, s) ->
           |      CASE WHEN ends_with(acc, chr(31) || t$k.x) AND s = t$k.y
           |           THEN substr(acc, 1, length(acc) - length(t$k.x) - 1) || chr(31) || t$k.x || t$k.y
           |           ELSE acc || chr(31) || s END), chr(31)), z -> z <> '') AS syms
           |  FROM seg${k - 1} CROSS JOIN t$k)""".stripMargin
      s"""v0 AS (SELECT w, count(*)::BIGINT AS freq, string_split(w, '') AS syms
         |  FROM (SELECT unnest($toks) AS w FROM documents)
         |  WHERE w <> '' GROUP BY w),
         |${(1 to rounds).map(roundCtes).mkString(",\n")},
         |seg0 AS (SELECT doc_id, string_split(tok, '') AS syms FROM
         |  (SELECT doc_id, unnest($toks) AS tok FROM documents) WHERE tok <> ''),
         |${(1 to rounds).map(segCte).mkString(",\n")}""".stripMargin
    }

    // the fixed-point BM25 replay over a pluggable term-frequency CTE —
    // shared by the raw-corpus maintenance family (incr/del/compact/
    // streams) and, with the Zipfian CTE, by sim_bm25/sim_bm25_index
    def bm25SqlOverTf(tfCtes: String): String =
  s"""WITH $tfCtes,
           |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
           |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot_len FROM dl),
           |dfq AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY t
           |  HAVING count(*) <= 1000),
           |q AS (SELECT DISTINCT doc_id AS query_id, t FROM tf
           |  WHERE doc_id IN (0, 1, 2, 3, 4)),
           |sc AS (SELECT q.query_id, tf.doc_id,
           |    least(CAST(floor((100.0::DOUBLE) * n_docs / df) AS BIGINT), 10000) *
           |      ((tf.tf * 2200 * 1000) // (tf.tf * 1000 +
           |        (1200 * (250 + (750 * dl.dl * 1000) // ((1000 * tot_len) // n_docs))) // 1000))
           |      AS contrib
           |  FROM q JOIN tf USING (t) JOIN dfq USING (t)
           |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
           |  WHERE tf.doc_id <> q.query_id),
           |r AS (SELECT query_id, doc_id, sum(contrib)::BIGINT AS score_x1e5,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sum(contrib) DESC, doc_id) AS rank
           |  FROM sc GROUP BY query_id, doc_id)
           |SELECT query_id, doc_id, rank::BIGINT AS rank, score_x1e5
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

    val bm25OracleSql = bm25SqlOverTf(
      s"""tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM
         |    (SELECT doc_id, unnest($toks) AS t FROM documents)
         |  WHERE t <> '' GROUP BY doc_id, t)""".stripMargin)

    // the Zipfian synthetic-corpus replay (TextAnalysis.syntheticZipfCorpus
    // mirrored in pure integer arithmetic — LCG draw, scale s = h mod 13,
    // term id below 2^(s+1)); sim_bm25's corpus at EVERY scale factor,
    // so the bench's retrieval cell ranks a real distribution instead of
    // df-capping a 31-term vocabulary into an empty join
    val bm25ZipfOracleSql = bm25SqlOverTf(
      """zt AS (SELECT doc_id,
        |    ((doc_id*1000003 + r.i*7919 + 12345) % 2147483647) AS h
        |  FROM documents CROSS JOIN range(0, 64) r(i)
        |  WHERE r.i < doc_id % 45 + 20),
        |ztok AS (SELECT doc_id,
        |    'z' || CAST((h // 13) %
        |      (CAST(1 AS BIGINT) << CAST(h % 13 + 1 AS INT)) AS VARCHAR) AS t
        |  FROM zt),
        |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM ztok
        |  GROUP BY doc_id, t)""".stripMargin)

    // unit-normalized embedding CTEs (mirrors Dedup.withUnitVector): DuckDB
    // list_dot_product folds sequentially — verified bit-identical to
    // Spark's index left-fold. cosine(a,b) = dot of unit vectors.
    val unitVecCte =
      "e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n" +
        "e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),\n" +
        "en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1)"
    // brute-force cosine top-k replay — shared verbatim by the Scala plan
    // (`ann_topk`) and the pure-spark.sql graft_dot form (`sql_ann_topk`)
    val annTopkOracleSql: String =
      s"""WITH $unitVecCte,
         |q AS (SELECT vec_id AS query_id, vn AS qv FROM en WHERE vec_id < 10),
         |scored AS (SELECT query_id, en.vec_id, list_dot_product(qv, vn) AS cos
         |  FROM q JOIN en ON query_id <> en.vec_id),
         |r AS (SELECT query_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
         |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    // shared by dedup_clusters and dedup_clusters_star (same contract,
    // same fixpoint — min reachable id over the near-dup pair graph)
    val clustersOracle =
      """WITH RECURSIVE
          |b0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |u0 AS (SELECT vec_id, v FROM b0
          |  UNION ALL
          |  SELECT vec_id + 1000000 AS vec_id, list_concat([v[1]*(1.05::DOUBLE)], v[2:]) AS v FROM b0),
          |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM u0),
          |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1),
          |pr AS (SELECT vec_a, vec_b FROM (
          |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          |      CAST(floor(list_dot_product(a.vn, b.vn) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
          |    FROM en a JOIN en b ON a.vec_id < b.vec_id)
          |  WHERE cos_x1000000 >= 900000),
          |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pr UNION SELECT vec_b, vec_a FROM pr),
          |nodes AS (SELECT DISTINCT src AS id FROM edges),
          |reach(id, r) AS (
          |  SELECT id, id FROM nodes
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
          |SELECT id AS vec_id, min(r) AS canonical_id FROM reach GROUP BY id ORDER BY vec_id""".stripMargin

    val validWhere =
      "text IS NOT NULL AND text <> '' AND lang IS NOT NULL AND lang <> '' " +
        "AND source IS NOT NULL AND source <> '' AND lower(text) NOT LIKE '#redirect%'"

    // MinHash-LSH near-dup pairs: shared by dedup_minhash (Scala API) and
    // sql_minhash_pairs (the spark.sql + graft_* function surface)
    val minhashOracleSql =
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
         |sh AS (SELECT doc_id, unnest(shs) AS sh FROM s),
         |hh AS (SELECT doc_id, ${poly("sh")} AS h FROM sh),
         |mh AS (SELECT doc_id, i, min(((1000003*(i+1))*h + 12345 + 7919*i) % 1000000007) AS mh
         |  FROM hh CROSS JOIN range(0, 16) r(i) GROUP BY doc_id, i),
         |bk AS (SELECT doc_id, i // 4 AS band, string_agg(mh::VARCHAR, '-' ORDER BY i) AS bkey
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b FROM bk x
         |  JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |est AS (SELECT doc_a, doc_b, sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT AS matches
         |  FROM cand JOIN mh ma ON ma.doc_id = doc_a
         |  JOIN mh mb ON mb.doc_id = doc_b AND mb.i = ma.i
         |  GROUP BY doc_a, doc_b)
         |SELECT * FROM (
         |  SELECT doc_a, doc_b, CAST(floor((100.0::DOUBLE) * matches / 16 + 0.5) AS BIGINT) AS est_jaccard_x100 FROM est)
         |WHERE est_jaccard_x100 >= 50 ORDER BY doc_a, doc_b""".stripMargin

    // the full corpus-assembly chain, stage for stage: validated docs →
    // ngram-pair graph → recursive-CTE canonical filter → hash split →
    // 8-gram decontamination → BPE-token greedy packing; shared by
    // e2e_corpus and e2e_corpus_from_artifact
    val e2eCorpusOracleSql =
      s"""WITH RECURSIVE v AS (SELECT doc_id, text, source FROM documents WHERE $validWhere),
           |t AS (SELECT doc_id, $toks AS toks FROM v),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |    FROM common JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jaccard_x10000 >= 5000),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr UNION SELECT doc_b, doc_a FROM pr),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, r) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
           |cl AS (SELECT id, min(r) AS canonical_id FROM reach GROUP BY id),
           |canon AS (SELECT v.doc_id, v.text, v.source FROM v
           |  LEFT JOIN cl ON v.doc_id = cl.id
           |  WHERE cl.id IS NULL OR cl.id = cl.canonical_id),
           |sp AS (SELECT doc_id, text, source, (${poly("'split:' || doc_id")}) % 100 AS b FROM canon),
           |tr AS (SELECT doc_id, text, source, 'train' AS split FROM sp WHERE b < 80),
           |ev AS (SELECT doc_id, text, source,
           |    CASE WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM sp WHERE b >= 80),
           |trt AS (SELECT doc_id, $toks AS toks FROM tr),
           |trs AS (SELECT DISTINCT ${poly("sh")} AS h FROM
           |  (SELECT unnest(${shinglesOfN(8)}) AS sh FROM trt)),
           |evt AS (SELECT doc_id, $toks AS toks FROM ev),
           |evs AS (SELECT doc_id, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM evt)),
           |esz AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM evs GROUP BY doc_id),
           |ehit AS (SELECT evs.doc_id, count(*)::BIGINT AS n_hit
           |  FROM evs JOIN trs ON evs.h = trs.h GROUP BY evs.doc_id),
           |contam AS (SELECT esz.doc_id FROM esz JOIN ehit ON esz.doc_id = ehit.doc_id
           |  WHERE CAST(floor((10000.0::DOUBLE) * n_hit / greatest(n_sh, 1) + 0.5) AS BIGINT) >= 5000),
           |keep AS (SELECT doc_id, text, source, split FROM tr
           |  UNION ALL
           |  SELECT doc_id, text, source, split FROM ev
           |  WHERE NOT EXISTS (SELECT 1 FROM contam WHERE contam.doc_id = ev.doc_id)),
           |pt AS (SELECT split, source, doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM keep),
           |c AS (SELECT split, source, doc_id, tok_cnt,
           |    sum(tok_cnt) OVER (PARTITION BY split, source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM pt)
           |SELECT split, source, CAST(floor((cum - tok_cnt) / 512) AS BIGINT) AS seq_no,
           |  count(*)::BIGINT AS n_docs, sum(tok_cnt)::BIGINT AS seq_tokens
           |FROM c GROUP BY split, source, seq_no ORDER BY split, source, seq_no""".stripMargin

    val base = Map(
      "s1_scan_stubs" ->
        "SELECT doc_id, source, lang FROM documents WHERE doc_id >= 0 ORDER BY doc_id LIMIT 100",

      "s4_point_lookup" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42 ORDER BY doc_id",

      "p3_article_metadata" ->
        s"""SELECT doc_id,
           |  length(text)::BIGINT AS content_length,
           |  length($norm)::BIGINT AS clean_length,
           |  ($wordCnt)::BIGINT AS word_count,
           |  len(string_split(text, chr(10)))::BIGINT AS line_count,
           |  'https://en.wikipedia.org/wiki/' || replace('doc_' || doc_id, ' ', '_') AS url
           |FROM documents WHERE $validWhere ORDER BY doc_id""".stripMargin,

      "p5_url_construct" ->
        "SELECT p_partkey, 'https://en.wikipedia.org/wiki/' || replace(p_name, ' ', '_') AS url FROM part ORDER BY p_partkey",

      "p7_clean_text" ->
        s"SELECT doc_id, $norm AS clean_text FROM documents ORDER BY doc_id",

      "p8_category_cleanup" ->
        s"""SELECT doc_id, array_to_string(
           |  list_filter(
           |    list_transform(
           |      list_transform($toks[1:5], t -> 'Category:' || t) || ['', 'Category:  '],
           |      x -> trim(regexp_replace(x, '^Category:', ''))),
           |    x -> x IS NOT NULL AND x <> ''), '|') AS categories
           |FROM documents ORDER BY doc_id""".stripMargin,

      "u1_wikitext_strip" -> {
        val wt = s"'{{Infobox|a=' || lang || '}} ''''''' || substr($norm, 1, 30) || " +
          s"''''''' see [[Target|' || source || ']] and [[' || lang || " +
          s"']]<ref name=x>r</ref> ==h== ' || substr($norm, 31, 50)"
        s"""SELECT doc_id, ${normOf(
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
            wt +
            ", '\\{\\{[^{}]*\\}\\}', ' ', 'g')" +
            ", '\\{\\{[^{}]*\\}\\}', ' ', 'g')" +
            ", '<ref[^>]*>.*?</ref>|<ref[^>]*/>', ' ', 'g')" +
            ", '\\[\\[[^\\]|]*\\|([^\\]]*)\\]\\]', '\\1', 'g')" +
            ", '\\[\\[([^\\]]*)\\]\\]', '\\1', 'g')" +
            ", '\\[https?://[^\\s\\]]*( ([^\\]]*))?\\]', '\\2', 'g')" +
            ", '''{2,}', '', 'g')" +
            ", '={2,}', '', 'g')")} AS plain_text
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "f1_validate" ->
        s"SELECT source, count(*)::BIGINT AS valid_docs FROM documents WHERE $validWhere GROUP BY source ORDER BY source",

      "f6_empty_revisions" ->
        s"""SELECT doc_id, len(list_slice($toks, 1, (doc_id % 3)::INT))::BIGINT AS n_revisions
           |FROM documents
           |WHERE len(list_slice($toks, 1, (doc_id % 3)::INT)) > 0
           |ORDER BY doc_id""".stripMargin,

      "j1_antijoin_dedup" ->
        """SELECT c_custkey, c_name FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin,

      "j2_union_dedup" ->
        """SELECT DISTINCT doc_id FROM (
          |  SELECT doc_id FROM documents WHERE source IN ('src0','src1')
          |  UNION ALL
          |  SELECT doc_id FROM documents WHERE source IN ('src1','src2')
          |) ORDER BY doc_id""".stripMargin,

      "j3_enrich_join" ->
        """SELECT e.vec_id AS doc_id, d.lang, e.label, length(d.text)::BIGINT AS content_length
          |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
          |ORDER BY doc_id""".stripMargin,

      // the salted join must be row-identical to the plain join
      "skew_salted_join" ->
        """WITH ls AS (SELECT lang, count(*)::BIGINT AS lang_docs,
          |    sum(length(text))::BIGINT AS lang_chars
          |  FROM documents GROUP BY lang)
          |SELECT doc_id, d.lang AS lang, lang_docs, lang_chars
          |FROM documents d JOIN ls ON d.lang = ls.lang
          |ORDER BY doc_id""".stripMargin,

      "a1_corpus_summary" ->
        s"""SELECT count(*)::BIGINT AS total_docs,
           |  sum(length(text))::BIGINT AS total_content_length,
           |  sum(length(text))::BIGINT / count(*)::BIGINT AS avg_content_length,
           |  sum($wordCnt)::BIGINT AS total_words,
           |  count(DISTINCT lang)::BIGINT AS unique_langs
           |FROM documents""".stripMargin,

      "a2_source_summary" ->
        s"""SELECT source, count(*)::BIGINT AS doc_count,
           |  sum(length(text))::BIGINT AS total_content_length,
           |  sum(length(text))::BIGINT / count(*)::BIGINT AS avg_content_length,
           |  count(DISTINCT lang)::BIGINT AS unique_langs
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "a3_status_counts" ->
        "SELECT o_orderstatus, count(*)::BIGINT AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",

      "a7_event_window" ->
        """SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
          |  count(*)::BIGINT AS n,
          |  sum(CAST(floor(value*10000 + 0.5) AS BIGINT)) / (10000.0::DOUBLE) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

      "a8_props_summary" ->
        """SELECT event_type, count(*)::BIGINT AS n,
          |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "p6_timestamp_normalize" ->
        "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS order_iso FROM orders ORDER BY o_orderkey",

      // the html branch replays the full page-plant + extraction chain over
      // the html-format quarter; other branches unchanged
      "s8_format_dispatch" ->
        s"""WITH hpage AS (SELECT doc_id, $htmlPageSql AS html
           |  FROM documents WHERE doc_id % 4 = 1),
           |$htmlExtractCtes
           |SELECT d.doc_id AS doc_id,
           |  CASE WHEN d.doc_id % 4 = 0 THEN 'wikitext' WHEN d.doc_id % 4 = 1 THEN 'html'
           |       WHEN d.doc_id % 4 = 2 THEN 'plain' ELSE 'summary' END AS format,
           |  CASE WHEN d.doc_id % 4 = 2 THEN $norm
           |       WHEN d.doc_id % 4 = 1 THEN coalesce(hxe.plain_text, '')
           |       WHEN d.doc_id % 4 = 3 THEN split_part($norm, '. ', 1)
           |       ELSE text END AS rendition
           |FROM documents d LEFT JOIN hxe ON hxe.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      // HTML→text extraction over the planted pages for EVERY doc: the
      // oracle replays script/style/comment drop, block-tag line breaks,
      // inline strip, anchor-text link density, entity decode
      "web_html_text" ->
        s"""WITH hpage AS (SELECT doc_id, $htmlPageSql AS html FROM documents),
           |$htmlExtractCtes
           |SELECT d.doc_id AS doc_id,
           |  coalesce(n_lines, 0)::BIGINT AS n_lines,
           |  coalesce(n_kept_lines, 0)::BIGINT AS n_kept_lines,
           |  coalesce(plain_text, '') AS plain_text
           |FROM documents d LEFT JOIN hxe ON hxe.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      "p10_to_json" ->
        """SELECT doc_id,
          |  to_json(struct_pack(doc_id := doc_id, lang := lang, source := source)) AS doc_json
          |FROM documents ORDER BY doc_id""".stripMargin,

      "a4_unique_tokens" ->
        s"""SELECT lang, count(DISTINCT tok)::BIGINT AS unique_tokens
           |FROM (SELECT lang, unnest($toks) AS tok FROM documents)
           |GROUP BY lang ORDER BY lang""".stripMargin,

      // the sketch-accuracy quartet (round-15 verdict task 5): the engine
      // emits exact values + an accuracy-verdict boolean computed from its
      // own sketch; the oracle recomputes the exact side and asserts the
      // verdict is literally TRUE — so a sketch violating its advertised
      // bound fails the gate like any wrong answer.
      "a9_approx_distinct" ->
        s"""SELECT lang, count(DISTINCT tok)::BIGINT AS exact_unique_tokens,
           |  TRUE AS within_5pct
           |FROM (SELECT lang, unnest($toks) AS tok FROM documents)
           |GROUP BY lang ORDER BY lang""".stripMargin,

      "a22_mg_heavy_hitters" ->
        s"""WITH t AS (SELECT tok AS term
           |    FROM (SELECT unnest($toks) AS tok FROM documents)
           |    WHERE tok <> ''),
           |c AS (SELECT term, count(*)::BIGINT AS exact_cnt FROM t GROUP BY term),
           |n AS (SELECT count(*)::BIGINT AS n_tot FROM t)
           |SELECT term, exact_cnt, TRUE AS mg_found, TRUE AS bound_ok
           |FROM c, n WHERE exact_cnt * 33 > n_tot
           |ORDER BY exact_cnt DESC, term""".stripMargin,

      "a15b_approx_percentiles" ->
        """WITH t AS (SELECT source, length(text)::BIGINT AS v FROM documents),
          |n AS (SELECT source, count(*)::BIGINT AS n FROM t GROUP BY source)
          |SELECT source, pct::BIGINT AS pct, n, TRUE AS rank_err_ok
          |FROM n CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct)
          |ORDER BY source, pct""".stripMargin,

      "ann_ivf" ->
        """SELECT DISTINCT vec_id::BIGINT AS query_id, 5::BIGINT AS k,
          |  TRUE AS found_any, TRUE AS recall_floor_met
          |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))::BIGINT AS sum_qty_x100,
          |  sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))::BIGINT AS sum_base_price_x100,
          |  sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT))::BIGINT AS sum_disc_price_x10000,
          |  count(*)::BIGINT AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q3_top_orders" ->
        """SELECT l_orderkey, o_orderdate,
          |  sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT))::BIGINT AS revenue_x10000
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY l_orderkey, o_orderdate
          |ORDER BY revenue_x10000 DESC, l_orderkey LIMIT 10""".stripMargin,

      "q5_region_revenue" ->
        """SELECT r_name, n_name,
          |  sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT))::BIGINT AS revenue_x10000,
          |  count(*)::BIGINT AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

      // manual CASE pivot mirroring groupBy().pivot(values) column for
      // column; absent cells 0 on both sides
      "q10_pivot" -> {
        val cols = operators.Relational.PivotYears.map(y =>
          s"  sum(CASE WHEN y = $y THEN rev ELSE 0 END)::BIGINT AS rev_${y}_x10000")
          .mkString(",\n")
        s"""SELECT n_name,
           |$cols
           |FROM (SELECT n_name, year(o_orderdate) AS y,
           |    CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) AS rev
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey)
           |GROUP BY n_name ORDER BY n_name""".stripMargin
      },

      "q11_promo_revenue" ->
        """WITH r AS (SELECT p_type = 'PROMO' AS is_promo,
          |    CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) AS rev
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
          |SELECT sum(CASE WHEN is_promo THEN rev ELSE 0 END)::BIGINT AS promo_x10000,
          |  sum(rev)::BIGINT AS total_x10000,
          |  ((sum(CASE WHEN is_promo THEN rev ELSE 0 END) * 10000) // sum(rev))::BIGINT AS promo_share_x10000
          |FROM r""".stripMargin,

      "q12_supplier_revenue" ->
        """SELECT n_name, year(l_shipdate)::BIGINT AS o_year,
          |  sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT))::BIGINT AS revenue_x10000,
          |  count(*)::BIGINT AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name, o_year ORDER BY n_name, o_year""".stripMargin,

      "q13_order_histogram" ->
        """WITH per_cust AS (
          |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
          |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |  GROUP BY c_custkey)
          |SELECT c_count, count(*)::BIGINT AS custdist
          |FROM per_cust GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin,

      // blocked fuzzy ER: the oracle replays the same distinct-name
      // vocabulary, last-token block, and levenshtein gate (byte-lev ==
      // char-lev on the ASCII part names)
      "er_fuzzy_names" ->
        """WITH names AS (
          |  SELECT p_name AS name, count(*)::BIGINT AS n FROM part GROUP BY 1),
          |b AS (SELECT name, n, split_part(name, ' ', -1) AS blk FROM names)
          |SELECT a.name AS name_a, c.name AS name_b,
          |  levenshtein(a.name, c.name)::BIGINT AS dist,
          |  a.n AS n_a, c.n AS n_b
          |FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
          |WHERE levenshtein(a.name, c.name) <= 2
          |ORDER BY name_a, name_b""".stripMargin,

      // rolling 5-row window replay: same (ts, event_id) order, exact
      // fixed-point sum/count, BIGINT floor-division mean
      "a23_rolling_mean" ->
        """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
          |    CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
          |w AS (SELECT event_id, user_id,
          |    sum(v) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)::BIGINT AS roll_sum_x100,
          |    count(*) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)::BIGINT AS roll_n
          |  FROM t)
          |SELECT event_id, user_id, roll_sum_x100, roll_n,
          |  (roll_sum_x100 // roll_n)::BIGINT AS roll_mean_x100
          |FROM w ORDER BY event_id""".stripMargin,

      "q15_disjunctive" ->
        """SELECT sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT))::BIGINT AS revenue_x10000,
          |  count(*)::BIGINT AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
          |    AND l_quantity BETWEEN 1 AND 20)
          |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
          |    AND l_quantity BETWEEN 10 AND 35)
          |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
          |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

      // Q17 decorrelated replay: per-part quantity sums, exact rational
      // compare (5*q*cnt < sum) — no rounded average on either engine
      "q17_small_quantity" ->
        """WITH l AS (SELECT l_partkey,
          |    CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qx100,
          |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS px100
          |  FROM lineitem),
          |a AS (SELECT l_partkey, sum(qx100)::BIGINT AS sum_x100,
          |    count(*)::BIGINT AS cnt FROM l GROUP BY l_partkey)
          |SELECT sum(px100)::BIGINT AS revenue_x100, count(*)::BIGINT AS n_items
          |FROM l JOIN a USING (l_partkey)
          |WHERE qx100 * 5 * cnt < sum_x100""".stripMargin,

      "q18_large_orders" ->
        """WITH big AS (SELECT l_orderkey,
          |    sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))::BIGINT AS total_qty_x100
          |  FROM lineitem GROUP BY l_orderkey HAVING total_qty_x100 > 25000)
          |SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty_x100
          |FROM orders JOIN big ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey""".stripMargin,

      // Q22 replay: exact integer mean compare (bal*n > sum) + NOT EXISTS
      "q22_idle_accounts" ->
        """WITH c AS (SELECT c_custkey, c_mktsegment,
          |    CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_x100 FROM customer),
          |a AS (SELECT sum(bal_x100)::BIGINT AS sum_x100, count(*)::BIGINT AS n FROM c),
          |q AS (SELECT c.* FROM c, a WHERE bal_x100 * n > sum_x100
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'))
          |SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
          |  sum(bal_x100)::BIGINT AS balance_x100
          |FROM q GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      // Q20 replay: the CLASSIC nested-IN subquery form — the engine's
      // decorrelated colocated-agg plan must reproduce it exactly
      "q20_dominant_share" ->
        """SELECT s.s_suppkey, s.s_name, n.n_name
          |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          |WHERE n.n_name IN ('NATION_3', 'NATION_7')
          |  AND s.s_suppkey IN (
          |    SELECT sp.l_suppkey FROM
          |      (SELECT l_suppkey, l_partkey,
          |          sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))::BIGINT AS sq
          |        FROM lineitem GROUP BY 1, 2) sp
          |      JOIN (SELECT l_partkey,
          |          sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))::BIGINT AS tq,
          |          count(DISTINCT l_suppkey)::BIGINT AS n_supp
          |        FROM lineitem GROUP BY 1) tp ON sp.l_partkey = tp.l_partkey
          |      JOIN part p ON p.p_partkey = sp.l_partkey
          |    WHERE p.p_name LIKE 'red%' AND sp.sq * tp.n_supp > 2 * tp.tq)
          |ORDER BY s_name""".stripMargin,

      // Q21 replay: the CLASSIC correlated EXISTS + NOT-EXISTS double
      // self-join — the engine answers both with one per-order aggregate
      "q21_sole_fault" ->
        """SELECT s_name, count(*)::BIGINT AS numwait
          |FROM supplier, lineitem l1, orders
          |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

      // source-centroid cosines: exact per-source sum vectors (the /n
      // cancels out of the cosine), IEEE-sqrt finish
      "ann_source_matrix" ->
        """WITH comp AS (
          |  SELECT vec_id, d - 1 AS d, CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS xi
          |  FROM (SELECT vec_id, unnest(embedding) AS x,
          |        generate_subscripts(embedding, 1) AS d FROM embeddings)),
          |cs AS (SELECT doc.source AS source, c.d AS d, c.xi AS xi
          |  FROM comp c JOIN documents doc ON c.vec_id = doc.doc_id),
          |sums AS (SELECT source, d, sum(xi)::BIGINT AS s FROM cs GROUP BY source, d),
          |stats AS (SELECT sums.source AS source, sum(s*s)::BIGINT AS ss, any_value(nd.n) AS n
          |  FROM sums JOIN (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source) nd
          |    ON sums.source = nd.source
          |  GROUP BY sums.source),
          |dots AS (SELECT a.source AS source_a, b.source AS source_b, sum(a.s * b.s)::BIGINT AS dot
          |  FROM sums a JOIN sums b ON a.d = b.d AND a.source < b.source
          |  GROUP BY a.source, b.source)
          |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b,
          |  CAST(floor((1000000.0::DOUBLE) * dot /
          |    (sqrt(CAST(sa.ss AS DOUBLE)) * sqrt(CAST(sb.ss AS DOUBLE))) + 0.5) AS BIGINT) AS cos_x1000000
          |FROM dots JOIN stats sa ON dots.source_a = sa.source
          |JOIN stats sb ON dots.source_b = sb.source
          |ORDER BY source_a, source_b""".stripMargin,

      "ann_pca" -> pcaOracleSql,

      "ann_whiten" -> annWhitenSql,

      // fuzzy pair graph closed transitively (min reachable name), the
      // dedup_clusters recursive-CTE oracle pattern over string ids
      "er_fuzzy_clusters" ->
        """WITH RECURSIVE
          |names AS (SELECT p_name AS name, count(*)::BIGINT AS n_entities FROM part GROUP BY 1),
          |b AS (SELECT name, n_entities, split_part(name, ' ', -1) AS blk FROM names),
          |pairs AS (SELECT a.name AS name_a, c.name AS name_b
          |  FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
          |  WHERE levenshtein(a.name, c.name) <= 2),
          |edges AS (SELECT name_a AS src, name_b AS dst FROM pairs
          |  UNION SELECT name_b, name_a FROM pairs),
          |reach AS (SELECT src, src AS r FROM edges
          |  UNION SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.src),
          |canon AS (SELECT src AS name, min(r) AS canonical FROM reach GROUP BY src)
          |SELECT canon.name AS name, canonical, n.n_entities AS n_entities
          |FROM canon JOIN names n ON canon.name = n.name
          |ORDER BY name""".stripMargin,

      // one-pass profile replay: nulls + exact distincts per column
      "dq_profile" ->
        """WITH p AS (SELECT count(*)::BIGINT AS n_rows,
          |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn1, count(DISTINCT o_orderkey)::BIGINT AS nd1,
          |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn2, count(DISTINCT o_custkey)::BIGINT AS nd2,
          |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn3, count(DISTINCT o_orderstatus)::BIGINT AS nd3,
          |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn4, count(DISTINCT o_totalprice)::BIGINT AS nd4,
          |    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn5, count(DISTINCT o_orderpriority)::BIGINT AS nd5
          |  FROM orders)
          |SELECT 'orders' AS table_name, column_name, n_nulls, n_distinct, n_rows FROM (
          |  SELECT 'o_orderkey' AS column_name, nn1 AS n_nulls, nd1 AS n_distinct, n_rows FROM p
          |  UNION ALL SELECT 'o_custkey', nn2, nd2, n_rows FROM p
          |  UNION ALL SELECT 'o_orderstatus', nn3, nd3, n_rows FROM p
          |  UNION ALL SELECT 'o_totalprice', nn4, nd4, n_rows FROM p
          |  UNION ALL SELECT 'o_orderpriority', nn5, nd5, n_rows FROM p)
          |ORDER BY column_name""".stripMargin,

      // margin-criterion replay: unit vectors, the en×de candidate block,
      // both-side top-4 integer NN sums, the exact integer margin division
      "mine_bitext" ->
        """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
          |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1),
          |d AS (SELECT en.vec_id AS vec_id, vn, lang FROM en JOIN documents ON en.vec_id = documents.doc_id),
          |s AS (SELECT vec_id AS src_id, vn AS sv FROM d WHERE lang = 'en'),
          |tt AS (SELECT vec_id AS tgt_id, vn AS tv FROM d WHERE lang = 'de'),
          |sc AS (SELECT src_id, tgt_id,
          |    CAST(floor(list_dot_product(sv, tv) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
          |  FROM s CROSS JOIN tt),
          |sr AS (SELECT src_id, cos_x1000000,
          |    row_number() OVER (PARTITION BY src_id ORDER BY cos_x1000000 DESC, tgt_id) AS r FROM sc),
          |snn AS (SELECT src_id, sum(cos_x1000000)::BIGINT AS snn, count(*)::BIGINT AS ks
          |  FROM sr WHERE r <= 4 GROUP BY src_id),
          |tr AS (SELECT tgt_id, cos_x1000000,
          |    row_number() OVER (PARTITION BY tgt_id ORDER BY cos_x1000000 DESC, src_id) AS r FROM sc),
          |tnn AS (SELECT tgt_id, sum(cos_x1000000)::BIGINT AS tnn, count(*)::BIGINT AS kt
          |  FROM tr WHERE r <= 4 GROUP BY tgt_id),
          |m AS (SELECT sc.src_id, sc.tgt_id, cos_x1000000,
          |    ((2 * cos_x1000000 * ks * kt * 1000000) // (snn * kt + tnn * ks))::BIGINT AS margin_x1000000
          |  FROM sc JOIN snn USING (src_id) JOIN tnn USING (tgt_id)
          |  WHERE cos_x1000000 >= 0 AND snn * kt + tnn * ks > 0),
          |b AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin_x1000000 DESC, tgt_id) AS best FROM m)
          |SELECT src_id, tgt_id, cos_x1000000, margin_x1000000 FROM b
          |WHERE best = 1 AND margin_x1000000 >= 1000000
          |ORDER BY src_id""".stripMargin,

      // the ANN-candidate form: the target language's deterministic coarse
      // cells (the ann_ivf_det quantizer replay) bound the candidate set;
      // the margin CTEs are identical to mine_bitext's, just over the
      // probed candidates instead of the cross product
      "mine_bitext_ann" ->
        """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
          |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1),
          |d AS (SELECT en.vec_id AS vec_id, vn, lang FROM en JOIN documents ON en.vec_id = documents.doc_id),
          |s AS (SELECT vec_id AS src_id, vn AS sv FROM d WHERE lang = 'en'),
          |tt AS (SELECT vec_id AS tgt_id, vn AS tv FROM d WHERE lang = 'de'),
          |cpd AS (SELECT tgt_id, p,
          |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), dd ->
          |      ((((1103515245*(p*64+dd+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * tv[dd+1])),
          |    (acc, x) -> acc + x) AS dotp
          |  FROM tt CROSS JOIN range(0, 4) r(p)),
          |ccell AS (SELECT tgt_id,
          |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
          |  FROM cpd GROUP BY tgt_id),
          |ta AS (SELECT tt.tgt_id, tv, cell FROM tt JOIN ccell ON tt.tgt_id = ccell.tgt_id),
          |ccomp AS (SELECT cell, dd, CAST(floor(tv[dd+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
          |  FROM ta CROSS JOIN range(0, 64) r(dd)),
          |ccent AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY dd) AS centroid
          |  FROM (SELECT cell, dd, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
          |        FROM ccomp GROUP BY cell, dd) GROUP BY cell),
          |probes AS (SELECT src_id, cell FROM (
          |    SELECT src_id, c.cell,
          |      row_number() OVER (PARTITION BY src_id ORDER BY
          |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(sv, c.centroid), c.cell) AS crank
          |    FROM s CROSS JOIN ccent c) WHERE crank <= 4),
          |sc AS (SELECT s.src_id, ta.tgt_id,
          |    CAST(floor(list_dot_product(sv, tv) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
          |  FROM probes JOIN ta ON probes.cell = ta.cell
          |  JOIN s ON s.src_id = probes.src_id),
          |sr AS (SELECT src_id, cos_x1000000,
          |    row_number() OVER (PARTITION BY src_id ORDER BY cos_x1000000 DESC, tgt_id) AS r FROM sc),
          |snn AS (SELECT src_id, sum(cos_x1000000)::BIGINT AS snn, count(*)::BIGINT AS ks
          |  FROM sr WHERE r <= 4 GROUP BY src_id),
          |tr AS (SELECT tgt_id, cos_x1000000,
          |    row_number() OVER (PARTITION BY tgt_id ORDER BY cos_x1000000 DESC, src_id) AS r FROM sc),
          |tnn AS (SELECT tgt_id, sum(cos_x1000000)::BIGINT AS tnn, count(*)::BIGINT AS kt
          |  FROM tr WHERE r <= 4 GROUP BY tgt_id),
          |m AS (SELECT sc.src_id, sc.tgt_id, cos_x1000000,
          |    ((2 * cos_x1000000 * ks * kt * 1000000) // (snn * kt + tnn * ks))::BIGINT AS margin_x1000000
          |  FROM sc JOIN snn USING (src_id) JOIN tnn USING (tgt_id)
          |  WHERE cos_x1000000 >= 0 AND snn * kt + tnn * ks > 0),
          |b AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin_x1000000 DESC, tgt_id) AS best FROM m)
          |SELECT src_id, tgt_id, cos_x1000000, margin_x1000000 FROM b
          |WHERE best = 1 AND margin_x1000000 >= 1000000
          |ORDER BY src_id""".stripMargin,

      // Gopher quality heuristics over the web-artifact-planted corpus:
      // every signal recomputed from the planted text, fixed-point ratios
      "web_gopher" ->
        s"""WITH p AS (SELECT doc_id, $webTextSql AS text FROM documents),
           |$gopherReportSql""".stripMargin,

      // HTML extraction COMPOSED with the Gopher gate — the order a real
      // crawl pipeline runs them (extract first, rule-filter the extracted
      // text): the oracle replays the full page-plant + extraction chain,
      // then the same gopher signal block over the extracted text
      "web_html_curate" ->
        s"""WITH hpage AS (SELECT doc_id, $htmlPageSql AS html FROM documents),
           |$htmlExtractCtes,
           |p AS (SELECT d.doc_id AS doc_id, coalesce(hxe.plain_text, '') AS text
           |  FROM documents d LEFT JOIN hxe ON hxe.doc_id = d.doc_id),
           |$gopherReportSql""".stripMargin,

      // C4 cleaning rules over the same planted corpus: line retention +
      // the three page gates + the cleaned text
      "web_c4" ->
        s"""WITH p AS (SELECT doc_id, $webTextSql AS text FROM documents),
           |t AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM p),
           |k AS (SELECT doc_id, text, lines,
           |    list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"]$$')
           |      AND ${normOf("l")} <> ''
           |      AND len(string_split(${normOf("l")}, ' ')) >= 5) AS kept
           |  FROM t),
           |s2 AS (SELECT doc_id, len(lines)::BIGINT AS n_lines,
           |    len(kept)::BIGINT AS n_kept_lines,
           |    len(regexp_extract_all(text, '[.!?]'))::BIGINT AS n_sentences,
           |    (lower(text) LIKE '%lorem ipsum%') AS has_lorem,
           |    (text LIKE '%{%') AS has_brace, kept
           |  FROM k)
           |SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
           |  has_brace,
           |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace) AS pass,
           |  CASE WHEN n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
           |    THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text
           |FROM s2 ORDER BY doc_id""".stripMargin,

      // the per-source curation funnel: both filter gates recomputed
      // inline, the exact-dedup canonical as the hash-keyed window
      // the Gopher leg is the FULL A1.1 gate: form rules AND the 13
      // repetition rules (repsig replays WebCuration.repCols per doc)
      "e2e_web_curate" ->
        s"""WITH p AS (SELECT doc_id, source, $webTextSql AS text FROM documents),
           |$repCtes,
           |nn AS (SELECT doc_id, source, text, ${normOf("text")} AS norm FROM p),
           |t AS (SELECT doc_id, source, text, norm,
           |    (CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END)::BIGINT AS n_words,
           |    string_split(norm, ' ') AS toks,
           |    string_split(text, chr(10)) AS lines FROM nn),
           |f AS (SELECT doc_id, source, norm, n_words AS wc,
           |    CASE WHEN n_words >= 50 AND n_words <= 100000
           |      AND (CASE WHEN n_words = 0 THEN 0 ELSE CAST(floor((100.0::DOUBLE) * (len(norm) - (n_words - 1))::DOUBLE / n_words + 0.5) AS BIGINT) END) BETWEEN 300 AND 1000
           |      AND CAST(floor((10000.0::DOUBLE) * (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE / greatest(n_words, 1) + 0.5) AS BIGINT) <= 1000
           |      AND CAST(floor((10000.0::DOUBLE) * len(list_filter(lines, l -> ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %'))::DOUBLE / len(lines) + 0.5) AS BIGINT) <= 9000
           |      AND CAST(floor((10000.0::DOUBLE) * len(list_filter(lines, l -> rtrim(l) LIKE '%...'))::DOUBLE / len(lines) + 0.5) AS BIGINT) <= 3000
           |      AND CAST(floor((10000.0::DOUBLE) * len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))::DOUBLE / greatest(n_words, 1) + 0.5) AS BIGINT) >= 8000
           |      AND len(list_intersect(toks, ['the','be','to','of','and','that','have','with'])) >= 2
           |      THEN 1 ELSE 0 END AS gp,
           |    CASE WHEN len(regexp_extract_all(text, '[.!?]')) >= 3
           |      AND NOT (lower(text) LIKE '%lorem ipsum%')
           |      AND NOT (text LIKE '%{%')
           |      THEN 1 ELSE 0 END AS cp
           |  FROM t),
           |g AS (SELECT source, f.gp * (CASE WHEN $repPassSql THEN 1 ELSE 0 END) AS gp, cp, wc,
           |    CASE WHEN f.doc_id = min(f.doc_id) OVER (PARTITION BY ${poly2("norm")})
           |      THEN 1 ELSE 0 END AS canon
           |  FROM f JOIN repsig ON repsig.doc_id = f.doc_id)
           |SELECT source, count(*)::BIGINT AS n_raw,
           |  sum(gp)::BIGINT AS n_gopher, sum(cp)::BIGINT AS n_c4,
           |  sum(gp * cp)::BIGINT AS n_both,
           |  sum(gp * cp * canon)::BIGINT AS n_final,
           |  sum(gp * cp * canon * wc)::BIGINT AS final_ws_tokens
           |FROM g GROUP BY source ORDER BY source""".stripMargin,

      // Gopher repetition half over the repetition-planted corpus: the
      // relational replay of the map-only expression (see repCtes)
      "web_gopher_rep" ->
        s"""WITH p AS (SELECT doc_id, $repTextSql AS text FROM documents),
           |$repCtes
           |SELECT doc_id,
           |  dup_line_frac_x10000, dup_line_char_frac_x10000,
           |  dup_para_frac_x10000, dup_para_char_frac_x10000,
           |  top2_char_frac_x10000, top3_char_frac_x10000, top4_char_frac_x10000,
           |  dup5_char_frac_x10000, dup6_char_frac_x10000, dup7_char_frac_x10000,
           |  dup8_char_frac_x10000, dup9_char_frac_x10000, dup10_char_frac_x10000,
           |  (dup_line_frac_x10000 <= 3000) AS r_dup_lines,
           |  (dup_line_char_frac_x10000 <= 2000) AS r_dup_line_chars,
           |  (dup_para_frac_x10000 <= 3000) AS r_dup_paras,
           |  (dup_para_char_frac_x10000 <= 2000) AS r_dup_para_chars,
           |  (top2_char_frac_x10000 <= 2000) AS r_top2,
           |  (top3_char_frac_x10000 <= 1800) AS r_top3,
           |  (top4_char_frac_x10000 <= 1600) AS r_top4,
           |  (dup5_char_frac_x10000 <= 1500) AS r_dup5,
           |  (dup6_char_frac_x10000 <= 1400) AS r_dup6,
           |  (dup7_char_frac_x10000 <= 1300) AS r_dup7,
           |  (dup8_char_frac_x10000 <= 1200) AS r_dup8,
           |  (dup9_char_frac_x10000 <= 1100) AS r_dup9,
           |  (dup10_char_frac_x10000 <= 1000) AS r_dup10,
           |  ($repPassSql) AS pass
           |FROM repsig ORDER BY doc_id""".stripMargin,

      // URL-level dedup: the same deterministic messy-URL construction,
      // the same canonicalization rules (lowercase scheme/host, default
      // port, trailing slash, fragment, tracking params, param sort),
      // the same min-id window
      "web_url_canon" ->
        s"""WITH u AS (SELECT doc_id,
           |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'http://' END
           |   || 'WWW.' || upper(source) || '.Example.COM'
           |   || CASE WHEN doc_id % 3 = 0 THEN ':443'
           |        WHEN doc_id % 5 = 0 THEN ':80'
           |        WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
           |   || '/wiki/' || lang || '/Doc-' || (doc_id % 100)::VARCHAR
           |   || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
           |   || CASE WHEN doc_id % 2 = 0
           |        THEN '?utm_source=feed&sort=asc&id=' || (doc_id % 100)::VARCHAR
           |        ELSE '?id=' || (doc_id % 100)::VARCHAR || '&ref=rss&sort=asc' END
           |   || '#sec' || (doc_id % 5)::VARCHAR) AS url FROM documents),
           |c0 AS (SELECT doc_id, url,
           |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
           |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
           |    regexp_replace(regexp_extract(url,
           |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$$', '') AS pth,
           |    regexp_extract(url, '\\?([^#]*)', 1) AS qraw
           |  FROM u),
           |c1 AS (SELECT doc_id, url, sch,
           |    CASE WHEN sch = 'http' THEN regexp_replace(host0, ':80$$', '')
           |         WHEN sch = 'https' THEN regexp_replace(host0, ':443$$', '')
           |         ELSE host0 END AS host,
           |    pth,
           |    array_to_string(list_sort(list_filter(string_split(qraw, '&'),
           |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS qs
           |  FROM c0),
           |c AS (SELECT doc_id, url,
           |    sch || '://' || host || pth ||
           |      CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url
           |  FROM c1)
           |SELECT doc_id, url, canon_url,
           |  min(doc_id) OVER (PARTITION BY canon_url) AS canonical_id,
           |  count(*) OVER (PARTITION BY canon_url)::BIGINT AS n_copies
           |FROM c ORDER BY doc_id""".stripMargin,

      // the crawl-to-corpus flagship: URL gate (same plant/rules as
      // web_url_filter), extraction over the planted pages, the gopher
      // block over the extracted text of URL-passing docs only, rolled up
      // per source
      "e2e_web_pipeline" ->
        s"""WITH hpage AS (SELECT doc_id, $htmlPageSql AS html FROM documents),
           |$htmlExtractCtes,
           |uf AS (SELECT doc_id,
           |    (regexp_extract(lower(regexp_extract(url,
           |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)),
           |        '([^.]+\\.[^.]+)$$', 1) IN ('spamfarm.net', 'tracker.biz')
           |     OR contains(lower(regexp_extract(url,
           |        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)), 'casino')
           |     OR contains(lower(regexp_extract(url,
           |        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)), 'lottery')) AS blocked
           |  FROM (SELECT doc_id,
           |    'http://' || source ||
           |      CASE WHEN (doc_id // 20) % 4 = 0 THEN '.tracker.biz'
           |           WHEN (doc_id // 20) % 4 = 1 THEN '.news.org'
           |           WHEN (doc_id // 20) % 4 = 2 THEN '.example.com'
           |           ELSE '.spamfarm.net' END ||
           |    '/page/' || doc_id ||
           |      CASE WHEN doc_id % 7 = 0 THEN '?session=casino-bonus'
           |           ELSE '?id=' || doc_id END AS url FROM documents)),
           |p AS (SELECT d.doc_id, coalesce(hxe.plain_text, '') AS text
           |  FROM documents d JOIN uf USING (doc_id)
           |  LEFT JOIN hxe ON hxe.doc_id = d.doc_id
           |  WHERE NOT uf.blocked),
           |g AS (WITH $gopherReportSql)
           |SELECT d.source AS source, count(*)::BIGINT AS n_raw,
           |  sum(CASE WHEN uf.blocked THEN 0 ELSE 1 END)::BIGINT AS n_url_pass,
           |  sum(CASE WHEN g.pass THEN 1 ELSE 0 END)::BIGINT AS n_gopher,
           |  coalesce(sum(CASE WHEN g.pass THEN g.n_words END), 0)::BIGINT AS gopher_ws_tokens
           |FROM documents d JOIN uf USING (doc_id)
           |LEFT JOIN g ON g.doc_id = d.doc_id
           |GROUP BY d.source ORDER BY source""".stripMargin,

      // URL filter: same planted URL construction, same last-two-label
      // domain extraction, domain verdict before keyword
      "web_url_filter" ->
        """WITH u AS (SELECT doc_id,
          |  'http://' || source ||
          |    CASE WHEN doc_id % 4 = 0 THEN '.tracker.biz'
          |         WHEN doc_id % 4 = 1 THEN '.news.org'
          |         WHEN doc_id % 4 = 2 THEN '.example.com'
          |         ELSE '.spamfarm.net' END ||
          |  '/page/' || doc_id ||
          |    CASE WHEN doc_id % 7 = 0 THEN '?session=casino-bonus'
          |         ELSE '?id=' || doc_id END AS url FROM documents),
          |dm AS (SELECT doc_id, url,
          |  regexp_extract(lower(regexp_extract(url,
          |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)),
          |    '([^.]+\.[^.]+)$', 1) AS domain FROM u),
          |b AS (SELECT doc_id, url, domain,
          |  CASE WHEN domain IN ('spamfarm.net', 'tracker.biz') THEN 'domain'
          |       WHEN contains(lower(regexp_extract(url,
          |           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)), 'casino')
          |         OR contains(lower(regexp_extract(url,
          |           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)), 'lottery')
          |       THEN 'keyword' ELSE NULL END AS block_reason FROM dm)
          |SELECT doc_id, url, domain, block_reason,
          |  block_reason IS NOT NULL AS blocked
          |FROM b ORDER BY doc_id""".stripMargin,

      // template line strip: same planting, same fixed-width chunking as
      // the dedup_lines oracle, per-source doc-frequency bar (>=2 docs AND
      // >=20% of the source), boilerplate removed everywhere and docs
      // reassembled in line order. The oracle keys on the line STRING
      // while Spark keys on its content hash — collision-free agreement is
      // exactly what the cross-check certifies
      "web_template_strip" ->
        s"""WITH base AS (SELECT doc_id, source,
           |  CASE WHEN (doc_id // 20) % 2 = 0
           |    THEN source || ' portal navigation header menu about contact terms privacy copyright ' || text
           |    ELSE text END AS text FROM documents),
           |t AS (SELECT doc_id, source,
           |  string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks FROM base),
           |l0 AS (SELECT doc_id, source, toks,
           |  unnest(range(0, (len(toks) + 9) // 10)) AS i FROM t),
           |l AS (SELECT doc_id, source, i::BIGINT AS line_no,
           |  array_to_string(toks[(i*10+1)::INT : (i*10+10)::INT], ' ') AS line FROM l0),
           |nd AS (SELECT source, count(*)::BIGINT AS n_docs FROM base GROUP BY source),
           |df AS (SELECT source, line, count(DISTINCT doc_id)::BIGINT AS df
           |  FROM l GROUP BY source, line),
           |bl AS (SELECT df.source, df.line FROM df JOIN nd USING (source)
           |  WHERE df.df >= 2 AND df.df * 100 >= 20 * nd.n_docs),
           |k AS (SELECT l.doc_id, l.source, l.line_no, l.line,
           |    (bl.line IS NOT NULL) AS boiler
           |  FROM l LEFT JOIN bl ON l.source = bl.source AND l.line = bl.line)
           |SELECT doc_id, source, count(*)::BIGINT AS n_lines,
           |  sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
           |  coalesce(string_agg(line, ' ' ORDER BY line_no)
           |    FILTER (WHERE NOT boiler), '') AS kept_text
           |FROM k GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,

      // incremental template strip: the df bar is computed over the BASE
      // split only (doc_id % 4 <> 0, n_docs likewise base-scoped), then
      // applied frozen to the incoming quarter
      "web_template_incr" ->
        templateIncrSql,

      // the streaming apply accumulates the SAME result as the batch
      // incremental apply — identical split, identical frozen artifact —
      // so it shares web_template_incr's oracle verbatim
      "stream_template_strip" ->
        templateIncrSql,

      // soft dedup: shingle df by hash, mean df per doc, harmonic weight —
      // the identical hash on both engines keeps collision parity
      "dedup_soft_weights" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h
           |  FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |df AS (SELECT h, count(*)::BIGINT AS df FROM sh GROUP BY h),
           |agg AS (SELECT sh.doc_id, count(*)::BIGINT AS n_sh, sum(df.df)::BIGINT AS sum_df
           |  FROM sh JOIN df USING (h) GROUP BY sh.doc_id)
           |SELECT d.doc_id AS doc_id,
           |  coalesce(n_sh, 0)::BIGINT AS n_shingles,
           |  CASE WHEN n_sh IS NULL THEN 0
           |    ELSE CAST(floor((100.0::DOUBLE) * sum_df / n_sh + 0.5) AS BIGINT) END AS mean_df_x100,
           |  CASE WHEN n_sh IS NULL THEN 10000
           |    ELSE CAST(floor((10000.0::DOUBLE) * n_sh / sum_df + 0.5) AS BIGINT) END AS weight_x10000
           |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      // the accumulated streaming audit must equal the batch computation
      // of the same additive rules over the full table
      "stream_dq" ->
        """WITH c AS (SELECT count(*)::BIGINT AS total,
          |    sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)::BIGINT AS nc,
          |    sum(CASE WHEN length(text) > 0 THEN 0 ELSE 1 END)::BIGINT AS ne,
          |    sum(CASE WHEN lang IN ('en','de','fr','es') THEN 0 ELSE 1 END)::BIGINT AS fl
          |  FROM documents)
          |SELECT 'documents' AS table_name, check_name, violations, total,
          |  violations = 0 AS pass FROM (
          |  SELECT 'nchar_consistent' AS check_name, nc AS violations, total FROM c
          |  UNION ALL SELECT 'text_nonempty', ne, total FROM c
          |  UNION ALL SELECT 'fk_lang', fl, total FROM c)
          |ORDER BY check_name""".stripMargin,

      // each check recomputed directly; pass = violations == 0
      "dq_audit" ->
        """WITH li AS (SELECT count(*)::BIGINT AS total,
          |    sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.2 THEN 0 ELSE 1 END)::BIGINT AS rr_disc,
          |    sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END)::BIGINT AS rr_qty,
          |    (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT AS uq_pk
          |  FROM lineitem),
          |li_ref AS (SELECT count(*)::BIGINT AS v FROM lineitem
          |  WHERE l_orderkey IS NOT NULL
          |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
          |o AS (SELECT count(*)::BIGINT AS total,
          |    sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)::BIGINT AS rr_tp,
          |    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)::BIGINT AS rr_st,
          |    (count(*) - count(DISTINCT o_orderkey))::BIGINT AS uq_pk
          |  FROM orders),
          |o_ref AS (SELECT count(*)::BIGINT AS v FROM orders
          |  WHERE o_custkey IS NOT NULL
          |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
          |c AS (SELECT count(*)::BIGINT AS total,
          |    sum(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment <> '' THEN 0 ELSE 1 END)::BIGINT AS rr_mk,
          |    (count(*) - count(DISTINCT c_custkey))::BIGINT AS uq_pk
          |  FROM customer),
          |dcs AS (SELECT count(*)::BIGINT AS total,
          |    sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)::BIGINT AS rr_nc,
          |    sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END)::BIGINT AS rr_lg,
          |    (count(*) - count(DISTINCT doc_id))::BIGINT AS uq_pk
          |  FROM documents),
          |rows_out AS (
          |  SELECT 'lineitem' AS table_name, 'discount_in_range' AS check_name, rr_disc AS violations, total FROM li
          |  UNION ALL SELECT 'lineitem', 'quantity_positive', rr_qty, total FROM li
          |  UNION ALL SELECT 'lineitem', 'pk_order_line', uq_pk, total FROM li
          |  UNION ALL SELECT 'lineitem', 'fk_orderkey', li_ref.v, li.total FROM li_ref, li
          |  UNION ALL SELECT 'orders', 'totalprice_positive', rr_tp, total FROM o
          |  UNION ALL SELECT 'orders', 'status_domain', rr_st, total FROM o
          |  UNION ALL SELECT 'orders', 'pk_orderkey', uq_pk, total FROM o
          |  UNION ALL SELECT 'orders', 'fk_custkey', o_ref.v, o.total FROM o_ref, o
          |  UNION ALL SELECT 'customer', 'pk_custkey', uq_pk, total FROM c
          |  UNION ALL SELECT 'customer', 'mktsegment_present', rr_mk, total FROM c
          |  UNION ALL SELECT 'documents', 'pk_doc_id', uq_pk, total FROM dcs
          |  UNION ALL SELECT 'documents', 'nchar_consistent', rr_nc, total FROM dcs
          |  UNION ALL SELECT 'documents', 'lang_domain', rr_lg, total FROM dcs)
          |SELECT table_name, check_name, violations, total,
          |  violations = 0 AS pass
          |FROM rows_out ORDER BY table_name, check_name""".stripMargin,

      "q6_revenue_forecast" ->
        """SELECT sum(CAST(floor(l_extendedprice*l_discount*10000 + 0.5) AS BIGINT))::BIGINT AS revenue_x10000,
          |  count(*)::BIGINT AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

      "q8_rollup" ->
        """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
          |  sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))::BIGINT AS total_x100,
          |  count(*)::BIGINT AS n_orders
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY region, nation""".stripMargin,

      // set algebra: INTERSECT binds tighter than EXCEPT in both engines,
      // so the bare chain is (1996 ∩ 1997) − 1998
      "j4_set_ops" ->
        """SELECT count(*)::BIGINT AS n_customers,
          |  sum(o_custkey)::BIGINT AS custkey_sum
          |FROM (
          |  SELECT o_custkey FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
          |  INTERSECT
          |  SELECT o_custkey FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
          |  EXCEPT
          |  SELECT o_custkey FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')""".stripMargin,

      // CUBE replay: GROUPING(a, b) carries the same first-arg-MSB bitmask
      // convention as Spark's grouping_id
      "q16_cube" ->
        """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
          |  coalesce(o_orderstatus, 'ALL') AS status,
          |  GROUPING(c_mktsegment, o_orderstatus)::BIGINT AS gid,
          |  sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))::BIGINT AS total_x100,
          |  count(*)::BIGINT AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY CUBE (c_mktsegment, o_orderstatus)
          |ORDER BY gid, segment, status""".stripMargin,

      "q7_window_rank" ->
        """WITH t AS (SELECT o_custkey, o_orderkey,
          |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS o_totalprice_x100 FROM orders),
          |r AS (SELECT o_custkey, o_orderkey, o_totalprice_x100,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice_x100 DESC, o_orderkey) AS rn
          |  FROM t)
          |SELECT o_custkey, o_orderkey, o_totalprice_x100, rn::BIGINT AS rn
          |FROM r WHERE rn <= 1 ORDER BY o_custkey, o_orderkey""".stripMargin,

      "q9_topk_agg" ->
        """WITH t AS (SELECT o_custkey, o_orderkey,
          |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS o_totalprice_x100 FROM orders),
          |r AS (SELECT o_custkey, o_orderkey, o_totalprice_x100,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice_x100 DESC, o_orderkey) AS rn
          |  FROM t)
          |SELECT o_custkey, rn::BIGINT AS rn, o_totalprice_x100, o_orderkey
          |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

      // EXISTS mirrors the left-semi join; count(*) cast keeps both LONG
      "q4_priority_semijoin" ->
        """SELECT o_orderpriority, count(*)::BIGINT AS order_count
          |FROM orders o
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |  AND EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      // the same correlated-subquery text the Spark side runs via
      // spark.sql — both engines decorrelate it; the all-BIGINT boundary
      // test keeps the above-average cut engine-exact
      "q2_above_avg_subquery" ->
        """SELECT o.o_custkey, count(*)::BIGINT AS n_above,
          |  max(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS max_price_x100
          |FROM orders o
          |WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) * 2 *
          |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          |    > 3 * (SELECT sum(CAST(floor(i.o_totalprice * 100 + 0.5) AS BIGINT))
          |           FROM orders i WHERE i.o_custkey = o.o_custkey)
          |GROUP BY o.o_custkey
          |ORDER BY o.o_custkey""".stripMargin,

      "a10_correlation" ->
        """WITH t AS (SELECT event_type,
          |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
          |g AS (SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS sv, sum(k)::BIGINT AS sk,
          |    sum(v*v)::BIGINT AS svv, sum(k*k)::BIGINT AS skk, sum(v*k)::BIGINT AS svk
          |  FROM t GROUP BY event_type)
          |SELECT event_type, n,
          |  CAST(floor((10000.0::DOUBLE) * (n*svk - sv*sk) /
          |    (sqrt(CAST(n*svv - sv*sv AS DOUBLE)) * sqrt(CAST(n*skk - sk*sk AS DOUBLE))) + 0.5) AS BIGINT) AS corr_x10000
          |FROM g ORDER BY event_type""".stripMargin,

      "a11_median" ->
        """WITH t AS (SELECT event_type, event_id,
          |    CAST(floor(value*10000 + 0.5) AS BIGINT) AS v FROM events),
          |r AS (SELECT event_type, v,
          |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
          |    count(*) OVER (PARTITION BY event_type) AS cnt
          |  FROM t)
          |SELECT event_type, v AS median_x10000
          |FROM r WHERE rn = (cnt + 1) // 2 ORDER BY event_type""".stripMargin,

      "a12_sessions" ->
        """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
          |s AS (SELECT user_id, tsu,
          |    CASE WHEN tsu - lag(tsu, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 30*60000000 THEN 1 ELSE 0 END AS new_session,
          |    event_id
          |  FROM t),
          |x AS (SELECT user_id, tsu,
          |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
          |  FROM s)
          |SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
          |  min(tsu)::BIGINT AS start_us, max(tsu)::BIGINT AS end_us
          |FROM x GROUP BY user_id, session_idx
          |ORDER BY user_id, session_idx""".stripMargin,

      // the driven streaming pipeline must accumulate exactly the batch
      // session_window result (sentinel-flushed) — same oracle SQL
      "stream_sessions" ->
        """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
          |s AS (SELECT user_id, tsu,
          |    CASE WHEN tsu - lag(tsu, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 30*60000000 THEN 1 ELSE 0 END AS new_session,
          |    event_id
          |  FROM t),
          |x AS (SELECT user_id, tsu,
          |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
          |  FROM s)
          |SELECT user_id, count(*)::BIGINT AS n_events,
          |  min(tsu)::BIGINT AS start_us, max(tsu)::BIGINT AS end_us
          |FROM x GROUP BY user_id, session_idx
          |ORDER BY user_id, start_us""".stripMargin,

      "a12b_session_window" ->
        """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
          |s AS (SELECT user_id, tsu,
          |    CASE WHEN tsu - lag(tsu, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id) > 30*60000000 THEN 1 ELSE 0 END AS new_session,
          |    event_id
          |  FROM t),
          |x AS (SELECT user_id, tsu,
          |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
          |  FROM s)
          |SELECT user_id, count(*)::BIGINT AS n_events,
          |  min(tsu)::BIGINT AS start_us, max(tsu)::BIGINT AS end_us
          |FROM x GROUP BY user_id, session_idx
          |ORDER BY user_id, start_us""".stripMargin,

      "a13_asof" ->
        """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
          |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
          |  FROM events WHERE event_type IN ('click', 'purchase')),
          |t AS (SELECT event_id, user_id, tsu, is_click,
          |    last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
          |      OVER (PARTITION BY user_id ORDER BY tsu, is_click DESC, event_id
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
          |    last_value(CASE WHEN is_click = 1 THEN tsu END IGNORE NULLS)
          |      OVER (PARTITION BY user_id ORDER BY tsu, is_click DESC, event_id
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_tsu
          |  FROM ev)
          |SELECT event_id, user_id, tsu, last_click_id, last_click_tsu
          |FROM t WHERE is_click = 0 ORDER BY event_id""".stripMargin,

      "a14_range_join" ->
        """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id, count(c.tsu)::BIGINT AS n_clicks_5m
          |FROM p LEFT JOIN c ON p.user_id = c.user_id
          |  AND c.tsu BETWEEN p.tsu - 300000000 AND p.tsu
          |GROUP BY p.event_id, p.user_id ORDER BY event_id""".stripMargin,

      // the accumulated stream-stream join must equal the batch
      // bounded-range INNER join pair-for-pair
      "stream_attribution" ->
        """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id, c.click_id
          |FROM p JOIN c ON p.user_id = c.user_id
          |  AND c.tsu BETWEEN p.tsu - 3600000000 AND p.tsu
          |ORDER BY event_id, click_id""".stripMargin,

      // batch LEFT bounded-range join: every purchase appears; unmatched
      // ones carry a NULL click_id (the rows whose emission the streaming
      // side must defer until the watermark passes their interval end)
      "stream_attribution_outer" ->
        """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id, c.click_id
          |FROM p LEFT JOIN c ON p.user_id = c.user_id
          |  AND c.tsu BETWEEN p.tsu - 3600000000 AND p.tsu
          |ORDER BY event_id, click_id""".stripMargin,

      "k1_batch_layout" ->
        s"""SELECT doc_id,
           |  (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS file_index,
           |  ((row_number() OVER (ORDER BY doc_id) - 1) // 100)::BIGINT AS batch_id,
           |  printf('batch_%03d/article_%06d.json',
           |    (row_number() OVER (ORDER BY doc_id) - 1) // 100,
           |    row_number() OVER (ORDER BY doc_id) - 1) AS file_name
           |FROM documents WHERE $validWhere ORDER BY doc_id""".stripMargin,

      "dedup_exact" ->
        s"""SELECT doc_id, min(doc_id) OVER (PARTITION BY ${poly2(norm)}) AS canonical_id,
           |  count(*) OVER (PARTITION BY ${poly2(norm)})::BIGINT AS n_copies
           |FROM documents ORDER BY doc_id""".stripMargin,

      // planted 'mirror' source copying every 5th doc; each dup copy
      // contributes one (its source, canonical's source) observation
      "dedup_source_matrix" ->
        s"""WITH p AS (
           |  SELECT doc_id, text, source FROM documents
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS doc_id, text, 'mirror' AS source
           |  FROM documents WHERE doc_id % 5 = 0),
           |g AS (SELECT doc_id, source,
           |    min(doc_id) OVER (PARTITION BY ${poly2(norm)}) AS canonical_id FROM p),
           |d AS (SELECT g.source AS dup_source, c.source AS canonical_source
           |  FROM g JOIN (SELECT doc_id, source FROM p) c ON c.doc_id = g.canonical_id
           |  WHERE g.doc_id <> g.canonical_id)
           |SELECT dup_source, canonical_source, count(*)::BIGINT AS n_dup_docs
           |FROM d GROUP BY dup_source, canonical_source
           |ORDER BY dup_source, canonical_source""".stripMargin,

      // line-level dedup: the same chunking (10-token runs of the normalized
      // token list), first-occurrence rule as a window (the oracle does not
      // need the agg+join scale shape), reassembly as an ordered string_agg.
      "dedup_lines" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, '$boilerplateLine' || ' ' || text
           |  FROM documents WHERE doc_id % 5 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |l0 AS (SELECT doc_id, toks,
           |  unnest(range(0, (len(toks) + 9) // 10)) AS i FROM t),
           |l AS (SELECT doc_id, i::BIGINT AS line_no,
           |  array_to_string(toks[(i*10+1)::INT : (i*10+10)::INT], ' ') AS line FROM l0),
           |k AS (SELECT doc_id, line_no, line,
           |  (row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1) AS keep
           |  FROM l)
           |SELECT doc_id, count(*)::BIGINT AS n_lines,
           |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           |  coalesce(string_agg(line, ' ' ORDER BY line_no) FILTER (WHERE keep), '') AS kept_text
           |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // shared-span detection: positional (non-distinct) 8-gram shingles,
      // diagonal = pos_a - pos_b, islands via pos_a - row_number(), runs
      // >= 5 rolled up per pair. Planting mirrors plantedSpanCopies.
      "dedup_spans" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    -- coalesce: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5)
           |SELECT doc_a, doc_b, count(*)::BIGINT AS n_runs, max(run_len) AS max_run,
           |  sum(run_len)::BIGINT AS shared_pos, (max(run_len) + 7)::BIGINT AS max_span_tokens
           |FROM runs GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,

      // the batch spans oracle restricted to pairs with a planted (new)
      // member — exactly what the incremental index probe must produce
      "dedup_spans_incr" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5)
           |SELECT doc_a, doc_b, count(*)::BIGINT AS n_runs, max(run_len) AS max_run,
           |  sum(run_len)::BIGINT AS shared_pos, (max(run_len) + 7)::BIGINT AS max_span_tokens
           |FROM runs GROUP BY doc_a, doc_b
           |HAVING doc_b >= 600000 ORDER BY doc_a, doc_b""".stripMargin,

      // the spans-incr oracle over the SURVIVOR corpus: deleted sources
      // (doc_id % 20 = 0, base side only) absent from the positional index
      // — their island pairs vanish; the planted copies (>= 600000) all
      // still probe
      "dedup_spans_del" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5)
           |SELECT doc_a, doc_b, count(*)::BIGINT AS n_runs, max(run_len) AS max_run,
           |  sum(run_len)::BIGINT AS shared_pos, (max(run_len) + 7)::BIGINT AS max_span_tokens
           |FROM runs GROUP BY doc_a, doc_b
           |HAVING doc_b >= 600000 ORDER BY doc_a, doc_b""".stripMargin,

      // same positional-shingle pipeline, self-join within one doc
      // (pos_a < pos_b), islands per (doc, diag = pos_b - pos_a)
      "dedup_self_spans" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 700000 AS doc_id,
           |    coalesce(array_to_string(toks[1:30], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[1:30], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_id, a.pos AS pos_a, b.pos - a.pos AS diag
           |  FROM ps a JOIN ps b ON a.doc_id = b.doc_id AND a.h = b.h AND a.pos < b.pos),
           |r AS (SELECT doc_id, diag, pos_a,
           |    pos_a - row_number() OVER (PARTITION BY doc_id, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_id, diag, grp, count(*)::BIGINT AS run_len
           |  FROM r GROUP BY doc_id, diag, grp HAVING count(*) >= 5)
           |SELECT doc_id, count(*)::BIGINT AS n_runs, max(run_len) AS max_run,
           |  sum(run_len)::BIGINT AS rep_pos
           |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // winnowing: per trailing window of 4 positions keep the integer-
      // packed (min h, rightmost pos) key; distinct fingerprints; shared-
      // fingerprint inverted-index join
      "dedup_winnow" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |sel AS (SELECT doc_id, pos,
           |    max((1000000007 - h) * 1048576 + pos)
           |      OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selKey
           |  FROM ps),
           |fp AS (SELECT DISTINCT doc_id,
           |    (selKey % 1048576)::BIGINT AS pos,
           |    (1000000007 - selKey // 1048576)::BIGINT AS h
           |  FROM sel WHERE pos >= 3)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY doc_a, doc_b""".stripMargin,

      // same islands pipeline as dedup_spans, then runs explode into their
      // position intervals (both sides), distinct per doc, over the doc's
      // shingle-position count
      "dedup_span_coverage" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a, pos_b,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len,
           |    min(pos_a) AS start_a, min(pos_b) AS start_b
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5),
           |cov AS (SELECT DISTINCT doc_id, pos FROM (
           |  SELECT doc_a AS doc_id, unnest(range(start_a, start_a + run_len)) AS pos FROM runs
           |  UNION ALL
           |  SELECT doc_b AS doc_id, unnest(range(start_b, start_b + run_len)) AS pos FROM runs)),
           |nc AS (SELECT doc_id, count(*)::BIGINT AS n_covered FROM cov GROUP BY doc_id),
           |sz AS (SELECT doc_id, greatest(len(toks) - 7, 0)::BIGINT AS n_pos FROM t)
           |SELECT sz.doc_id AS doc_id, n_pos,
           |  coalesce(n_covered, 0)::BIGINT AS n_covered,
           |  CAST(floor((10000.0::DOUBLE) * coalesce(n_covered, 0) / greatest(n_pos, 1) + 0.5) AS BIGINT) AS coverage_x10000
           |FROM sz LEFT JOIN nc ON sz.doc_id = nc.doc_id ORDER BY doc_id""".stripMargin,

      // keep-first span removal: same planted base + runs chain as
      // dedup_span_coverage, but only doc_b's side is cut, token ranges
      // (run_len + 7 tokens per 8-gram run), rebuilt in position order
      "dedup_span_removal" ->
        s"""WITH base AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 600000 AS doc_id,
           |    coalesce(array_to_string(toks[1:40], ' '), '') || ' ' ||
           |      coalesce(array_to_string(toks[61:80], ' '), '') AS text
           |  FROM (SELECT doc_id, $toks AS toks FROM documents) WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, string_split(${normOf("text")}, ' ') AS toks FROM base),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a, pos_b,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len,
           |    min(pos_a) AS start_a, min(pos_b) AS start_b
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5),
           |cut AS (SELECT DISTINCT doc_b AS doc_id, unnest(range(start_b, start_b + run_len + 7)) AS p
           |  FROM runs),
           |tk AS (SELECT doc_id, unnest(range(0, len(toks))) AS p FROM t),
           |kept AS (SELECT tk.doc_id AS doc_id, tk.p AS p
           |  FROM tk LEFT JOIN cut ON tk.doc_id = cut.doc_id AND tk.p = cut.p
           |  WHERE cut.p IS NULL),
           |rebuilt AS (SELECT kept.doc_id AS doc_id,
           |    string_agg(t.toks[(kept.p + 1)::INT], ' ' ORDER BY kept.p) AS clean_text
           |  FROM kept JOIN t ON t.doc_id = kept.doc_id GROUP BY kept.doc_id),
           |nrem AS (SELECT doc_id, count(*)::BIGINT AS n_removed FROM cut GROUP BY doc_id)
           |SELECT t.doc_id AS doc_id,
           |  coalesce(rebuilt.clean_text, '') AS clean_text,
           |  coalesce(nrem.n_removed, 0)::BIGINT AS n_removed
           |FROM t
           |LEFT JOIN rebuilt ON rebuilt.doc_id = t.doc_id
           |LEFT JOIN nrem ON nrem.doc_id = t.doc_id
           |ORDER BY doc_id""".stripMargin,

      // similarity histogram: unthresholded pair jx, capped deciles
      "dedup_sim_histogram" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sh0 AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |hot AS (SELECT h FROM (SELECT h, count(*)::BIGINT AS df FROM sh0 GROUP BY h)
           |  WHERE df > 1000),
           |sh AS (SELECT doc_id, h FROM sh0 WHERE h NOT IN (SELECT h FROM hot)),
           |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |j AS (SELECT CAST(floor((10000.0::DOUBLE) * n_common /
           |      (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |  FROM common
           |  JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |SELECT least(jx // 1000, 9) AS decile, count(*)::BIGINT AS n_pairs,
           |  min(jx)::BIGINT AS min_jx, max(jx)::BIGINT AS max_jx
           |FROM j GROUP BY decile ORDER BY decile""".stripMargin,

      // best survivor: ngram closure + the ta_quality score + per-cluster
      // (quality DESC, id) argmin
      "dedup_best_survivor" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2
          .map(w => s"'$w'").mkString(",")
        s"""WITH RECURSIVE
           |t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a AS a, doc_b AS b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |edges AS (SELECT a AS src, b AS dst FROM pr UNION SELECT b, a FROM pr),
           |reach(id, r) AS (
           |  SELECT id, id FROM (SELECT DISTINCT src AS id FROM edges)
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |canon AS (SELECT id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id),
           |q AS (SELECT doc_id,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (word_cnt::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * stop_hits / greatest(word_cnt, 1))) + 0.5) AS BIGINT)
           |      AS quality_x10000
           |  FROM (SELECT doc_id, ($wordCnt)::BIGINT AS word_cnt,
           |      len(list_filter($toks, t2 -> t2 IN ($enWords)))::BIGINT AS stop_hits
           |    FROM documents)),
           |m AS (SELECT canon.cluster_id, canon.id AS doc_id, q.quality_x10000
           |  FROM canon JOIN q ON q.doc_id = canon.id),
           |r AS (SELECT cluster_id, doc_id, quality_x10000,
           |    row_number() OVER (PARTITION BY cluster_id
           |      ORDER BY quality_x10000 DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY cluster_id) AS n_members
           |  FROM m)
           |SELECT cluster_id, doc_id AS survivor_id,
           |  quality_x10000 AS survivor_quality_x10000, n_members::BIGINT AS n_members
           |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin
      },

      // cluster labels: the ngram closure + cluster-tf × integer idf +
      // per-cluster window top-3
      "dedup_cluster_labels" ->
        s"""WITH RECURSIVE
           |t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a AS a, doc_b AS b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |edges AS (SELECT a AS src, b AS dst FROM pr UNION SELECT b, a FROM pr),
           |reach(id, r) AS (
           |  SELECT id, id FROM (SELECT DISTINCT src AS id FROM edges)
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |canon AS (SELECT id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id),
           |ct AS (SELECT cluster_id, term, count(*)::BIGINT AS tf FROM (
           |    SELECT canon.cluster_id, unnest(t.toks) AS term
           |    FROM t JOIN canon ON canon.id = t.doc_id)
           |  WHERE term <> '' GROUP BY cluster_id, term),
           |dfq AS (SELECT term, count(*)::BIGINT AS df FROM (
           |    SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t)
           |  WHERE term <> '' GROUP BY term),
           |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
           |sc AS (SELECT cluster_id, term,
           |    tf * least(CAST(floor((100.0::DOUBLE) * n_docs / df) AS BIGINT), 10000) AS score
           |  FROM ct JOIN dfq USING (term) CROSS JOIN n),
           |r AS (SELECT cluster_id, term, score,
           |    row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, term) AS rank
           |  FROM sc)
           |SELECT cluster_id, rank::BIGINT AS rank, term, score
           |FROM r WHERE rank <= 3 ORDER BY cluster_id, rank""".stripMargin,

      // verdict: exact-dup window + recursive ngram closure + raw-corpus
      // span coverage, folded into the first-failing-reason CASE
      "dedup_verdict" ->
        s"""WITH RECURSIVE
           |t AS (SELECT doc_id, $toks AS toks FROM documents),
           |ex AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY ${poly2(normOf("text"))})
           |    AS exact_canonical FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a AS a, doc_b AS b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |edges AS (SELECT a AS src, b AS dst FROM pr UNION SELECT b, a FROM pr),
           |reach(id, r) AS (
           |  SELECT id, id FROM (SELECT DISTINCT src AS id FROM edges)
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |canon AS (SELECT id, min(r)::BIGINT AS canonical_id FROM reach GROUP BY id),
           |p0 AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM t),
           |ps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sg")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sg
           |  FROM p0)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
           |  FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id),
           |r AS (SELECT doc_a, doc_b, diag, pos_a, pos_b,
           |    pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
           |  FROM m),
           |runs AS (SELECT doc_a, doc_b, diag, grp, count(*)::BIGINT AS run_len,
           |    min(pos_a) AS start_a, min(pos_b) AS start_b
           |  FROM r GROUP BY doc_a, doc_b, diag, grp HAVING count(*) >= 5),
           |cv AS (SELECT DISTINCT doc_id, pos FROM (
           |  SELECT doc_a AS doc_id, unnest(range(start_a, start_a + run_len)) AS pos FROM runs
           |  UNION ALL
           |  SELECT doc_b AS doc_id, unnest(range(start_b, start_b + run_len)) AS pos FROM runs)),
           |nc AS (SELECT doc_id, count(*)::BIGINT AS n_covered FROM cv GROUP BY doc_id),
           |sz AS (SELECT doc_id, greatest(len(toks) - 7, 0)::BIGINT AS n_pos FROM t),
           |cov AS (SELECT sz.doc_id AS doc_id,
           |    CAST(floor((10000.0::DOUBLE) * coalesce(n_covered, 0) / greatest(n_pos, 1) + 0.5) AS BIGINT) AS coverage_x10000
           |  FROM sz LEFT JOIN nc ON sz.doc_id = nc.doc_id),
           |v AS (SELECT d.doc_id AS doc_id, ex.exact_canonical,
           |    coalesce(canon.canonical_id, d.doc_id) AS cluster_canonical,
           |    cov.coverage_x10000
           |  FROM documents d
           |  JOIN ex ON ex.doc_id = d.doc_id
           |  LEFT JOIN canon ON canon.id = d.doc_id
           |  JOIN cov ON cov.doc_id = d.doc_id)
           |SELECT doc_id,
           |  CASE WHEN exact_canonical <> doc_id THEN 0
           |       WHEN cluster_canonical <> doc_id THEN 0
           |       WHEN coverage_x10000 >= 5000 THEN 0 ELSE 1 END::BIGINT AS keep,
           |  CASE WHEN exact_canonical <> doc_id THEN 'exact_duplicate'
           |       WHEN cluster_canonical <> doc_id THEN 'near_duplicate'
           |       WHEN coverage_x10000 >= 5000 THEN 'span_copy'
           |       ELSE '' END AS reason,
           |  exact_canonical, cluster_canonical, coverage_x10000
           |FROM v ORDER BY doc_id""".stripMargin,

      "dedup_ngram" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
           |SELECT * FROM (
           |  SELECT doc_a, doc_b,
           |    CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |  FROM common
           |  JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |WHERE jaccard_x10000 >= 5000 ORDER BY doc_a, doc_b""".stripMargin,

      "dedup_minhash" -> minhashOracleSql,

      // the SQL-surface sibling computes the identical pipeline through
      // spark.sql + graft_hash/graft_minhash — same oracle byte for byte
      "sql_minhash_pairs" -> minhashOracleSql,

      // the streamed micro-batch pipeline must converge to the one-shot
      // batch pair set (StreamingSpec proves it batch-for-batch)
      "stream_near_dup" -> minhashOracleSql,

      // ta_quality_pct's gate + the mix_shards hash-shard assignment —
      // what the curation stream emits once every micro-batch has landed
      "stream_curate" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""WITH b AS (SELECT doc_id, source,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) AS quality_x10000
           |  FROM documents),
           |r AS (SELECT source, quality_x10000,
           |    row_number() OVER (PARTITION BY source ORDER BY quality_x10000, doc_id)::BIGINT AS rn
           |  FROM b),
           |tg AS (SELECT source, greatest((40 * cnt + 99) // 100, 1) AS rn
           |  FROM (SELECT source, count(*)::BIGINT AS cnt FROM b GROUP BY source)),
           |th AS (SELECT r.source AS source, r.quality_x10000 AS q_threshold
           |  FROM r JOIN tg ON r.source = tg.source AND r.rn = tg.rn)
           |SELECT b.doc_id AS doc_id, b.source AS source, b.quality_x10000 AS quality_x10000,
           |  th.q_threshold AS q_threshold,
           |  (${poly("'shard:' || b.doc_id")}) % 16 AS shard
           |FROM b JOIN th ON b.source = th.source
           |WHERE b.quality_x10000 >= th.q_threshold ORDER BY doc_id""".stripMargin
      },

      // LSH S-curve: exact-Jaccard truth (threshold 3000) LEFT JOIN the
      // banded candidate set, recall per decile band; d0 mirrors
      // plantedPrefixCopies (prefix copies at 4..9 tenths of the tokens)
      "dedup_lsh_eval" ->
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(($toks)[1:((len($toks) * (4 + (doc_id // 4) % 6)) // 10)], ' ') AS text
           |  FROM documents WHERE doc_id % 4 = 0 AND len($toks) >= 20),
           |t AS (SELECT doc_id, $toks AS toks FROM d0),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |truth AS (SELECT doc_a, doc_b, jaccard_x10000 FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jaccard_x10000 >= 3000),
           |mh AS (SELECT doc_id, i, min(((1000003*(i+1))*h + 12345 + 7919*i) % 1000000007) AS mh
           |  FROM sh CROSS JOIN range(0, 16) r(i) GROUP BY doc_id, i),
           |bk AS (SELECT doc_id, i // 4 AS band, string_agg(mh::VARCHAR, '-' ORDER BY i) AS bkey
           |  FROM mh GROUP BY doc_id, i // 4),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b FROM bk x
           |  JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
           |j AS (SELECT truth.jaccard_x10000,
           |    CASE WHEN cand.doc_a IS NOT NULL THEN 1 ELSE 0 END AS caught
           |  FROM truth LEFT JOIN cand
           |    ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b)
           |SELECT (jaccard_x10000 // 1000)::BIGINT AS jaccard_band,
           |  count(*)::BIGINT AS n_true, sum(caught)::BIGINT AS n_caught,
           |  CAST(floor((1000000.0::DOUBLE) * sum(caught) / count(*) + 0.5) AS BIGINT) AS recall_ppm
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

      // canonicalization ladder: the planted variants + the p13 unicode
      // chain, one (level, hash) row per doc per level, distinct-counted
      "dedup_canon_ladder" ->
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
           |    regexp_replace(text, ' ', '  ', 'g') AS text
           |  FROM documents WHERE doc_id % 11 = 0
           |  UNION ALL SELECT doc_id + 2000000 AS doc_id,
           |    regexp_replace(text, ' ', chr(160), 'g') AS text
           |  FROM documents WHERE doc_id % 13 = 0
           |  UNION ALL SELECT doc_id + 3000000 AS doc_id, upper(text) AS text
           |  FROM documents WHERE doc_id % 17 = 0
           |  UNION ALL SELECT doc_id + 4000000 AS doc_id, text || ' !!!' AS text
           |  FROM documents WHERE doc_id % 19 = 0),
           |c1 AS (SELECT text, regexp_replace(text, '[\\x{2018}\\x{2019}\\x{201A}\\x{201B}]', '''', 'g') AS t FROM d0),
           |c2 AS (SELECT text, regexp_replace(t, '[\\x{201C}\\x{201D}\\x{201E}]', '"', 'g') AS t FROM c1),
           |c3 AS (SELECT text, regexp_replace(t, '[\\x{2013}\\x{2014}\\x{2015}]', '-', 'g') AS t FROM c2),
           |c4 AS (SELECT text, regexp_replace(t, '[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{3000}]', ' ', 'g') AS t FROM c3),
           |c5 AS (SELECT text, regexp_replace(t, '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g') AS t FROM c4),
           |c6 AS (SELECT text, regexp_replace(t, '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]', '', 'g') AS t FROM c5),
           |n AS (SELECT text, ${normOf("t")} AS clean FROM c6),
           |lv AS (
           |  SELECT 1 AS level, 'raw' AS form, ${poly2("text")} AS h FROM n
           |  UNION ALL SELECT 2, 'whitespace', ${poly2(normOf("text"))} FROM n
           |  UNION ALL SELECT 3, 'unicode', ${poly2("clean")} FROM n
           |  UNION ALL SELECT 4, 'casefold', ${poly2("lower(clean)")} FROM n
           |  UNION ALL SELECT 5, 'alnum', ${poly2("trim(regexp_replace(lower(clean), '[^a-z0-9]+', ' ', 'g'))")} FROM n)
           |SELECT level::BIGINT AS level, form, count(*)::BIGINT AS n_docs,
           |  count(DISTINCT h)::BIGINT AS n_distinct,
           |  (count(*) - count(DISTINCT h))::BIGINT AS dup_docs,
           |  CAST(floor((1000000.0::DOUBLE) * (count(*) - count(DISTINCT h))
           |    / greatest(count(*), 1)) AS BIGINT) AS dup_ppm
           |FROM lv GROUP BY level, form ORDER BY level""".stripMargin,

      // containment scoring over the prefix-planted corpus (d0 mirrors
      // plantedPrefixCopies): same inverted-index overlap core as the
      // Jaccard pairs, scored |∩|/min(|A|,|B|) with the Jaccard column kept
      // for the asymmetry readout
      "dedup_containment" ->
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(($toks)[1:((len($toks) * (4 + (doc_id // 4) % 6)) // 10)], ' ') AS text
           |  FROM documents WHERE doc_id % 4 = 0 AND len($toks) >= 20),
           |t AS (SELECT doc_id, $toks AS toks FROM d0),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |sc AS (SELECT doc_a, doc_b,
           |    CAST(floor((10000.0::DOUBLE) * n_common / least(na.n_sh, nb.n_sh) + 0.5) AS BIGINT) AS containment_x10000,
           |    CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000,
           |    (CASE WHEN na.n_sh < nb.n_sh THEN doc_a
           |      WHEN nb.n_sh < na.n_sh THEN doc_b ELSE -1 END)::BIGINT AS contained_doc
           |  FROM common JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |SELECT doc_a, doc_b, containment_x10000, jaccard_x10000, contained_doc
           |FROM sc WHERE containment_x10000 >= 8000 ORDER BY doc_a, doc_b""".stripMargin,

      // the batch containment oracle restricted to pairs with a planted
      // (>= 1000000) member — exactly what the incremental index probe
      // must produce
      "dedup_containment_incr" ->
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(($toks)[1:((len($toks) * (4 + (doc_id // 4) % 6)) // 10)], ' ') AS text
           |  FROM documents WHERE doc_id % 4 = 0 AND len($toks) >= 20),
           |t AS (SELECT doc_id, $toks AS toks FROM d0),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |sc AS (SELECT doc_a, doc_b,
           |    CAST(floor((10000.0::DOUBLE) * n_common / least(na.n_sh, nb.n_sh) + 0.5) AS BIGINT) AS containment_x10000,
           |    CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000,
           |    (CASE WHEN na.n_sh < nb.n_sh THEN doc_a
           |      WHEN nb.n_sh < na.n_sh THEN doc_b ELSE -1 END)::BIGINT AS contained_doc
           |  FROM common JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |SELECT doc_a, doc_b, containment_x10000, jaccard_x10000, contained_doc
           |FROM sc WHERE containment_x10000 >= 8000
           |  AND (doc_a >= 1000000 OR doc_b >= 1000000)
           |ORDER BY doc_a, doc_b""".stripMargin,

      // the batch minhash oracle restricted to pairs with a >= 400 member —
      // exactly what the incremental index probe must produce
      "dedup_minhash_incr" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sh AS (SELECT doc_id, unnest(shs) AS sh FROM s),
           |hh AS (SELECT doc_id, ${poly("sh")} AS h FROM sh),
           |mh AS (SELECT doc_id, i, min(((1000003*(i+1))*h + 12345 + 7919*i) % 1000000007) AS mh
           |  FROM hh CROSS JOIN range(0, 16) r(i) GROUP BY doc_id, i),
           |bk AS (SELECT doc_id, i // 4 AS band, string_agg(mh::VARCHAR, '-' ORDER BY i) AS bkey
           |  FROM mh GROUP BY doc_id, i // 4),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b FROM bk x
           |  JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
           |est AS (SELECT doc_a, doc_b, sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT AS matches
           |  FROM cand JOIN mh ma ON ma.doc_id = doc_a
           |  JOIN mh mb ON mb.doc_id = doc_b AND mb.i = ma.i
           |  GROUP BY doc_a, doc_b)
           |SELECT * FROM (
           |  SELECT doc_a, doc_b, CAST(floor((100.0::DOUBLE) * matches / 16 + 0.5) AS BIGINT) AS est_jaccard_x100 FROM est)
           |WHERE est_jaccard_x100 >= 50 AND (doc_a >= 400 OR doc_b >= 400)
           |ORDER BY doc_a, doc_b""".stripMargin,

      // the minhash-incr oracle over the SURVIVOR corpus: deleted docs
      // (doc_id < 400 AND doc_id % 7 = 5) absent from the signature index
      // means absent from candidates and estimates entirely
      "dedup_minhash_del" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents
           |  WHERE NOT (doc_id < 400 AND doc_id % 7 = 5)),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sh AS (SELECT doc_id, unnest(shs) AS sh FROM s),
           |hh AS (SELECT doc_id, ${poly("sh")} AS h FROM sh),
           |mh AS (SELECT doc_id, i, min(((1000003*(i+1))*h + 12345 + 7919*i) % 1000000007) AS mh
           |  FROM hh CROSS JOIN range(0, 16) r(i) GROUP BY doc_id, i),
           |bk AS (SELECT doc_id, i // 4 AS band, string_agg(mh::VARCHAR, '-' ORDER BY i) AS bkey
           |  FROM mh GROUP BY doc_id, i // 4),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b FROM bk x
           |  JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
           |est AS (SELECT doc_a, doc_b, sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT AS matches
           |  FROM cand JOIN mh ma ON ma.doc_id = doc_a
           |  JOIN mh mb ON mb.doc_id = doc_b AND mb.i = ma.i
           |  GROUP BY doc_a, doc_b)
           |SELECT * FROM (
           |  SELECT doc_a, doc_b, CAST(floor((100.0::DOUBLE) * matches / 16 + 0.5) AS BIGINT) AS est_jaccard_x100 FROM est)
           |WHERE est_jaccard_x100 >= 50 AND (doc_a >= 400 OR doc_b >= 400)
           |ORDER BY doc_a, doc_b""".stripMargin,

      // the fingerprint TABLE only — pairing is 60-bit-banded (below);
      // the 32-bit oracle pins SimHashAgg's integer vote arithmetic
      "dedup_simhash" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
           |tc AS (SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM tok GROUP BY doc_id, tok),
           |th AS (SELECT doc_id, cnt, ((${poly("tok")}) * 48271) % 4294967291 AS h FROM tc),
           |bits AS (SELECT doc_id, b,
           |    sum(cnt * ((CAST(floor(h / power(2, b)) AS BIGINT) % 2) * 2 - 1)) AS s
           |  FROM th CROSS JOIN range(0, 32) r(b) GROUP BY doc_id, b)
           |SELECT doc_id,
           |    sum(CAST((CASE WHEN s > 0 THEN 1 ELSE 0 END) * power(2, b) AS BIGINT))::BIGINT AS simhash
           |  FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the 60-bit sibling: dual-fold token hash, exact integer bit ops
      // (the 32-bit oracle's floor(h/2^b) double path would lose low bits
      // past 2^53), 15-bit shift/mask bands
      "dedup_simhash60" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
           |tc AS (SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM tok GROUP BY doc_id, tok),
           |th AS (SELECT doc_id, cnt, (${poly2("tok")}) AS h FROM tc),
           |bits AS (SELECT doc_id, b,
           |    sum(cnt * (((h >> b) & 1) * 2 - 1)) AS s
           |  FROM th CROSS JOIN range(0, 60) r(b) GROUP BY doc_id, b),
           |sim AS (SELECT doc_id,
           |    sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
           |  FROM bits GROUP BY doc_id),
           |banded AS (SELECT doc_id, simhash, j,
           |    (simhash >> (15 * j)::INT) & 32767 AS bkey
           |  FROM sim CROSS JOIN range(0, 4) r(j)),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS sim_a,
           |    y.doc_id AS doc_b, y.simhash AS sim_b
           |  FROM banded x JOIN banded y ON x.j = y.j AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
           |SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::BIGINT AS hamming
           |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3 ORDER BY doc_a, doc_b""".stripMargin,

      "dedup_embedding" ->
        s"""WITH $unitVecCte
           |SELECT * FROM (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |    CAST(floor(list_dot_product(a.vn, b.vn) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |  FROM en a JOIN en b ON a.vec_id < b.vec_id)
           |WHERE cos_x1000000 >= 400000 ORDER BY vec_a, vec_b""".stripMargin,

      "dedup_embedding_lsh" ->
        """WITH b0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |u0 AS (SELECT vec_id, v FROM b0
          |  UNION ALL
          |  SELECT vec_id + 1000000 AS vec_id, list_concat([v[1]*(1.05::DOUBLE)], v[2:]) AS v FROM b0),
          |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM u0),
          |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1)
          |SELECT * FROM (
          |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          |    CAST(floor(list_dot_product(a.vn, b.vn) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
          |  FROM en a JOIN en b ON a.vec_id < b.vec_id)
          |WHERE cos_x1000000 >= 900000 ORDER BY vec_a, vec_b""".stripMargin,

      // full SemDeDup replay: planted unit vectors → hyperplane seed cells
      // → exact-integer centroids → one argmin Lloyd round → re-centroid →
      // farthest-first rank → dominated rule. The k-means is the
      // ann_ivf_det machinery (proven parity); only the final
      // floor(cos·1e6+0.5) touches IEEE rounding.
      "dedup_semantic" ->
        s"""WITH b0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |u0 AS (SELECT vec_id, v FROM b0
           |  UNION ALL
           |  SELECT vec_id + 1000000 AS vec_id, list_concat([v[1]*(1.05::DOUBLE)], v[2:]) AS v FROM b0),
           |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM u0),
           |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1),
           |pd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, $semanticPlanes) r(p)),
           |c0 AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM pd GROUP BY vec_id),
           |a0 AS (SELECT en.vec_id, vn, cell FROM en JOIN c0 ON en.vec_id = c0.vec_id),
           |comp0 AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM a0 CROSS JOIN range(0, 64) r(d)),
           |cs0 AS (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |  FROM comp0 GROUP BY cell, d),
           |cent0 AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM cs0 GROUP BY cell),
           |a1 AS (SELECT vec_id, vn, cell FROM (
           |    SELECT a0.vec_id, a0.vn, c.cell,
           |      row_number() OVER (PARTITION BY a0.vec_id ORDER BY
           |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(a0.vn, c.centroid), c.cell) AS rr
           |    FROM a0 CROSS JOIN cent0 c) WHERE rr = 1),
           |comp1 AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM a1 CROSS JOIN range(0, 64) r(d)),
           |cs1 AS (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |  FROM comp1 GROUP BY cell, d),
           |cent1 AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM cs1 GROUP BY cell),
           |rk AS (SELECT vec_id, vn, a1.cell AS cell,
           |    row_number() OVER (PARTITION BY a1.cell ORDER BY
           |      (list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(vn, c.centroid)) DESC,
           |      vec_id)::BIGINT AS cent_rank
           |  FROM a1 JOIN cent1 c ON a1.cell = c.cell),
           |dom AS (SELECT id_b, id_a FROM (
           |    SELECT b.vec_id AS id_b, a.vec_id AS id_a,
           |      row_number() OVER (PARTITION BY b.vec_id ORDER BY a.cent_rank, a.vec_id) AS rn
           |    FROM rk a JOIN rk b ON a.cell = b.cell AND a.cent_rank < b.cent_rank
           |    WHERE CAST(floor(list_dot_product(a.vn, b.vn) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) >= ${cfg.minCosX1000000}
           |  ) WHERE rn = 1)
           |SELECT rk.vec_id AS vec_id, cell, cent_rank,
           |  (CASE WHEN dom.id_a IS NULL THEN 1 ELSE 0 END)::BIGINT AS keep,
           |  coalesce(dom.id_a, -1)::BIGINT AS dup_of
           |FROM rk LEFT JOIN dom ON rk.vec_id = dom.id_b
           |ORDER BY rk.vec_id""".stripMargin,

      "dedup_clusters" -> clustersOracle,

      // the incremental fold must reproduce the batch clustering exactly
      "dedup_clusters_incr" -> clustersOracle,

      "dedup_cluster_sizes" ->
        s"""SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM (
           |  SELECT canonical_id, count(*)::BIGINT AS cluster_size
           |  FROM ($clustersOracle) GROUP BY canonical_id)
           |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

      "dedup_clusters_star" -> clustersOracle,

      "ann_topk" -> annTopkOracleSql,

      // the pure-SQL surface must equal the Scala plan byte for byte —
      // same oracle verbatim
      "sql_ann_topk" -> annTopkOracleSql,

      "ann_ivf_det" ->
        s"""WITH $unitVecCte,
           |pd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 4) r(p)),
           |cells AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM pd GROUP BY vec_id),
           |assigned AS (SELECT en.vec_id, vn, cell FROM en JOIN cells ON en.vec_id = cells.vec_id),
           |comp AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM assigned CROSS JOIN range(0, 64) r(d)),
           |cellsums AS (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |  FROM comp GROUP BY cell, d),
           |centroids AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM cellsums GROUP BY cell),
           |q AS (SELECT vec_id AS query_id, vn AS qv FROM assigned WHERE vec_id < 10),
           |probes AS (SELECT query_id, qv, cell FROM (
           |  SELECT query_id, qv, c.cell,
           |    row_number() OVER (PARTITION BY query_id ORDER BY
           |      list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(qv, centroid), c.cell) AS crank
           |  FROM q CROSS JOIN centroids c)
           |  WHERE crank <= 4),
           |scored AS (SELECT query_id, a.vec_id, list_dot_product(qv, a.vn) AS cos
           |  FROM probes JOIN assigned a ON probes.cell = a.cell
           |  WHERE query_id <> a.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // simplified silhouette over the dedup_semantic k-means (planes=6,
      // no planting): same seed-cells → integer centroids → one argmin
      // Lloyd round CTEs, then per-vector a/b centroid distances and the
      // per-cell quantized mean
      "ann_silhouette" ->
        s"""WITH $unitVecCte,
           |pd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, $semanticPlanes) r(p)),
           |c0 AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM pd GROUP BY vec_id),
           |a0 AS (SELECT en.vec_id, vn, cell FROM en JOIN c0 ON en.vec_id = c0.vec_id),
           |comp0 AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM a0 CROSS JOIN range(0, 64) r(d)),
           |cs0 AS (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |  FROM comp0 GROUP BY cell, d),
           |cent0 AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM cs0 GROUP BY cell),
           |a1 AS (SELECT vec_id, vn, cell FROM (
           |    SELECT a0.vec_id, a0.vn, c.cell,
           |      row_number() OVER (PARTITION BY a0.vec_id ORDER BY
           |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(a0.vn, c.centroid), c.cell) AS rr
           |    FROM a0 CROSS JOIN cent0 c) WHERE rr = 1),
           |comp1 AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM a1 CROSS JOIN range(0, 64) r(d)),
           |cs1 AS (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |  FROM comp1 GROUP BY cell, d),
           |cent1 AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM cs1 GROUP BY cell),
           |dist AS (SELECT a1.vec_id, a1.cell, c.cell AS ccell,
           |    sqrt(greatest((1.0::DOUBLE + list_dot_product(c.centroid, c.centroid))
           |      - (2.0::DOUBLE) * list_dot_product(a1.vn, c.centroid), 0.0::DOUBLE)) AS dist
           |  FROM a1 CROSS JOIN cent1 c),
           |ab AS (SELECT vec_id, cell,
           |    min(CASE WHEN ccell = cell THEN dist END) AS a,
           |    min(CASE WHEN ccell <> cell THEN dist END) AS b
           |  FROM dist GROUP BY vec_id, cell),
           |sil AS (SELECT cell,
           |    CASE WHEN b IS NULL OR greatest(a, b) <= 0.0 THEN 0::BIGINT
           |      ELSE CAST(floor((1000000.0::DOUBLE) * (b - a) / greatest(a, b) + 0.5) AS BIGINT) END AS sil
           |  FROM ab)
           |SELECT cell, count(*)::BIGINT AS n_members,
           |  CAST(floor(sum(sil)::DOUBLE / count(*)::DOUBLE) AS BIGINT) AS mean_sil_x1000000
           |FROM sil GROUP BY cell ORDER BY cell""".stripMargin,

      // truth = the ann_topk pipeline, pred = the ann_lsh pipeline, then
      // one (query, neighbor) equi-join + per-query metric rollup
      "ann_eval" ->
        s"""WITH $unitVecCte,
           |q AS (SELECT vec_id AS query_id, vn AS qv FROM en WHERE vec_id < 10),
           |tsc AS (SELECT query_id, en.vec_id, list_dot_product(qv, vn) AS cos
           |  FROM q JOIN en ON query_id <> en.vec_id),
           |truth AS (SELECT query_id, vec_id AS neighbor_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |    FROM tsc) WHERE rank <= 5),
           |pd AS (SELECT vec_id, t, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*((t*4+p)*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 2) r(t) CROSS JOIN range(0, 4) rp(p)),
           |buckets AS (SELECT vec_id, t,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
           |  FROM pd GROUP BY vec_id, t),
           |cand AS (SELECT DISTINCT bq.vec_id AS query_id, b.vec_id
           |  FROM buckets bq JOIN buckets b ON bq.t = b.t AND bq.bucket = b.bucket
           |  WHERE bq.vec_id < 10 AND bq.vec_id <> b.vec_id),
           |psc AS (SELECT query_id, cand.vec_id, list_dot_product(eq.vn, ec.vn) AS cos
           |  FROM cand JOIN en eq ON eq.vec_id = query_id JOIN en ec ON ec.vec_id = cand.vec_id),
           |pred AS (SELECT query_id, vec_id AS neighbor_id, rank FROM (
           |    SELECT query_id, vec_id, cos,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |    FROM psc) WHERE rank <= 5),
           |hits AS (SELECT pred.query_id, count(*)::BIGINT AS n_hit,
           |    min(pred.rank)::BIGINT AS first_hit_rank
           |  FROM pred JOIN truth ON pred.query_id = truth.query_id
           |    AND pred.neighbor_id = truth.neighbor_id
           |  GROUP BY pred.query_id)
           |SELECT tq.query_id AS query_id,
           |  coalesce(n_hit, 0)::BIGINT AS n_hit,
           |  CAST(floor((10000.0::DOUBLE) * coalesce(n_hit, 0) / 5 + 0.5) AS BIGINT) AS recall_x10000,
           |  coalesce(CAST(floor((10000.0::DOUBLE) / first_hit_rank + 0.5) AS BIGINT), 0)::BIGINT AS rr_x10000
           |FROM (SELECT DISTINCT query_id FROM truth) tq
           |LEFT JOIN hits ON tq.query_id = hits.query_id
           |ORDER BY query_id""".stripMargin,

      // nDCG: same truth/pred pipelines as ann_eval + the literal
      // log-discount weight CASE (identical constants both engines)
      "ann_ndcg" -> {
        val wCase = operators.Similarity.NdcgWeightsX1e6.take(5).zipWithIndex
          .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
          .mkString("CASE pred.rank ", " ", " ELSE 0 END")
        val idcg = operators.Similarity.NdcgWeightsX1e6.take(5).sum
        s"""WITH $unitVecCte,
           |q AS (SELECT vec_id AS query_id, vn AS qv FROM en WHERE vec_id < 10),
           |tsc AS (SELECT query_id, en.vec_id, list_dot_product(qv, vn) AS cos
           |  FROM q JOIN en ON query_id <> en.vec_id),
           |truth AS (SELECT query_id, vec_id AS neighbor_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |    FROM tsc) WHERE rank <= 5),
           |pd AS (SELECT vec_id, t, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*((t*4+p)*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 2) r(t) CROSS JOIN range(0, 4) rp(p)),
           |buckets AS (SELECT vec_id, t,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
           |  FROM pd GROUP BY vec_id, t),
           |cand AS (SELECT DISTINCT bq.vec_id AS query_id, b.vec_id
           |  FROM buckets bq JOIN buckets b ON bq.t = b.t AND bq.bucket = b.bucket
           |  WHERE bq.vec_id < 10 AND bq.vec_id <> b.vec_id),
           |psc AS (SELECT query_id, cand.vec_id, list_dot_product(eq.vn, ec.vn) AS cos
           |  FROM cand JOIN en eq ON eq.vec_id = query_id JOIN en ec ON ec.vec_id = cand.vec_id),
           |pred AS (SELECT query_id, vec_id AS neighbor_id, rank FROM (
           |    SELECT query_id, vec_id, cos,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |    FROM psc) WHERE rank <= 5),
           |dcg AS (SELECT pred.query_id, sum($wCase)::BIGINT AS dcg
           |  FROM pred JOIN truth ON pred.query_id = truth.query_id
           |    AND pred.neighbor_id = truth.neighbor_id
           |  GROUP BY pred.query_id)
           |SELECT tq.query_id AS query_id,
           |  coalesce(dcg, 0)::BIGINT AS dcg_x1e6,
           |  $idcg::BIGINT AS idcg_x1e6,
           |  CAST(floor((10000.0::DOUBLE) * coalesce(dcg, 0) / $idcg + 0.5) AS BIGINT) AS ndcg_x10000
           |FROM (SELECT DISTINCT query_id FROM truth) tq
           |LEFT JOIN dcg ON tq.query_id = dcg.query_id
           |ORDER BY query_id""".stripMargin
      },

      // PQ: subvector cells from 4 hyperplane signs per subspace (seeds
      // g = s·4 + p over sub-dim 8), exact integer centroid means, one
      // argmin Lloyd refinement, integer ADC entries → shortlist of 50 →
      // exact-cosine rerank (the FAISS refine step), bit-stable throughout
      "ann_pq" ->
        s"""WITH $unitVecCte,
           |sub AS (SELECT vec_id, s, vn[(s*8+1)::INT:(s*8+8)::INT] AS sv
           |  FROM en CROSS JOIN range(0, 8) rs(s)),
           |pd AS (SELECT vec_id, s, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 8), d ->
           |      ((((1103515245*((s*4+p)*8+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * sv[d+1])),
           |    (acc, x) -> acc + x) AS dotp
           |  FROM sub CROSS JOIN range(0, 4) rp(p)),
           |codes0 AS (SELECT vec_id, s,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS code
           |  FROM pd GROUP BY vec_id, s),
           |comp0 AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes0 ON sub.vec_id = codes0.vec_id AND sub.s = codes0.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids0 AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp0 GROUP BY s, code, d) GROUP BY s, code),
           |codes AS (SELECT vec_id, s, code FROM (
           |    SELECT sub.vec_id, sub.s, c.code,
           |      row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
           |        list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(sv, centroid), c.code) AS cr
           |    FROM sub JOIN centroids0 c ON sub.s = c.s)
           |  WHERE cr = 1),
           |comp AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes ON sub.vec_id = codes.vec_id AND sub.s = codes.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp GROUP BY s, code, d) GROUP BY s, code),
           |q AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub WHERE vec_id < 10),
           |lut AS (SELECT query_id, c.s, c.code,
           |    CAST(floor(list_dot_product(qsv, centroid) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS ci
           |  FROM q JOIN centroids c ON q.s = c.s),
           |adc AS (SELECT query_id, codes.vec_id, sum(ci)::BIGINT AS est
           |  FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.code
           |  WHERE query_id <> codes.vec_id
           |  GROUP BY query_id, codes.vec_id),
           |short AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY est DESC, vec_id) AS srank
           |    FROM adc) WHERE srank <= 50),
           |scored AS (SELECT short.query_id, short.vec_id,
           |    list_dot_product(eq.vn, ev.vn) AS cos
           |  FROM short JOIN en eq ON short.query_id = eq.vec_id
           |  JOIN en ev ON short.vec_id = ev.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // IVF+PQ composition: the ann_ivf_det coarse CTEs (c-prefixed)
      // produce the probed candidate set; the ann_pq CTEs score ONLY
      // those candidates by integer ADC, then the exact re-rank
      "ann_ivfpq" ->
        s"""WITH $unitVecCte,
           |cpd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 4) r(p)),
           |ccell AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM cpd GROUP BY vec_id),
           |cassign AS (SELECT en.vec_id, vn, cell FROM en JOIN ccell ON en.vec_id = ccell.vec_id),
           |ccomp AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM cassign CROSS JOIN range(0, 64) r(d)),
           |ccent AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |        FROM ccomp GROUP BY cell, d) GROUP BY cell),
           |q0 AS (SELECT vec_id AS query_id, vn AS qv FROM cassign WHERE vec_id < 10),
           |probes AS (SELECT query_id, cell FROM (
           |    SELECT query_id, c.cell,
           |      row_number() OVER (PARTITION BY query_id ORDER BY
           |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(qv, c.centroid), c.cell) AS crank
           |    FROM q0 CROSS JOIN ccent c) WHERE crank <= 4),
           |cand AS (SELECT query_id, a.vec_id FROM probes JOIN cassign a ON probes.cell = a.cell
           |  WHERE query_id <> a.vec_id),
           |sub AS (SELECT vec_id, s, vn[(s*8+1)::INT:(s*8+8)::INT] AS sv
           |  FROM en CROSS JOIN range(0, 8) rs(s)),
           |pd AS (SELECT vec_id, s, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 8), d ->
           |      ((((1103515245*((s*4+p)*8+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * sv[d+1])),
           |    (acc, x) -> acc + x) AS dotp
           |  FROM sub CROSS JOIN range(0, 4) rp(p)),
           |codes0 AS (SELECT vec_id, s,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS code
           |  FROM pd GROUP BY vec_id, s),
           |comp0 AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes0 ON sub.vec_id = codes0.vec_id AND sub.s = codes0.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids0 AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp0 GROUP BY s, code, d) GROUP BY s, code),
           |codes AS (SELECT vec_id, s, code FROM (
           |    SELECT sub.vec_id, sub.s, c.code,
           |      row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
           |        list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(sv, centroid), c.code) AS cr
           |    FROM sub JOIN centroids0 c ON sub.s = c.s)
           |  WHERE cr = 1),
           |comp AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes ON sub.vec_id = codes.vec_id AND sub.s = codes.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp GROUP BY s, code, d) GROUP BY s, code),
           |q AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub WHERE vec_id < 10),
           |lut AS (SELECT query_id, c.s, c.code,
           |    CAST(floor(list_dot_product(qsv, centroid) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS ci
           |  FROM q JOIN centroids c ON q.s = c.s),
           |adc AS (SELECT cand.query_id, codes.vec_id, sum(ci)::BIGINT AS est
           |  FROM cand JOIN codes ON cand.vec_id = codes.vec_id
           |  JOIN lut ON codes.s = lut.s AND codes.code = lut.code
           |    AND lut.query_id = cand.query_id
           |  GROUP BY cand.query_id, codes.vec_id),
           |short AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY est DESC, vec_id) AS srank
           |    FROM adc) WHERE srank <= 50),
           |scored AS (SELECT short.query_id, short.vec_id,
           |    list_dot_product(eq.vn, ev.vn) AS cos
           |  FROM short JOIN en eq ON short.query_id = eq.vec_id
           |  JOIN en ev ON short.vec_id = ev.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // incremental IVF+PQ maintenance replayed: the coarse tier (cells +
      // integer-sum centroids) is computed over ALL vectors — exactly what
      // the mergeable coarse_sums table yields after the update — while the
      // PQ codebook TRAINS ON THE BASE SPLIT ONLY (vec_id % 4 <> 0, the
      // frozen-quantizer contract); base vectors keep their training-time
      // codes (argmin vs the init centroids), batch vectors encode by
      // argmin vs the final serving codebook, and the serve path is
      // ann_ivfpq's verbatim
      "ann_index_incr" ->
        s"""WITH $unitVecCte,
           |cpd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 4) r(p)),
           |ccell AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM cpd GROUP BY vec_id),
           |cassign AS (SELECT en.vec_id, vn, cell FROM en JOIN ccell ON en.vec_id = ccell.vec_id),
           |ccomp AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM cassign CROSS JOIN range(0, 64) r(d)),
           |ccent AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |        FROM ccomp GROUP BY cell, d) GROUP BY cell),
           |q0 AS (SELECT vec_id AS query_id, vn AS qv FROM cassign WHERE vec_id < 10),
           |probes AS (SELECT query_id, cell FROM (
           |    SELECT query_id, c.cell,
           |      row_number() OVER (PARTITION BY query_id ORDER BY
           |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(qv, c.centroid), c.cell) AS crank
           |    FROM q0 CROSS JOIN ccent c) WHERE crank <= 4),
           |cand AS (SELECT query_id, a.vec_id FROM probes JOIN cassign a ON probes.cell = a.cell
           |  WHERE query_id <> a.vec_id),
           |sub AS (SELECT vec_id, s, vn[(s*8+1)::INT:(s*8+8)::INT] AS sv
           |  FROM en CROSS JOIN range(0, 8) rs(s)),
           |pd AS (SELECT vec_id, s, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 8), d ->
           |      ((((1103515245*((s*4+p)*8+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * sv[d+1])),
           |    (acc, x) -> acc + x) AS dotp
           |  FROM sub CROSS JOIN range(0, 4) rp(p) WHERE sub.vec_id % 4 <> 0),
           |codes0 AS (SELECT vec_id, s,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS code
           |  FROM pd GROUP BY vec_id, s),
           |comp0 AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes0 ON sub.vec_id = codes0.vec_id AND sub.s = codes0.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids0 AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp0 GROUP BY s, code, d) GROUP BY s, code),
           |codest AS (SELECT vec_id, s, code FROM (
           |    SELECT sub.vec_id, sub.s, c.code,
           |      row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
           |        list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(sv, centroid), c.code) AS cr
           |    FROM sub JOIN centroids0 c ON sub.s = c.s WHERE sub.vec_id % 4 <> 0)
           |  WHERE cr = 1),
           |comp AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codest ON sub.vec_id = codest.vec_id AND sub.s = codest.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp GROUP BY s, code, d) GROUP BY s, code),
           |codesnew AS (SELECT vec_id, s, code FROM (
           |    SELECT sub.vec_id, sub.s, c.code,
           |      row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
           |        list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(sv, centroid), c.code) AS cr
           |    FROM sub JOIN centroids c ON sub.s = c.s WHERE sub.vec_id % 4 = 0)
           |  WHERE cr = 1),
           |codes AS (SELECT * FROM codest UNION ALL SELECT * FROM codesnew),
           |q AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub WHERE vec_id < 10),
           |lut AS (SELECT query_id, c.s, c.code,
           |    CAST(floor(list_dot_product(qsv, centroid) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS ci
           |  FROM q JOIN centroids c ON q.s = c.s),
           |adc AS (SELECT cand.query_id, codes.vec_id, sum(ci)::BIGINT AS est
           |  FROM cand JOIN codes ON cand.vec_id = codes.vec_id
           |  JOIN lut ON codes.s = lut.s AND codes.code = lut.code
           |    AND lut.query_id = cand.query_id
           |  GROUP BY cand.query_id, codes.vec_id),
           |short AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY est DESC, vec_id) AS srank
           |    FROM adc) WHERE srank <= 50),
           |scored AS (SELECT short.query_id, short.vec_id,
           |    list_dot_product(eq.vn, ev.vn) AS cos
           |  FROM short JOIN en eq ON short.query_id = eq.vec_id
           |  JOIN en ev ON short.vec_id = ev.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // deletion replay: ann_ivfpq's SQL with the PQ tier trained on the
      // FULL corpus (the frozen-training contract — deletes never
      // re-train) and the coarse tier + candidate set restricted to the
      // SURVIVORS (NOT (vec_id % 7 = 3 AND vec_id >= 10)) — exactly what
      // the integer sums subtraction leaves in the artifact
      "ann_index_del" ->
        s"""WITH $unitVecCte,
           |cpd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 4) r(p)),
           |ccell AS (SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM cpd GROUP BY vec_id),
           |cassign AS (SELECT en.vec_id, vn, cell FROM en JOIN ccell ON en.vec_id = ccell.vec_id
           |  WHERE NOT (en.vec_id % 7 = 3 AND en.vec_id >= 10)),
           |ccomp AS (SELECT cell, d, CAST(floor(vn[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM cassign CROSS JOIN range(0, 64) r(d)),
           |ccent AS (SELECT cell, list((sd::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT cell, d, sum(xi)::BIGINT AS sd, count(*)::BIGINT AS cnt
           |        FROM ccomp GROUP BY cell, d) GROUP BY cell),
           |q0 AS (SELECT vec_id AS query_id, vn AS qv FROM cassign WHERE vec_id < 10),
           |probes AS (SELECT query_id, cell FROM (
           |    SELECT query_id, c.cell,
           |      row_number() OVER (PARTITION BY query_id ORDER BY
           |        list_dot_product(c.centroid, c.centroid) - (2.0::DOUBLE) * list_dot_product(qv, c.centroid), c.cell) AS crank
           |    FROM q0 CROSS JOIN ccent c) WHERE crank <= 4),
           |cand AS (SELECT query_id, a.vec_id FROM probes JOIN cassign a ON probes.cell = a.cell
           |  WHERE query_id <> a.vec_id),
           |sub AS (SELECT vec_id, s, vn[(s*8+1)::INT:(s*8+8)::INT] AS sv
           |  FROM en CROSS JOIN range(0, 8) rs(s)),
           |pd AS (SELECT vec_id, s, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 8), d ->
           |      ((((1103515245*((s*4+p)*8+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * sv[d+1])),
           |    (acc, x) -> acc + x) AS dotp
           |  FROM sub CROSS JOIN range(0, 4) rp(p)),
           |codes0 AS (SELECT vec_id, s,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS code
           |  FROM pd GROUP BY vec_id, s),
           |comp0 AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes0 ON sub.vec_id = codes0.vec_id AND sub.s = codes0.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids0 AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp0 GROUP BY s, code, d) GROUP BY s, code),
           |codes AS (SELECT vec_id, s, code FROM (
           |    SELECT sub.vec_id, sub.s, c.code,
           |      row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY
           |        list_dot_product(centroid, centroid) - (2.0::DOUBLE) * list_dot_product(sv, centroid), c.code) AS cr
           |    FROM sub JOIN centroids0 c ON sub.s = c.s)
           |  WHERE cr = 1),
           |comp AS (SELECT s, code, d, CAST(floor(sv[d+1]*(1000000.0::DOUBLE) + 0.5) AS BIGINT) AS xi
           |  FROM (SELECT sub.vec_id, sub.s, sv, code
           |        FROM sub JOIN codes ON sub.vec_id = codes.vec_id AND sub.s = codes.s)
           |  CROSS JOIN range(0, 8) r(d)),
           |centroids AS (SELECT s, code, list((sd_::DOUBLE) / ((cnt::DOUBLE) * (1000000.0::DOUBLE)) ORDER BY d) AS centroid
           |  FROM (SELECT s, code, d, sum(xi)::BIGINT AS sd_, count(*)::BIGINT AS cnt
           |        FROM comp GROUP BY s, code, d) GROUP BY s, code),
           |q AS (SELECT vec_id AS query_id, s, sv AS qsv FROM sub WHERE vec_id < 10),
           |lut AS (SELECT query_id, c.s, c.code,
           |    CAST(floor(list_dot_product(qsv, centroid) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS ci
           |  FROM q JOIN centroids c ON q.s = c.s),
           |adc AS (SELECT cand.query_id, codes.vec_id, sum(ci)::BIGINT AS est
           |  FROM cand JOIN codes ON cand.vec_id = codes.vec_id
           |  JOIN lut ON codes.s = lut.s AND codes.code = lut.code
           |    AND lut.query_id = cand.query_id
           |  GROUP BY cand.query_id, codes.vec_id),
           |short AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY est DESC, vec_id) AS srank
           |    FROM adc) WHERE srank <= 50),
           |scored AS (SELECT short.query_id, short.vec_id,
           |    list_dot_product(eq.vn, ev.vn) AS cos
           |  FROM short JOIN en eq ON short.query_id = eq.vec_id
           |  JOIN en ev ON short.vec_id = ev.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // quantized codes: floor(x·127/amax + 0.5), scale = amax/127; the
      // integer dot is exact in any order, the scale multiplies fixed-order
      "ann_topk_int8" ->
        s"""WITH $unitVecCte,
           |qt AS (SELECT vec_id, vn, list_max(list_transform(vn, x -> abs(x))) AS amax FROM en),
           |qz AS (SELECT vec_id, amax / 127.0 AS scale,
           |    list_transform(vn, x -> floor(x * 127.0 / amax + 0.5)) AS dv FROM qt),
           |q AS (SELECT vec_id AS query_id, dv AS qq, scale AS qs FROM qz WHERE vec_id < 10),
           |scored AS (SELECT query_id, z.vec_id, ((qs * z.scale) * list_dot_product(qq, z.dv)) AS cos_est
           |  FROM q JOIN qz z ON query_id <> z.vec_id),
           |r AS (SELECT query_id, vec_id, cos_est,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos_est DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos_est * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_est_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "ann_lsh" ->
        s"""WITH $unitVecCte,
           |pd AS (SELECT vec_id, t, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*((t*4+p)*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 2) r(t) CROSS JOIN range(0, 4) rp(p)),
           |buckets AS (SELECT vec_id, t,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
           |  FROM pd GROUP BY vec_id, t),
           |cand AS (SELECT DISTINCT q.vec_id AS query_id, b.vec_id
           |  FROM buckets q JOIN buckets b ON q.t = b.t AND q.bucket = b.bucket
           |  WHERE q.vec_id < 10 AND q.vec_id <> b.vec_id),
           |scored AS (SELECT query_id, cand.vec_id, list_dot_product(eq.vn, ec.vn) AS cos
           |  FROM cand JOIN en eq ON eq.vec_id = query_id JOIN en ec ON ec.vec_id = cand.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
           |  CAST(floor(cos * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "ta_langid" -> {
        val langs = operators.TextAnalysis.stopwords
        val scoreCols = langs.map { case (l, ws) =>
          s"len(list_filter($toks, t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))::BIGINT AS score_$l"
        }.mkString(",\n  ")
        val names = langs.map(_._1)
        val pred = names.map { l =>
          val isMax = names.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $isMax AND score_$l > 0 THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        s"""SELECT doc_id, ${names.map(l => s"score_$l").mkString(", ")},
           |  $pred AS predicted_lang, actual_lang
           |FROM (SELECT doc_id, lang AS actual_lang,
           |  $scoreCols
           |FROM documents) ORDER BY doc_id""".stripMargin
      },

      "ta_quality" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""SELECT doc_id, char_len, word_cnt,
           |  CAST(floor((100.0::DOUBLE) * (norm_len - word_cnt + 1) / greatest(word_cnt, 1) + 0.5) AS BIGINT) AS avg_word_len_x100,
           |  punct_cnt, digit_cnt, upper_cnt,
           |  CAST(floor((10000.0::DOUBLE) * stop_hits / greatest(word_cnt, 1) + 0.5) AS BIGINT) AS stopword_ratio_x10000,
           |  CAST(floor((10000.0::DOUBLE) *
           |    least(1.0::DOUBLE, (word_cnt::DOUBLE) / (200.0::DOUBLE)) *
           |    ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE, (4.0::DOUBLE) * stop_hits / greatest(word_cnt, 1))) + 0.5) AS BIGINT) AS quality_x10000
           |FROM (SELECT doc_id,
           |  length(text)::BIGINT AS char_len,
           |  length($norm)::BIGINT AS norm_len,
           |  ($wordCnt)::BIGINT AS word_cnt,
           |  len(list_filter($toks, t -> t IN ($enWords)))::BIGINT AS stop_hits,
           |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS punct_cnt,
           |  len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digit_cnt,
           |  len(regexp_extract_all(text, '[A-Z]'))::BIGINT AS upper_cnt
           |FROM documents) ORDER BY doc_id""".stripMargin
      },

      "ta_tokens" ->
        s"""SELECT doc_id,
           |  ($wordCnt)::BIGINT AS ws_tokens,
           |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens,
           |  length(text)::BIGINT AS chars
           |FROM documents ORDER BY doc_id""".stripMargin,

      "ta_fingerprint" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, toks, $shinglesOf AS shs FROM t)
           |SELECT doc_id,
           |  list_reduce(list_prepend(0::BIGINT, list_transform(toks, tk -> ${poly("tk")})),
           |    (a, b) -> (a*131 + b) % 1000000007) AS fingerprint,
           |  CASE WHEN len(shs) > 0
           |    THEN list_min(list_transform(shs, sg -> ${poly("sg")})) ELSE -1 END AS min_shingle_hash,
           |  CASE WHEN len(shs) > 0
           |    THEN list_max(list_transform(shs, sg -> ${poly("sg")})) ELSE -1 END AS max_shingle_hash
           |FROM s ORDER BY doc_id""".stripMargin,

      "ta_keywords" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
           |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
           |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
           |sc AS (SELECT doc_id, term, tf,
           |    tf * CAST(floor((1000000.0::DOUBLE) * n_docs / df) AS BIGINT) AS score
           |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
           |r AS (SELECT doc_id, term, score,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
           |  FROM sc)
           |SELECT doc_id, term, rank::BIGINT AS rank, score
           |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

      "ta_pii" -> {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val url = "https?://[^ ]+"
        val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4,}"
        s"""WITH p AS (SELECT doc_id,
           |  text || ' contact user' || doc_id || '@example.com or https://site' || doc_id ||
           |    '.example/p?q=1 tel +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS ptext
           |  FROM documents)
           |SELECT doc_id,
           |  len(regexp_extract_all(ptext, '$email'))::BIGINT AS email_cnt,
           |  len(regexp_extract_all(ptext, '$url'))::BIGINT AS url_cnt,
           |  len(regexp_extract_all(ptext, '$phone'))::BIGINT AS phone_cnt,
           |  regexp_replace(regexp_replace(regexp_replace(ptext,
           |    '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'), '$phone', '<PHONE>', 'g') AS redacted
           |FROM p ORDER BY doc_id""".stripMargin
      },

      // header sizes: PNG 33 (sig + IHDR), JPEG 39 (SOI + APP0 + SOF0),
      // WAV 44 (RIFF + fmt + data); video stays opaque → parsed = 0
      "mm_media_features" ->
        """SELECT doc_id AS media_id,
          |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          |  CASE WHEN doc_id % 6 = 0 THEN 'image/png' WHEN doc_id % 3 = 0 THEN 'image/jpeg'
          |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
          |  (octet_length(encode(text)) + CASE WHEN doc_id % 6 = 0 THEN 33 WHEN doc_id % 3 = 0 THEN 39
          |     WHEN doc_id % 3 = 1 THEN 44 ELSE 140 END)::BIGINT AS n_bytes,
          |  1::BIGINT AS parsed,
          |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 500 ELSE -1 END AS INT) AS width,
          |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 400 ELSE -1 END AS INT) AS height,
          |  (CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) // 2
          |     ELSE (doc_id % 997) + 100 END)::BIGINT AS n_frames
          |FROM documents ORDER BY media_id""".stripMargin,

      // fit-inside at 128×128: height binds iff w <= h (equal bounds);
      // integer-floored scaling mirrors Multimodal.fitInside exactly
      "mm_resize" ->
        """WITH img AS (SELECT doc_id AS media_id,
          |    CAST(16 + doc_id % 500 AS INT) AS w,
          |    CAST(16 + (doc_id * 7) % 400 AS INT) AS h
          |  FROM documents WHERE doc_id % 3 = 0)
          |SELECT media_id, w AS width, h AS height,
          |  CAST(CASE WHEN w <= 128 AND h <= 128 THEN w
          |    WHEN w <= h THEN (w * 128) // h ELSE 128 END AS INT) AS out_w,
          |  CAST(CASE WHEN w <= 128 AND h <= 128 THEN h
          |    WHEN w <= h THEN 128 ELSE (h * 128) // w END AS INT) AS out_h,
          |  (CASE WHEN w <= 128 AND h <= 128 THEN 0 ELSE 1 END)::BIGINT AS resized,
          |  1::BIGINT AS parsed
          |FROM img ORDER BY media_id""".stripMargin,

      // tick_i = (i * duration) // k over the planted (id % 997) + 100
      // duration the MP4 container actually carries
      "mm_frame_sample" ->
        """SELECT doc_id AS media_id, i::BIGINT AS frame_idx,
          |  ((i * ((doc_id % 997) + 100)) // 8)::BIGINT AS tick
          |FROM documents CROSS JOIN range(0, 8) r(i)
          |WHERE doc_id % 3 = 2 ORDER BY media_id, frame_idx""".stripMargin,

      // 256-frame windows over the WAV payloads: frames = body/2 (mono
      // 16-bit), data chunk at byte 44 in the canonical header the
      // planting writes — while Spark walks the real bytes
      "mm_audio_chunks" ->
        """WITH a AS (SELECT doc_id AS media_id,
          |    (octet_length(encode(text)) // 2)::BIGINT AS frames
          |  FROM documents WHERE doc_id % 3 = 1),
          |c AS (SELECT media_id, frames,
          |    unnest(range(0, CAST((frames + 255) // 256 AS BIGINT)))::BIGINT AS chunk_no
          |  FROM a)
          |SELECT media_id, chunk_no, (chunk_no * 256)::BIGINT AS start_frame,
          |  least(256::BIGINT, frames - chunk_no * 256)::BIGINT AS n_frames,
          |  (44 + chunk_no * 512)::BIGINT AS start_byte
          |FROM c ORDER BY media_id, chunk_no""".stripMargin,

      // perceptual image dedup: the oracle replays the aHash from the
      // closed-form planting formulas (group dims, gradient + sparse
      // perturbation pixels, 8×8 sampled grid, 64·v > Σv bits, four
      // 16-bit bands) and the banded candidate probe + exact Hamming —
      // while Spark builds/parses the real container bytes
      "mm_phash_pairs" ->
        """WITH imgs AS (SELECT doc_id,
          |    (16 + (doc_id // 4) % 50)::BIGINT AS w,
          |    (16 + ((doc_id // 4) * 7) % 40)::BIGINT AS h,
          |    (doc_id // 4)::BIGINT AS g, (doc_id % 4)::BIGINT AS m
          |  FROM documents WHERE doc_id % 3 = 0),
          |cells AS (SELECT doc_id, g, m, k,
          |    ((k % 8) * w) // 8 AS cx, ((k // 8) * h) // 8 AS cy
          |  FROM imgs CROSS JOIN range(0, 64) r(k)),
          |vals AS (SELECT doc_id, k,
          |    ((cx*31 + cy*17 + g*13) % 251
          |      + CASE WHEN cx % 37 = m AND cy % 23 = m THEN 7 ELSE 0 END) % 256 AS v
          |  FROM cells),
          |sums AS (SELECT doc_id, sum(v)::BIGINT AS s FROM vals GROUP BY doc_id),
          |bits AS (SELECT vals.doc_id, k,
          |    CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS b
          |  FROM vals JOIN sums ON vals.doc_id = sums.doc_id),
          |bands AS (SELECT doc_id, (k // 16)::BIGINT AS j,
          |    sum(b * CAST(power(2, k % 16) AS BIGINT))::BIGINT AS bv
          |  FROM bits GROUP BY doc_id, k // 16),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
          |    AND a.doc_id < b.doc_id),
          |ham AS (SELECT doc_a, doc_b,
          |    sum(bit_count(xor(ba.bv, bb.bv)))::BIGINT AS hamming
          |  FROM cand
          |  JOIN bands ba ON ba.doc_id = doc_a
          |  JOIN bands bb ON bb.doc_id = doc_b AND bb.j = ba.j
          |  GROUP BY doc_a, doc_b)
          |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
          |ORDER BY doc_a, doc_b""".stripMargin,

      // incremental pHash probe == the batch run restricted to pairs
      // involving a new image (media_id % 4 = 3): same hash + band +
      // Hamming replay, one extra membership condition on the candidates
      "mm_phash_incr" ->
        """WITH imgs AS (SELECT doc_id,
          |    (16 + (doc_id // 4) % 50)::BIGINT AS w,
          |    (16 + ((doc_id // 4) * 7) % 40)::BIGINT AS h,
          |    (doc_id // 4)::BIGINT AS g, (doc_id % 4)::BIGINT AS m
          |  FROM documents WHERE doc_id % 3 = 0),
          |cells AS (SELECT doc_id, g, m, k,
          |    ((k % 8) * w) // 8 AS cx, ((k // 8) * h) // 8 AS cy
          |  FROM imgs CROSS JOIN range(0, 64) r(k)),
          |vals AS (SELECT doc_id, k,
          |    ((cx*31 + cy*17 + g*13) % 251
          |      + CASE WHEN cx % 37 = m AND cy % 23 = m THEN 7 ELSE 0 END) % 256 AS v
          |  FROM cells),
          |sums AS (SELECT doc_id, sum(v)::BIGINT AS s FROM vals GROUP BY doc_id),
          |bits AS (SELECT vals.doc_id, k,
          |    CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS b
          |  FROM vals JOIN sums ON vals.doc_id = sums.doc_id),
          |bands AS (SELECT doc_id, (k // 16)::BIGINT AS j,
          |    sum(b * CAST(power(2, k % 16) AS BIGINT))::BIGINT AS bv
          |  FROM bits GROUP BY doc_id, k // 16),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
          |    AND a.doc_id < b.doc_id
          |  WHERE a.doc_id % 4 = 3 OR b.doc_id % 4 = 3),
          |ham AS (SELECT doc_a, doc_b,
          |    sum(bit_count(xor(ba.bv, bb.bv)))::BIGINT AS hamming
          |  FROM cand
          |  JOIN bands ba ON ba.doc_id = doc_a
          |  JOIN bands bb ON bb.doc_id = doc_b AND bb.j = ba.j
          |  GROUP BY doc_a, doc_b)
          |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
          |ORDER BY doc_a, doc_b""".stripMargin,

      // the phash-incr oracle over the SURVIVOR index: deleted images
      // (media_id % 8 = 1 — all index-side, the new %4=3 quarter is
      // untouched) absent from candidates and Hamming ranking entirely
      "mm_phash_del" ->
        """WITH imgs AS (SELECT doc_id,
          |    (16 + (doc_id // 4) % 50)::BIGINT AS w,
          |    (16 + ((doc_id // 4) * 7) % 40)::BIGINT AS h,
          |    (doc_id // 4)::BIGINT AS g, (doc_id % 4)::BIGINT AS m
          |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 8 <> 1),
          |cells AS (SELECT doc_id, g, m, k,
          |    ((k % 8) * w) // 8 AS cx, ((k // 8) * h) // 8 AS cy
          |  FROM imgs CROSS JOIN range(0, 64) r(k)),
          |vals AS (SELECT doc_id, k,
          |    ((cx*31 + cy*17 + g*13) % 251
          |      + CASE WHEN cx % 37 = m AND cy % 23 = m THEN 7 ELSE 0 END) % 256 AS v
          |  FROM cells),
          |sums AS (SELECT doc_id, sum(v)::BIGINT AS s FROM vals GROUP BY doc_id),
          |bits AS (SELECT vals.doc_id, k,
          |    CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS b
          |  FROM vals JOIN sums ON vals.doc_id = sums.doc_id),
          |bands AS (SELECT doc_id, (k // 16)::BIGINT AS j,
          |    sum(b * CAST(power(2, k % 16) AS BIGINT))::BIGINT AS bv
          |  FROM bits GROUP BY doc_id, k // 16),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
          |    AND a.doc_id < b.doc_id
          |  WHERE a.doc_id % 4 = 3 OR b.doc_id % 4 = 3),
          |ham AS (SELECT doc_a, doc_b,
          |    sum(bit_count(xor(ba.bv, bb.bv)))::BIGINT AS hamming
          |  FROM cand
          |  JOIN bands ba ON ba.doc_id = doc_a
          |  JOIN bands bb ON bb.doc_id = doc_b AND bb.j = ba.j
          |  GROUP BY doc_a, doc_b)
          |SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
          |ORDER BY doc_a, doc_b""".stripMargin,

      // the image flagship: pHash pair replay → recursive-CTE min-
      // reachable canonical (the dedup_clusters pattern) → per-source
      // funnel; images never in a pair stay their own canonical
      "e2e_image_pipeline" ->
        """WITH RECURSIVE
          |imgs AS (SELECT doc_id, source,
          |    (16 + (doc_id // 4) % 50)::BIGINT AS w,
          |    (16 + ((doc_id // 4) * 7) % 40)::BIGINT AS h,
          |    (doc_id // 4)::BIGINT AS g, (doc_id % 4)::BIGINT AS m
          |  FROM documents WHERE doc_id % 3 = 0),
          |cells AS (SELECT doc_id, g, m, k,
          |    ((k % 8) * w) // 8 AS cx, ((k // 8) * h) // 8 AS cy
          |  FROM imgs CROSS JOIN range(0, 64) r(k)),
          |vals AS (SELECT doc_id, k,
          |    ((cx*31 + cy*17 + g*13) % 251
          |      + CASE WHEN cx % 37 = m AND cy % 23 = m THEN 7 ELSE 0 END) % 256 AS v
          |  FROM cells),
          |sums AS (SELECT doc_id, sum(v)::BIGINT AS s FROM vals GROUP BY doc_id),
          |bits AS (SELECT vals.doc_id, k,
          |    CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS b
          |  FROM vals JOIN sums ON vals.doc_id = sums.doc_id),
          |bands AS (SELECT doc_id, (k // 16)::BIGINT AS j,
          |    sum(b * CAST(power(2, k % 16) AS BIGINT))::BIGINT AS bv
          |  FROM bits GROUP BY doc_id, k // 16),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
          |    AND a.doc_id < b.doc_id),
          |pr AS (SELECT doc_a, doc_b FROM (
          |    SELECT doc_a, doc_b,
          |      sum(bit_count(xor(ba.bv, bb.bv)))::BIGINT AS hamming
          |    FROM cand
          |    JOIN bands ba ON ba.doc_id = doc_a
          |    JOIN bands bb ON bb.doc_id = doc_b AND bb.j = ba.j
          |    GROUP BY doc_a, doc_b) WHERE hamming <= 6),
          |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
          |  UNION SELECT doc_b, doc_a FROM pr),
          |nodes AS (SELECT DISTINCT src AS id FROM edges),
          |reach(id, r) AS (
          |  SELECT id, id FROM nodes
          |  UNION
          |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
          |cl AS (SELECT id, min(r) AS canonical_id FROM reach GROUP BY id)
          |SELECT source, count(*)::BIGINT AS n_images,
          |  sum(CASE WHEN coalesce(cl.canonical_id, imgs.doc_id) = imgs.doc_id
          |    THEN 1 ELSE 0 END)::BIGINT AS n_canonical,
          |  sum(CASE WHEN coalesce(cl.canonical_id, imgs.doc_id) <> imgs.doc_id
          |    THEN 1 ELSE 0 END)::BIGINT AS n_dropped
          |FROM imgs LEFT JOIN cl ON imgs.doc_id = cl.id
          |GROUP BY source ORDER BY source""".stripMargin,

      "mix_split" ->
        s"""SELECT source,
           |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           |  count(*)::BIGINT AS n
           |FROM (SELECT source, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents)
           |GROUP BY source, split ORDER BY source, split""".stripMargin,

      "mix_sample" ->
        s"""SELECT source, count(*)::BIGINT AS n_kept
           |FROM (SELECT source, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents)
           |WHERE b < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 25 ELSE 50 END
           |GROUP BY source ORDER BY source""".stripMargin,

      // near-dup components via the recursive CTE (the dedup_clusters
      // contract), then the split hash runs on the cluster canonical —
      // coalesced to the doc's own id outside the pair graph
      "mix_split_safe" ->
        s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |    FROM common JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jaccard_x10000 >= 5000),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr UNION SELECT doc_b, doc_a FROM pr),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, r) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
           |cl AS (SELECT id, min(r) AS canonical_id FROM reach GROUP BY id),
           |k AS (SELECT d.doc_id AS doc_id,
           |    (${poly("'split:' || coalesce(cl.canonical_id, d.doc_id)")}) % 100 AS b
           |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id)
           |SELECT doc_id,
           |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           |FROM k ORDER BY doc_id""".stripMargin,

      "mix_shards" ->
        s"""SELECT shard, count(*)::BIGINT AS n_docs,
           |  sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS shard_tokens
           |FROM (SELECT text, (${poly("'shard:' || doc_id")}) % 16 AS shard FROM documents)
           |GROUP BY shard ORDER BY shard""".stripMargin,

      // serpentine replay: rank over (tokens desc, id), block/pos dealing
      "mix_shards_lpt" ->
        """WITH tc AS (SELECT doc_id,
          |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS tok_cnt
          |  FROM documents),
          |r AS (SELECT doc_id, tok_cnt,
          |    row_number() OVER (ORDER BY tok_cnt DESC, doc_id) - 1 AS rn FROM tc),
          |a AS (SELECT tok_cnt, rn // 16 AS blk, rn % 16 AS pos FROM r)
          |SELECT (CASE WHEN blk % 2 = 0 THEN pos ELSE 15 - pos END)::BIGINT AS shard,
          |  count(*)::BIGINT AS n_docs, sum(tok_cnt)::BIGINT AS shard_tokens
          |FROM a GROUP BY 1 ORDER BY shard""".stripMargin,

      // one-row rollup of the mix_shards balance report: straggler bound =
      // max/mean token skew, ppm
      "mix_shard_skew" ->
        s"""WITH ss AS (SELECT shard, count(*)::BIGINT AS n_docs,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS shard_tokens
           |  FROM (SELECT text, (${poly("'shard:' || doc_id")}) % 16 AS shard FROM documents)
           |  GROUP BY shard)
           |SELECT count(*)::BIGINT AS n_shards,
           |  min(n_docs)::BIGINT AS min_docs, max(n_docs)::BIGINT AS max_docs,
           |  min(shard_tokens)::BIGINT AS min_tokens,
           |  max(shard_tokens)::BIGINT AS max_tokens,
           |  sum(shard_tokens)::BIGINT AS total_tokens,
           |  CAST(floor((1000000.0::DOUBLE) * max(shard_tokens) * count(*)
           |    / greatest(sum(shard_tokens), 1)) AS BIGINT) AS skew_ppm
           |FROM ss""".stripMargin,

      // three batch-formation policies over one projection: per-policy
      // window (band / source partitions), per-batch n/max/sum, rollup
      "pack_waste" ->
        s"""WITH b AS (SELECT doc_id, source,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt,
           |    (${poly("'batch:' || doc_id")}) AS hk
           |  FROM documents),
           |f AS (SELECT doc_id, source, tok_cnt,
           |    length(bin(tok_cnt))::BIGINT AS band, hk
           |  FROM b WHERE tok_cnt > 0),
           |bk AS (SELECT 'bucketed' AS policy, band::VARCHAR AS g, tok_cnt,
           |    (row_number() OVER (PARTITION BY band ORDER BY hk, doc_id) - 1) // 8 AS batch_no
           |  FROM f
           |  UNION ALL
           |  SELECT 'naive' AS policy, source AS g, tok_cnt,
           |    (row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) - 1) // 8 AS batch_no
           |  FROM f
           |  UNION ALL
           |  SELECT 'sorted' AS policy, source AS g, tok_cnt,
           |    (row_number() OVER (PARTITION BY source ORDER BY tok_cnt, doc_id) - 1) // 8 AS batch_no
           |  FROM f),
           |pb AS (SELECT policy, g, batch_no, count(*)::BIGINT AS n_docs,
           |    max(tok_cnt)::BIGINT AS max_tokens, sum(tok_cnt)::BIGINT AS sum_tokens
           |  FROM bk GROUP BY policy, g, batch_no)
           |SELECT policy, count(*)::BIGINT AS n_batches,
           |  sum(sum_tokens)::BIGINT AS useful_tokens,
           |  sum(n_docs * max_tokens)::BIGINT AS token_cost,
           |  CAST(floor((1000000.0::DOUBLE) * (sum(n_docs * max_tokens) - sum(sum_tokens))
           |    / greatest(sum(n_docs * max_tokens), 1)) AS BIGINT) AS pad_ppm
           |FROM pb GROUP BY policy ORDER BY policy""".stripMargin,

      // the dataset card: six instrument legs unioned long-format — each
      // leg mirrors its standalone oracle (quality mean, gini, diversity,
      // lorenz decile 1) over one corpus snapshot
      "e2e_dataset_card" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2
          .map(w => s"'$w'").mkString(",")
        s"""WITH base AS (SELECT source, count(*)::BIGINT AS n_docs,
           |    sum(($wordCnt))::BIGINT AS ws_tokens,
           |    sum(CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, tq -> tq IN ($enWords)))
           |        / greatest(($wordCnt), 1))) + 0.5) AS BIGINT))::BIGINT AS sq
           |  FROM documents GROUP BY source),
           |tokw AS (SELECT source, unnest($toks) AS w FROM documents),
           |gg AS (SELECT source, w, count(*)::BIGINT AS cnt FROM tokw
           |  WHERE w <> '' GROUP BY source, w),
           |gr AS (SELECT source, sum(cnt)::BIGINT AS n_tokens,
           |    sum(cnt*cnt)::BIGINT AS s2 FROM gg GROUP BY source),
           |gini AS (SELECT source,
           |    CAST(floor((1000000.0::DOUBLE) * (n_tokens*n_tokens - s2)::DOUBLE
           |      / (n_tokens*n_tokens)::DOUBLE + 0.5) AS BIGINT) AS v FROM gr),
           |td AS (SELECT source, $toks AS toks FROM documents),
           |ts AS (SELECT source, unnest($shinglesOf) AS sh FROM td),
           |tg AS (SELECT source, ${poly("sh")} AS h, count(*)::BIGINT AS cnt
           |  FROM ts GROUP BY 1, 2),
           |dv AS (SELECT source, CAST(floor((1000000.0::DOUBLE) * count(*)
           |    / greatest(sum(cnt), 1) + 0.5) AS BIGINT) AS v FROM tg GROUP BY source),
           |lbase AS (SELECT source, doc_id, ($wordCnt)::BIGINT AS tok FROM documents),
           |lr AS (SELECT source, tok,
           |    row_number() OVER (PARTITION BY source ORDER BY tok DESC, doc_id)::BIGINT AS rn,
           |    sum(tok) OVER (PARTITION BY source ORDER BY tok DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
           |  FROM lbase),
           |lt AS (SELECT source, count(*)::BIGINT AS n_docs,
           |    sum(tok)::BIGINT AS total FROM lbase GROUP BY source),
           |lor AS (SELECT lt.source AS source,
           |    CAST(floor((1000000.0::DOUBLE) * lr.cum
           |      / greatest(lt.total, 1)) AS BIGINT) AS v
           |  FROM lt JOIN lr ON lr.source = lt.source
           |    AND lr.rn = ((lt.n_docs + 9) // 10))
           |SELECT source, metric, value FROM (
           |  SELECT source, 'n_docs' AS metric, n_docs AS value FROM base
           |  UNION ALL SELECT source, 'ws_tokens', ws_tokens FROM base
           |  UNION ALL SELECT source, 'mean_quality_x10000',
           |    CAST(floor(sq::DOUBLE / n_docs) AS BIGINT) FROM base
           |  UNION ALL SELECT source, 'gini_ppm', v FROM gini
           |  UNION ALL SELECT source, 'ngram_diversity_ppm', v FROM dv
           |  UNION ALL SELECT source, 'top_decile_share_ppm', v FROM lor)
           |ORDER BY source, metric""".stripMargin
      },

      // per-source Lorenz deciles: rank docs by whitespace-token count
      // desc (ties by doc_id), report cumulative token share at each
      // docs-decile boundary rank ceil(d*n/10)
      "mix_lorenz" ->
        s"""WITH base AS (SELECT source, doc_id, ($wordCnt)::BIGINT AS tok FROM documents),
           |r AS (SELECT source, doc_id, tok,
           |    row_number() OVER (PARTITION BY source ORDER BY tok DESC, doc_id)::BIGINT AS rn,
           |    sum(tok) OVER (PARTITION BY source ORDER BY tok DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
           |  FROM base),
           |tg AS (SELECT source, count(*)::BIGINT AS n_docs,
           |    sum(tok)::BIGINT AS total_tokens FROM base GROUP BY source),
           |d AS (SELECT source, n_docs, total_tokens, unnest(range(1, 11)) AS decile FROM tg),
           |t AS (SELECT source, decile::BIGINT AS decile,
           |    ((decile * n_docs + 9) // 10)::BIGINT AS rn, total_tokens FROM d)
           |SELECT t.source AS source, decile, t.rn AS docs_rank, cum_tokens,
           |  t.total_tokens AS total_tokens,
           |  CAST(floor((1000000.0::DOUBLE) * cum_tokens
           |    / greatest(t.total_tokens, 1)) AS BIGINT) AS cum_share_ppm
           |FROM t JOIN r ON r.source = t.source AND r.rn = t.rn
           |ORDER BY source, decile""".stripMargin,

      "mix_sample_k" ->
        s"""SELECT doc_id, source, lang FROM (
           |  SELECT doc_id, source, lang FROM documents
           |  ORDER BY (${poly("'pick:' || doc_id")}), doc_id LIMIT 25)
           |ORDER BY doc_id""".stripMargin,

      // running token prefix in salted-hash order per source; keep while
      // the prefix BEFORE the doc is under the source budget
      "mix_token_budget" ->
        s"""WITH b AS (SELECT doc_id, source,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt,
           |    (${poly("'budget:' || doc_id")}) AS hk
           |  FROM documents),
           |c AS (SELECT doc_id, source, tok_cnt,
           |    sum(tok_cnt) OVER (PARTITION BY source ORDER BY hk, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           |  FROM b)
           |SELECT doc_id, source, tok_cnt, cum_tokens::BIGINT AS cum_tokens FROM c
           |WHERE cum_tokens - tok_cnt < CASE source WHEN 'src0' THEN 1200 ELSE 600 END
           |ORDER BY doc_id""".stripMargin,

      // Hamilton apportionment: floor quotas + one unit to the largest
      // remainders; integer // and % make both engines bit-identical
      "mix_quota" ->
        s"""WITH b AS (SELECT source,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM documents),
           |c AS (SELECT source, sum(tok_cnt)::BIGINT AS tokens FROM b GROUP BY source),
           |t AS (SELECT sum(tokens)::BIGINT AS tot FROM c),
           |f AS (SELECT source, tokens,
           |    (10007 * tokens) // tot AS fq, (10007 * tokens) % tot AS rem,
           |    CAST(floor((10000.0::DOUBLE) * tokens / tot) AS BIGINT) AS share_x10000
           |  FROM c, t),
           |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
           |    sum(fq) OVER () AS sfq FROM f)
           |SELECT source, tokens, share_x10000,
           |  (fq + CASE WHEN rk <= 10007 - sfq THEN 1 ELSE 0 END)::BIGINT AS quota_tokens
           |FROM r ORDER BY source""".stripMargin,

      // soft-dedup budget: the dedup_soft_weights CTE chain + wc·weight
      // per-source rollup; ratio by correctly-rounded double division
      // (both operands < 2^53)
      "mix_soft_budget" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h
           |  FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |df AS (SELECT h, count(*)::BIGINT AS df FROM sh GROUP BY h),
           |agg AS (SELECT sh.doc_id, count(*)::BIGINT AS n_sh, sum(df.df)::BIGINT AS sum_df
           |  FROM sh JOIN df USING (h) GROUP BY sh.doc_id),
           |w AS (SELECT d.doc_id AS doc_id, d.source AS source,
           |    ($wordCnt)::BIGINT AS wc,
           |    CASE WHEN n_sh IS NULL THEN 10000
           |      ELSE CAST(floor((10000.0::DOUBLE) * n_sh / sum_df + 0.5) AS BIGINT) END AS wt
           |  FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  sum(wc)::BIGINT AS ws_tokens,
           |  sum(wc * wt)::BIGINT AS eff_tokens_x10000,
           |  CASE WHEN sum(wc) = 0 THEN 10000
           |    ELSE CAST(floor((sum(wc * wt)::DOUBLE) / sum(wc)) AS BIGINT) END AS eff_ratio_x10000
           |FROM w GROUP BY source ORDER BY source""".stripMargin,

      // length-banded batches: len(bin(n)) = floor(log2)+1 on both engines
      "pack_batches" ->
        s"""WITH b AS (SELECT doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt,
           |    (${poly("'batch:' || doc_id")}) AS hk
           |  FROM documents),
           |f AS (SELECT doc_id, tok_cnt, length(bin(tok_cnt))::BIGINT AS band, hk
           |  FROM b WHERE tok_cnt > 0),
           |r AS (SELECT band, tok_cnt,
           |    (row_number() OVER (PARTITION BY band ORDER BY hk, doc_id) - 1) // 8 AS batch_no
           |  FROM f)
           |SELECT band, batch_no, count(*)::BIGINT AS n_docs,
           |  max(tok_cnt)::BIGINT AS max_tokens, sum(tok_cnt)::BIGINT AS sum_tokens,
           |  (count(*) * max(tok_cnt) - sum(tok_cnt))::BIGINT AS padding_waste
           |FROM r GROUP BY band, batch_no
           |ORDER BY band, batch_no""".stripMargin,

      // snippets: same window scan via list slicing (both engines 1-based,
      // clamped, first-match argmax)
      "sim_snippets" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents
           |  WHERE doc_id < 50),
           |h AS (SELECT doc_id, toks, list_transform(toks,
           |    x -> CASE WHEN x IN ('spark', 'join', 'data') THEN 1 ELSE 0 END) AS hits
           |  FROM t),
           |w AS (SELECT doc_id, toks, list_transform(
           |    range(0, greatest(len(toks) - 10, 0) + 1),
           |    i -> list_reduce(list_prepend(0, hits[i+1:i+10]), (a, b) -> a + b)) AS wins
           |  FROM h),
           |b AS (SELECT doc_id, toks,
           |    list_position(wins, list_max(wins))::BIGINT AS start_pos,
           |    list_max(wins)::BIGINT AS window_hits
           |  FROM w)
           |SELECT doc_id, start_pos, window_hits,
           |  array_to_string(toks[start_pos:start_pos + 9], ' ') AS snippet
           |FROM b ORDER BY doc_id""".stripMargin,

      // RRF: both retrieval pipelines as namespaced CTEs + the integer
      // 100000 // (60 + rank) fusion
      "sim_rrf" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |bt AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM
           |    (SELECT doc_id, unnest(toks) AS t FROM tok)
           |  WHERE t <> '' GROUP BY doc_id, t),
           |bdl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM bt GROUP BY doc_id),
           |bst AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot_len FROM bdl),
           |bdf AS (SELECT t, count(*)::BIGINT AS df FROM bt GROUP BY t
           |  HAVING count(*) <= 1000),
           |bq AS (SELECT DISTINCT doc_id AS query_id, t FROM bt
           |  WHERE doc_id IN (0, 1, 2, 3, 4)),
           |bsc AS (SELECT bq.query_id, bt.doc_id,
           |    least(CAST(floor((100.0::DOUBLE) * n_docs / df) AS BIGINT), 10000) *
           |      ((bt.tf * 2200 * 1000) // (bt.tf * 1000 +
           |        (1200 * (250 + (750 * bdl.dl * 1000) // ((1000 * tot_len) // n_docs))) // 1000))
           |      AS contrib
           |  FROM bq JOIN bt USING (t) JOIN bdf USING (t)
           |    JOIN bdl ON bdl.doc_id = bt.doc_id CROSS JOIN bst
           |  WHERE bt.doc_id <> bq.query_id),
           |br AS (SELECT query_id, doc_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sum(contrib) DESC, doc_id) AS rank
           |  FROM bsc GROUP BY query_id, doc_id),
           |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN []
           |    ELSE list_transform(range(0, len(toks) - 2),
           |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS g
           |  FROM tok),
           |hh AS (SELECT doc_id, ${poly("g")} AS h FROM g),
           |ent AS (SELECT doc_id, h % 64 AS idx,
           |    sum(CASE WHEN h % 128 >= 64 THEN -1 ELSE 1 END)::BIGINT AS v
           |  FROM hh GROUP BY doc_id, h % 64
           |  HAVING sum(CASE WHEN h % 128 >= 64 THEN -1 ELSE 1 END) <> 0),
           |nrm AS (SELECT doc_id, sum(v*v)::BIGINT AS nsq FROM ent GROUP BY doc_id),
           |hdots AS (SELECT q.doc_id AS query_id, e.doc_id AS doc_id,
           |    sum(q.v * e.v)::BIGINT AS dot
           |  FROM ent q JOIN ent e USING (idx)
           |  WHERE q.doc_id < 5 AND q.doc_id <> e.doc_id
           |  GROUP BY q.doc_id, e.doc_id),
           |hc AS (SELECT hdots.query_id, hdots.doc_id, CAST(floor(1000000.0 * dot /
           |    (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))) AS BIGINT) AS cos_x1e6
           |  FROM hdots JOIN nrm n1 ON n1.doc_id = hdots.query_id
           |    JOIN nrm n2 ON n2.doc_id = hdots.doc_id),
           |hr AS (SELECT query_id, doc_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cos_x1e6 DESC, doc_id) AS rank
           |  FROM hc),
           |u AS (SELECT query_id, doc_id, 100000 // (60 + rank) AS c
           |    FROM br WHERE rank <= 10
           |  UNION ALL
           |  SELECT query_id, doc_id, 100000 // (60 + rank) AS c
           |    FROM hr WHERE rank <= 10),
           |f AS (SELECT query_id, doc_id, sum(c)::BIGINT AS rrf_x1e5,
           |    count(*)::BIGINT AS n_systems
           |  FROM u GROUP BY query_id, doc_id),
           |fr AS (SELECT query_id, doc_id, rrf_x1e5, n_systems,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY rrf_x1e5 DESC, doc_id) AS rank
           |  FROM f)
           |SELECT query_id, doc_id, rank::BIGINT AS rank, rrf_x1e5, n_systems
           |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

      // modality coverage: validity predicate + embedding id left join
      "mm_coverage" ->
        """WITH hv AS (SELECT DISTINCT vec_id AS doc_id, 1 AS has_vec FROM embeddings),
          |d AS (SELECT doc_id, source,
          |    CASE WHEN text IS NOT NULL AND text <> ''
          |      AND lang IS NOT NULL AND lang <> ''
          |      AND source IS NOT NULL AND source <> '' THEN 1 ELSE 0 END AS valid_text
          |  FROM documents)
          |SELECT source, count(*)::BIGINT AS n_docs,
          |  sum(valid_text)::BIGINT AS n_valid_text,
          |  sum(coalesce(has_vec, 0))::BIGINT AS n_with_embedding,
          |  CAST(floor((10000.0::DOUBLE) * sum(coalesce(has_vec, 0)) /
          |    greatest(count(*), 1) + 0.5) AS BIGINT) AS embedding_coverage_x10000
          |FROM d LEFT JOIN hv ON d.doc_id = hv.doc_id
          |GROUP BY source ORDER BY source""".stripMargin,

      // semantic decontamination: exact cross-side all-pairs cosine (the
      // banded Spark side's recall against it is the dedup_embedding_lsh
      // property, re-pinned by its spec)
      "decontam_semantic" ->
        """WITH b0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |ev0 AS (SELECT vec_id + 1000000 AS vec_id,
          |    list_concat([v[1]*(1.05::DOUBLE)], v[2:]) AS v FROM b0),
          |t1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM b0),
          |tn AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM t1),
          |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ev0),
          |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e1),
          |p AS (SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
          |    CAST(floor(list_dot_product(e.vn, t.vn) * (1000000.0::DOUBLE) + 0.5) AS BIGINT) AS cos_x1000000
          |  FROM en e CROSS JOIN tn t)
          |SELECT eval_id, train_id, cos_x1000000 FROM p
          |WHERE cos_x1000000 >= 900000
          |ORDER BY eval_id, train_id""".stripMargin,

      // dim stats: 0-based dim via struct-unnest, per-element fixed point,
      // double division for the mean (exact at these magnitudes)
      "ann_dim_stats" ->
        """WITH e AS (SELECT unnest(list_transform(range(1, len(embedding) + 1),
          |    i -> {'dim': i - 1, 'x': embedding[i]})) AS u FROM embeddings),
          |f AS (SELECT (u.dim)::BIGINT AS dim,
          |    CAST(floor(CAST(u.x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS xf
          |  FROM e)
          |SELECT dim, count(*)::BIGINT AS n, sum(xf)::BIGINT AS sum_x1e6,
          |  min(xf)::BIGINT AS min_x1e6, max(xf)::BIGINT AS max_x1e6,
          |  CAST(floor(CAST(sum(xf) AS DOUBLE) / count(*)) AS BIGINT) AS mean_x1e6
          |FROM f GROUP BY dim ORDER BY dim""".stripMargin,

      // centroid-identity diversity: per-row fixed-point components →
      // exact integer dim sums → one fixed-order 64-element double fold
      "ann_diversity" ->
        s"""WITH $unitVecCte,
           |lb AS (SELECT vec_id, label::BIGINT AS label FROM embeddings),
           |qv AS (SELECT en.vec_id, lb.label,
           |    list_transform(vn, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS q
           |  FROM en JOIN lb ON en.vec_id = lb.vec_id),
           |rws AS (SELECT label, q,
           |    list_reduce(list_prepend(0::BIGINT, list_transform(q, x -> x*x)), (a,b) -> a+b) AS sd
           |  FROM qv),
           |pl AS (SELECT label, count(*)::BIGINT AS n_vecs,
           |    sum(sd)::BIGINT AS sum_self FROM rws GROUP BY label),
           |ds AS (SELECT label, i, sum(q[i+1])::BIGINT AS s
           |  FROM rws CROSS JOIN range(0, ${cfg.embeddingDim}) r(i) GROUP BY label, i),
           |cs AS (SELECT label,
           |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(list(s ORDER BY i),
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a+b) AS cent_sq
           |  FROM ds GROUP BY label)
           |SELECT pl.label AS label, n_vecs,
           |  CASE WHEN n_vecs < 2 THEN -1::BIGINT
           |    ELSE CAST(floor((cent_sq - CAST(sum_self AS DOUBLE))
           |      / CAST(n_vecs * (n_vecs - 1) AS DOUBLE) / 1000000.0) AS BIGINT)
           |  END AS avg_pair_cos_x1e6
           |FROM pl JOIN cs ON pl.label = cs.label
           |ORDER BY label""".stripMargin,

      // BM25: same fixed-point recurrence — capped integer idf, every
      // division an explicit floor DIV at a fixed scale; over the
      // Zipfian synthetic corpus (see bm25ZipfOracleSql)
      "sim_bm25" -> bm25ZipfOracleSql,

      "sim_bm25_index" -> bm25ZipfOracleSql,

      // shard-parallel serving merges the mergeable statistics exactly —
      // shard count is layout, not semantics: the unsharded oracle verbatim
      "sim_bm25_sharded" -> bm25ZipfOracleSql,
      // streamed sharded maintenance drains to the full-corpus rebuild
      // (per-shard exactly-once ledgers; stats merge associatively) —
      // sim_bm25_incr's full-corpus BM25 replay verbatim
      "stream_bm25_sharded" -> bm25OracleSql,

      // incremental update == full rebuild: the oracle replays BM25 over
      // the WHOLE corpus — the merged index must score identically
      "sim_bm25_incr" -> bm25OracleSql,
      // the streaming maintenance pipeline accumulates the SAME index as
      // the batch incremental update (exactly-once ledger + append-only
      // merges), so the oracle is identical: the full-corpus BM25 replay
      "stream_bm25_incr" -> bm25OracleSql,
      // mid-stream auto-compaction preserves every answer — the same
      // full-corpus rebuild replay verbatim
      "stream_bm25_autocompact" -> bm25OracleSql,

      // deletion replay: BM25 over the SURVIVOR corpus (doc_id % 7 <> 5)
      // with survivor df/doclen/stats; the cap test reads the FULL-corpus
      // df (eviction is monotone under delete — the index's documented
      // upper-bound rule), the score reads the survivor df
      "sim_bm25_del" ->
        s"""WITH tfall AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM
           |    (SELECT doc_id, unnest($toks) AS t FROM documents)
           |  WHERE t <> '' GROUP BY doc_id, t),
           |tf AS (SELECT * FROM tfall WHERE doc_id % 7 <> 5),
           |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
           |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot_len FROM dl),
           |dff AS (SELECT t FROM tfall GROUP BY t HAVING count(*) <= 1000),
           |dfq AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY t),
           |q AS (SELECT DISTINCT doc_id AS query_id, t FROM tf
           |  WHERE doc_id IN (0, 1, 2, 3, 4)),
           |sc AS (SELECT q.query_id, tf.doc_id,
           |    least(CAST(floor((100.0::DOUBLE) * n_docs / df) AS BIGINT), 10000) *
           |      ((tf.tf * 2200 * 1000) // (tf.tf * 1000 +
           |        (1200 * (250 + (750 * dl.dl * 1000) // ((1000 * tot_len) // n_docs))) // 1000))
           |      AS contrib
           |  FROM q JOIN tf USING (t) JOIN dff USING (t) JOIN dfq USING (t)
           |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
           |  WHERE tf.doc_id <> q.query_id),
           |r AS (SELECT query_id, doc_id, sum(contrib)::BIGINT AS score_x1e5,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sum(contrib) DESC, doc_id) AS rank
           |  FROM sc GROUP BY query_id, doc_id)
           |SELECT query_id, doc_id, rank::BIGINT AS rank, score_x1e5
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


      // triplets: the dedup_ngram pair CTEs + the bucketed negative pick
      // (row_number mirrors min(struct(cand_h, cand_id)))
      "mix_triplets" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |cb AS (SELECT doc_id AS cand_id, ${poly("'neg:' || doc_id")} AS cand_h,
           |    (${poly("'neg:' || doc_id")}) % 64 AS bucket FROM documents),
           |pb AS (SELECT doc_a AS anchor_id, doc_b AS positive_id,
           |    (${poly("'probe:' || doc_a || ':' || doc_b")}) % 64 AS bucket FROM pr),
           |j AS (SELECT anchor_id, positive_id, cand_id,
           |    row_number() OVER (PARTITION BY anchor_id, positive_id
           |      ORDER BY cand_h, cand_id) AS rn
           |  FROM pb JOIN cb USING (bucket)
           |  WHERE cand_id <> anchor_id AND cand_id <> positive_id)
           |SELECT anchor_id, positive_id, cand_id AS negative_id FROM j WHERE rn = 1
           |ORDER BY anchor_id, positive_id""".stripMargin,

      // temperature weights: IEEE sqrt then integer floor, both engines
      // hashed-bigram likelihood-ratio scoring vs the src0 target; every
      // step BIGINT (// for the capped smoothed ratio), one IEEE floor
      // for the per-doc mean
      "mix_importance" ->
        s"""WITH tok AS (SELECT doc_id, source, $toks AS toks FROM documents),
           |pr AS (SELECT doc_id, source, unnest(CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1),
           |      i -> toks[i+1] || ' ' || toks[i+2]) END) AS ng FROM tok),
           |occ AS (SELECT doc_id, source, (${poly("'ng:' || ng")}) % 4096 AS b FROM pr),
           |tgt AS (SELECT b, count(*)::BIGINT AS tgt_cnt FROM occ WHERE source = 'src0' GROUP BY b),
           |rawo AS (SELECT doc_id, source, b FROM occ WHERE source <> 'src0'),
           |rawc AS (SELECT b, count(*)::BIGINT AS raw_cnt FROM rawo GROUP BY b),
           |tots AS (SELECT (SELECT count(*) FROM occ WHERE source = 'src0')::BIGINT AS n_tgt,
           |    (SELECT count(*) FROM rawo)::BIGINT AS n_raw),
           |w AS (SELECT coalesce(t.b, r.b) AS b,
           |    least(100000::BIGINT, (10000 * (coalesce(tgt_cnt, 0) + 1) * n_raw)
           |      // ((coalesce(raw_cnt, 0) + 1) * n_tgt)) AS w_x10000
           |  FROM tgt t FULL JOIN rawc r ON t.b = r.b CROSS JOIN tots),
           |tf AS (SELECT doc_id, source, b, count(*)::BIGINT AS tf FROM rawo GROUP BY 1, 2, 3),
           |sc AS (SELECT doc_id, source, sum(tf)::BIGINT AS n_ngrams,
           |    sum(tf * w_x10000)::BIGINT AS sw
           |  FROM tf JOIN w USING (b) GROUP BY 1, 2),
           |rk AS (SELECT doc_id, source, n_ngrams,
           |    CAST(floor(sw::DOUBLE / n_ngrams) AS BIGINT) AS importance_x10000
           |  FROM sc),
           |rr AS (SELECT *, row_number() OVER (PARTITION BY source
           |      ORDER BY importance_x10000 DESC, doc_id)::BIGINT AS rank FROM rk)
           |SELECT doc_id, source, n_ngrams, importance_x10000, rank,
           |  (CASE WHEN rank <= 100 THEN 1 ELSE 0 END)::BIGINT AS selected
           |FROM rr ORDER BY doc_id""".stripMargin,

      "mix_temperature" ->
        s"""WITH c AS (SELECT source,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS tokens
           |  FROM documents GROUP BY source),
           |i AS (SELECT source, tokens,
           |    CAST(floor(sqrt(tokens::DOUBLE)) AS BIGINT) AS isqrt FROM c),
           |t AS (SELECT sum(tokens)::BIGINT AS tot_tokens,
           |    sum(isqrt)::BIGINT AS tot_isqrt FROM i)
           |SELECT source, tokens, isqrt,
           |  CAST(floor((1000000.0::DOUBLE) * isqrt / tot_isqrt) AS BIGINT) AS weight_ppm,
           |  CAST(floor((10000.0::DOUBLE) * isqrt * tot_tokens /
           |    (tot_isqrt * tokens)) AS BIGINT) AS vs_proportional_x10000
           |FROM i CROSS JOIN t ORDER BY source""".stripMargin,

      // epoch plan: the same sqrt counts, integer budget allocation
      "mix_epoch_plan" ->
        s"""WITH c AS (SELECT source,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS tokens
           |  FROM documents GROUP BY source),
           |i AS (SELECT source, tokens,
           |    CAST(floor(sqrt(tokens::DOUBLE)) AS BIGINT) AS isqrt FROM c),
           |t AS (SELECT sum(isqrt)::BIGINT AS tot_isqrt FROM i),
           |a AS (SELECT source, tokens, isqrt, tot_isqrt,
           |    (100000 * isqrt) // tot_isqrt AS allocated_tokens
           |  FROM i CROSS JOIN t)
           |SELECT source, tokens AS available_tokens,
           |  CAST(floor((1000000.0::DOUBLE) * isqrt / tot_isqrt) AS BIGINT) AS weight_ppm,
           |  allocated_tokens::BIGINT AS allocated_tokens,
           |  CAST(floor((10000.0::DOUBLE) * allocated_tokens /
           |    greatest(tokens, 1)) AS BIGINT) AS epochs_x10000
           |FROM a ORDER BY source""".stripMargin,

      // UniMax waterfilling: capacity-sorted shares, the first source that
      // can absorb its share fixes the fill level (LIMIT 1 threshold row)
      "mix_unimax" ->
        s"""WITH c AS (SELECT source,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS tokens
           |  FROM documents GROUP BY source),
           |w AS (SELECT source, tokens, (tokens * 2)::BIGINT AS capacity,
           |    row_number() OVER (ORDER BY tokens * 2, source) AS i,
           |    coalesce(sum(tokens * 2) OVER (ORDER BY tokens * 2, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cap,
           |    count(*) OVER () AS m
           |  FROM c),
           |s AS (SELECT source, tokens, capacity, i,
           |    greatest(52000 - prev_cap, 0) // (m - i + 1) AS share FROM w),
           |lvl AS (SELECT i AS t_i, share AS t_share FROM s
           |  WHERE capacity > share ORDER BY i LIMIT 1)
           |SELECT source, tokens AS available_tokens, capacity,
           |  (CASE WHEN t_i IS NULL OR i < t_i THEN capacity ELSE t_share END)::BIGINT AS allocated_tokens,
           |  CAST(floor((10000.0::DOUBLE) *
           |    (CASE WHEN t_i IS NULL OR i < t_i THEN capacity ELSE t_share END) /
           |    greatest(tokens, 1)) AS BIGINT) AS epochs_x10000
           |FROM s LEFT JOIN lvl ON true
           |ORDER BY source""".stripMargin,

      // DoReMi reweighting: per-source stats once, then 5 unrolled
      // multiplicative-weights rounds (the graph-replay oracle pattern) —
      // quality arithmetic identical to ta_quality's score column
      "mix_doremi" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2
          .map(w => s"'$w'").mkString(",")
        val rounds = 5
        def stepCte(k: Int) = {
          val prev = if (k == 1) "b1" else s"i${k - 1}"
          s"""i$k AS (SELECT source, w0_ppm, e, f,
             |    CAST(floor((1000000.0::DOUBLE) * w * f /
             |      (SELECT sum(w * f) FROM $prev)) AS BIGINT) AS w FROM $prev)"""
            .stripMargin
        }
        s"""WITH per AS (SELECT source,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS tokens,
           |    sum(10000 - q)::BIGINT AS sum_def,
           |    count(*)::BIGINT AS n
           |  FROM (SELECT source, text,
           |      CAST(floor((10000.0::DOUBLE) *
           |        least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |        ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |          (4.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) AS q
           |    FROM documents)
           |  GROUP BY source),
           |tot AS (SELECT sum(tokens)::BIGINT AS tt, sum(sum_def)::BIGINT AS td,
           |    sum(n)::BIGINT AS tn FROM per),
           |b0 AS (SELECT source,
           |    CAST(floor((1000000.0::DOUBLE) * tokens / tt) AS BIGINT) AS w0_ppm,
           |    (CAST(floor((sum_def::DOUBLE) / n) AS BIGINT) -
           |     CAST(floor((td::DOUBLE) / tn) AS BIGINT)) AS e
           |  FROM per CROSS JOIN tot),
           |b1 AS (SELECT source, w0_ppm, e,
           |    (1000 + CAST(floor((e::DOUBLE) / (20.0::DOUBLE)) AS BIGINT))::BIGINT AS f,
           |    w0_ppm AS w FROM b0),
           |${(1 to rounds).map(stepCte).mkString(",\n")}
           |SELECT source, w0_ppm, e AS excess_x10000, w AS doremi_ppm
           |FROM i$rounds ORDER BY source""".stripMargin
      },

      // interleave: per-source salted-hash rank
      "mix_interleave" ->
        s"""SELECT doc_id, source,
           |  row_number() OVER (PARTITION BY source
           |    ORDER BY (${poly("'order:' || doc_id")}), doc_id)::BIGINT AS rr_rank
           |FROM documents
           |ORDER BY rr_rank, source, doc_id""".stripMargin,

      // curriculum order: within-source quality quartile (ntile over the
      // same total order) + salted-hash row number within (source, phase);
      // quality arithmetic identical to ta_quality's score column
      "mix_curriculum" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2
          .map(w => s"'$w'").mkString(",")
        s"""WITH q AS (SELECT doc_id, source,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) AS quality_x10000
           |  FROM documents),
           |p AS (SELECT doc_id, source, quality_x10000,
           |    ntile(4) OVER (PARTITION BY source
           |      ORDER BY quality_x10000 DESC, doc_id) AS phase
           |  FROM q)
           |SELECT doc_id, source, quality_x10000, phase::BIGINT AS phase,
           |  (row_number() OVER (PARTITION BY source, phase
           |    ORDER BY (${poly("'curriculum:' || doc_id")}), doc_id))::BIGINT AS rr_rank
           |FROM p ORDER BY doc_id""".stripMargin
      },

      // hard negatives: ngram pair CTEs + recursive min-reachable closure
      // + the BM25 pipeline queried at the anchors + cluster exclusion
      "mix_hard_triplets" ->
        s"""WITH RECURSIVE
           |tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |sg AS (SELECT doc_id, $shinglesOf AS shs FROM tok),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM sg),
           |shh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM sg)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a AS a, doc_b AS b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |edges AS (SELECT a AS src, b AS dst FROM pr UNION SELECT b, a FROM pr),
           |reach(id, r) AS (
           |  SELECT id, id FROM (SELECT DISTINCT src AS id FROM edges)
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |canon AS (SELECT id, min(r)::BIGINT AS canonical_id FROM reach GROUP BY id),
           |bt AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM
           |    (SELECT doc_id, unnest(toks) AS t FROM tok)
           |  WHERE t <> '' GROUP BY doc_id, t),
           |bdl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM bt GROUP BY doc_id),
           |bst AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot_len FROM bdl),
           |bdf AS (SELECT t, count(*)::BIGINT AS df FROM bt GROUP BY t
           |  HAVING count(*) <= 1000),
           |anchors AS (SELECT DISTINCT a AS qid FROM pr),
           |bq0 AS (SELECT DISTINCT bt.doc_id AS query_id, t FROM bt
           |  JOIN anchors ON bt.doc_id = anchors.qid),
           |bq AS (SELECT query_id, t FROM (
           |    SELECT bq0.query_id, bq0.t,
           |      row_number() OVER (PARTITION BY bq0.query_id
           |        ORDER BY bdf.df, bq0.t) AS qrn
           |    FROM bq0 JOIN bdf USING (t))
           |  WHERE qrn <= 8),
           |bsc AS (SELECT bq.query_id, bt.doc_id,
           |    least(CAST(floor((100.0::DOUBLE) * n_docs / df) AS BIGINT), 10000) *
           |      ((bt.tf * 2200 * 1000) // (bt.tf * 1000 +
           |        (1200 * (250 + (750 * bdl.dl * 1000) // ((1000 * tot_len) // n_docs))) // 1000))
           |      AS contrib
           |  FROM bq JOIN bt USING (t) JOIN bdf USING (t)
           |    JOIN bdl ON bdl.doc_id = bt.doc_id CROSS JOIN bst
           |  WHERE bt.doc_id <> bq.query_id),
           |br AS (SELECT query_id, doc_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sum(contrib) DESC, doc_id) AS rank
           |  FROM bsc GROUP BY query_id, doc_id),
           |ex AS (SELECT br.query_id, br.doc_id, br.rank FROM br
           |  LEFT JOIN canon cq ON cq.id = br.query_id
           |  LEFT JOIN canon cd ON cd.id = br.doc_id
           |  WHERE br.rank <= 20
           |    AND coalesce(cq.canonical_id, br.query_id) <> coalesce(cd.canonical_id, br.doc_id)),
           |neg AS (SELECT query_id, doc_id FROM (
           |    SELECT query_id, doc_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY rank, doc_id) AS rn
           |    FROM ex) WHERE rn = 1)
           |SELECT pr.a AS anchor_id, pr.b AS positive_id, neg.doc_id AS hard_negative_id
           |FROM pr JOIN neg ON neg.query_id = pr.a
           |ORDER BY anchor_id, positive_id""".stripMargin,

      // per-source cap: k smallest salted hashes per source survive; the
      // window form here mirrors the heap's (hash ASC, id ASC) kept-set order
      "mix_source_cap" ->
        s"""WITH h AS (SELECT doc_id, source,
           |    (${poly("'cap:' || doc_id")}) AS hk FROM documents),
           |r AS (SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
           |  FROM h)
           |SELECT doc_id, source FROM r WHERE rn <= 10
           |ORDER BY doc_id""".stripMargin,

      "pack_sequences" ->
        s"""WITH t AS (SELECT source, doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM documents),
           |c AS (SELECT source, doc_id, tok_cnt,
           |    sum(tok_cnt) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM t)
           |SELECT source, CAST(floor((cum - tok_cnt) / 512) AS BIGINT) AS seq_no,
           |  count(*)::BIGINT AS n_docs, sum(tok_cnt)::BIGINT AS seq_tokens
           |FROM c GROUP BY source, seq_no ORDER BY source, seq_no""".stripMargin,

      "ta_vocab" ->
        s"""SELECT term, count(*)::BIGINT AS cnt
           |FROM (SELECT unnest($toks) AS term FROM documents)
           |GROUP BY term ORDER BY cnt DESC, term LIMIT 100""".stripMargin,

      // TF-IDF cosine over 3-gram shingles: integer weights (capped
      // fixed-point idf), exact BIGINT dot/norms, one IEEE floor at the end
      "sim_tfidf" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN []
           |    ELSE list_transform(range(0, len(toks) - 2),
           |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS g
           |  FROM tok),
           |tf AS (SELECT doc_id, g, count(*)::BIGINT AS tf FROM g GROUP BY doc_id, g),
           |dfq AS (SELECT g, count(*)::BIGINT AS df FROM tf GROUP BY g
           |  HAVING count(*) <= 1000),
           |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
           |w AS (SELECT doc_id, g,
           |    tf * least(CAST(floor(100.0 * n_docs / df) AS BIGINT), 10000) AS w
           |  FROM tf JOIN dfq USING (g) CROSS JOIN n),
           |nrm AS (SELECT doc_id, sum(w*w)::BIGINT AS nsq FROM w GROUP BY doc_id),
           |dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w*b.w)::BIGINT AS dot
           |  FROM w a JOIN w b USING (g) WHERE a.doc_id <> b.doc_id
           |  GROUP BY a.doc_id, b.doc_id),
           |c AS (SELECT d1, d2, CAST(floor(1000000.0 * dot /
           |    (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))) AS BIGINT) AS cos_x1e6
           |  FROM dots JOIN nrm n1 ON n1.doc_id = d1 JOIN nrm n2 ON n2.doc_id = d2),
           |r AS (SELECT d1, d2, cos_x1e6,
           |    row_number() OVER (PARTITION BY d1 ORDER BY cos_x1e6 DESC, d2) AS rank
           |  FROM c)
           |SELECT d1 AS doc_id, d2 AS neighbor_id, rank::BIGINT AS rank, cos_x1e6
           |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

      // feature-hashed vectors in sparse long form; the poly hash, idx/sign
      // bit split, integer entry sums, and final IEEE floor all mirror the
      // Spark side exactly
      "sim_hashed" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN []
           |    ELSE list_transform(range(0, len(toks) - 2),
           |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END) AS g
           |  FROM tok),
           |hh AS (SELECT doc_id, ${poly("g")} AS h FROM g),
           |ent AS (SELECT doc_id, h % 64 AS idx,
           |    sum(CASE WHEN h % 128 >= 64 THEN -1 ELSE 1 END)::BIGINT AS v
           |  FROM hh GROUP BY doc_id, h % 64 HAVING sum(CASE WHEN h % 128 >= 64 THEN -1 ELSE 1 END) <> 0),
           |nrm AS (SELECT doc_id, sum(v*v)::BIGINT AS nsq FROM ent GROUP BY doc_id),
           |dots AS (SELECT q.doc_id AS query_id, e.doc_id AS doc_id,
           |    sum(q.v * e.v)::BIGINT AS dot
           |  FROM ent q JOIN ent e USING (idx)
           |  WHERE q.doc_id < 10 AND q.doc_id <> e.doc_id
           |  GROUP BY q.doc_id, e.doc_id),
           |c AS (SELECT dots.query_id, dots.doc_id, CAST(floor(1000000.0 * dot /
           |    (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))) AS BIGINT) AS cos_x1e6
           |  FROM dots JOIN nrm n1 ON n1.doc_id = dots.query_id JOIN nrm n2 ON n2.doc_id = dots.doc_id),
           |r AS (SELECT query_id, doc_id, cos_x1e6,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos_x1e6 DESC, doc_id) AS rank
           |  FROM c)
           |SELECT query_id, doc_id AS neighbor_id, rank::BIGINT AS rank, cos_x1e6
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // CMS: group token occurrences by the same salted-hash buckets the
      // sketch uses; estimate = min over the probe term's d buckets
      "a17_cms_counts" ->
        s"""WITH tk AS (SELECT term FROM
           |    (SELECT unnest($toks) AS term FROM documents) WHERE term <> ''),
           |probes AS (SELECT term, count(*)::BIGINT AS exact_cnt FROM tk
           |  GROUP BY term ORDER BY exact_cnt DESC, term LIMIT 20),
           |occ AS (SELECT i, ${poly("'cms' || i || ':' || term")} % 1024 AS bucket
           |  FROM tk CROSS JOIN range(0, 4) r(i)),
           |cnts AS (SELECT i, bucket, count(*)::BIGINT AS c FROM occ GROUP BY i, bucket),
           |pb AS (SELECT p.term, p.exact_cnt, r.i AS i,
           |    ${poly("'cms' || r.i || ':' || p.term")} % 1024 AS bucket
           |  FROM probes p CROSS JOIN range(0, 4) r(i))
           |SELECT term, exact_cnt, min(c)::BIGINT AS est_cnt
           |FROM pb JOIN cnts USING (i, bucket)
           |GROUP BY term, exact_cnt ORDER BY exact_cnt DESC, term""".stripMargin,

      // event paths: lead() over the same (ts, event_id) per-user order
      "a20_event_paths" ->
        """WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t,
          |    event_id AS eid FROM events),
          |l AS (SELECT et AS s0,
          |    lead(et, 1) OVER (PARTITION BY u ORDER BY t, eid) AS s1,
          |    lead(et, 2) OVER (PARTITION BY u ORDER BY t, eid) AS s2
          |  FROM ev)
          |SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path, count(*)::BIGINT AS cnt
          |FROM l WHERE s2 IS NOT NULL
          |GROUP BY path ORDER BY cnt DESC, path LIMIT 20""".stripMargin,

      // volume anomalies: the same division-free integer 2-sigma test
      "a21_volume_anomaly" ->
        """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          |    count(*)::BIGINT AS n
          |  FROM events GROUP BY event_type, day),
          |st AS (SELECT event_type, count(*)::BIGINT AS d_days,
          |    sum(n)::BIGINT AS s_sum, sum(n*n)::BIGINT AS q_sumsq
          |  FROM daily GROUP BY event_type)
          |SELECT daily.event_type AS event_type, day, n,
          |  (n * d_days - s_sum) * (n * d_days - s_sum) >
          |    4 * (q_sumsq * d_days - s_sum * s_sum) AS anomalous
          |FROM daily JOIN st ON daily.event_type = st.event_type
          |ORDER BY event_type, day""".stripMargin,

      // sentence stats: same planted boundaries (DuckDB backrefs are \1
      // where Spark's are $1), same split + fixed-point means
      "ta_sentences" ->
        s"""WITH p AS (SELECT doc_id,
           |    regexp_replace(regexp_replace(text,
           |      ' (spark|data|join) ', '. \\1 ', 'g'),
           |      ' (table|row) ', '! \\1 ', 'g') AS text
           |  FROM documents),
           |segs AS (SELECT doc_id, list_filter(
           |    list_transform(string_split_regex(text, '[.!?]+'),
           |      s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
           |    s -> s <> '') AS sent FROM p),
           |lens AS (SELECT doc_id,
           |    list_transform(sent, s -> len(string_split(s, ' '))) AS lens
           |  FROM segs)
           |SELECT doc_id, len(lens)::BIGINT AS n_sentences,
           |  CASE WHEN len(lens) = 0 THEN 0::BIGINT
           |    ELSE CAST(floor((100.0::DOUBLE) *
           |      list_reduce(list_prepend(0::BIGINT, lens), (a, b) -> a + b) /
           |      len(lens)) AS BIGINT) END AS mean_sentence_len_x100,
           |  coalesce(list_max(lens), 0)::BIGINT AS max_sentence_len,
           |  CASE WHEN len(lens) = 0 THEN 0::BIGINT
           |    ELSE CAST(floor((10000.0::DOUBLE) *
           |      len(list_filter(lens, x -> x = 1)) / len(lens)) AS BIGINT)
           |  END AS one_word_frac_x10000
           |FROM lens ORDER BY doc_id""".stripMargin,

      // language audit: the ta_langid prediction CASE + a (source, lang)
      // rollup
      "ta_lang_mismatch" -> {
        val langs = operators.TextAnalysis.stopwords
        val scoreCols = langs.map { case (l, ws) =>
          s"len(list_filter($toks, t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))::BIGINT AS score_$l"
        }.mkString(",\n  ")
        val names = langs.map(_._1)
        val pred = names.map { l =>
          val isMax = names.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $isMax AND score_$l > 0 THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        s"""WITH p AS (SELECT source, actual_lang, $pred AS predicted_lang
           |  FROM (SELECT source, lang AS actual_lang,
           |    $scoreCols
           |  FROM documents))
           |SELECT source, actual_lang, count(*)::BIGINT AS n_docs,
           |  sum(CASE WHEN predicted_lang = actual_lang THEN 1 ELSE 0 END)::BIGINT AS n_agree,
           |  sum(CASE WHEN predicted_lang = 'und' THEN 1 ELSE 0 END)::BIGINT AS n_undetermined,
           |  sum(CASE WHEN predicted_lang <> actual_lang AND predicted_lang <> 'und'
           |    THEN 1 ELSE 0 END)::BIGINT AS n_mismatch
           |FROM p GROUP BY source, actual_lang
           |ORDER BY source, actual_lang""".stripMargin
      },

      // quality calibration: the ta_quality score formula + the
      // exact-dup window + per-source ntile quartiles
      "ta_quality_calibration" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2
          .map(w => s"'$w'").mkString(",")
        s"""WITH q AS (SELECT doc_id, source, n_chars,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (word_cnt::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * stop_hits / greatest(word_cnt, 1))) + 0.5) AS BIGINT)
           |      AS quality_x10000,
           |    CASE WHEN count(*) OVER (PARTITION BY ${poly2(norm)}) > 1 THEN 1 ELSE 0 END AS is_dup
           |  FROM (SELECT doc_id, source, n_chars, text,
           |      ($wordCnt)::BIGINT AS word_cnt,
           |      len(list_filter($toks, t -> t IN ($enWords)))::BIGINT AS stop_hits
           |    FROM documents)),
           |t AS (SELECT source, n_chars, quality_x10000, is_dup,
           |    ntile(4) OVER (PARTITION BY source ORDER BY quality_x10000, doc_id)::BIGINT AS quartile
           |  FROM q)
           |SELECT source, quartile, count(*)::BIGINT AS n_docs,
           |  sum(is_dup)::BIGINT AS n_dup_docs,
           |  sum(quality_x10000)::BIGINT AS sum_quality_x10000,
           |  sum(n_chars)::BIGINT AS sum_chars
           |FROM t GROUP BY source, quartile
           |ORDER BY source, quartile""".stripMargin
      },

      // closed-form least-squares training replay: shape features → 9
      // integer sums → floor-div-by-n Gram entries → Cramer expansion.
      // Every intermediate is BIGINT (training is bit-reproducible).
      "ta_train_lsq" -> s"WITH $lsqModelCtes SELECT * FROM model",

      // hashed-ngram NB: FULL training replay — token+bigram occurrence
      // rows (charPolyHash % 1024), per-bucket class counts, add-one
      // log-odds weights ×1e6, Laplace class prior — then the per-doc
      // scoring sum. The only float is ln(), immediately floor-fixed, the
      // quality-score convention
      "ta_train_hashed" -> hashedNbSql("TRUE", "TRUE"),

      // the SERVING split: model trained on the base three-quarters,
      // frozen, scored over the incoming quarter — unseen buckets take the
      // model's default weight (the coalesce leg ta_train_hashed's
      // train==score case never exercises)
      "ta_hashed_incr" -> hashedNbSql("doc_id % 4 <> 0", "doc_id % 4 = 0"),

      // the streamed scoring accumulates the SAME result as the batch
      // serving split — identical split, identical frozen artifact
      "stream_quality_nb" -> hashedNbSql("doc_id % 4 <> 0", "doc_id % 4 = 0"),

      // model card: the training-replay scores rolled up per source
      "ta_hashed_eval" ->
        s"""WITH sc AS (${hashedNbSql("TRUE", "TRUE")})
           |SELECT d.source AS source, count(*)::BIGINT AS n,
           |  sum(sc.correct)::BIGINT AS n_correct,
           |  CAST(floor((10000.0::DOUBLE) * sum(sc.correct) / count(*) + 0.5) AS BIGINT) AS acc_x10000
           |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
           |GROUP BY d.source ORDER BY source""".stripMargin,

      "ta_train_lsq_score" ->
        s"""WITH $lsqModelCtes,
           |sc AS (SELECT doc_id, source, y,
           |    2*(w0_num + w1_num*x1 + w2_num*x2) AS s2, det
           |  FROM sf CROSS JOIN model)
           |SELECT doc_id, source, y AS label, (s2 - det)::BIGINT AS margin2,
           |  predicted,
           |  (CASE WHEN predicted = y THEN 1 ELSE 0 END)::BIGINT AS correct
           |FROM (SELECT *,
           |  (CASE WHEN (det > 0 AND s2 > det) OR (det < 0 AND s2 < det)
           |    THEN 1 ELSE 0 END)::BIGINT AS predicted FROM sc)
           |ORDER BY doc_id""".stripMargin,

      "ta_train_lsq_eval" ->
        s"""WITH $lsqModelCtes,
           |sc AS (SELECT source, y,
           |    (CASE WHEN (det > 0 AND 2*(w0_num + w1_num*x1 + w2_num*x2) > det)
           |        OR (det < 0 AND 2*(w0_num + w1_num*x1 + w2_num*x2) < det)
           |      THEN 1 ELSE 0 END)::BIGINT AS predicted
           |  FROM sf CROSS JOIN model)
           |SELECT source, count(*)::BIGINT AS n,
           |  sum(CASE WHEN predicted = y THEN 1 ELSE 0 END)::BIGINT AS n_correct,
           |  CAST(floor((10000.0::DOUBLE) *
           |    sum(CASE WHEN predicted = y THEN 1 ELSE 0 END) / count(*) + 0.5)
           |    AS BIGINT) AS acc_x10000
           |FROM sc GROUP BY source ORDER BY source""".stripMargin,

      // stump training: per-distinct-value label counts → prefix sums →
      // best (max correct, min threshold), plus the all-negative sentinel
      "ta_train_stump" ->
        s"""WITH lab AS (SELECT ($wordCnt)::BIGINT AS f, $labelY AS y FROM documents),
           |bv AS (SELECT f, sum(y)::BIGINT AS npos,
           |    (count(*) - sum(y))::BIGINT AS nneg FROM lab GROUP BY f),
           |tt AS (SELECT sum(y)::BIGINT AS tot_pos,
           |    (count(*) - sum(y))::BIGINT AS tot_neg, count(*)::BIGINT AS n,
           |    (max(f) + 1)::BIGINT AS f_max1 FROM lab),
           |cands AS (SELECT f AS threshold,
           |    (tt.tot_pos
           |      - coalesce(sum(npos) OVER (ORDER BY f
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + coalesce(sum(nneg) OVER (ORDER BY f
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           |      AS n_correct, tt.n AS n
           |  FROM bv CROSS JOIN tt
           |  UNION ALL SELECT f_max1, tot_neg, n FROM tt)
           |SELECT threshold, n_correct, n FROM cands
           |ORDER BY n_correct DESC, threshold LIMIT 1""".stripMargin,

      // funnel: per-step earliest-time frontier, strictly-after ordering
      "a18_funnel" ->
        """WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
          |s1 AS (SELECT u, min(t) AS t1 FROM ev WHERE et = 'view' GROUP BY u),
          |s2 AS (SELECT ev.u AS u, min(t) AS t2 FROM ev JOIN s1 ON ev.u = s1.u
          |  WHERE et = 'click' AND t > t1 GROUP BY ev.u),
          |s3 AS (SELECT ev.u AS u, min(t) AS t3 FROM ev JOIN s2 ON ev.u = s2.u
          |  WHERE et = 'purchase' AND t > t2 GROUP BY ev.u)
          |SELECT * FROM (VALUES
          |  (1::BIGINT, 'view', (SELECT count(*) FROM s1)::BIGINT),
          |  (2::BIGINT, 'click', (SELECT count(*) FROM s2)::BIGINT),
          |  (3::BIGINT, 'purchase', (SELECT count(*) FROM s3)::BIGINT))
          |  AS v(step_no, step, users)
          |ORDER BY step_no""".stripMargin,

      // retention: integer epoch-week buckets over the distinct
      // (user, week) frame
      "a19_retention" ->
        """WITH uw AS (SELECT DISTINCT user_id AS u,
          |    epoch_us(ts) // 604800000000 AS week FROM events),
          |c AS (SELECT u, min(week) AS cohort_week FROM uw GROUP BY u)
          |SELECT cohort_week, week - cohort_week AS week_offset,
          |  count(*)::BIGINT AS active_users
          |FROM uw JOIN c USING (u)
          |GROUP BY cohort_week, week_offset
          |ORDER BY cohort_week, week_offset""".stripMargin,

      "ta_lm_model" ->
        s"""WITH tok AS (SELECT $toks AS toks FROM documents),
           |pr AS (SELECT unnest(CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1),
           |      i -> {'x': toks[i+1], 'y': toks[i+2]}) END) AS p FROM tok),
           |big AS (SELECT p.x AS x, p.y AS y, count(*)::BIGINT AS cnt FROM pr GROUP BY 1, 2),
           |ctx AS (SELECT x, sum(cnt)::BIGINT AS ctx_cnt FROM big GROUP BY x)
           |SELECT x, y, cnt, ctx_cnt,
           |  CAST(floor(1000000.0 * cnt / ctx_cnt) AS BIGINT) AS p_x1e6
           |FROM big JOIN ctx USING (x) ORDER BY x, y""".stripMargin,

      "ta_lm_score" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1),
           |      i -> {'x': toks[i+1], 'y': toks[i+2]}) END) AS p FROM tok),
           |occ AS (SELECT doc_id, p.x AS x, p.y AS y, count(*)::BIGINT AS tf
           |  FROM pr GROUP BY 1, 2, 3),
           |big AS (SELECT x, y, sum(tf)::BIGINT AS cnt FROM occ GROUP BY x, y),
           |ctx AS (SELECT x, sum(cnt)::BIGINT AS ctx_cnt FROM big GROUP BY x),
           |mdl AS (SELECT x, y, CAST(floor(1000000.0 * cnt / ctx_cnt) AS BIGINT) AS p_x1e6
           |  FROM big JOIN ctx USING (x)),
           |pd AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
           |    sum(tf * coalesce(p_x1e6, 0))::BIGINT AS sump,
           |    min(coalesce(p_x1e6, 0))::BIGINT AS min_p
           |  FROM occ LEFT JOIN mdl USING (x, y) GROUP BY doc_id)
           |SELECT d.doc_id,
           |  coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
           |  coalesce(CAST(floor(CAST(sump AS DOUBLE) / n_bigrams) AS BIGINT), -1) AS lm_score_x1e6,
           |  coalesce(min_p, -1)::BIGINT AS min_p_x1e6
           |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

      // CCNet buckets: the ta_lm_score CTE chain + a per-language ntile(3)
      // over (score DESC, doc_id) — SQL-standard ntile remainder handling
      // matches Spark's, so the assignment is exact
      "ta_ccnet_buckets" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1),
           |      i -> {'x': toks[i+1], 'y': toks[i+2]}) END) AS p FROM tok),
           |occ AS (SELECT doc_id, p.x AS x, p.y AS y, count(*)::BIGINT AS tf
           |  FROM pr GROUP BY 1, 2, 3),
           |big AS (SELECT x, y, sum(tf)::BIGINT AS cnt FROM occ GROUP BY x, y),
           |ctx AS (SELECT x, sum(cnt)::BIGINT AS ctx_cnt FROM big GROUP BY x),
           |mdl AS (SELECT x, y, CAST(floor(1000000.0 * cnt / ctx_cnt) AS BIGINT) AS p_x1e6
           |  FROM big JOIN ctx USING (x)),
           |pd AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
           |    sum(tf * coalesce(p_x1e6, 0))::BIGINT AS sump
           |  FROM occ LEFT JOIN mdl USING (x, y) GROUP BY doc_id),
           |sc AS (SELECT d.doc_id, d.lang,
           |    coalesce(CAST(floor(CAST(sump AS DOUBLE) / n_bigrams) AS BIGINT), -1) AS lm_score_x1e6
           |  FROM documents d LEFT JOIN pd USING (doc_id)),
           |nt AS (SELECT doc_id, lang, lm_score_x1e6,
           |    ntile(3) OVER (PARTITION BY lang
           |      ORDER BY lm_score_x1e6 DESC, doc_id) AS t
           |  FROM sc)
           |SELECT doc_id, lang, lm_score_x1e6,
           |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
           |FROM nt ORDER BY doc_id""".stripMargin,

      // PMI collocations: bigram counts + positional marginals + the one-row
      // total; ranked by the fixed-point likelihood ratio (log-free PMI
      // ordering), min-count 5, deterministic (ratio DESC, x, y) top-50
      "ta_pmi" ->
        s"""WITH tok AS (SELECT $toks AS toks FROM documents),
           |pr AS (SELECT unnest(CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1),
           |      i -> {'x': toks[i+1], 'y': toks[i+2]}) END) AS p FROM tok),
           |big AS (SELECT p.x AS x, p.y AS y, count(*)::BIGINT AS cnt
           |  FROM pr GROUP BY 1, 2),
           |cxs AS (SELECT x, sum(cnt)::BIGINT AS cx FROM big GROUP BY x),
           |cys AS (SELECT y, sum(cnt)::BIGINT AS cy FROM big GROUP BY y),
           |nb AS (SELECT sum(cnt)::BIGINT AS n_big FROM big)
           |SELECT x, y, cnt, cx, cy,
           |  CAST(floor((10000.0::DOUBLE) * cnt * n_big / (cx * cy)) AS BIGINT) AS pmi_ratio_x10000
           |FROM big JOIN cxs USING (x) JOIN cys USING (y) CROSS JOIN nb
           |WHERE cnt >= 5
           |ORDER BY pmi_ratio_x10000 DESC, x, y LIMIT 50""".stripMargin,

      // blocklist scrub: occurrence count + sorted distinct matched terms +
      // the keep/flag/drop verdict at flagMax=3
      "ta_blocklist" -> blocklistOracleSql,

      // the broadcast-join form is row-identical to the literal form
      "ta_blocklist_join" -> blocklistOracleSql,

      "ta_bpe_pairs" ->
        s"""WITH wf AS (SELECT w, count(*)::BIGINT AS freq
           |  FROM (SELECT unnest($toks) AS w FROM documents)
           |  WHERE w <> '' GROUP BY w),
           |p AS (SELECT substring(w, (i+1)::INT, 2) AS pair, freq
           |  FROM (SELECT w, freq, unnest(range(0, length(w) - 1)) AS i
           |        FROM wf WHERE length(w) >= 2))
           |SELECT pair, sum(freq)::BIGINT AS cnt
           |FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

      // replay each merge round: top pair by (cnt DESC, x, y), then the
      // same greedy left-fold re-segmentation (separator-encoded string
      // accumulator) the Spark side runs
      "ta_bpe_train" -> {
        val rounds = 5
        def roundCtes(k: Int) =
          s"""p$k AS (SELECT syms[i+1] AS x, syms[i+2] AS y, sum(freq)::BIGINT AS cnt
             |  FROM (SELECT freq, syms, unnest(range(0, len(syms) - 1)) AS i
             |        FROM v${k - 1} WHERE len(syms) >= 2)
             |  GROUP BY 1, 2),
             |t$k AS (SELECT x, y, cnt FROM p$k ORDER BY cnt DESC, x, y LIMIT 1),
             |v$k AS (SELECT w, freq, list_filter(string_split(
             |    list_reduce(list_prepend('', syms), (acc, s) ->
             |      CASE WHEN ends_with(acc, chr(31) || t$k.x) AND s = t$k.y
             |           THEN substr(acc, 1, length(acc) - length(t$k.x) - 1) || chr(31) || t$k.x || t$k.y
             |           ELSE acc || chr(31) || s END), chr(31)), z -> z <> '') AS syms
             |  FROM v${k - 1} CROSS JOIN t$k)""".stripMargin
        s"""WITH v0 AS (SELECT w, count(*)::BIGINT AS freq, string_split(w, '') AS syms
           |  FROM (SELECT unnest($toks) AS w FROM documents)
           |  WHERE w <> '' GROUP BY w),
           |${(1 to rounds).map(roundCtes).mkString(",\n")}
           |${(1 to rounds).map(k =>
                s"SELECT $k::BIGINT AS merge_no, x, y, cnt FROM t$k")
                .mkString("\nUNION ALL\n")}
           |ORDER BY merge_no""".stripMargin
      },

      // re-train (same round CTEs), then apply each merge to every token of
      // every doc via the same greedy fold, and bill per-doc symbols
      "ta_bpe_segment" ->
        s"""WITH ${bpeSegCtes(5)}
           |SELECT doc_id, sum(len(syms))::BIGINT AS n_syms
           |FROM seg5 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the artifact round-trip must not change a single count
      "ta_bpe_artifact" ->
        s"""WITH ${bpeSegCtes(5)}
           |SELECT doc_id, sum(len(syms))::BIGINT AS n_syms
           |FROM seg5 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // fertility: the same 5-round replay, rolled up to BPE symbols per
      // whitespace word per source (wordless docs excluded on both sides,
      // mirroring bpeSegmentCountsFast's filter)
      "ta_bpe_fertility" ->
        s"""WITH ${bpeSegCtes(5)},
           |sy AS (SELECT doc_id, sum(len(syms))::BIGINT AS n_syms
           |  FROM seg5 GROUP BY doc_id),
           |ws AS (SELECT doc_id, source, ($wordCnt)::BIGINT AS ws_words
           |  FROM documents WHERE ($wordCnt) > 0)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  sum(n_syms)::BIGINT AS total_syms,
           |  sum(ws_words)::BIGINT AS total_words,
           |  CAST(floor((10000.0::DOUBLE) * sum(n_syms) /
           |    greatest(sum(ws_words), 1)) AS BIGINT) AS fertility_x10000
           |FROM sy JOIN ws USING (doc_id)
           |GROUP BY source ORDER BY source""".stripMargin,

      // signals mirror ta_quality / ta_repetition; the verdict CASE tests
      // rules in the same order as TextAnalysis.qualityFilter
      "ta_quality_filter" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""WITH sig AS (SELECT doc_id,
           |    ($wordCnt)::BIGINT AS word_cnt,
           |    CAST(floor((100.0::DOUBLE) * (length($norm) - ($wordCnt) + 1) / greatest(($wordCnt), 1) + 0.5) AS BIGINT) AS avg_word_len_x100,
           |    CAST(floor((10000.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1) + 0.5) AS BIGINT) AS stopword_ratio_x10000
           |  FROM documents),
           |tt AS (SELECT doc_id, $toks AS toks FROM documents),
           |b AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) END AS bgs
           |  FROM tt),
           |rep AS (SELECT doc_id,
           |    CAST(floor((10000.0::DOUBLE) * (len(bgs) - len(list_distinct(bgs))) / greatest(len(bgs), 1) + 0.5) AS BIGINT) AS dup_bigram_ratio_x10000
           |  FROM b),
           |v AS (SELECT sig.doc_id AS doc_id, word_cnt, avg_word_len_x100,
           |    stopword_ratio_x10000, dup_bigram_ratio_x10000,
           |    CASE WHEN word_cnt < 30 THEN 'too_short'
           |         WHEN word_cnt > 100000 THEN 'too_long'
           |         WHEN avg_word_len_x100 < 200 THEN 'words_too_short'
           |         WHEN avg_word_len_x100 > 1500 THEN 'words_too_long'
           |         WHEN stopword_ratio_x10000 < 200 THEN 'low_stopwords'
           |         WHEN dup_bigram_ratio_x10000 > 3000 THEN 'repetitive'
           |         ELSE '' END AS reason
           |  FROM sig JOIN rep ON sig.doc_id = rep.doc_id)
           |SELECT doc_id, (CASE WHEN reason = '' THEN 1 ELSE 0 END)::BIGINT AS keep,
           |  reason, word_cnt, avg_word_len_x100, stopword_ratio_x10000, dup_bigram_ratio_x10000
           |FROM v ORDER BY doc_id""".stripMargin
      },

      // gate ablation: the ta_quality_filter signal CTEs + six flag
      // columns, then one aggregate per rule (marginal / sole-blocker /
      // first-match attribution) UNION ALL'd into the 6-row report
      "ta_gate_ablation" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        val rules = Seq(
          "too_short" -> "word_cnt < 30",
          "too_long" -> "word_cnt > 100000",
          "words_too_short" -> "avg_word_len_x100 < 200",
          "words_too_long" -> "avg_word_len_x100 > 1500",
          "low_stopwords" -> "stopword_ratio_x10000 < 200",
          "repetitive" -> "dup_bigram_ratio_x10000 > 3000")
        val ruleRows = rules.map { case (name, cond) =>
          s"""SELECT '$name' AS rule,
             |  sum(CASE WHEN $cond THEN 1 ELSE 0 END)::BIGINT AS violations,
             |  sum(CASE WHEN ($cond) AND n_viol = 1 THEN 1 ELSE 0 END)::BIGINT AS sole_blockers,
             |  sum(CASE WHEN reason = '$name' THEN 1 ELSE 0 END)::BIGINT AS first_reason_cnt
             |FROM v""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH sig AS (SELECT doc_id,
           |    ($wordCnt)::BIGINT AS word_cnt,
           |    CAST(floor((100.0::DOUBLE) * (length($norm) - ($wordCnt) + 1) / greatest(($wordCnt), 1) + 0.5) AS BIGINT) AS avg_word_len_x100,
           |    CAST(floor((10000.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1) + 0.5) AS BIGINT) AS stopword_ratio_x10000
           |  FROM documents),
           |tt AS (SELECT doc_id, $toks AS toks FROM documents),
           |bg AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) END AS bgs
           |  FROM tt),
           |rep AS (SELECT doc_id,
           |    CAST(floor((10000.0::DOUBLE) * (len(bgs) - len(list_distinct(bgs))) / greatest(len(bgs), 1) + 0.5) AS BIGINT) AS dup_bigram_ratio_x10000
           |  FROM bg),
           |v AS (SELECT sig.doc_id AS doc_id, word_cnt, avg_word_len_x100,
           |    stopword_ratio_x10000, dup_bigram_ratio_x10000,
           |    ${rules.map { case (_, c) => s"(CASE WHEN $c THEN 1 ELSE 0 END)" }
                  .mkString(" + ")} AS n_viol,
           |    CASE ${rules.map { case (n, c) => s"WHEN $c THEN '$n'" }.mkString(" ")}
           |         ELSE '' END AS reason
           |  FROM sig JOIN rep ON sig.doc_id = rep.doc_id)
           |SELECT * FROM ($ruleRows) ORDER BY rule""".stripMargin
      },

      // per-source nearest-rank threshold at the 40th percentile of the
      // ta_quality score (keep top 60%); ties at the cut survive (>=)
      "ta_quality_pct" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""WITH b AS (SELECT doc_id, source,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, t -> t IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) AS quality_x10000
           |  FROM documents),
           |r AS (SELECT source, quality_x10000,
           |    row_number() OVER (PARTITION BY source ORDER BY quality_x10000, doc_id)::BIGINT AS rn
           |  FROM b),
           |tg AS (SELECT source, greatest((40 * cnt + 99) // 100, 1) AS rn
           |  FROM (SELECT source, count(*)::BIGINT AS cnt FROM b GROUP BY source)),
           |th AS (SELECT r.source AS source, r.quality_x10000 AS q_threshold
           |  FROM r JOIN tg ON r.source = tg.source AND r.rn = tg.rn)
           |SELECT b.doc_id AS doc_id, b.source AS source, b.quality_x10000 AS quality_x10000,
           |  th.q_threshold AS q_threshold
           |FROM b JOIN th ON b.source = th.source
           |WHERE b.quality_x10000 >= th.q_threshold ORDER BY doc_id""".stripMargin
      },

      // bigrams are NON-distinct here (occurrence counts), unlike the
      // dedup shingle fragment
      // compaction plan: same prefix-sum grouping in file-name order
      "layout_compaction" ->
        """WITH m AS (SELECT source AS dir,
          |    lpad(doc_id::VARCHAR, 6, '0') AS file, n_chars AS bytes
          |  FROM documents),
          |c AS (SELECT dir, file, bytes,
          |    sum(bytes) OVER (PARTITION BY dir ORDER BY file
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM m)
          |SELECT dir, ((cum - bytes) // 2000)::BIGINT AS group_no,
          |  count(*)::BIGINT AS n_files, sum(bytes)::BIGINT AS group_bytes,
          |  min(file) AS first_file, max(file) AS last_file
          |FROM c GROUP BY dir, group_no
          |ORDER BY dir, group_no""".stripMargin,

      // Z-order skipping report: same bucketize → Morton interleave →
      // file assignment → per-file min/max → box-intersection test; the
      // interleave is the same shift/mask sum, generated here so Spark and
      // SQL cannot drift bit by bit
      "layout_zorder" -> {
        val zIlv = (0 until 8).map(i =>
          s"((((ab >> $i) & 1) << ${2 * i + 1}) + (((bb >> $i) & 1) << ${2 * i}))")
          .mkString(" + ")
        s"""WITH mm AS (SELECT min(n_chars)::BIGINT AS amin, max(n_chars)::BIGINT AS amax,
           |    min(doc_id)::BIGINT AS bmin, max(doc_id)::BIGINT AS bmax FROM documents),
           |bk AS (SELECT ((n_chars - amin) * 256) // (amax - amin + 1) AS ab,
           |    ((doc_id - bmin) * 256) // (bmax - bmin + 1) AS bb
           |  FROM documents, mm),
           |asg AS (SELECT ab, bb, ($zIlv) // 1024 AS zfile, ab // 4 AS lfile FROM bk),
           |st AS (
           |  SELECT 'zorder' AS layout, zfile AS file_no, count(*)::BIGINT AS n_rows,
           |      min(ab) AS fa_min, max(ab) AS fa_max,
           |      min(bb) AS fb_min, max(bb) AS fb_max
           |    FROM asg GROUP BY zfile
           |  UNION ALL
           |  SELECT 'linear', lfile, count(*)::BIGINT,
           |      min(ab), max(ab), min(bb), max(bb)
           |    FROM asg GROUP BY lfile)
           |SELECT layout, 'a' AS box, count(*)::BIGINT AS files_total,
           |    sum(CASE WHEN fa_max >= 64 AND fa_min <= 95
           |      AND fb_max >= 0 AND fb_min <= 255 THEN 1 ELSE 0 END)::BIGINT AS files_hit,
           |    sum(CASE WHEN fa_max >= 64 AND fa_min <= 95
           |      AND fb_max >= 0 AND fb_min <= 255 THEN n_rows ELSE 0 END)::BIGINT AS rows_hit
           |  FROM st GROUP BY layout
           |UNION ALL
           |SELECT layout, 'b', count(*)::BIGINT,
           |    sum(CASE WHEN fa_max >= 0 AND fa_min <= 255
           |      AND fb_max >= 64 AND fb_min <= 95 THEN 1 ELSE 0 END)::BIGINT,
           |    sum(CASE WHEN fa_max >= 0 AND fa_min <= 255
           |      AND fb_max >= 64 AND fb_min <= 95 THEN n_rows ELSE 0 END)::BIGINT
           |  FROM st GROUP BY layout
           |ORDER BY layout, box""".stripMargin
      },

      // ORC: lossless round-trip ⇒ the oracle reads the source directly
      "src_orc_roundtrip" ->
        """SELECT doc_id, source, n_chars FROM documents
          |ORDER BY doc_id""".stripMargin,

      // CSV: lossless round-trip ⇒ same shape, text length proves the
      // quoted/escaped/multiline text column survived byte-for-byte
      "src_csv_roundtrip" ->
        """SELECT doc_id, source, n_chars, length(text)::BIGINT AS text_len
          |FROM documents ORDER BY doc_id""".stripMargin,

      // corrupt-record ingest: the oracle replays the plant arithmetic —
      // valid docs (13∤id) aggregate per source from the table directly
      // (the JSON round-trip is lossless), malformed lines' raw lengths
      // recompute from the same deterministic corruption expressions
      "src_corrupt_records" ->
        """WITH valid AS (SELECT source, count(*)::BIGINT AS n_docs,
          |    sum(n_chars)::BIGINT AS sum_chars
          |  FROM documents WHERE doc_id % 13 <> 0 GROUP BY source),
          |corrupt AS (SELECT count(*)::BIGINT AS n_docs,
          |    sum(CASE WHEN doc_id % 2 = 0
          |      THEN length('{"doc_id": ' || doc_id || ', "truncated')
          |      ELSE length('### corrupt record ' || doc_id) END)::BIGINT AS corrupt_chars
          |  FROM documents WHERE doc_id % 13 = 0)
          |SELECT source, n_docs, sum_chars, 0::BIGINT AS corrupt_chars FROM valid
          |UNION ALL
          |SELECT '_quarantine' AS source, n_docs, 0::BIGINT AS sum_chars,
          |  corrupt_chars FROM corrupt
          |ORDER BY source""".stripMargin,

      // merged-schema read: batch-1 rows get the added column null-filled
      // (surfaced as -1), batch 2 carries it
      "src_schema_evolution" ->
        """SELECT doc_id, source, -1::BIGINT AS n_chars, 1::BIGINT AS batch
          |FROM documents WHERE doc_id % 2 = 0
          |UNION ALL
          |SELECT doc_id, source, n_chars, 2::BIGINT AS batch
          |FROM documents WHERE doc_id % 2 <> 0
          |ORDER BY doc_id""".stripMargin,

      // compaction apply: lossless round-trip through the fragmented-then-
      // compacted directory ⇒ the oracle reads the source directly
      "layout_compaction_apply" ->
        """SELECT doc_id, source, n_chars FROM documents
          |ORDER BY doc_id""".stripMargin,

      // the custom source's MicroBatchStream face drained to parquet must
      // accumulate the whole staged table exactly once
      "stream_custom_source" ->
        """SELECT doc_id, source, lang, length(text)::BIGINT AS text_chars
          |FROM documents ORDER BY doc_id""".stripMargin,

      // custom DataSourceV2 read: the staged chunk format + pushed
      // filters + pruned projection must be lossless, so the oracle is
      // the same filter/projection on the source table directly
      "src_custom_source" ->
        """SELECT doc_id, source, length(text)::BIGINT AS text_chars
          |FROM documents WHERE lang = 'en' AND doc_id < 400
          |ORDER BY doc_id""".stripMargin,

      // lake layout: the round-trip must be lossless, so the oracle is the
      // same filter on the source table directly
      "layout_pruned_scan" ->
        """SELECT doc_id, source, n_chars FROM documents
          |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,

      // unicode cleanup: same planted dirt, same explicit codepoint
      // classes (RE2 \\x{...} spelling of the Java \\uXXXX classes)
      "p13_normalize_unicode" ->
        s"""WITH dirty AS (SELECT doc_id,
           |    chr(8220) || 'quoted' || chr(8221) || ' ' || chr(8211) || ' ' || text ||
           |      chr(160) || 'tail' || chr(8203) || chr(7) AS t
           |  FROM documents),
           |c1 AS (SELECT doc_id, regexp_replace(t, '[\\x{2018}\\x{2019}\\x{201A}\\x{201B}]', '''', 'g') AS t FROM dirty),
           |c2 AS (SELECT doc_id, regexp_replace(t, '[\\x{201C}\\x{201D}\\x{201E}]', '"', 'g') AS t FROM c1),
           |c3 AS (SELECT doc_id, regexp_replace(t, '[\\x{2013}\\x{2014}\\x{2015}]', '-', 'g') AS t FROM c2),
           |c4 AS (SELECT doc_id, regexp_replace(t, '[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{3000}]', ' ', 'g') AS t FROM c3),
           |c5 AS (SELECT doc_id, regexp_replace(t, '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g') AS t FROM c4),
           |c6 AS (SELECT doc_id, regexp_replace(t, '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]', '', 'g') AS t FROM c5),
           |n AS (SELECT doc_id, ${normOf("t")} AS clean FROM c6)
           |SELECT doc_id, ${poly2("clean")} AS clean_hash,
           |  length(clean)::BIGINT AS clean_len
           |FROM n ORDER BY doc_id""".stripMargin,

      // 2-core: two unrolled peel rounds (the cycle construction converges
      // structurally in one — the second proves the fixpoint)
      "graph_kcore" ->
        """WITH hubs AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY source),
          |mem AS (SELECT d.doc_id AS a, h.hub AS b FROM documents d
          |  JOIN hubs h ON d.source = h.source WHERE d.doc_id <> h.hub),
          |ring0 AS (SELECT hub AS a, lead(hub, 1) OVER (ORDER BY source) AS b FROM hubs),
          |ringe AS (SELECT a, b FROM ring0 WHERE b IS NOT NULL),
          |wrap AS (SELECT max_by(hub, source) AS a, min_by(hub, source) AS b FROM hubs),
          |pe AS (SELECT a, b FROM mem UNION ALL SELECT a, b FROM ringe
          |  UNION ALL SELECT a, b FROM wrap),
          |cn AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM pe WHERE a <> b),
          |e0 AS (SELECT a AS src, b AS dst FROM cn UNION ALL SELECT b AS src, a AS dst FROM cn),
          |d1 AS (SELECT src, count(*)::BIGINT AS degree FROM e0 GROUP BY src),
          |k1 AS (SELECT src FROM d1 WHERE degree >= 2),
          |e1 AS (SELECT e0.src, e0.dst FROM e0
          |  JOIN k1 x ON e0.src = x.src JOIN k1 y ON e0.dst = y.src),
          |d2 AS (SELECT src, count(*)::BIGINT AS degree FROM e1 GROUP BY src),
          |k2 AS (SELECT src FROM d2 WHERE degree >= 2),
          |e2 AS (SELECT e1.src, e1.dst FROM e1
          |  JOIN k2 x ON e1.src = x.src JOIN k2 y ON e1.dst = y.src),
          |d3 AS (SELECT src, count(*)::BIGINT AS degree FROM e2 GROUP BY src)
          |SELECT src AS node, degree FROM d3 WHERE degree >= 2
          |ORDER BY node""".stripMargin,

      // personalized PageRank: same graph CTEs, seed-only reset/init via
      // the shared pprRounds recurrence
      "graph_ppr" -> {
        val rounds = pprRounds(10)
        s"""WITH hubs AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY source),
           |mem AS (SELECT d.doc_id AS x, h.hub AS y FROM documents d
           |  JOIN hubs h ON d.source = h.source WHERE d.doc_id <> h.hub),
           |ring0 AS (SELECT hub AS src, lead(hub, 1) OVER (ORDER BY source) AS dst FROM hubs),
           |ringe AS (SELECT src, dst FROM ring0 WHERE dst IS NOT NULL),
           |edges AS (SELECT x AS src, y AS dst, 1::BIGINT AS w FROM mem
           |  UNION ALL SELECT y AS src, x AS dst, 1::BIGINT AS w FROM mem
           |  UNION ALL SELECT src, dst, 1::BIGINT AS w FROM ringe
           |  UNION ALL SELECT dst AS src, src AS dst, 1::BIGINT AS w FROM ringe),
           |deg AS (SELECT src, sum(w)::BIGINT AS wdeg FROM edges GROUP BY src),
           |rst AS (SELECT src AS node,
           |    CASE WHEN src = 0 THEN 150000 ELSE 0 END::BIGINT AS reset FROM deg),
           |r0 AS (SELECT src AS node,
           |    CASE WHEN src = 0 THEN 1000000 ELSE 0 END::BIGINT AS rank FROM deg),
           |$rounds
           |SELECT node, rank AS rank_x1e6 FROM r10 ORDER BY node""".stripMargin
      },

      // triangles: dedup_ngram's pair CTEs + the canonical a<b<c join
      "graph_triangles" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a AS a, doc_b AS b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jx
           |    FROM common
           |    JOIN sizes na ON na.doc_id = doc_a
           |    JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jx >= 5000),
           |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
           |  FROM pr e1 JOIN pr e2 ON e1.b = e2.a
           |  WHERE EXISTS (SELECT 1 FROM pr e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
           |nodes AS (SELECT a AS node FROM tri
           |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
           |SELECT node, count(*)::BIGINT AS triangles
           |FROM nodes GROUP BY node ORDER BY node""".stripMargin,

      // graphRank over the planted hub-star + hub-ring doc graph; same
      // shared unrolled recurrence, node ids instead of terms
      "graph_rank" -> {
        val rounds = prRounds(10, "node")
        s"""WITH hubs AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY source),
           |mem AS (SELECT d.doc_id AS x, h.hub AS y FROM documents d
           |  JOIN hubs h ON d.source = h.source WHERE d.doc_id <> h.hub),
           |ring0 AS (SELECT hub AS src, lead(hub, 1) OVER (ORDER BY source) AS dst FROM hubs),
           |ringe AS (SELECT src, dst FROM ring0 WHERE dst IS NOT NULL),
           |edges AS (SELECT x AS src, y AS dst, 1::BIGINT AS w FROM mem
           |  UNION ALL SELECT y AS src, x AS dst, 1::BIGINT AS w FROM mem
           |  UNION ALL SELECT src, dst, 1::BIGINT AS w FROM ringe
           |  UNION ALL SELECT dst AS src, src AS dst, 1::BIGINT AS w FROM ringe),
           |deg AS (SELECT src, sum(w)::BIGINT AS wdeg FROM edges GROUP BY src),
           |r0 AS (SELECT src AS node, 1000000::BIGINT AS rank FROM deg),
           |$rounds
           |SELECT node, rank AS rank_x1e6 FROM r10 ORDER BY node""".stripMargin
      },

      // wikitext → links → PageRank: the oracle replays the markup plant,
      // the [[target|label]] extraction, Doc-id resolution, self/red-link
      // policy, then the same unrolled 10-round recurrence
      "graph_wikilinks" -> {
        val rounds = prRounds(10, "node")
        s"""WITH wtx AS (SELECT doc_id,
           |  'See ' || CASE WHEN doc_id % 8 <> 0
           |    THEN '[[Doc-' || (doc_id - doc_id % 8) || '|hub page]] and '
           |    ELSE '' END ||
           |  '[[Doc-' || (doc_id + 1) || ']] for more details.' AS wt
           |  FROM documents),
           |lnk AS (SELECT doc_id AS src,
           |    unnest(regexp_extract_all(wt, '\\[\\[([^\\]|]+)(?:\\|[^\\]]*)?\\]\\]', 1)) AS t
           |  FROM wtx),
           |tid AS (SELECT src, regexp_extract(t, '^Doc-([0-9]+)$$', 1) AS tid FROM lnk),
           |edges AS (SELECT src, CAST(tid AS BIGINT) AS dst, 1::BIGINT AS w
           |  FROM tid WHERE tid <> '' AND src <> CAST(tid AS BIGINT)),
           |deg AS (SELECT src, sum(w)::BIGINT AS wdeg FROM edges GROUP BY src),
           |r0 AS (SELECT src AS node, 1000000::BIGINT AS rank FROM deg),
           |$rounds
           |SELECT node, rank AS rank_x1e6 FROM r10 ORDER BY node""".stripMargin
      },

      // Newman's r over the same planted graph CTEs: exact degree sums,
      // the a10 IEEE-sqrt Pearson finish
      "graph_assortativity" ->
        """WITH hubs AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY source),
          |mem AS (SELECT d.doc_id AS x, h.hub AS y FROM documents d
          |  JOIN hubs h ON d.source = h.source WHERE d.doc_id <> h.hub),
          |ring0 AS (SELECT hub AS src, lead(hub, 1) OVER (ORDER BY source) AS dst FROM hubs),
          |ringe AS (SELECT src, dst FROM ring0 WHERE dst IS NOT NULL),
          |edges AS (SELECT x AS src, y AS dst FROM mem
          |  UNION ALL SELECT y AS src, x AS dst FROM mem
          |  UNION ALL SELECT src, dst FROM ringe
          |  UNION ALL SELECT dst AS src, src AS dst FROM ringe),
          |deg AS (SELECT src AS node, count(*)::BIGINT AS deg FROM edges GROUP BY src),
          |j AS (SELECT dx.deg AS x, dy.deg AS y FROM edges e
          |  JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node),
          |g AS (SELECT count(*)::BIGINT AS m, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy, sum(x*y)::BIGINT AS sxy
          |  FROM j)
          |SELECT m AS m_edges,
          |  CAST(floor((10000.0::DOUBLE) * (m*sxy - sx*sy) /
          |    (sqrt(CAST(m*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(m*syy - sy*sy AS DOUBLE))) + 0.5) AS BIGINT) AS r_x10000
          |FROM g""".stripMargin,

      // label propagation: same planted graph CTEs + self-edges, 4
      // unrolled sync rounds, then the community-size join
      "graph_communities" -> {
        val rounds = lpaRounds(4)
        s"""WITH hubs AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY source),
           |mem AS (SELECT d.doc_id AS x, h.hub AS y FROM documents d
           |  JOIN hubs h ON d.source = h.source WHERE d.doc_id <> h.hub),
           |ring0 AS (SELECT hub AS src, lead(hub, 1) OVER (ORDER BY source) AS dst FROM hubs),
           |ringe AS (SELECT src, dst FROM ring0 WHERE dst IS NOT NULL),
           |e0 AS (SELECT x AS node, y AS nbr FROM mem
           |  UNION ALL SELECT y AS node, x AS nbr FROM mem
           |  UNION ALL SELECT src AS node, dst AS nbr FROM ringe
           |  UNION ALL SELECT dst AS node, src AS nbr FROM ringe),
           |es AS (SELECT node, nbr FROM e0
           |  UNION ALL SELECT DISTINCT node AS node, node AS nbr FROM e0),
           |l0 AS (SELECT DISTINCT node AS node, node AS label FROM es),
           |$rounds
           |SELECT l4.node AS node, l4.label AS label, s.community_n
           |FROM l4 JOIN (SELECT label, count(*)::BIGINT AS community_n
           |  FROM l4 GROUP BY label) s ON l4.label = s.label
           |ORDER BY node""".stripMargin
      },

      // redirect chains: same planted mapping, resolved by a recursive CTE
      // (one hop per recursion level); final rows = targets outside the
      // redirect domain
      "p12_redirect_resolve" ->
        """WITH RECURSIVE
          |r AS (SELECT doc_id AS id, doc_id - 1 AS target FROM documents
          |  WHERE doc_id % 8 <> 0),
          |chain(id, target, hops) AS (
          |  SELECT id, target, 1::BIGINT AS hops FROM r
          |  UNION ALL
          |  SELECT c.id, r2.target, c.hops + 1 FROM chain c JOIN r r2 ON c.target = r2.id)
          |SELECT id, target AS final_id, hops FROM chain
          |WHERE target NOT IN (SELECT id FROM r)
          |ORDER BY id""".stripMargin,

      // TextRank: the same fixed-point integer PageRank recurrence the
      // Spark loop runs, unrolled one CTE per round (DuckDB `//` and Spark
      // `DIV` agree on non-negative BIGINTs; sums cast back from HUGEINT).
      // `prRounds` is shared with graph_rank: it assumes CTEs `edges`
      // (src, dst, w) and `deg` (src, wdeg) and emits r1..rN from r0.
      "ta_textrank" -> {
        val rounds = prRounds(10, "term")
        s"""WITH t AS (SELECT $toks AS toks FROM documents),
           |pr AS (SELECT a, b FROM (
           |    SELECT unnest(list_transform(range(0, len(toks) - 1), i -> toks[i+1])) AS a,
           |      unnest(list_transform(range(0, len(toks) - 1), i -> toks[i+2])) AS b
           |    FROM t WHERE len(toks) >= 2)
           |  WHERE a <> b),
           |vocab AS (SELECT term FROM (SELECT unnest(toks) AS term FROM t)
           |  GROUP BY term ORDER BY count(*) DESC, term LIMIT 500),
           |e0 AS (SELECT least(a, b) AS x, greatest(a, b) AS y, count(*)::BIGINT AS w
           |  FROM pr WHERE a IN (SELECT term FROM vocab) AND b IN (SELECT term FROM vocab)
           |  GROUP BY x, y),
           |edges AS (SELECT x AS src, y AS dst, w FROM e0
           |  UNION ALL SELECT y AS src, x AS dst, w FROM e0),
           |deg AS (SELECT src, sum(w)::BIGINT AS wdeg FROM edges GROUP BY src),
           |r0 AS (SELECT src AS term, 1000000::BIGINT AS rank FROM deg),
           |$rounds
           |SELECT term, rank AS rank_x1e6 FROM r10
           |ORDER BY rank DESC, term LIMIT 50""".stripMargin
      },

      // per-doc 8-gram novelty: df over the char-poly shingle hash (same
      // hash both engines, so a collision cancels), -1 sentinel for docs
      // too short to shingle
      "ta_novelty" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM t),
           |h AS (SELECT doc_id, ${poly("sh")} AS h FROM s),
           |dfq AS (SELECT h, count(*)::BIGINT AS df FROM h GROUP BY h),
           |p AS (SELECT doc_id, count(*)::BIGINT AS n_shingles,
           |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS unique_shingles
           |  FROM h JOIN dfq USING (h) GROUP BY doc_id)
           |SELECT d.doc_id AS doc_id,
           |  coalesce(n_shingles, 0)::BIGINT AS n_shingles,
           |  coalesce(unique_shingles, 0)::BIGINT AS unique_shingles,
           |  CASE WHEN coalesce(n_shingles, 0) = 0 THEN -1::BIGINT
           |    ELSE CAST(floor((1000000.0::DOUBLE) * unique_shingles / n_shingles) AS BIGINT)
           |  END AS novelty_x1e6
           |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
           |ORDER BY 1""".stripMargin,

      // per-source n-gram type–token ratio: (source, hash) pre-aggregate,
      // then the per-source rollup — same hash universe as the dedup suite
      "ta_diversity" ->
        s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
           |s AS (SELECT source, unnest($shinglesOf) AS sh FROM t),
           |g AS (SELECT source, ${poly("sh")} AS h, count(*)::BIGINT AS cnt
           |  FROM s GROUP BY 1, 2)
           |SELECT source, count(*)::BIGINT AS distinct_ngrams,
           |  sum(cnt)::BIGINT AS total_ngrams,
           |  CAST(floor((1000000.0::DOUBLE) * count(*) / greatest(sum(cnt), 1) + 0.5) AS BIGINT) AS diversity_ppm
           |FROM g GROUP BY source ORDER BY source""".stripMargin,

      // nearest-rank median + MAD per source (the a11/a15 rank convention),
      // flag docs beyond 4 MADs; d0 mirrors plantedLongDocs
      "ta_length_outliers" ->
        s"""WITH d0 AS (SELECT doc_id, source, text FROM documents
           |  UNION ALL SELECT doc_id + 1000000 AS doc_id, source,
           |    repeat(text || ' ', 10) AS text
           |  FROM documents WHERE doc_id % 23 = 0),
           |b AS (SELECT doc_id, source, ($wordCnt)::BIGINT AS tok FROM d0),
           |c AS (SELECT source, count(*)::BIGINT AS n,
           |    ((count(*) + 1) // 2)::BIGINT AS target FROM b GROUP BY source),
           |r1 AS (SELECT source, tok,
           |    row_number() OVER (PARTITION BY source ORDER BY tok, doc_id)::BIGINT AS rn
           |  FROM b),
           |med AS (SELECT r1.source AS source, tok AS med
           |  FROM r1 JOIN c ON r1.source = c.source AND r1.rn = c.target),
           |dv AS (SELECT b.doc_id, b.source, b.tok, med.med,
           |    abs(b.tok - med.med)::BIGINT AS dev
           |  FROM b JOIN med ON b.source = med.source),
           |r2 AS (SELECT source, doc_id, dev,
           |    row_number() OVER (PARTITION BY source ORDER BY dev, doc_id)::BIGINT AS rn
           |  FROM dv),
           |mad AS (SELECT r2.source AS source, dev AS mad
           |  FROM r2 JOIN c ON r2.source = c.source AND r2.rn = c.target)
           |SELECT dv.doc_id AS doc_id, dv.source AS source, tok, med,
           |  mad.mad AS mad, dev
           |FROM dv JOIN mad ON dv.source = mad.source
           |WHERE dev > 4 * greatest(mad.mad, 1)
           |ORDER BY doc_id""".stripMargin,

      // per-source unigram Gini impurity 1 - Σc²/N², ppm — exact int64
      // factors through one IEEE double division
      "ta_gini" ->
        s"""WITH tok AS (SELECT source, unnest($toks) AS w FROM documents),
           |g AS (SELECT source, w, count(*)::BIGINT AS cnt FROM tok
           |  WHERE w <> '' GROUP BY source, w),
           |r AS (SELECT source, count(*)::BIGINT AS n_terms,
           |    sum(cnt)::BIGINT AS n_tokens, sum(cnt*cnt)::BIGINT AS s2
           |  FROM g GROUP BY source)
           |SELECT source, n_terms, n_tokens,
           |  CAST(floor((1000000.0::DOUBLE) * (n_tokens*n_tokens - s2)::DOUBLE
           |    / (n_tokens*n_tokens)::DOUBLE + 0.5) AS BIGINT) AS gini_ppm
           |FROM r ORDER BY source""".stripMargin,

      "ta_k_anonymity" ->
        """SELECT source, lang, (n_chars // 200)::BIGINT AS len_bucket,
          |  count(*)::BIGINT AS class_n,
          |  (CASE WHEN count(*) < 10 THEN 1 ELSE 0 END)::BIGINT AS at_risk
          |FROM documents GROUP BY source, lang, len_bucket
          |ORDER BY source, lang, len_bucket""".stripMargin,

      // same planted boundaries as ta_sentences; the per-doc score is one
      // exact BIGINT rational over (words, sentences, vowel-run syllables)
      "ta_readability" ->
        s"""WITH p AS (SELECT source,
           |    regexp_replace(regexp_replace(text,
           |      ' (spark|data|join) ', '. \\1 ', 'g'),
           |      ' (table|row) ', '! \\1 ', 'g') AS text
           |  FROM documents),
           |m AS (SELECT source, ($wordCnt)::BIGINT AS w,
           |    greatest(len(regexp_extract_all(text, '[.!?]+'))::BIGINT, 1) AS s,
           |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT AS syl
           |  FROM p),
           |f AS (SELECT source,
           |    CAST(floor((206835*s*w - 1015*w*w - 84600*syl*s)::DOUBLE
           |      / (s*w)::DOUBLE) AS BIGINT) AS fre
           |  FROM m WHERE w >= 1)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  CAST(floor(sum(fre)::DOUBLE / count(*)::DOUBLE) AS BIGINT) AS mean_fre_x1000,
           |  min(fre)::BIGINT AS min_fre_x1000,
           |  max(fre)::BIGINT AS max_fre_x1000
           |FROM f GROUP BY source ORDER BY source""".stripMargin,

      // rank-frequency at power-of-two ranks over the top-1024 vocabulary,
      // plus the cumulative-coverage vocab-sizing curve
      "ta_zipf" ->
        s"""WITH tok AS (SELECT unnest($toks) AS w FROM documents),
           |v AS (SELECT w, count(*)::BIGINT AS cnt FROM tok WHERE w <> '' GROUP BY w),
           |top AS (SELECT w, cnt FROM v ORDER BY cnt DESC, w LIMIT 1024),
           |r AS (SELECT w, cnt,
           |    row_number() OVER (ORDER BY cnt DESC, w)::BIGINT AS rank,
           |    sum(cnt) OVER (ORDER BY cnt DESC, w
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_cnt
           |  FROM top),
           |st AS (SELECT (SELECT sum(cnt)::BIGINT FROM v) AS total_cnt,
           |    (SELECT cnt FROM r WHERE rank = 1) AS top_cnt)
           |SELECT rank, w AS term, cnt,
           |  CAST(floor((1000000.0::DOUBLE) * cnt / top_cnt) AS BIGINT) AS ratio_ppm,
           |  CAST(floor((1000000.0::DOUBLE) * cum_cnt / total_cnt) AS BIGINT) AS coverage_ppm
           |FROM r CROSS JOIN st
           |WHERE rank IN (1,2,4,8,16,32,64,128,256,512,1024)
           |ORDER BY rank""".stripMargin,

      // WordPiece-style substring vocabulary: substrings (len <= 4) of
      // distinct words scored by corpus word frequency, top-200 with the
      // (cnt DESC, term) tie-break
      "ta_wordpiece_vocab" ->
        s"""WITH t AS (SELECT $toks AS toks FROM documents),
           |tok AS (SELECT unnest(toks) AS w FROM t),
           |words AS (SELECT w, count(*)::BIGINT AS freq FROM tok WHERE w <> '' GROUP BY w),
           |subs AS (SELECT unnest(flatten(list_transform(range(1, len(w)+1),
           |    s -> list_transform(range(1, least(4, len(w)-s+1)+1),
           |      l -> substr(w, s, l))))) AS term, freq FROM words)
           |SELECT term, cnt FROM (SELECT term, sum(freq)::BIGINT AS cnt
           |  FROM subs GROUP BY term ORDER BY cnt DESC, term LIMIT 200)
           |ORDER BY term""".stripMargin,

      // greedy longest-match segmentation of each DISTINCT word against
      // that vocabulary (recursive CTE: advance by the longest matching
      // piece, else 1 unknown char), then bill the corpus through the
      // (source, word) count join — fertility per source
      "ta_wordpiece_fertility" -> wpFertilitySql,

      // the parquet round trip must not change a count: same oracle as the
      // direct fertility query
      "ta_wordpiece_artifact" -> wpFertilitySql,

      // per-doc bill: same vocab + greedy replay, billed through the
      // (doc_id, word) explode; wordless docs re-attached with 0s
      "ta_wordpiece_segment" ->
        s"""WITH RECURSIVE
           |t AS (SELECT doc_id, $toks AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
           |$wpSegCtes,
           |billed AS (SELECT doc_id, sum(pieces)::BIGINT AS n_pieces,
           |    sum(unknowns)::BIGINT AS n_unknowns
           |  FROM (SELECT doc_id, w FROM tok WHERE w <> '') dw
           |  JOIN pieces USING (w) GROUP BY doc_id)
           |SELECT d.doc_id AS doc_id,
           |  coalesce(n_pieces, 0)::BIGINT AS n_pieces,
           |  coalesce(n_unknowns, 0)::BIGINT AS n_unknowns
           |FROM documents d LEFT JOIN billed ON d.doc_id = billed.doc_id
           |ORDER BY doc_id""".stripMargin,

      // unigram optimal decode, billed per source — viterbiSegCtes replays
      // the DP as a recursive state exploration + encoded-score min;
      // shared verbatim with ta_unigram_artifact (the parquet vocab round
      // trip must not change a count)
      "ta_unigram_fertility" -> uniFertilitySql,

      "ta_unigram_artifact" -> uniFertilitySql,

      // per-doc unigram bill: same DP replay, billed through the
      // (doc_id, word) explode; wordless docs re-attached with 0s
      "ta_unigram_segment" ->
        s"""WITH RECURSIVE
           |t AS (SELECT doc_id, $toks AS toks FROM documents),
           |tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
           |$viterbiSegCtes,
           |billed AS (SELECT doc_id, sum(pieces)::BIGINT AS n_pieces,
           |    sum(unknowns)::BIGINT AS n_unknowns
           |  FROM (SELECT doc_id, w FROM tok WHERE w <> '') dw
           |  JOIN vpieces USING (w) GROUP BY doc_id)
           |SELECT d.doc_id AS doc_id,
           |  coalesce(n_pieces, 0)::BIGINT AS n_pieces,
           |  coalesce(n_unknowns, 0)::BIGINT AS n_unknowns
           |FROM documents d LEFT JOIN billed ON d.doc_id = billed.doc_id
           |ORDER BY doc_id""".stripMargin,

      // sliding-window passage replay: same planted boundaries and
      // splitter as ta_sentences, lead() windows, concat_ws null-skip
      "rag_passages" ->
        s"""WITH p AS (SELECT doc_id,
           |    regexp_replace(regexp_replace(text,
           |      ' (spark|data|join) ', '. \\1 ', 'g'),
           |      ' (table|row) ', '! \\1 ', 'g') AS text
           |  FROM documents),
           |segs AS (SELECT doc_id, list_filter(
           |    list_transform(string_split_regex(text, '[.!?]+'),
           |      s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
           |    s -> s <> '') AS sent FROM p),
           |st AS (SELECT doc_id, unnest(sent) AS sent,
           |    generate_subscripts(sent, 1) - 1 AS idx FROM segs),
           |ld AS (SELECT doc_id, idx, sent,
           |    lead(sent, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS s1,
           |    lead(sent, 2) OVER (PARTITION BY doc_id ORDER BY idx) AS s2
           |  FROM st),
           |a AS (SELECT doc_id, (idx // 2)::BIGINT AS passage_idx,
           |    concat_ws(' ', sent, s1, s2) AS passage,
           |    (1 + CASE WHEN s1 IS NULL THEN 0 ELSE 1 END
           |       + CASE WHEN s2 IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_sents
           |  FROM ld WHERE idx % 2 = 0)
           |SELECT doc_id, passage_idx, n_sents,
           |  len(string_split(passage, ' '))::BIGINT AS n_words,
           |  ${poly("passage")} AS passage_hash
           |FROM a ORDER BY doc_id, passage_idx""".stripMargin,

      "ta_repetition" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |b AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN []
           |    ELSE list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) END AS bgs
           |  FROM t),
           |base AS (SELECT doc_id, len(bgs)::BIGINT AS n_bigrams,
           |    len(list_distinct(bgs))::BIGINT AS n_distinct, bgs FROM b),
           |cnt AS (SELECT doc_id, bg, count(*)::BIGINT AS cnt
           |  FROM (SELECT doc_id, unnest(bgs) AS bg FROM base) GROUP BY doc_id, bg),
           |top AS (SELECT doc_id, max(cnt)::BIGINT AS top_cnt FROM cnt GROUP BY doc_id)
           |SELECT base.doc_id AS doc_id, n_bigrams, n_distinct,
           |  CAST(floor((10000.0::DOUBLE) * (n_bigrams - n_distinct) / greatest(n_bigrams, 1) + 0.5) AS BIGINT) AS dup_bigram_ratio_x10000,
           |  CAST(floor((10000.0::DOUBLE) * coalesce(top_cnt, 0) / greatest(n_bigrams, 1) + 0.5) AS BIGINT) AS top_bigram_ratio_x10000
           |FROM base LEFT JOIN top ON base.doc_id = top.doc_id
           |ORDER BY 1""".stripMargin,

      // same split + planting as `decontaminate`; per-(eval, train) shared
      // distinct-8-gram counts above the floor
      "decontam_pairs" ->
        s"""WITH sp AS (SELECT doc_id, text, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents),
           |tr AS (SELECT doc_id, text FROM sp WHERE b < 80),
           |ev AS (SELECT doc_id, text FROM sp WHERE b >= 90
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM tr WHERE doc_id % 7 = 0),
           |trt AS (SELECT doc_id, $toks AS toks FROM tr),
           |trs AS (SELECT doc_id AS train_doc, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM trt)),
           |evt AS (SELECT doc_id, $toks AS toks FROM ev),
           |evs AS (SELECT doc_id AS eval_doc, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM evt))
           |SELECT eval_doc, train_doc, count(*)::BIGINT AS n_common
           |FROM evs JOIN trs ON evs.h = trs.h
           |GROUP BY eval_doc, train_doc
           |HAVING count(*) >= 5
           |ORDER BY eval_doc, train_doc""".stripMargin,

      // same planting, same substring probe
      "decontam_canary" ->
        """WITH p AS (SELECT source,
          |    CASE WHEN doc_id % 50 = 0 THEN text || ' CANARY-GUID-aa11bb22'
          |         WHEN doc_id % 77 = 0 THEN text || ' CANARY-GUID-cc33dd44'
          |         ELSE text END AS text
          |  FROM documents),
          |e AS (SELECT source, text,
          |    unnest(['CANARY-GUID-aa11bb22', 'CANARY-GUID-cc33dd44']) AS canary
          |  FROM p)
          |SELECT source, canary, count(*)::BIGINT AS n_docs
          |FROM e WHERE contains(text, canary)
          |GROUP BY source, canary
          |ORDER BY source, canary""".stripMargin,

      // the attribution pairs rolled up to the source level (same split
      // and planting as decontam_pairs), plus per-source totals
      "decontam_by_source" ->
        s"""WITH sp AS (SELECT doc_id, text, source, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents),
           |tr AS (SELECT doc_id, text, source FROM sp WHERE b < 80),
           |ev AS (SELECT doc_id, text FROM sp WHERE b >= 90
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM tr WHERE doc_id % 7 = 0),
           |trt AS (SELECT doc_id, $toks AS toks FROM tr),
           |trs AS (SELECT doc_id AS train_doc, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM trt)),
           |evt AS (SELECT doc_id, $toks AS toks FROM ev),
           |evs AS (SELECT doc_id AS eval_doc, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM evt)),
           |pairs AS (SELECT eval_doc, train_doc, count(*)::BIGINT AS n_common
           |  FROM evs JOIN trs ON evs.h = trs.h
           |  GROUP BY eval_doc, train_doc
           |  HAVING count(*) >= 5),
           |bysrc AS (SELECT tr.source,
           |    count(DISTINCT p.train_doc)::BIGINT AS flagged_train_docs,
           |    count(DISTINCT p.eval_doc)::BIGINT AS eval_docs_touched,
           |    sum(p.n_common)::BIGINT AS shared_shingles
           |  FROM pairs p JOIN tr ON tr.doc_id = p.train_doc
           |  GROUP BY tr.source),
           |tot AS (SELECT source, count(*)::BIGINT AS n_train_docs FROM tr GROUP BY source)
           |SELECT tot.source AS source, n_train_docs,
           |  coalesce(flagged_train_docs, 0)::BIGINT AS flagged_train_docs,
           |  coalesce(eval_docs_touched, 0)::BIGINT AS eval_docs_touched,
           |  coalesce(shared_shingles, 0)::BIGINT AS shared_shingles,
           |  CAST(floor((1000000.0::DOUBLE) * coalesce(flagged_train_docs, 0) / n_train_docs + 0.5) AS BIGINT) AS flagged_ppm
           |FROM tot LEFT JOIN bysrc ON tot.source = bysrc.source
           |ORDER BY source""".stripMargin,

      // interval-overlap chunking in integer math: a doc covering tokens
      // [cum_before, cum_before+tok) touches seqs cum//B .. (cum+tok-1)//B
      "pack_split" ->
        s"""WITH t AS (SELECT source, doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM documents),
           |c AS (SELECT source, doc_id, tok_cnt,
           |    (sum(tok_cnt) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_cnt)::BIGINT AS cum_before
           |  FROM t),
           |e AS (SELECT source, tok_cnt, cum_before,
           |    unnest(range(cum_before // 512, (cum_before + tok_cnt - 1) // 512 + 1)) AS seq_no
           |  FROM c WHERE tok_cnt > 0),
           |x AS (SELECT source, seq_no,
           |    least((seq_no + 1) * 512, cum_before + tok_cnt) - greatest(seq_no * 512, cum_before) AS tokens_in_seq
           |  FROM e)
           |SELECT source, seq_no::BIGINT AS seq_no, count(*)::BIGINT AS n_docs,
           |  sum(tokens_in_seq)::BIGINT AS seq_tokens
           |FROM x GROUP BY source, seq_no ORDER BY source, seq_no""".stripMargin,

      // boundary offsets inside packed sequences: the pack_split CTE chain
      // minus the rollup — one row per (sequence, doc) with the doc's
      // in-sequence token interval (end exclusive)
      "pack_boundaries" ->
        s"""WITH t AS (SELECT source, doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM documents),
           |c AS (SELECT source, doc_id, tok_cnt,
           |    (sum(tok_cnt) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_cnt)::BIGINT AS cum_before
           |  FROM t),
           |e AS (SELECT source, doc_id, tok_cnt, cum_before,
           |    unnest(range(cum_before // 512, (cum_before + tok_cnt - 1) // 512 + 1)) AS seq_no
           |  FROM c WHERE tok_cnt > 0)
           |SELECT source, seq_no::BIGINT AS seq_no, doc_id,
           |  (greatest(seq_no * 512, cum_before) - seq_no * 512)::BIGINT AS start_tok,
           |  (least((seq_no + 1) * 512, cum_before + tok_cnt) - seq_no * 512)::BIGINT AS end_tok
           |FROM e ORDER BY source, seq_no, doc_id""".stripMargin,

      // sliding-window chunking: windows of 32 every 24 tokens; last chunk
      // short; 1 + ceil(max(0, len-32)/24) chunks per doc
      "pack_chunks" ->
        s"""WITH tok AS (SELECT doc_id, $toks AS toks, ($wordCnt)::BIGINT AS len
           |  FROM documents),
           |c AS (SELECT doc_id, toks, len,
           |    unnest(range(0, 1 + CAST(floor((greatest(len - 32, 0) + 24 - 1) / 24) AS BIGINT))) AS chunk_no
           |  FROM tok WHERE len > 0)
           |SELECT doc_id, chunk_no::BIGINT AS chunk_no,
           |  (least(chunk_no * 24 + 32, len) - chunk_no * 24)::BIGINT AS n_tokens,
           |  array_to_string(toks[(chunk_no * 24 + 1)::INT : (least(chunk_no * 24 + 32, len))::INT], ' ') AS chunk_text
           |FROM c ORDER BY doc_id, chunk_no""".stripMargin,

      // shared v2-snapshot CTE for the versioning oracles (mirrors
      // SparkEntry.snapshotV2)
      "ver_diff" ->
        s"""WITH newd AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text || ' drifted marker token'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id % 10 <> 0
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0),
           |oh AS (SELECT doc_id, ${poly2(norm)} AS old_hash FROM documents),
           |nh AS (SELECT doc_id, ${poly2(norm)} AS new_hash FROM newd)
           |SELECT doc_id, old_hash, new_hash,
           |  CASE WHEN old_hash IS NULL THEN 'added'
           |       WHEN new_hash IS NULL THEN 'removed'
           |       WHEN old_hash = new_hash THEN 'unchanged'
           |       ELSE 'changed' END AS status
           |FROM oh FULL JOIN nh USING (doc_id) ORDER BY doc_id""".stripMargin,

      // upsert: kept = base minus changed ids; result = kept + upsert rows
      "ver_apply" ->
        s"""WITH kept AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id % 10 NOT IN (0, 1)),
           |ups AS (SELECT doc_id, upper(text) AS text FROM documents
           |    WHERE doc_id % 10 = 1
           |  UNION ALL
           |  SELECT doc_id + 700000 AS doc_id, 'new: ' || text AS text
           |    FROM documents WHERE doc_id % 10 = 2),
           |app AS (SELECT * FROM kept UNION ALL SELECT * FROM ups)
           |SELECT doc_id, ${poly2("text")} AS text_hash FROM app
           |ORDER BY doc_id""".stripMargin,

      "ver_drift" ->
        s"""WITH newd AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text || ' drifted marker token'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id % 10 <> 0
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0),
           |oc AS (SELECT term, count(*)::BIGINT AS cnt FROM
           |  (SELECT unnest($toks) AS term FROM documents) WHERE term <> '' GROUP BY term),
           |nc AS (SELECT term, count(*)::BIGINT AS cnt FROM
           |  (SELECT unnest($toks) AS term FROM newd) WHERE term <> '' GROUP BY term),
           |m AS (SELECT term, coalesce(oc.cnt, 0)::BIGINT AS cnt_old,
           |    coalesce(nc.cnt, 0)::BIGINT AS cnt_new
           |  FROM oc FULL JOIN nc USING (term)),
           |t AS (SELECT sum(cnt_old)::BIGINT AS tot_old, sum(cnt_new)::BIGINT AS tot_new FROM m),
           |r AS (SELECT term, cnt_old, cnt_new,
           |    CAST(floor(1000000.0 * cnt_old / tot_old) AS BIGINT) AS rate_old_ppm,
           |    CAST(floor(1000000.0 * cnt_new / tot_new) AS BIGINT) AS rate_new_ppm
           |  FROM m CROSS JOIN t)
           |SELECT term, cnt_old, cnt_new, rate_old_ppm, rate_new_ppm,
           |  (rate_new_ppm - rate_old_ppm) AS drift_ppm
           |FROM r ORDER BY abs(rate_new_ppm - rate_old_ppm) DESC, term LIMIT 50""".stripMargin,

      // exact nearest-rank length deciles per source, v1 vs v2; the
      // nearest-rank pick (d*n + 9) // 10 is all-integer on both engines
      "ver_length_drift" ->
        """WITH v2 AS (
          |  SELECT doc_id, source,
          |    CASE WHEN doc_id % 7 = 0 THEN text || ' drifted marker token'
          |         ELSE text END AS text
          |  FROM documents WHERE doc_id % 10 <> 0
          |  UNION ALL
          |  SELECT doc_id + 1000000 AS doc_id, source, text FROM documents WHERE doc_id % 13 = 0),
          |o1 AS (SELECT source, doc_id, length(text)::BIGINT AS len FROM documents),
          |o2 AS (SELECT source, doc_id, length(text)::BIGINT AS len FROM v2),
          |r1 AS (SELECT source, len,
          |    row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
          |    count(*) OVER (PARTITION BY source) AS n
          |  FROM o1),
          |r2 AS (SELECT source, len,
          |    row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
          |    count(*) OVER (PARTITION BY source) AS n
          |  FROM o2),
          |ds AS (SELECT unnest(range(1, 10)) AS decile),
          |q1 AS (SELECT source, decile, len AS q_old FROM r1 JOIN ds
          |  ON rn = (decile * n + 9) // 10),
          |q2 AS (SELECT source, decile, len AS q_new FROM r2 JOIN ds
          |  ON rn = (decile * n + 9) // 10)
          |SELECT coalesce(q1.source, q2.source) AS source,
          |  coalesce(q1.decile, q2.decile)::BIGINT AS decile,
          |  coalesce(q_old, -1)::BIGINT AS q_old_chars,
          |  coalesce(q_new, -1)::BIGINT AS q_new_chars,
          |  (coalesce(q_new, -1) - coalesce(q_old, -1))::BIGINT AS shift_chars
          |FROM q1 FULL JOIN q2 ON q1.source = q2.source AND q1.decile = q2.decile
          |ORDER BY source, decile""".stripMargin,

      "a16_corpus_health" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""WITH base AS (SELECT source, count(*)::BIGINT AS n_docs,
           |    count(DISTINCT lang)::BIGINT AS n_langs,
           |    sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))::BIGINT AS bpe_tokens
           |  FROM documents GROUP BY source),
           |v AS (SELECT source, count(*)::BIGINT AS n_valid
           |  FROM documents WHERE $validWhere GROUP BY source),
           |dup AS (SELECT source, count(*)::BIGINT AS n_dup_docs FROM (
           |    SELECT source, doc_id, min(doc_id) OVER (PARTITION BY ${poly2(norm)}) AS canonical_id
           |    FROM documents)
           |  WHERE doc_id <> canonical_id GROUP BY source),
           |q AS (SELECT source,
           |    CAST(floor(sum(CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, w -> w IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT))::DOUBLE
           |      / count(*) + 0.5) AS BIGINT) AS mean_quality_x10000
           |  FROM documents GROUP BY source)
           |SELECT base.source AS source, n_docs,
           |  coalesce(n_valid, 0)::BIGINT AS n_valid,
           |  coalesce(n_dup_docs, 0)::BIGINT AS n_dup_docs,
           |  coalesce(mean_quality_x10000, 0)::BIGINT AS mean_quality_x10000,
           |  n_langs, bpe_tokens
           |FROM base
           |LEFT JOIN v ON base.source = v.source
           |LEFT JOIN dup ON base.source = dup.source
           |LEFT JOIN q ON base.source = q.source
           |ORDER BY source""".stripMargin
      },

      // nearest-rank percentile: value at sorted row (pct*n + 99) // 100 —
      // integer target arithmetic, bit-identical cross-engine
      "a15_percentiles" ->
        """WITH t AS (SELECT source, doc_id, length(text)::BIGINT AS v FROM documents),
          |r AS (SELECT source, v,
          |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id)::BIGINT AS rn
          |  FROM t),
          |tg AS (SELECT source, pct::BIGINT AS pct, (pct * cnt + 99) // 100 AS rn
          |  FROM (SELECT source, count(*)::BIGINT AS cnt FROM t GROUP BY source)
          |  CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct))
          |SELECT r.source AS source, pct, r.v AS value
          |FROM r JOIN tg ON r.source = tg.source AND r.rn = tg.rn
          |ORDER BY 1, 2""".stripMargin,

      // hash-split mirrors mix_split; planting mirrors the Spark side; the
      // membership set is the DISTINCT train 8-gram hash universe.
      // decontam_bloom shares the oracle verbatim: the Bloom prefilter is
      // result-invariant (no false negatives; exact join culls the rest).
      "decontam_bloom" ->
        s"""WITH sp AS (SELECT doc_id, text, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents),
           |tr AS (SELECT doc_id, text FROM sp WHERE b < 80),
           |ev AS (SELECT doc_id, text FROM sp WHERE b >= 90
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM tr WHERE doc_id % 7 = 0),
           |trt AS (SELECT doc_id, $toks AS toks FROM tr),
           |trs AS (SELECT DISTINCT ${poly("sh")} AS h FROM
           |  (SELECT unnest(${shinglesOfN(8)}) AS sh FROM trt)),
           |evt AS (SELECT doc_id, $toks AS toks FROM ev),
           |evs AS (SELECT doc_id, ${poly("sh")} AS h FROM
           |  (SELECT doc_id, unnest(${shinglesOfN(8)}) AS sh FROM evt)),
           |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM evs GROUP BY doc_id),
           |hits AS (SELECT evs.doc_id, count(*)::BIGINT AS n_hit
           |  FROM evs JOIN trs ON evs.h = trs.h GROUP BY evs.doc_id),
           |rep AS (SELECT e.doc_id,
           |    coalesce(sizes.n_sh, 0)::BIGINT AS n_sh,
           |    coalesce(hits.n_hit, 0)::BIGINT AS n_hit
           |  FROM (SELECT doc_id FROM ev) e
           |  LEFT JOIN sizes ON e.doc_id = sizes.doc_id
           |  LEFT JOIN hits ON e.doc_id = hits.doc_id)
           |SELECT doc_id, n_sh, n_hit, overlap_x10000,
           |  (CASE WHEN overlap_x10000 >= 5000 THEN 1 ELSE 0 END)::BIGINT AS contaminated
           |FROM (SELECT doc_id, n_sh, n_hit,
           |  CAST(floor((10000.0::DOUBLE) * n_hit / greatest(n_sh, 1) + 0.5) AS BIGINT) AS overlap_x10000
           |  FROM rep)
           |ORDER BY doc_id""".stripMargin,

      "decontaminate" -> decontamOracleSql,

      // the streaming probe accumulates exactly the batch report (each
      // eval doc lives in one micro-batch; the universe is fixed)
      "stream_decontam" -> decontamOracleSql,

      // surgical decontamination: the decontaminate split + planting, the
      // dedup_span_removal gaps-and-islands span SQL run train-joins-eval
      // (no doc ordering constraint), cuts applied to the TRAIN side only
      "decontam_span_removal" ->
        s"""WITH sp AS (SELECT doc_id, text, (${poly("'split:' || doc_id")}) % 100 AS b FROM documents),
           |tr AS (SELECT doc_id, text FROM sp WHERE b < 80),
           |ev AS (SELECT doc_id, text FROM sp WHERE b >= 90
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM tr WHERE doc_id % 7 = 0),
           |tt AS (SELECT doc_id, $toks AS toks FROM tr),
           |et AS (SELECT doc_id, $toks AS toks FROM ev),
           |tp AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM tt),
           |tps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM tp)),
           |ep AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS i FROM et),
           |eps AS (SELECT doc_id, i::BIGINT AS pos, ${poly("sh")} AS h FROM (
           |  SELECT doc_id, i,
           |    ${(1 to 8).map(j => s"toks[(i+$j)::INT]").mkString(" || ' ' || ")} AS sh
           |  FROM ep)),
           |m AS (SELECT t.doc_id AS t_id, e.doc_id AS e_id,
           |    t.pos AS pos_t, t.pos - e.pos AS diag
           |  FROM tps t JOIN eps e ON t.h = e.h),
           |r AS (SELECT t_id, e_id, diag, pos_t,
           |    pos_t - row_number() OVER (PARTITION BY t_id, e_id, diag ORDER BY pos_t) AS grp
           |  FROM m),
           |runs AS (SELECT t_id, e_id, diag, grp, count(*)::BIGINT AS run_len,
           |    min(pos_t) AS start_t
           |  FROM r GROUP BY t_id, e_id, diag, grp HAVING count(*) >= 5),
           |cut AS (SELECT DISTINCT t_id AS doc_id, unnest(range(start_t, start_t + run_len + 7)) AS p
           |  FROM runs),
           |tk AS (SELECT doc_id, unnest(range(0, len(toks))) AS p FROM tt),
           |kept AS (SELECT tk.doc_id AS doc_id, tk.p AS p
           |  FROM tk LEFT JOIN cut ON tk.doc_id = cut.doc_id AND tk.p = cut.p
           |  WHERE cut.p IS NULL),
           |rebuilt AS (SELECT kept.doc_id AS doc_id,
           |    string_agg(tt.toks[(kept.p + 1)::INT], ' ' ORDER BY kept.p) AS clean_text
           |  FROM kept JOIN tt ON tt.doc_id = kept.doc_id GROUP BY kept.doc_id),
           |nrem AS (SELECT doc_id, count(*)::BIGINT AS n_removed FROM cut GROUP BY doc_id)
           |SELECT tt.doc_id AS doc_id,
           |  coalesce(rebuilt.clean_text, '') AS clean_text,
           |  coalesce(nrem.n_removed, 0)::BIGINT AS n_removed
           |FROM tt
           |LEFT JOIN rebuilt ON rebuilt.doc_id = tt.doc_id
           |LEFT JOIN nrem ON nrem.doc_id = tt.doc_id
           |ORDER BY doc_id""".stripMargin,

      // the full corpus-assembly chain, stage for stage: validated docs →
      // ngram-pair graph → recursive-CTE canonical filter → hash split →
      // 8-gram decontamination → BPE-token greedy packing
      "e2e_corpus" -> e2eCorpusOracleSql,

      // identical pipeline; the Spark side reads the pair graph from the
      // persisted artifact — results must be bit-identical to e2e_corpus
      "e2e_corpus_from_artifact" -> e2eCorpusOracleSql,

      // the validated-corpus near-dup pair list (what the artifact holds):
      // dedup_ngram's shape restricted to valid docs
      "dedup_pairs_artifact" ->
        s"""WITH v AS (SELECT doc_id, text FROM documents WHERE $validWhere),
           |t AS (SELECT doc_id, $toks AS toks FROM v),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
           |SELECT * FROM (
           |  SELECT doc_a, doc_b,
           |    CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |  FROM common
           |  JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |WHERE jaccard_x10000 >= 5000 ORDER BY doc_a, doc_b""".stripMargin,

      // the pair graph after takedown: any pair touching a deleted doc
      // (doc_id % 7 = 5) is gone; survivor scores are pairwise facts and
      // do not move
      "dedup_pairs_del" ->
        s"""WITH v AS (SELECT doc_id, text FROM documents WHERE $validWhere),
           |t AS (SELECT doc_id, $toks AS toks FROM v),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM t),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
           |SELECT * FROM (
           |  SELECT doc_a, doc_b,
           |    CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |  FROM common
           |  JOIN sizes na ON na.doc_id = doc_a
           |  JOIN sizes nb ON nb.doc_id = doc_b)
           |WHERE jaccard_x10000 >= 5000 AND doc_a % 7 <> 5 AND doc_b % 7 <> 5
           |ORDER BY doc_a, doc_b""".stripMargin,

      // policy sibling of e2e_corpus: quality gate (40th-pct per-source
      // threshold over the VALID docs), recursive closure, split hash on
      // the cluster canonical, pack — near-dups kept, leakage impossible
      "e2e_corpus_safe" -> {
        val enWords = operators.TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(",")
        s"""WITH RECURSIVE v AS (SELECT doc_id, text, source FROM documents WHERE $validWhere),
           |qb AS (SELECT doc_id, source,
           |    CAST(floor((10000.0::DOUBLE) *
           |      least(1.0::DOUBLE, (($wordCnt)::DOUBLE) / (200.0::DOUBLE)) *
           |      ((0.5::DOUBLE) + (0.5::DOUBLE) * least(1.0::DOUBLE,
           |        (4.0::DOUBLE) * len(list_filter($toks, w -> w IN ($enWords))) / greatest(($wordCnt), 1))) + 0.5) AS BIGINT) AS q
           |  FROM v),
           |qr AS (SELECT source, doc_id, q,
           |    row_number() OVER (PARTITION BY source ORDER BY q, doc_id)::BIGINT AS rn
           |  FROM qb),
           |qtg AS (SELECT source, greatest((40 * cnt + 99) // 100, 1) AS rn
           |  FROM (SELECT source, count(*)::BIGINT AS cnt FROM qb GROUP BY source)),
           |qth AS (SELECT qr.source AS source, qr.q AS th
           |  FROM qr JOIN qtg ON qr.source = qtg.source AND qr.rn = qtg.rn),
           |g AS (SELECT v.doc_id AS doc_id, v.text AS text, v.source AS source FROM v
           |  JOIN qb ON v.doc_id = qb.doc_id
           |  JOIN qth ON v.source = qth.source
           |  WHERE qb.q >= qth.th),
           |tk AS (SELECT doc_id, $toks AS toks FROM g),
           |s AS (SELECT doc_id, $shinglesOf AS shs FROM tk),
           |sizes AS (SELECT doc_id, len(shs)::BIGINT AS n_sh FROM s),
           |sh AS (SELECT doc_id, ${poly("sh")} AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM s)),
           |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |pr AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b,
           |      CAST(floor((10000.0::DOUBLE) * n_common / (na.n_sh + nb.n_sh - n_common) + 0.5) AS BIGINT) AS jaccard_x10000
           |    FROM common JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b)
           |  WHERE jaccard_x10000 >= 5000),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr UNION SELECT doc_b, doc_a FROM pr),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, r) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
           |cl AS (SELECT id, min(r) AS canonical_id FROM reach GROUP BY id),
           |k AS (SELECT g.doc_id AS doc_id, g.text AS text, g.source AS source,
           |    (${poly("'split:' || coalesce(cl.canonical_id, g.doc_id)")}) % 100 AS b
           |  FROM g LEFT JOIN cl ON g.doc_id = cl.id),
           |ks AS (SELECT doc_id, text, source,
           |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           |  FROM k),
           |pt AS (SELECT split, source, doc_id,
           |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS tok_cnt
           |  FROM ks),
           |c AS (SELECT split, source, doc_id, tok_cnt,
           |    sum(tok_cnt) OVER (PARTITION BY split, source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM pt)
           |SELECT split, source, CAST(floor((cum - tok_cnt) / 512) AS BIGINT) AS seq_no,
           |  count(*)::BIGINT AS n_docs, sum(tok_cnt)::BIGINT AS seq_tokens
           |FROM c GROUP BY split, source, seq_no ORDER BY split, source, seq_no""".stripMargin
      },

      "e2e_pipeline" ->
        s"""SELECT source, count(*)::BIGINT AS doc_count,
           |  sum(length(text))::BIGINT AS total_content_length,
           |  sum(length($norm))::BIGINT / count(*)::BIGINT AS avg_clean_length,
           |  sum($wordCnt)::BIGINT AS total_words,
           |  count(DISTINCT lang)::BIGINT AS unique_langs
           |FROM documents WHERE $validWhere
           |GROUP BY source ORDER BY source""".stripMargin
    )
    // the probe-only persisted-index form must equal the direct form
    // byte-for-byte — the SAME oracle SQL verbatim (the
    // e2e_corpus_from_artifact discipline); and the build query's cell
    // assignment is the direct oracle's own coarse-quantizer CTE replay
    base +
      ("ann_ivfpq_index" -> base("ann_ivfpq")) +
      // shard fan-out with one shared frozen codebook reconstructs the
      // unsharded probe bit-exactly — same oracle SQL verbatim
      ("ann_ivfpq_sharded" -> base("ann_ivfpq")) +
      // streamed sharded maintenance drains to the one-shot incremental
      // update of ONE artifact (shared frozen codebook, mergeable sums,
      // per-shard ledgers) — ann_index_incr's oracle verbatim
      ("stream_ann_sharded" -> base("ann_index_incr")) +
      // the streamed incremental maintenance accumulates the SAME index
      // as the one-shot incremental update (frozen quantizers, argmin
      // codes, associative sums) — same oracle SQL verbatim
      ("stream_ann_incr" -> base("ann_index_incr")) +
      // mid-stream folds preserve the probe — same oracle verbatim
      ("stream_ann_autocompact" -> base("ann_index_incr")) +
      // streamed takedown drains to the one-shot delete's exact index
      // (deletion is idempotent by construction) — same oracle verbatim
      ("stream_bm25_takedown" -> base("sim_bm25_del")) +
      // the pooled trigger applies the UNION of the request batches —
      // idempotent + associative deletion makes it the same index
      ("stream_bm25_takedown_batched" -> base("sim_bm25_del")) +
      ("stream_ann_takedown" -> base("ann_index_del")) +
      ("stream_ann_takedown_batched" -> base("ann_index_del")) +
      // compaction folds the segment log without changing a single query
      // answer — the delete oracles verbatim
      ("sim_bm25_compact" -> base("sim_bm25_del")) +
      ("ann_index_compact" -> base("ann_index_del")) +
      // the pre-collapsed edge graph has the full pair graph's connected
      // components, so the funnel is bit-identical — same oracle verbatim
      ("e2e_image_pipeline_scaled" -> base("e2e_image_pipeline")) +
      // streamed signature-index takedown drains to the one-shot delete
      // (partition-scoped, idempotent) — same survivor oracle verbatim
      ("stream_neardup_takedown" -> base("dedup_minhash_del")) +
      ("ann_build_index" ->
        s"""WITH $unitVecCte,
           |cpd AS (SELECT vec_id, p,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, 64), d ->
           |      ((((1103515245*(p*64+d+1) + 12345) % 2097152)::DOUBLE) / (2097152.0::DOUBLE) - 0.5) * vn[d+1])),
           |    (s, x) -> s + x) AS dotp
           |  FROM en CROSS JOIN range(0, 4) r(p))
           |SELECT vec_id,
           |    sum(CASE WHEN dotp > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)::BIGINT AS cell
           |  FROM cpd GROUP BY vec_id ORDER BY vec_id""".stripMargin)
  }
}
