package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Eval-set decontamination — the gate every training-data pipeline runs
  * before publishing numbers: an eval document whose n-grams substantially
  * appear in the training corpus would leak test answers into training, so
  * it must be flagged (and usually dropped from the eval set, or its train
  * sources dropped).
  *
  * Metric: per-eval-doc overlap fraction = |distinct eval shingles that
  * occur ANYWHERE in train| / |distinct eval shingles| — membership against
  * the train shingle universe, not pairwise doc similarity (one eval doc
  * stitched from three train docs is 100% contaminated despite low pairwise
  * Jaccard to each). Decontamination shingles are LONGER than near-dup
  * shingles (default n=8 vs 3): an 8-gram shared with train is evidence of
  * copying, a 3-gram is just shared vocabulary.
  *
  * Scale shape (100 TB train, ~1e4-doc eval): the train side collapses to
  * its DISTINCT shingle-hash universe (one map-side-combinable aggregate
  * over the corpus — the same explode→hash→distinct scan the dedup suite
  * runs), and the eval shingle table is tiny and explicitly broadcast, so
  * the membership join is map-only against the train scan: no corpus-sized
  * shuffle, no pairwise comparison. Cost ≈ one pass over train.
  */
object Decontaminate {

  /** Per-eval-doc contamination report: (doc_id, n_sh, n_hit,
    * overlap_x10000, contaminated). Every eval doc appears exactly once;
    * docs with fewer than n tokens have n_sh = 0 and overlap 0.
    * `train`/`eval` need (doc_id, text). Overlap is fixed-point
    * (`floor(1e4·hit/size + 0.5)`) — bit-identical cross-engine.
    *
    * `broadcastEval` (default true) fits the usual shape — a hand-curated
    * eval set of ~1e4 docs whose shingle table rides to every executor and
    * makes the membership join map-only. Pass false when the eval side is a
    * corpus-scale SPLIT (e.g. a 20% holdout): an explicit broadcast hint
    * overrides the size threshold, so a large eval side must take the
    * shuffle equi-join instead of being collected to the driver. */
  def overlapReport(train: DataFrame, eval: DataFrame, n: Int,
                    minOverlapX10000: Long,
                    broadcastEval: Boolean = true): DataFrame =
    overlapReportAgainstUniverse(shingleUniverse(train, n), eval, n,
      minOverlapX10000, broadcastEval)

  /** The train side's distinct shingle-hash membership set — the long-lived
    * artifact a deployment persists once per train corpus and probes many
    * times (one column `h`). A hash collision can only INFLATE one eval
    * doc's hit count by 1 (the oracle computes the same hash, so parity
    * holds) — same posture as ngramJaccardPairs' hash join. */
  def shingleUniverse(train: DataFrame, n: Int): DataFrame =
    Dedup.shingleTable(train, n)
      .select(charPolyHash(col("sh")).as("h")).distinct()

  /** [[overlapReport]] against an already-materialized shingle universe —
    * for callers that persist the universe (the streaming tier probes it
    * every micro-batch without re-scanning train). */
  def overlapReportAgainstUniverse(trainSh: DataFrame, eval: DataFrame,
                                   n: Int, minOverlapX10000: Long,
                                   broadcastEval: Boolean = true): DataFrame = {
    val evalSh0 = Dedup.shingleTable(eval, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
    val evalSh = if (broadcastEval) broadcast(evalSh0) else evalSh0
    val hits = trainSh.join(evalSh, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    // per-doc shingle count MAP-ONLY from the token array (the
    // Dedup.shingleSizes rule): the explode side emits exactly one row per
    // distinct shingle, so size(shinglesFromToks) equals the old
    // explode → count aggregate — without re-exploding and re-hashing the
    // eval side a second time through an Exchange
    val sizes = eval
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        coalesce(size(shinglesFromToks(col("toks"), n)).cast("long"), lit(0L))
          .as("n_sh"))
    eval.select(col("doc_id"))
      .join(sizes, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("overlap_x10000",
        floor(lit(10000.0) * col("n_hit") / greatest(col("n_sh"), lit(1L)) + 0.5)
          .cast("long"))
      .withColumn("contaminated",
        when(col("overlap_x10000") >= minOverlapX10000, 1L).otherwise(0L))
  }

  /** [[overlapReport]] with a Bloom-filter prefilter on the train shingle
    * scan — the explicit runtime-filter (semi-join reduction) form, for the
    * canonical deployment shape: a CURATED eval set (its distinct shingle
    * universe is small and enumerable) against a 100 TB train corpus.
    *
    * A Bloom filter over the eval shingle hashes (~1.2 MiB per 10⁶ keys at
    * 1% fpp — an order of magnitude smaller than the broadcast hash table
    * of the shingles themselves) rides to every train-scan task and drops
    * non-eval shingles BEFORE the distinct/join shuffle: the train
    * exchange shrinks from |train shingle universe| rows to
    * |eval ∩ train| + fpp·|train| — at fpp 1%, a ~99% shuffle reduction on
    * the dominant side. Correctness is unaffected: Bloom filters have no
    * false negatives (every true hit survives), and surviving false
    * positives are train-only hashes that the exact membership join cannot
    * match — the report is bit-identical to [[overlapReport]]
    * (OperatorsSpec asserts equality).
    *
    * Building the filter runs one job over the eval side (plus a count when
    * `expectedItems` is not given) — the small side, by assumption; pass
    * `expectedItems` when the caller already knows the universe size. */
  def overlapReportBloom(train: DataFrame, eval: DataFrame, n: Int,
                         minOverlapX10000: Long, fpp: Double = 0.01,
                         expectedItems: Option[Long] = None): DataFrame = {
    val evalUniverse = Dedup.shingleTable(eval, n)
      .select(charPolyHash(col("sh")).as("h")).distinct()
    // without expectedItems the universe feeds two actions (count + filter
    // build) — persist it across them instead of recomputing the shingle
    // scan; it is small by the curated-eval assumption
    val bloom = expectedItems match {
      case Some(items) =>
        evalUniverse.stat.bloomFilter("h", math.max(items, 1L), fpp)
      case None =>
        val cached = evalUniverse.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nKeys = math.max(cached.count(), 1L)
          cached.stat.bloomFilter("h", nKeys, fpp)
        } finally cached.unpersist(blocking = false)
    }
    val universe = Dedup.shingleTable(train, n)
      .select(charPolyHash(col("sh")).as("h"))
      .where(graft.plans.BloomExpr.mightContain(col("h"), bloom))
      .distinct()
    overlapReportAgainstUniverse(universe, eval, n, minOverlapX10000,
      broadcastEval = false)
  }

  /** The docs that survive decontamination: eval rows whose overlap stays
    * below the threshold — `withSplit → overlapReport → keep clean` is the
    * split-then-decontaminate shape of corpus assembly. */
  def cleanEval(train: DataFrame, eval: DataFrame, n: Int,
                minOverlapX10000: Long,
                broadcastEval: Boolean = true): DataFrame =
    eval.join(
      overlapReport(train, eval, n, minOverlapX10000, broadcastEval)
        .where(col("contaminated") === 0L).select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Attribution pairs — the forensics behind a contamination flag: WHICH
    * train docs share at least `minCommon` distinct n-gram shingles with
    * which eval docs. [[overlapReport]] answers "is this eval doc leaked";
    * this answers "from where", which is what you need to DROP the
    * offending train docs instead of shrinking the eval set (the usual
    * remedy when train data is abundant).
    *
    * Same scale shape as the report: the eval shingle table is broadcast,
    * the join is map-only over one train shingle scan; output is bounded by
    * true leaks (shared-shingle pairs), not |train|×|eval|. */
  def attributionPairs(train: DataFrame, eval: DataFrame, n: Int,
                       minCommon: Long,
                       broadcastEval: Boolean = true): DataFrame = {
    val trainSh = Dedup.shingleTable(train, n)
      .select(col("doc_id").as("train_doc"), charPolyHash(col("sh")).as("h"))
    val evalSh0 = Dedup.shingleTable(eval, n)
      .select(col("doc_id").as("eval_doc"), charPolyHash(col("sh")).as("h"))
    val evalSh = if (broadcastEval) broadcast(evalSh0) else evalSh0
    trainSh.join(evalSh, Seq("h"))
      .groupBy(col("eval_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
  }

  /** Canary-string audit — the cheapest decontamination check there is:
    * benchmark suites embed sentinel strings (canary GUIDs) precisely so
    * a training corpus can be grepped for them; a hit means the benchmark
    * itself (not a paraphrase) was swallowed. Substring match, not
    * tokenized overlap — canaries are designed to survive formatting.
    *
    * Output: one (source, canary, n_docs) row per source × canary with at
    * least one hit. Map-only: each row explodes the (tiny, literal)
    * canary list and keeps contains() hits — no join, no shuffle beyond
    * the final per-source count; at 100 TB this is one pass over the
    * corpus with a k-way literal probe per row. */
  def canaryScan(docs: DataFrame, canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "need at least one canary string")
    docs.select(col("source"), col("text"),
        explode(array(canaries.map(lit): _*)).as("canary"))
      .where(col("text").contains(col("canary")))
      .groupBy(col("source"), col("canary"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Contamination-by-source rollup — the report that decides the REMEDY:
    * [[overlapReport]] says which eval docs are leaked, [[attributionPairs]]
    * says from which train docs; this aggregates the pairs to the level a
    * curation decision is actually made at — the SOURCE. A source whose
    * flagged_ppm is high is mirroring the benchmark (drop or de-weight the
    * source); isolated flagged docs across many sources are individual
    * copies (drop the docs). `train` needs (doc_id, text, source).
    *
    * Output per source: n_train_docs (size), flagged_train_docs (distinct
    * train docs sharing ≥ `minCommon` shingles with any eval doc),
    * eval_docs_touched, shared_shingles (total pair overlap mass), and
    * flagged_ppm = flagged/size.
    *
    * Scale shape: [[attributionPairs]]' broadcast membership join + two
    * tiny aggregates; the source attach joins the slim (doc_id, source)
    * projection against pair-bounded rows, never the corpus against
    * itself. */
  def contaminationBySource(train: DataFrame, eval: DataFrame, n: Int,
                            minCommon: Long,
                            broadcastEval: Boolean = true): DataFrame = {
    val pairs = attributionPairs(train.select(col("doc_id"), col("text")),
      eval, n, minCommon, broadcastEval)
    val bySource = pairs
      .join(train.select(col("doc_id").as("train_doc"), col("source")),
        Seq("train_doc"))
      .groupBy(col("source"))
      .agg(countDistinct(col("train_doc")).as("flagged_train_docs"),
        countDistinct(col("eval_doc")).as("eval_docs_touched"),
        sum(col("n_common")).as("shared_shingles"))
    train.groupBy(col("source")).agg(count(lit(1)).as("n_train_docs"))
      .join(bySource, Seq("source"), "left")
      .select(col("source"), col("n_train_docs"),
        coalesce(col("flagged_train_docs"), lit(0L)).as("flagged_train_docs"),
        coalesce(col("eval_docs_touched"), lit(0L)).as("eval_docs_touched"),
        coalesce(col("shared_shingles"), lit(0L)).as("shared_shingles"))
      .withColumn("flagged_ppm",
        floor(lit(1000000.0) * col("flagged_train_docs") / col("n_train_docs")
          + 0.5).cast("long"))
  }

  /** SEMANTIC decontamination — the leak n-gram overlap cannot see: a
    * paraphrased eval answer shares no 8-gram with its train source but
    * sits right next to it in embedding space. Flags every (eval, train)
    * vector pair with cosine ≥ the threshold, via the banded random-
    * hyperplane LSH machinery ([[Dedup.embeddingNearDupPairsBanded]]'s
    * one-expression bucketer) run ASYMMETRICALLY: both sides bucket with
    * the SAME plane matrix, candidates come from an (table, bucket)
    * equi-join across sides — never an eval × train product — and the
    * exact cosine verifies inline.
    *
    * Output: `(eval_id, train_id, cos_x1000000)`, one row per flagged
    * pair. Empty result = clean eval set. */
  def semanticOverlap(train: DataFrame, evalVecs: DataFrame,
                      minCosX1000000: Long,
                      planes: Int = 16, tables: Int = 8,
                      dim: Int = 64): DataFrame = {
    def sideBuckets(emb: DataFrame) = Dedup.withUnitVector(emb)
      .select(col("vec_id"), col("vn"),
        posexplode(graft.plans.ArrayExpressions.planeBuckets(
          col("vn"), planes, tables, dim)).as(Seq("t", "bucket")))
    val tr = sideBuckets(train).select(col("vec_id").as("train_id"),
      col("vn").as("tvn"), col("t"), col("bucket"))
    val ev = sideBuckets(evalVecs).select(col("vec_id").as("eval_id"),
      col("vn").as("evn"), col("t"), col("bucket"))
    ev.join(tr, Seq("t", "bucket"))
      .withColumn("cos_x1000000",
        floor(Dedup.dotCol(col("evn"), col("tvn")) * 1000000.0 + 0.5)
          .cast("long"))
      .where(col("cos_x1000000") >= minCosX1000000)
      .select(col("eval_id"), col("train_id"), col("cos_x1000000"))
      .distinct() // a pair may collide in several tables — emit it once
  }

  /** SURGICAL decontamination — [[Dedup.removeSharedSpans]]' span-cut
    * action applied cross-corpus: instead of DROPPING every train doc that
    * overlaps the eval set (the [[overlapReport]]-then-drop policy, which
    * throws away a whole document over one leaked paragraph), cut exactly
    * the verbatim eval-overlapping token spans out of the train text and
    * keep the rest. The eval side is never modified.
    *
    * A span is a maximal run of ≥ `minRun` consecutive train n-gram
    * positions that appear consecutively in SOME eval doc (the
    * [[Dedup.spanRuns]] gaps-and-islands diagonal argument, with the
    * inverted-index self-join replaced by a train⋈eval equi-join on the
    * shingle hash). A run of r shared n-grams cuts r+n−1 tokens;
    * overlapping runs union their positions, so nothing double-cuts.
    *
    * Output: (doc_id, clean_text, n_removed) for EVERY train doc —
    * untouched docs pass through with n_removed 0 and their whitespace-
    * normalized text (the same canonical form downstream ops tokenize).
    *
    * Scale shape (100 TB train, curated eval): the eval positional shingle
    * table is eval-sized — broadcast by default, so the match join is
    * map-only over the train scan; `docFreqCap` prunes boilerplate
    * shingles on the train side before the join (the skew point). The
    * island window partitions by (train doc, eval doc, diagonal) — bounded
    * by one pair's matches, never corpus-sized. Train text moves once;
    * reconstruction is one map-only indexed-lambda filter. Pass
    * `broadcastEval = false` when the eval side is a corpus-scale split. */
  def removeContaminatedSpans(train: DataFrame, evalDocs: DataFrame,
                              n: Int, minRun: Int,
                              docFreqCap: Option[Int] = None,
                              broadcastEval: Boolean = true): DataFrame = {
    require(n >= 1 && minRun >= 1, "n and minRun must be positive")
    val shT0 = Dedup.posShingleTable(train, n)
      .select(col("doc_id").as("t_id"), col("pos").as("pos_t"),
        charPolyHash(col("sh")).as("h"))
    val shT = docFreqCap match {
      case Some(cap) =>
        val hot = shT0.groupBy(col("h")).count()
          .where(col("count") > cap).select(col("h"))
        shT0.join(hot, Seq("h"), "left_anti")
      case None => shT0
    }
    val shE = Dedup.posShingleTable(evalDocs, n)
      .select(col("doc_id").as("e_id"), col("pos").as("pos_e"),
        charPolyHash(col("sh")).as("h"))
    val m = shT.join(if (broadcastEval) broadcast(shE) else shE, Seq("h"))
      .select(col("t_id"), col("e_id"), col("pos_t"),
        (col("pos_t") - col("pos_e")).as("diag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t_id"), col("e_id"), col("diag")).orderBy(col("pos_t"))
    val cuts = m.withColumn("grp", col("pos_t") - row_number().over(w))
      .groupBy(col("t_id"), col("e_id"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run_len"), min(col("pos_t")).as("start_t"))
      .where(col("run_len") >= minRun)
      .select(col("t_id").as("doc_id"),
        explode(sequence(col("start_t"),
          col("start_t") + col("run_len") + lit(n.toLong - 2L))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cut_ps"))
    train.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("cut_ps",
        coalesce(col("cut_ps"), array().cast("array<long>")))
      .select(col("doc_id"),
        array_join(filter(col("__toks"),
          (_, i) => !array_contains(col("cut_ps"), i.cast("long"))), " ")
          .as("clean_text"),
        size(col("cut_ps")).cast("long").as("n_removed"))
  }
}
