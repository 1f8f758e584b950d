package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Corpus mixing, splitting, and sequence packing — the assembly steps of a
  * training-data pipeline once cleaning/dedup are done: carve reproducible
  * train/val/test splits, reweight sources to a target mixture, and pack
  * documents into fixed token budgets for training sequences.
  *
  * Everything is RNG-free: assignment comes from the portable
  * char-polynomial hash of the doc id, so it is stable across runs, engines
  * (the DuckDB oracles run the same arithmetic), partitionings, and
  * cluster sizes — the property that makes a split reproducible at 100 TB
  * (seeded `rand()` is none of those things across re-partitions).
  */
object Mixing {

  /** Stable bucket in [0, 100) for a doc id: portable hash of
    * `"split:" + id` — the salt decorrelates this hash from any other use
    * of the id hash. Map-only, codegen'd. */
  def hashBucket(id: Column): Column =
    charPolyHash(concat(lit("split:"), id.cast("string"))) % 100

  /** Train/val/test assignment by hash bucket: `< trainPct` → train,
    * `< valPct` → val, else test. */
  def withSplit(docs: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 80, valPct: Int = 90): DataFrame = {
    require(0 < trainPct && trainPct <= valPct && valPct <= 100,
      s"need 0 < trainPct ($trainPct) <= valPct ($valPct) <= 100")
    val b = hashBucket(col(idCol))
    docs.withColumn("split",
      when(b < trainPct, "train").when(b < valPct, "val").otherwise("test"))
  }

  /** Deterministic per-source downsampling to a target mixture: keep a doc
    * iff its hash bucket < the source's percentage quota. The reweighting
    * primitive of corpus mixing (e.g. downweight a crawl, keep all of a
    * curated source) — a doc's fate never depends on which executor saw it. */
  def sampleBySource(docs: DataFrame, quotaPct: Map[String, Int],
                     defaultPct: Int = 100, idCol: String = "doc_id"): DataFrame = {
    require((quotaPct.values ++ Seq(defaultPct)).forall(q => q >= 0 && q <= 100),
      "quotas are percentages in [0, 100]")
    val quota = quotaPct.foldLeft(lit(defaultPct)) { case (acc, (src, q)) =>
      when(col("source") === src, lit(q)).otherwise(acc)
    }
    docs.where(hashBucket(col(idCol)) < quota)
  }

  /** Token-count column for a packing budget metric: `ws` = whitespace
    * tokens; `bpe` = the BPE-ish regex count (letter runs / digit runs /
    * single symbols — `TextAnalysis.tokenCounts`' `bpe_tokens`), which
    * tracks what a subword tokenizer would bill far more closely than
    * whitespace ("state-of-the-art." is 1 ws token but 6 BPE-ish). */
  def tokenMetric(metric: String): Column = metric match {
    case "ws" => wordCount(col("text")).cast("long")
    case "bpe" =>
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
    case other =>
      throw new IllegalArgumentException(
        s"unknown token metric '$other' (expected 'ws' or 'bpe')")
  }

  /** Exact-k uniform sample: the k docs with the smallest salted id hash —
    * reproducible, partition-stable, and plan-friendly (hash is map-only
    * and the top-k runs as TakeOrderedAndProject: per-partition heaps, a
    * k-row driver merge, no global sort). The deterministic replacement
    * for `df.sample()` when an EXACT count is required (sample() is both
    * approximate and partitioning-dependent). */
  def sampleExactK(docs: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "k must be positive")
    docs
      .withColumn("sample_hk",
        charPolyHash(concat(lit("pick:"), col(idCol).cast("string"))))
      .orderBy(col("sample_hk"), col(idCol))
      .limit(k)
      .drop("sample_hk")
  }

  /** Temperature-sampled mixture weights at α = ½ — the multilingual
    * upsampling formula (sample source s with probability ∝ n_s^α): α = 1
    * is proportional (big sources drown small ones), α = 0 is uniform
    * (tiny sources over-trained); √n is the standard compromise. α = ½ is
    * also the one non-trivial temperature computable EXACTLY cross-engine:
    * IEEE sqrt is correctly rounded everywhere, each source's `⌊√tokens⌋`
    * is an integer BEFORE the normalizing sum, so no float accumulation
    * order exists. Output per source: token count, √-weight, the ppm
    * sampling weight, and the implied up/down-sampling factor ×10000 vs
    * proportional. */
  /** Per-source (tokens, ⌊√tokens⌋) counts + one-row totals — shared by
    * [[temperatureWeights]] and [[epochPlan]]. */
  private def sqrtCounts(docs: DataFrame, metric: String): DataFrame = {
    val counts = docs
      .select(col("source"), tokenMetric(metric).as("tok_cnt"))
      .groupBy(col("source")).agg(sum(col("tok_cnt")).as("tokens"))
      .withColumn("isqrt", floor(sqrt(col("tokens").cast("double"))).cast("long"))
    val totals = counts.agg(sum(col("tokens")).as("tot_tokens"),
      sum(col("isqrt")).as("tot_isqrt"))
    counts.crossJoin(broadcast(totals))
  }

  def temperatureWeights(docs: DataFrame,
                         metric: String = "bpe"): DataFrame =
    sqrtCounts(docs, metric)
      .select(col("source"), col("tokens"), col("isqrt"),
        floor(lit(1000000.0) * col("isqrt") / col("tot_isqrt")).cast("long")
          .as("weight_ppm"),
        // factor = (isqrt/tot_isqrt) / (tokens/tot_tokens), ×10000
        floor(lit(10000.0) * col("isqrt") * col("tot_tokens") /
          (col("tot_isqrt") * col("tokens"))).cast("long")
          .as("vs_proportional_x10000"))

  /** Training-epoch plan — [[temperatureWeights]] turned into the artifact
    * a trainer consumes: given a total token budget, each source's
    * allocated tokens (`⌊budget · isqrt / Σisqrt⌋`, integer) and the
    * implied epoch count ×10000 (allocation / available — over 1.0 means
    * the source repeats; the standard upsampling consequence worth seeing
    * BEFORE the run, since high epoch counts mean memorization risk). */
  def epochPlan(docs: DataFrame, budgetTokens: Long,
                metric: String = "bpe"): DataFrame = {
    require(budgetTokens >= 1, "budget must be positive")
    sqrtCounts(docs, metric)
      .withColumn("weight_ppm",
        floor(lit(1000000.0) * col("isqrt") / col("tot_isqrt")).cast("long"))
      .withColumn("allocated_tokens",
        expr(s"(${budgetTokens}L * isqrt) DIV tot_isqrt"))
      .select(col("source"), col("tokens").as("available_tokens"),
        col("weight_ppm"), col("allocated_tokens"),
        floor(lit(10000.0) * col("allocated_tokens") /
          greatest(col("tokens"), lit(1L))).cast("long").as("epochs_x10000"))
  }

  /** Largest-remainder (Hamilton) quota allocation — the integer-exact
    * way to turn fractional mixture shares into whole-token quotas that
    * sum EXACTLY to the budget. `⌊B·tᵢ/T⌋` under-allocates by
    * `B − Σ⌊⌋ < m` units; those go one each to the sources with the
    * largest remainders `(B·tᵢ) mod T` (ties broken by source name), the
    * apportionment rule that never strands or smears budget the way a
    * per-source rounding would. Complements [[epochPlan]] (temperature
    * shares, remainder left visible) and [[unimaxPlan]] (uniform
    * waterfilling): same one-pass per-source aggregate, windows only over
    * the bounded source list. `B·tᵢ` must fit int64 (B ≤ ~9e18/Σt) —
    * enforced at runtime by an in-plan assert on the computed total, since
    * Σt is data the driver can't see at require() time. */
  def quotaAllocation(docs: DataFrame, budgetTokens: Long,
                      metric: String = "bpe"): DataFrame = {
    require(budgetTokens >= 1, "budget must be positive")
    val counts = docs.select(col("source"), tokenMetric(metric).as("tok_cnt"))
      .groupBy(col("source")).agg(sum(col("tok_cnt")).as("tokens"))
    val tot = counts.agg(sum(col("tokens")).as("tot"))
    val ord = Window.orderBy(col("rem").desc, col("source"))
    counts.crossJoin(broadcast(tot))
      // runtime overflow guard (the scaladoc bound, enforced): B·tᵢ ≤ B·T
      // must fit int64, so assert B ≤ int64max/T inside the plan — tot is
      // data, not a literal, so this can't be a driver-side require.
      // assert_true returns NULL on pass (and throws on fail), which the
      // coalesce discards; the optimizer can't prune it because fq reads it
      .withColumn("tot", coalesce(
        when(assert_true(lit(budgetTokens) <= expr(s"${Long.MaxValue}L DIV tot"),
          lit(s"quotaAllocation: budget $budgetTokens × total tokens " +
            "overflows int64 — shrink the budget or pre-scale the counts"))
          .isNull, col("tot")), col("tot")))
      .withColumn("fq", expr(s"(${budgetTokens}L * tokens) DIV tot"))
      .withColumn("rem", expr(s"(${budgetTokens}L * tokens) % tot"))
      .withColumn("share_x10000",
        floor(lit(10000.0) * col("tokens") / col("tot")).cast("long"))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("sfq", sum(col("fq")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("source"), col("tokens"), col("share_x10000"),
        (col("fq") + when(col("rk") <= lit(budgetTokens) - col("sfq"), 1L)
          .otherwise(0L)).as("quota_tokens"))
  }

  /** UniMax budget allocation (after Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling"): spread the token budget
    * UNIFORMLY across sources, capped at `maxEpochs` passes of each
    * source — the published alternative to temperature sampling that
    * upweights small sources WITHOUT unbounded repetition (the
    * memorization-risk knob is explicit, not emergent). Waterfilling in
    * closed form over the capacity-sorted source list: a source too small
    * to absorb the uniform share fills to its cap (maxEpochs × tokens) and
    * the rest of the budget re-spreads over the remaining sources; the
    * first source that CAN absorb its share fixes the fill level for
    * everyone after it. All integer floor-division (remainders stay
    * unallocated and visible in the epoch column, never smeared), so the
    * DuckDB oracle is bit-exact.
    *
    * Plan shape: one map-combinable per-source token aggregate, then
    * windows over the SOURCE LIST — rows = number of sources, a planning
    * artifact, so the unpartitioned window is over a broadcast-sized
    * table, not the corpus. */
  def unimaxPlan(docs: DataFrame, budgetTokens: Long, maxEpochs: Int = 4,
                 metric: String = "bpe"): DataFrame = {
    require(budgetTokens >= 1, "budget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be positive")
    val counts = docs.select(col("source"), tokenMetric(metric).as("tok_cnt"))
      .groupBy(col("source")).agg(sum(col("tok_cnt")).as("tokens"))
      .withColumn("capacity", col("tokens") * maxEpochs)
    val m = counts.agg(count(lit(1)).as("m"))
    val ord = Window.orderBy(col("capacity"), col("source"))
    val tbl = counts.crossJoin(broadcast(m))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("prev_cap",
        coalesce(sum(col("capacity")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // share if every smaller source is capped; rem ≥ 0 holds for every
      // row up to and including the threshold (induction over the fill),
      // the greatest() only sanitizes the never-selected rows past it
      .withColumn("share",
        expr(s"greatest(${budgetTokens}L - prev_cap, 0L) DIV (m - i + 1)"))
    // the threshold row: first source whose capacity exceeds its share —
    // its share is the fill level for itself and everything larger
    val level = tbl.where(col("capacity") > col("share"))
      .agg(min(struct(col("i"), col("share"))).as("ts"))
    tbl.crossJoin(broadcast(level))
      .withColumn("allocated_tokens",
        when(col("ts").isNull || col("i") < col("ts.i"), col("capacity"))
          .otherwise(col("ts.share")))
      .select(col("source"), col("tokens").as("available_tokens"),
        col("capacity"), col("allocated_tokens"),
        floor(lit(10000.0) * col("allocated_tokens") /
          greatest(col("tokens"), lit(1L))).cast("long").as("epochs_x10000"))
  }

  /** Per-source doc cap — "no source contributes more than k documents",
    * the per-domain cap web-corpus pipelines apply so one mirror-heavy
    * domain can't dominate the mix. Which k survive is decided by salted
    * hash order (a uniform, reproducible sample — the [[sampleBySource]]
    * property), NOT arrival order.
    *
    * Plan shape: the k survivors per source come from the ONE-PASS bounded
    * heap ([[graft.plans.TopKAgg]]) — value = negated hash so "top-k" =
    * k smallest hashes — so partial aggregation compacts every map task to
    * ≤ k (source, id) entries before the exchange; the winners list
    * (sources × k ids, slim) then semi-joins the corpus back. No per-source
    * sort of the full corpus, no window: at 100 TB the window form
    * shuffles+sorts every row of every source, this shuffles k ids per
    * source plus one hash-partitioned semi-join. */
  def capPerSource(docs: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "k must be positive")
    val withH = docs.withColumn("cap_hk",
      charPolyHash(concat(lit("cap:"), col(idCol).cast("string"))))
    val kept = withH
      .groupBy(col("source"))
      .agg(graft.plans.TopKAgg.topK(-col("cap_hk"), col(idCol), k).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("source"), col("e.id").as(idCol))
    withH.join(kept, Seq("source", idCol), "left_semi").drop("cap_hk")
  }

  /** Length-bucketed batch assembly — group docs of similar token length
    * into fixed-size batches so per-batch padding (every sequence pads to
    * the batch max) stays small: the batching step before inference or
    * packed-attention training. Buckets are power-of-two length bands
    * (`band = len(bin(tok_cnt))` = floor(log2)+1 — no global quantile pass,
    * deterministic at any scale); within a band docs batch in salted-hash
    * order (reproducible, not arrival-ordered). Reports per batch the
    * padding waste `n·max − Σ` the band structure is there to minimize.
    *
    * Plan shape: map-only banding, one per-band window (the packing
    * posture: per-band sort is the scale cost), one hash agg. */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int = 8,
                            metric: String = "bpe",
                            idCol: String = "doc_id"): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val withB = docs.select(col(idCol), tokenMetric(metric).as("tok_cnt"))
      .where(col("tok_cnt") > 0)
      .withColumn("band", length(bin(col("tok_cnt"))).cast("long"))
      .withColumn("bk_hk",
        charPolyHash(concat(lit("batch:"), col(idCol).cast("string"))))
    val w = Window.partitionBy(col("band")).orderBy(col("bk_hk"), col(idCol))
    withB
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_no", expr(s"(rn - 1) DIV $batchSize"))
      .groupBy(col("band"), col("batch_no"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("tok_cnt")).as("max_tokens"),
        sum(col("tok_cnt")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Contrastive triplet mining — turn near-dup PAIRS into (anchor,
    * positive, negative) training triplets for embedding models: the
    * positive is the anchor's near-copy, the negative a pseudo-random
    * other doc. The negative pick is RNG-free: every doc hashes onto one
    * of `numBuckets` ring buckets, every pair hashes to a probe bucket,
    * and the negative is the bucket's (hash, id)-minimal doc that isn't
    * the anchor or positive — reproducible across runs, engines, and
    * partitionings, unlike `rand()`-ordered sampling.
    *
    * Plan shape: every pair excludes at most TWO specific docs (its own
    * anchor and positive), so the bucket's minimal ELIGIBLE doc is always
    * among the bucket's 3 smallest (hash, id) — each bucket reduces to ≤3
    * rows (one per-bucket top-3 window over the docs scan) before the
    * pair join ever happens. Join fan-out is ≤3 per pair at ANY corpus
    * size — the naive bucket join's pairs × docs/numBuckets blow-up
    * (measured 25× on a 10× scale-up) never materializes, and the ≤
    * 3·numBuckets candidate table broadcasts. A pair whose probe bucket
    * holds no eligible doc drops out (needs every bucket doc to be the
    * pair itself — vanishingly rare; the spec pins the behavior). */
  def contrastiveTriplets(docs: DataFrame, pairs: DataFrame,
                          numBuckets: Int = 64,
                          aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be positive")
    val cand = docs.select(col("doc_id").as("cand_id"),
        charPolyHash(concat(lit("neg:"), col("doc_id").cast("string"))).as("cand_h"))
      .withColumn("bucket", col("cand_h") % numBuckets)
    // ≤2 exclusions per probe ⇒ the eligible minimum is in the bucket's
    // top-3; the window partitions are docs/numBuckets rows — scale
    // numBuckets with the corpus to keep them (and negative variety) sane
    val wb = Window.partitionBy(col("bucket"))
      .orderBy(col("cand_h"), col("cand_id"))
    val top3 = cand.withColumn("rn", row_number().over(wb))
      .where(col("rn") <= 3).drop("rn")
    val probes = pairs.select(col(aCol).as("anchor_id"), col(bCol).as("positive_id"))
      .withColumn("bucket",
        charPolyHash(concat(lit("probe:"), col("anchor_id").cast("string"),
          lit(":"), col("positive_id").cast("string"))) % numBuckets)
    probes.join(broadcast(top3), Seq("bucket"))
      .where(col("cand_id") =!= col("anchor_id") &&
        col("cand_id") =!= col("positive_id"))
      .groupBy(col("anchor_id"), col("positive_id"))
      .agg(min(struct(col("cand_h"), col("cand_id"))).as("m"))
      .select(col("anchor_id"), col("positive_id"),
        col("m").getField("cand_id").as("negative_id"))
  }

  /** Round-robin source interleaving — the training ORDER primitive: a
    * corpus written source-by-source trains source-by-source (catastrophic
    * for mixing); sorting by `(rr_rank, source, id)` instead deals one doc
    * per source per round, each source's docs in salted-hash order
    * (reproducible shuffle within the source). The operator emits the
    * per-source rank; consumers sort or range-partition by the triple —
    * no global row numbering, no single-partition window.
    */
  def interleaveSources(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val hk = charPolyHash(concat(lit("order:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("source")).orderBy(hk, col(idCol))
    docs.withColumn("rr_rank", row_number().over(w).cast("long"))
  }

  /** Curriculum training order — [[interleaveSources]] upgraded with a
    * quality phase: deal the highest-quality quartile first (the standard
    * easy/clean-first curriculum), sources still interleaved WITHIN each
    * phase so no phase trains source-by-source. Phase = within-source
    * quality quartile via ntile (1 = best; within-source, so one source's
    * score scale can't monopolize early phases), rank = salted-hash row
    * number within (source, phase) — reproducible shuffle, no RNG.
    * Consumers sort or range-partition by (phase, rr_rank, source, id).
    *
    * Scale shape: the quality score is ONE inlined map-only expression
    * ([[TextAnalysis.qualityX10000Col]] — no corpus self-join), and both
    * windows partition by source (and phase): per-source-sized partitions,
    * never a global window. */
  def curriculumOrder(docs: DataFrame, phases: Int = 4,
                      idCol: String = "doc_id"): DataFrame = {
    require(phases >= 1, "phases must be positive")
    val wq = Window.partitionBy(col("source"))
      .orderBy(col("quality_x10000").desc, col(idCol))
    val hk = charPolyHash(concat(lit("curriculum:"), col(idCol).cast("string")))
    val wr = Window.partitionBy(col("source"), col("phase"))
      .orderBy(hk, col(idCol))
    docs
      .withColumn("quality_x10000",
        graft.operators.TextAnalysis.qualityX10000Col)
      .withColumn("phase", ntile(phases).over(wq).cast("long"))
      .withColumn("rr_rank", row_number().over(wr).cast("long"))
      .select(col(idCol), col("source"), col("quality_x10000"),
        col("phase"), col("rr_rank"))
  }

  /** HARD-negative triplet mining — the upgrade of [[contrastiveTriplets]]
    * embedding training actually wants: the negative is not a random doc
    * but the anchor's top BM25 retrieval OUTSIDE its duplicate cluster —
    * lexically close enough to be confusable, provably not a copy. Random
    * negatives quickly become trivial for the model; hard negatives carry
    * the gradient (the standard dense-retrieval recipe: mine negatives
    * with BM25, exclude positives by clustering).
    *
    * Per anchor: BM25 top-`bmK` ([[Similarity.bm25TopKFor]], anchors as a
    * data-driven query table), anti-filtered against the pair graph's
    * connected components ([[Dedup.dedupClusters]] — a doc outside any
    * pair is its own singleton cluster), earliest surviving rank wins.
    * Anchors whose whole top-`bmK` sits inside their own cluster drop out
    * (no honest hard negative in range). */
  def hardNegativeTriplets(docs: DataFrame, pairs: DataFrame,
                           bmK: Int = 20, maxQueryTerms: Int = 8,
                           aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // the pair input feeds clustering, the anchor set, AND the final
    // (anchor, positive) join — materialize once so the caller's pair
    // QUERY (typically the ngram shingle self-join) doesn't re-run per
    // consumer
    val p = pairs.localCheckpoint()
    val clusters = Dedup.dedupClusters(p, aCol, bCol)
    val anchors = p.select(col(aCol).as("qid")).distinct()
    val ranked = Similarity.bm25TopKFor(docs, anchors, bmK,
      maxQueryTerms = maxQueryTerms)
    val qc = clusters.select(col("id").as("query_id"), col("canonical_id").as("qc"))
    val dc = clusters.select(col("id").as("doc_id"), col("canonical_id").as("dc"))
    val neg = ranked
      .join(qc, Seq("query_id"), "left")
      .join(dc, Seq("doc_id"), "left")
      .where(coalesce(col("qc"), col("query_id")) =!=
        coalesce(col("dc"), col("doc_id")))
      .groupBy(col("query_id"))
      .agg(min(struct(col("rank"), col("doc_id"))).as("m"))
      .select(col("query_id").as(aCol),
        col("m").getField("doc_id").as("hard_negative_id"))
    p.select(col(aCol), col(bCol))
      .join(neg, Seq(aCol))
      .select(col(aCol).as("anchor_id"), col(bCol).as("positive_id"),
        col("hard_negative_id"))
  }

  /** Per-source EFFECTIVE token mass under soft dedup — the number a
    * mixture planner should budget against instead of the raw count: each
    * doc's whitespace tokens are discounted by its
    * [[Dedup.softDedupWeights]] weight (inverse mean shingle document
    * frequency), so a source padded with near-identical boilerplate shows
    * the token volume it would contribute AFTER duplicate-discounting.
    * `eff_tokens_x10000 = Σ wc·w` stays integer-exact;
    * `eff_ratio_x10000` (effective/raw) is the per-source redundancy
    * readout. Plan: the soft-weights subplan + one slim (doc_id, source,
    * wc) join + one per-source agg — no text in any exchange. */
  def softTokenBudget(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = Dedup.softDedupWeights(docs, n)
      .select(col("doc_id"), col("weight_x10000"))
    docs.select(col("doc_id"), col("source"),
        wordCount(col("text")).cast("long").as("wc"))
      .join(w, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("wc")).as("ws_tokens"),
        sum(col("wc") * col("weight_x10000")).as("eff_tokens_x10000"))
      .withColumn("eff_ratio_x10000",
        when(col("ws_tokens") === 0L, lit(10000L))
          .otherwise(floor(col("eff_tokens_x10000") / col("ws_tokens")))
          .cast("long"))
  }

  /** Token-budget sampling — mixtures are specified in TOKENS, not doc
    * counts (a source of long docs at a 10% doc quota can dominate the
    * token mix): per source, walk docs in salted-hash order and keep them
    * while the running token prefix stays under the source's budget; the
    * doc that crosses the line is kept (budgets are floors, and partial
    * docs don't train), later docs drop. Hash order makes the kept set a
    * uniform sample AND reproducible across runs/partitionings — the
    * [[sampleBySource]] property, metered in tokens.
    *
    * One window per source (running sum in hash order). At 100 TB the
    * per-source sort is the cost — same posture as exact percentiles; the
    * sketch path would bucket the hash range and binary-search the budget
    * boundary bucket. Output: the kept docs with (tok_cnt, cum_tokens). */
  def sampleByTokenBudget(docs: DataFrame, budgetTokens: Map[String, Long],
                          defaultBudget: Long = Long.MaxValue,
                          metric: String = "bpe",
                          idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val budget = budgetTokens.foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) =>
        when(col("source") === src, lit(b)).otherwise(acc)
    }
    val hk = charPolyHash(concat(lit("budget:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("hk", hk)
      .withColumn("tok_cnt", tokenMetric(metric))
      .withColumn("cum_tokens", sum(col("tok_cnt")).over(w))
      .where(col("cum_tokens") - col("tok_cnt") < budget)
      .drop("hk")
  }

  /** DSIR-style hashed n-gram importance reweighting (after Xie et al.,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw doc by how target-like its hashed-bigram distribution
    * is, then keep the top-k per source. Feature space = bigram
    * occurrences hashed into `buckets` buckets; per-bucket weight is the
    * add-one-smoothed integer likelihood ratio
    * `w(b) = ⌊10⁴·(tgt(b)+1)·N_raw / ((raw(b)+1)·N_tgt)⌋`, capped — all
    * BIGINT arithmetic, bit-identical cross-engine (documented deviation
    * from DSIR: fixed-point ratio weights averaged per doc instead of
    * summed log-ratios; no transcendental ops cross engines).
    *
    * Plan shape (the 100 TB posture): the weight table is bounded by the
    * hashed feature space (≤ `buckets` rows — broadcast), the one-row
    * totals ride along broadcast (no driver action), and the corpus moves
    * once: bigram explode → (doc, bucket) tf agg → broadcast weight join →
    * per-doc agg → per-source window top-k. The target side is typically
    * the small curated corpus. Docs with < 2 tokens have no features and
    * are not scored. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        buckets: Int = 4096, keepPerSource: Int = 100,
                        capX10000: Long = 100000L): DataFrame = {
    require(buckets >= 2 && keepPerSource >= 1 && capX10000 >= 10000L,
      "need buckets >= 2, keepPerSource >= 1, cap >= 1.0")
    def occ(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.bigramStructs(col("toks"))).as("p"))
      .select(col("doc_id"), col("source"),
        (charPolyHash(concat(lit("ng:"), col("p.x"), lit(" "), col("p.y")))
          % buckets.toLong).as("b"))
    val tgtOcc = occ(target).select(col("b"))
    val rawOcc = occ(raw)
    val tgtCnt = tgtOcc.groupBy(col("b")).agg(count(lit(1)).as("tgt_cnt"))
    val rawCnt = rawOcc.groupBy(col("b")).agg(count(lit(1)).as("raw_cnt"))
    val totals = tgtOcc.agg(count(lit(1)).as("n_tgt"))
      .crossJoin(rawOcc.agg(count(lit(1)).as("n_raw")))
    // weight table: bounded by the bucket space, broadcast to the tf join
    val w = tgtCnt.join(rawCnt, Seq("b"), "full")
      .na.fill(0L, Seq("tgt_cnt", "raw_cnt"))
      .crossJoin(broadcast(totals))
      // integral `div`, not `/`: the numerator reaches ~4e16, past double's
      // 2^53 exact-integer range, so fp division would drift off the oracle
      .select(col("b"), least(lit(capX10000),
        expr("(10000 * (tgt_cnt + 1) * n_raw) div ((raw_cnt + 1) * n_tgt)"))
        .as("w_x10000"))
    val rk = Window.partitionBy(col("source"))
      .orderBy(col("importance_x10000").desc, col("doc_id"))
    rawOcc.groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("n_ngrams"),
        sum(col("tf") * col("w_x10000")).as("sw"))
      .withColumn("importance_x10000",
        floor(col("sw").cast("double") / col("n_ngrams")).cast("long"))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .select(col("doc_id"), col("source"), col("n_ngrams"),
        col("importance_x10000"), col("rank"),
        (col("rank") <= keepPerSource.toLong).cast("long").as("selected"))
  }

  /** DoReMi-style domain reweighting (after Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining"): start from the
    * reference mixture (token share per source) and run multiplicative-
    * weights steps that upweight domains with EXCESS LOSS — domains the
    * current model handles worse than average get more of the next token
    * budget. DoReMi's excess loss comes from a trained proxy model; the
    * deterministic data-side analog here uses each domain's mean quality
    * DEFICIT (`10000 − quality_x10000`, the [[TextAnalysis.quality]]
    * arithmetic) relative to the corpus mean — harder-looking domains carry
    * positive excess. The update is the linearized MW step
    * `w ← w·(1 + η·excess)` with floor renormalization to ppm each round
    * (same regret family as the exponential form, and — unlike `exp` — free
    * of transcendental ops, so every step is bit-identical cross-engine:
    * the documented deviation).
    *
    * All arithmetic is bounded-integer / exact-double: weights live in ppm
    * (≤ 10⁶), the per-domain factor `f = 1000 + ⌊excess/20⌋` in [500, 1500],
    * so every product stays < 2⁵³ and IEEE division + floor reproduce
    * exactly in any engine. Plan shape (the 100 TB posture): ONE corpus
    * scan (map-only quality deficit + token count → per-source agg); the
    * `steps` MW rounds then iterate on the domain table — rows = number of
    * sources, inherently tiny — with one-row sums riding along broadcast
    * and `localCheckpoint` cutting lineage per round (the [[Graphs]]
    * fixpoint posture; corpus-sized data never moves again). */
  def doremiWeights(docs: DataFrame, steps: Int = 5,
                    metric: String = "bpe"): DataFrame = {
    require(steps >= 1 && steps <= 50, s"steps must be in [1, 50], got $steps")
    val per = docs
      .select(col("source"), tokenMetric(metric).as("tok_cnt"),
        (lit(10000L) - TextAnalysis.qualityX10000Col).as("deficit"))
      .groupBy(col("source"))
      .agg(sum(col("tok_cnt")).as("tokens"),
        sum(col("deficit")).as("sum_def"),
        count(lit(1)).as("n_docs"))
    val tot = per.agg(sum(col("tokens")).as("tot_tokens"),
      sum(col("sum_def")).as("tot_def"), sum(col("n_docs")).as("tot_n"))
    // excess in quality-deficit points (×10⁴, can be negative); factor f is
    // per-domain constant across rounds (static excess — the closed-loop
    // variant would re-score under the updated mixture each round)
    var cur = per.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(lit(1000000.0) * col("tokens") / col("tot_tokens"))
          .cast("long").as("w0_ppm"),
        (floor(col("sum_def").cast("double") / col("n_docs")).cast("long") -
          floor(col("tot_def").cast("double") / col("tot_n")).cast("long"))
          .as("excess_x10000"))
      .withColumn("f",
        lit(1000L) + floor(col("excess_x10000").cast("double") / 20.0).cast("long"))
      .withColumn("w", col("w0_ppm"))
      .localCheckpoint() // corpus agg runs ONCE; rounds iterate on |sources| rows
    for (_ <- 1 to steps) {
      val sw = cur.agg(sum(col("w") * col("f")).as("sw"))
      cur = cur.crossJoin(broadcast(sw))
        .withColumn("w",
          floor(lit(1000000.0) * col("w") * col("f") / col("sw")).cast("long"))
        .drop("sw")
        .localCheckpoint()
    }
    cur.select(col("source"), col("w0_ppm"), col("excess_x10000"),
      col("w").as("doremi_ppm"))
  }

  /** Leakage-proof splitting: hash-split on the near-dup CLUSTER id instead
    * of the doc id, so every member of a duplicate cluster lands in the
    * same split. Plain [[withSplit]] can place a doc in train and its
    * near-copy in test — contamination baked in at split time that
    * decontamination then has to claw back; splitting on the cluster
    * canonical removes the leak by construction (pairs → connected
    * components → one split decision per component).
    *
    * `clusters` is [[Dedup.dedupClusters]] output (`id`, `canonical_id`)
    * over the near-dup pair graph; unclustered docs (no near-dup) fall back
    * to their own id. Scale shape: one equi-join of the corpus against the
    * cluster map (bounded by docs that HAVE a near-dup — broadcastable in
    * clean corpora) + the same map-only hash assignment as [[withSplit]]. */
  def withClusterSafeSplit(docs: DataFrame, clusters: DataFrame,
                           idCol: String = "doc_id",
                           trainPct: Int = 80, valPct: Int = 90): DataFrame = {
    require(0 < trainPct && trainPct <= valPct && valPct <= 100,
      s"need 0 < trainPct ($trainPct) <= valPct ($valPct) <= 100")
    val b = hashBucket(coalesce(col("canonical_id"), col(idCol)))
    docs
      .join(clusters.select(col("id").as(idCol), col("canonical_id")),
        Seq(idCol), "left")
      .withColumn("split",
        when(b < trainPct, "train").when(b < valPct, "val").otherwise("test"))
      .drop("canonical_id")
  }

  /** Deterministic output shard assignment — the writer-side op: a 100 TB
    * corpus ships as K shard files/directories, and the assignment must be
    * reproducible (re-running the export maps every doc to the same shard)
    * and independent of partitioning — so it hashes the doc id (salted, like
    * [[hashBucket]]), never `spark_partition_id` or `monotonically_
    * increasing_id` (both change with the physical plan). Writing is then
    * `df.repartition(K, col("shard")).write.partitionBy("shard")` — one
    * shuffle, one file set per shard. */
  def withShard(docs: DataFrame, numShards: Int,
                idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    docs.withColumn("shard",
      charPolyHash(concat(lit("shard:"), col(idCol).cast("string"))) % numShards)
  }

  /** Per-shard balance report: doc and token totals per shard — the check
    * that hash sharding spread the corpus evenly (skewed shards mean skewed
    * training-data files). Map-only assignment + one hash agg. */
  def shardSummary(docs: DataFrame, numShards: Int,
                   metric: String = "bpe"): DataFrame =
    withShard(docs, numShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenMetric(metric)).as("shard_tokens"))

  /** SERPENTINE balanced sharding — the ordered sibling of [[withShard]]'s
    * hash dealing, for when shard-balance matters more than placement
    * independence (training shards feeding fixed-size workers): sort docs
    * by token count (desc, doc_id tie), deal in boustrophedon rounds
    * (round r left-to-right, round r+1 right-to-left), so every shard's
    * picks sample each size stratum symmetrically — the card-dealing
    * balance an LPT scheduler approximates, without LPT's sequential
    * min-heap. Output: (shard, n_docs, shard_tokens).
    *
    * The global rank is a parallel range-sort + RDD `zipWithIndex`
    * ([[ArticleOps.batchLayout]]'s shape — per-partition counts →
    * cumulative offsets; NO single-partition window), then the serpentine
    * assignment is a map and the report one hash agg. Not lazy: the
    * zipWithIndex count job runs when the DataFrame is built. */
  def lptShards(docs: DataFrame, numShards: Int,
                metric: String = "bpe"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
    import org.apache.spark.sql.types.LongType
    val sorted = docs.select(col("doc_id"), tokenMetric(metric).as("tok_cnt"))
      .orderBy(col("tok_cnt").desc, col("doc_id"))
    val outSchema = sorted.schema.add("rn", LongType, nullable = false)
    val outTypes = outSchema.fields.map(_.dataType)
    val indexed = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val idxRow = new SpecificInternalRow(Seq(LongType))
      it.map { case (row, idx) =>
        idxRow.setLong(0, idx)
        proj(joined(row, idxRow)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val k = numShards.toLong
    org.apache.spark.sql.GraftColumnBridge
      .internalCreateDataFrame(docs.sparkSession, indexed, outSchema)
      .withColumn("blk", expr(s"rn DIV $k"))
      .withColumn("pos", col("rn") % k)
      .withColumn("shard",
        when(col("blk") % 2 === 0, col("pos"))
          .otherwise(lit(k - 1) - col("pos")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("shard_tokens"))
  }

  /** Contiguous greedy sequence packing: within each partition group (docs
    * ordered by id), a doc joins the sequence its running token prefix
    * falls in — `seq_no = floor(tokens-before-this-doc / budget)`. A doc
    * larger than the budget gets a sequence of its own. One window per
    * group — the packing parallelizes across groups; a single giant group
    * would be range-partitioned into blocks first (same greedy rule per
    * block). The budget metric should match the downstream tokenizer
    * (`bpe` for trainer-faithful budgets; `ws` for cheap word budgets).
    * Output: one row per (partitionCols..., seq_no) with doc/token totals. */
  def packSequences(docs: DataFrame, tokenBudget: Int,
                    metric: String = "ws",
                    partitionCols: Seq[String] = Seq("source")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    val parts = partitionCols.map(col)
    val w = Window.partitionBy(parts: _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(parts :+ col("doc_id") :+ tokenMetric(metric).as("tok_cnt"): _*)
      .withColumn("seq_no",
        floor((sum(col("tok_cnt")).over(w) - col("tok_cnt")) / tokenBudget))
      .groupBy(parts :+ col("seq_no"): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("seq_tokens"))
  }

  /** Sliding-window document chunking — the splitter every training/RAG
    * pipeline runs on long documents: cut each doc's token stream into
    * windows of `chunkTokens` starting every `strideTokens` (overlap =
    * chunk − stride), stopping at the first window that reaches the end —
    * so every token is covered, the last chunk may be short, and no chunk
    * is a suffix of a previous one. A doc shorter than one chunk yields
    * exactly one chunk; zero-word docs yield none.
    *
    * Map-only: tokenize → bounded explode (≤ len/stride + 1 chunks per
    * doc) → slice + rejoin. No shuffle at all — the shape that chunks a
    * 100 TB corpus in one pass. Output: (doc_id, chunk_no, n_tokens,
    * chunk_text). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int,
                     strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens ($strideTokens) must be in [1, chunkTokens ($chunkTokens)]")
    val ck = lit(chunkTokens.toLong)
    val st = lit(strideTokens.toLong)
    val len = col("len")
    // 1 + ceil(max(0, len - chunk) / stride), as portable double-floor math
    val nChunks =
      lit(1L) + floor((greatest(len - ck, lit(0L)) + st - 1L) / st).cast("long")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        wordCount(col("text")).cast("long").as("len"))
      .where(len > 0L)
      .withColumn("chunk_no", explode(sequence(lit(0L), nChunks - 1L)))
      .withColumn("start", col("chunk_no") * st)
      .withColumn("end", least(col("start") + ck, len))
      .select(col("doc_id"), col("chunk_no"),
        (col("end") - col("start")).as("n_tokens"),
        array_join(slice(col("toks"), (col("start") + 1L).cast("int"),
          (col("end") - col("start")).cast("int")), " ").as("chunk_text"))
  }

  /** Concat-and-chunk packing — the form trainers actually use: within each
    * source the token stream (docs concatenated in id order) is cut every
    * `tokenBudget` tokens, and a doc SPANS sequence boundaries instead of
    * opening a fresh one ([[packSequences]] keeps docs whole; this keeps
    * sequences full). Every sequence except each source's last carries
    * exactly `tokenBudget` tokens.
    *
    * Pure integer math on the running prefix: a doc covering token interval
    * [cum_before, cum_before + tok) touches sequences
    * floor(cum_before/B) .. floor((cum_before + tok − 1)/B), contributing
    * the interval overlap to each — one window prefix sum, one bounded
    * explode (a doc lands in ≤ tok/B + 1 sequences), one hash agg.
    * Zero-token docs contribute nothing (and are not counted in `n_docs`).
    * Output: (partitionCols..., seq_no, n_docs, seq_tokens) where `n_docs`
    * counts docs TOUCHING the sequence (a spanning doc counts in each). */
  def packSequencesSplit(docs: DataFrame, tokenBudget: Int,
                         metric: String = "ws",
                         partitionCols: Seq[String] = Seq("source")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    val parts = partitionCols.map(col)
    val b = lit(tokenBudget.toLong)
    val w = Window.partitionBy(parts: _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(parts :+ col("doc_id") :+ tokenMetric(metric).as("tok_cnt"): _*)
      .withColumn("cum_before", sum(col("tok_cnt")).over(w) - col("tok_cnt"))
      .where(col("tok_cnt") > 0L)
      .withColumn("start_seq", floor(col("cum_before") / b))
      .withColumn("end_seq",
        floor((col("cum_before") + col("tok_cnt") - 1L) / b))
      .withColumn("seq_no",
        explode(sequence(col("start_seq"), col("end_seq"))))
      .withColumn("tokens_in_seq",
        least((col("seq_no") + 1L) * b, col("cum_before") + col("tok_cnt")) -
          greatest(col("seq_no") * b, col("cum_before")))
      .groupBy(parts :+ col("seq_no"): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens_in_seq")).as("seq_tokens"))
  }

  /** Document-boundary table for packed sequences — [[packSequencesSplit]]
    * WITHOUT the final rollup: one row per (sequence, contributing doc)
    * with the doc's token interval INSIDE that sequence. This is the
    * attention-mask artifact concat-and-chunk training needs: packing
    * unrelated docs into one sequence without boundary offsets lets
    * attention bleed across documents, so trainers consume exactly this
    * table to build block-diagonal masks (and to attribute loss spans back
    * to source docs). Same prefix-sum + bounded-explode plan as the
    * rollup — one window, one ≤ tok/B+1 explode per doc, no extra shuffle;
    * `end_tok` is exclusive, `0 ≤ start_tok < end_tok ≤ tokenBudget`. */
  def packBoundaries(docs: DataFrame, tokenBudget: Int,
                     metric: String = "ws",
                     partitionCols: Seq[String] = Seq("source")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(partitionCols.nonEmpty, "need at least one partition column")
    val parts = partitionCols.map(col)
    val b = lit(tokenBudget.toLong)
    val w = Window.partitionBy(parts: _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(parts :+ col("doc_id") :+ tokenMetric(metric).as("tok_cnt"): _*)
      .withColumn("cum_before", sum(col("tok_cnt")).over(w) - col("tok_cnt"))
      .where(col("tok_cnt") > 0L)
      .withColumn("seq_no", explode(sequence(
        floor(col("cum_before") / b),
        floor((col("cum_before") + col("tok_cnt") - 1L) / b))))
      .select(parts ++ Seq(col("seq_no"), col("doc_id"),
        (greatest(col("seq_no") * b, col("cum_before")) - col("seq_no") * b)
          .as("start_tok"),
        (least((col("seq_no") + 1L) * b, col("cum_before") + col("tok_cnt")) -
          col("seq_no") * b).as("end_tok")): _*)
  }

  /** Token-concentration Lorenz deciles per source — the dataset-card
    * inequality readout: rank each source's docs by token count descending
    * and report, at each docs-decile, the cumulative share of the source's
    * tokens (ppm). "The top 10% of docs hold 58% of the tokens" is the row
    * a curation review reads before deciding length caps / chunking policy;
    * a near-diagonal curve means uniform doc sizes, a hockey stick means a
    * few giants dominate the source's training mass.
    *
    * Plan shape: one map-only projection → per-source rank + running-sum
    * window → a 10-rows-per-source decile-target join (broadcast — the
    * target table is |sources|×10). The window partitions by source, so
    * sources parallelize; a single 100 TB source would be range-partitioned
    * into blocks with per-block offsets folded in (the [[packSequences]]
    * giant-group caveat). Exact integers; ties broken by doc_id. */
  def lorenzDeciles(docs: DataFrame, metric: String = "ws"): DataFrame = {
    val base = docs.select(col("source"), col("doc_id"),
      tokenMetric(metric).as("tok"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("tok").desc, col("doc_id"))
    val ranked = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        explode(sequence(lit(1L), lit(10L))).as("decile"))
      .withColumn("rn",
        floor((col("decile") * col("n_docs") + 9L) / 10L).cast("long"))
    ranked.join(broadcast(targets), Seq("source", "rn"))
      .select(col("source"), col("decile"), col("rn").as("docs_rank"),
        col("cum_tokens"), col("total_tokens"),
        floor(lit(1000000.0) * col("cum_tokens") /
          greatest(col("total_tokens"), lit(1L))).cast("long")
          .as("cum_share_ppm"))
  }

  /** Batch-padding policy comparison — the compute-bill evidence behind
    * [[lengthBucketedBatches]]: a training batch costs
    * `batch_size × max_len_in_batch` tokens of compute, so padding waste is
    * `Σ(n·max − Σlen)`. Three policies over the same corpus and batch size:
    *  - `naive`   — batches formed in salted-hash order per source (what
    *    you get with no length awareness),
    *  - `bucketed` — power-of-two length bands first ([[lengthBucketedBatches]]'s
    *    assignment: waste < 50% by construction),
    *  - `sorted`  — batches in exact length order per source (the padding
    *    lower bound; in exchange adjacent batches are length-correlated,
    *    which is why trainers prefer the bucketed middle ground).
    * One row per policy: batches, useful tokens, billed token cost,
    * `pad_ppm`. Every window is partitioned (band / source) — nothing
    * global; each policy is one window + two hash aggs over the same
    * map-only projection. */
  def batchPaddingReport(docs: DataFrame, batchSize: Int = 8,
                         metric: String = "bpe"): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val base = docs.select(col("doc_id"), col("source"),
        tokenMetric(metric).as("tok_cnt"))
      .where(col("tok_cnt") > 0)
      .withColumn("band", length(bin(col("tok_cnt"))).cast("long"))
      .withColumn("hk",
        charPolyHash(concat(lit("batch:"), col("doc_id").cast("string"))))
    def policy(name: String, part: Column, ord: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(part).orderBy(ord: _*)
      base
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_no", expr(s"(rn - 1) DIV $batchSize"))
        .groupBy(part.as("g"), col("batch_no"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("tok_cnt")).as("max_tokens"),
          sum(col("tok_cnt")).as("sum_tokens"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("sum_tokens")).as("useful_tokens"),
          sum(col("n_docs") * col("max_tokens")).as("token_cost"))
        .select(lit(name).as("policy"), col("n_batches"),
          col("useful_tokens"), col("token_cost"),
          floor(lit(1000000.0) * (col("token_cost") - col("useful_tokens")) /
            greatest(col("token_cost"), lit(1L))).cast("long").as("pad_ppm"))
    }
    policy("bucketed", col("band"), Seq(col("hk"), col("doc_id")))
      .unionByName(policy("naive", col("source"), Seq(col("hk"), col("doc_id"))))
      .unionByName(policy("sorted", col("source"),
        Seq(col("tok_cnt"), col("doc_id"))))
  }

  /** Shard-balance audit over [[withShard]]'s assignment — the one-row
    * verdict an operator reads before a 100 TB shard-out: max/min/mean
    * tokens per shard and the skew ratio (max/mean, ppm; 1,000,000 =
    * perfectly balanced). Hash sharding is balanced in EXPECTATION — this
    * measures the realized spread, which is what decides whether the
    * trailing shard stalls a training-data write (the straggler bound is
    * the max shard, not the mean). Two hash aggs, output is one row. */
  def shardSkew(docs: DataFrame, numShards: Int,
                metric: String = "ws"): DataFrame =
    shardSummary(docs, numShards, metric)
      .agg(count(lit(1)).as("n_shards"),
        min(col("n_docs")).as("min_docs"), max(col("n_docs")).as("max_docs"),
        min(col("shard_tokens")).as("min_tokens"),
        max(col("shard_tokens")).as("max_tokens"),
        sum(col("shard_tokens")).as("total_tokens"))
      .select(col("n_shards"), col("min_docs"), col("max_docs"),
        col("min_tokens"), col("max_tokens"), col("total_tokens"),
        floor(lit(1000000.0) * col("max_tokens") * col("n_shards") /
          greatest(col("total_tokens"), lit(1L))).cast("long")
          .as("skew_ppm"))
}
