package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Trainable quality-classifier operators — the distillation step of a
  * corpus-curation pipeline: an expensive teacher signal (an LLM judgment,
  * a human label, here the composite quality score) is distilled into a
  * model over cheap features, which then gates the other 99.99% of the
  * corpus at scan speed.
  *
  * Both trainers are CLOSED-FORM, not iterative: training is one
  * map-side-combinable aggregation pass plus O(1) (least-squares) or
  * O(distinct-feature) (stump) post-processing that itself stays
  * relational. No gradient loops, no learning-rate tuning, no float
  * accumulation order — every intermediate is a BIGINT, so a DuckDB oracle
  * reproduces training bit for bit (the same property the fixed-point
  * PageRank and DSIR weights rely on). An SGD loop would converge slower
  * per pass AND break cross-engine determinism.
  *
  * Scale posture (100 TB): the model is O(1)/O(k) rows broadcast back over
  * the corpus; the training pass is a single scan producing a handful of
  * integer sums (least-squares) or a per-distinct-value count table
  * (stump). Nothing driver-side, nothing quadratic.
  */
object Classifier {

  /** Teacher label: the composite quality score thresholded at `tX10000`
    * (default 2000 ≈ the corpus median — both classes well-populated at
    * every sf). 1/0 as BIGINT. */
  def qualityLabel(tX10000: Long = 2000L): Column =
    when(TextAnalysis.qualityX10000Col >= tX10000, lit(1L)).otherwise(lit(0L))

  /** Integer shape features per doc — the quality signal's sufficient
    * statistics, deliberately downscaled so every normal-equation entry
    * stays far from Long overflow (`x1 ≤ 25`, `x2 ≤ 25`; the 3×3 Gram
    * matrix of N docs is then ≤ 625·N per entry — safe to N ≈ 10¹³):
    * `x0 = 1` (bias), `x1 = min(wc, 200)/8` (length fit),
    * `x2 = min(100, 400·stopHits/wc)/4` (stopword fit).
    * Output: (doc_id, source, x1, x2, y). */
  def shapeFeatures(docs: DataFrame, labelX10000: Long = 2000L): DataFrame = {
    val wc = wordCount(col("text")).cast("long")
    val wcDen = greatest(wc, lit(1L))
    val stopHits = graft.plans.ArrayExpressions
      .stopwordScores(tokens(col("text")), Seq(TextAnalysis.stopwords.head._2))(0)
      .cast("long")
    docs.select(
      col("doc_id"), col("source"),
      floor(least(wc, lit(200L)).cast("double") / 8.0).cast("long").as("x1"),
      floor(least(lit(100L), floor(lit(400.0) * stopHits / wcDen).cast("long"))
        .cast("double") / 4.0).cast("long").as("x2"),
      qualityLabel(labelX10000).as("y"))
  }

  /** Closed-form least-squares fit over the 3 shape features: the normal
    * equations `A·w = b` with `A = Σ x·xᵀ` (3×3) and `b = Σ x·y`,
    * assembled as ONE aggregation of 9 integer sums, then solved exactly
    * by Cramer's rule — `w_i = adj(A)ᵢ·b / det(A)` kept as the integer
    * pair (numerator, shared det denominator), never divided.
    *
    * Entries are scaled ×100 then floor-divided by N (deterministic — both
    * engines floor non-negatives identically; the uniform scale cancels in
    * the solve, leaving 1% quantization instead of unit quantization on
    * the class-rate entry b₀). The N-division bounds every Gram entry by
    * `100·625` REGARDLESS of corpus size, so `det ≤ 6·(6.25e4)³ ≈ 1.5e15`
    * and every score numerator stays ≲ 9e15 — overflow-safe BIGINT at any
    * N.
    *
    * Output (one row): (n, a11, a12, a22, det, w0_num, w1_num, w2_num) —
    * the Gram entries ride along as the model card's condition evidence. */
  def leastSquaresFit(feats: DataFrame): DataFrame = {
    val sums = feats.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("sy1"),
      sum(col("x2") * col("y")).as("sy2"))
    // ×100-scaled averaged Gram entries (floor-div by n): a00 = 100 exactly
    def avg(c: String) =
      floor(col(c).cast("double") * 100.0 / col("n")).cast("long")
    val m = sums.select(col("n"),
      lit(100L).as("a00"), avg("s1").as("a01"), avg("s2").as("a02"),
      avg("s11").as("a11"), avg("s12").as("a12"), avg("s22").as("a22"),
      avg("sy").as("b0"), avg("sy1").as("b1"), avg("sy2").as("b2"))
    m.select(col("n"), col("a11"), col("a12"), col("a22"),
      (col("a00") * (col("a11") * col("a22") - col("a12") * col("a12"))
        - col("a01") * (col("a01") * col("a22") - col("a12") * col("a02"))
        + col("a02") * (col("a01") * col("a12") - col("a11") * col("a02")))
        .as("det"),
      ((col("a11") * col("a22") - col("a12") * col("a12")) * col("b0")
        - (col("a01") * col("a22") - col("a02") * col("a12")) * col("b1")
        + (col("a01") * col("a12") - col("a02") * col("a11")) * col("b2"))
        .as("w0_num"),
      (-(col("a01") * col("a22") - col("a12") * col("a02")) * col("b0")
        + (col("a00") * col("a22") - col("a02") * col("a02")) * col("b1")
        - (col("a00") * col("a12") - col("a02") * col("a01")) * col("b2"))
        .as("w1_num"),
      ((col("a01") * col("a12") - col("a11") * col("a02")) * col("b0")
        - (col("a00") * col("a12") - col("a01") * col("a02")) * col("b1")
        + (col("a00") * col("a11") - col("a01") * col("a01")) * col("b2"))
        .as("w2_num"))
  }

  /** Score every doc with a [[leastSquaresFit]] model (broadcast — the
    * model is one row): regression output ŷ = w·x in units of det, decision
    * at ŷ > ½, i.e. `2·(w_num·x) > det` (sign-aware). Output:
    * (doc_id, source, y AS label, margin2 = 2·w·x − det in det units,
    * predicted, correct 0/1). */
  def leastSquaresScore(feats: DataFrame, model: DataFrame): DataFrame =
    feats.crossJoin(broadcast(model))
      .withColumn("s2",
        lit(2L) * (col("w0_num") + col("w1_num") * col("x1")
          + col("w2_num") * col("x2")))
      .withColumn("predicted",
        when((col("det") > 0 && col("s2") > col("det"))
          || (col("det") < 0 && col("s2") < col("det")), lit(1L))
          .otherwise(lit(0L)))
      .select(col("doc_id"), col("source"), col("y").as("label"),
        (col("s2") - col("det")).as("margin2"), col("predicted"),
        when(col("predicted") === col("y"), lit(1L)).otherwise(lit(0L))
          .as("correct"))

  /** Per-source accuracy rollup of [[leastSquaresScore]] — the model-card
    * table: (source, n, n_correct, acc_x10000). */
  def accuracyBySource(scored: DataFrame): DataFrame =
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("correct")).as("n_correct"))
      .withColumn("acc_x10000",
        floor(lit(10000.0) * col("n_correct") / col("n") + 0.5).cast("long"))

  /** fastText-style hashed n-gram occurrence rows — the feature front of
    * the model-based quality filter DCLM/LLaMA-class pipelines run (Joulin
    * et al. 2016's hashing trick; CCNet/DCLM fastText quality filtering):
    * one row per token AND bigram occurrence of the normalized text,
    * hashed into a FIXED `buckets`-wide space, so the vocabulary never
    * needs to be known, shipped, or even bounded — the model is exactly
    * `buckets` integer weights no matter the corpus. Teacher label rides
    * along ([[qualityLabel]], the distillation posture of
    * [[shapeFeatures]]). Output: (doc_id, source, y, b). */
  def hashedNgramFeatures(docs: DataFrame, buckets: Int = 1024,
                          labelX10000: Long = 2000L): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    docs.select(col("doc_id"), col("source"),
        qualityLabel(labelX10000).as("y"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("y"),
        explode(concat(col("toks"),
          transform(TextAnalysis.bigramStructs(col("toks")),
            p => concat_ws(" ", p.getField("x"), p.getField("y"))))).as("g"))
      .select(col("doc_id"), col("source"), col("y"),
        (charPolyHash(col("g")) % buckets.toLong).as("b"))
  }

  /** Multinomial Naive-Bayes fit over hashed n-gram occurrences with
    * add-one smoothing — closed-form like the suite's other trainers:
    * training is ONE map-combinable groupBy over the occurrence rows
    * (partial aggregation compacts every map task to ≤ `buckets` rows
    * before the shuffle) plus a one-row total aggregate; the model is
    * ≤ `buckets` + 2 integer rows, broadcast back at scoring time. The
    * single float step is the log-odds, immediately fixed to ×1e6 BIGINT
    * (the established `floor(x·scale + 0.5)` convention), so the DuckDB
    * oracle replays training:
    * `w_b = round(1e6·(ln((n1_b+1)/(T1+B)) − ln((n0_b+1)/(T0+B))))`.
    * Special rows: b = −1 carries the class prior
    * `round(1e6·(ln((D1+1)/(D+2)) − ln((D0+1)/(D+2))))`, b = −2 the
    * unseen-bucket default
    * (both-classes-zero smoothing) scoring needs for out-of-corpus
    * features. Output: (b, n1, n0, w_x1e6). */
  def hashedNBFit(feats: DataFrame, buckets: Int = 1024): DataFrame = {
    def lnRatioX1e6(n1: Column, t1: Column, n0: Column, t0: Column): Column =
      floor(lit(1000000.0) *
        (log((n1 + 1L).cast("double") / t1.cast("double"))
          - log((n0 + 1L).cast("double") / t0.cast("double"))) + 0.5)
        .cast("long")
    val counts = feats.groupBy(col("b"))
      .agg(sum(col("y")).as("n1"), (count(lit(1)) - sum(col("y"))).as("n0"))
    val totals = feats
      .agg(sum(col("y")).as("t1"), (count(lit(1)) - sum(col("y"))).as("t0"))
      .crossJoin(
        feats.select(col("doc_id"), col("y")).distinct()
          .agg(sum(col("y")).as("d1"), (count(lit(1)) - sum(col("y"))).as("d0")))
    val sm = lit(buckets.toLong)
    counts.crossJoin(broadcast(totals))
      .select(col("b"), col("n1"), col("n0"),
        lnRatioX1e6(col("n1"), col("t1") + sm, col("n0"), col("t0") + sm)
          .as("w_x1e6"))
      .unionByName(totals.select(lit(-1L).as("b"),
        col("d1").as("n1"), col("d0").as("n0"),
        lnRatioX1e6(col("d1"), col("d1") + col("d0") + 2L,
          col("d0"), col("d1") + col("d0") + 2L).as("w_x1e6")))
      .unionByName(totals.select(lit(-2L).as("b"),
        lit(0L).as("n1"), lit(0L).as("n0"),
        lnRatioX1e6(lit(0L), col("t1") + sm, lit(0L), col("t0") + sm)
          .as("w_x1e6")))
  }

  /** Score hashed-feature docs against a [[hashedNBFit]] model: per-doc
    * log-posterior odds ×1e6 = prior + Σ tf_b·w_b, predict 1 iff positive.
    * The occurrence rows are compacted to (doc, bucket, tf) FIRST (map-
    * side combine shrinks the shuffle to distinct pairs), then the
    * ≤ `buckets`-row weight table joins in via broadcast — the corpus
    * never shuffles on anything wider than ids. Unseen buckets take the
    * model's b = −2 default weight. Output:
    * (doc_id, source, label, score_x1e6, predicted, correct). */
  def hashedNBScore(feats: DataFrame, model: DataFrame): DataFrame = {
    val w = model.where(col("b") >= 0L).select(col("b"), col("w_x1e6"))
    val prior = model.where(col("b") === -1L)
      .select(col("w_x1e6").as("prior_x1e6"))
    val dflt = model.where(col("b") === -2L)
      .select(col("w_x1e6").as("default_w"))
    feats.groupBy(col("doc_id"), col("source"), col("y"), col("b"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(w), Seq("b"), "left")
      .crossJoin(broadcast(dflt))
      .select(col("doc_id"), col("source"), col("y"),
        (col("tf") * coalesce(col("w_x1e6"), col("default_w"))).as("wv"))
      .groupBy(col("doc_id"), col("source"), col("y"))
      .agg(sum(col("wv")).as("sw"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("source"), col("y").as("label"),
        (col("sw") + col("prior_x1e6")).as("score_x1e6"))
      .withColumn("predicted",
        when(col("score_x1e6") > 0L, lit(1L)).otherwise(lit(0L)))
      .withColumn("correct",
        when(col("predicted") === col("label"), lit(1L)).otherwise(lit(0L)))
  }

  /** Decision-stump training — the 1-D threshold learner (AdaBoost's weak
    * learner, and exactly how a calibrated keep/drop threshold on a cheap
    * signal is fit against labeled data): over candidate thresholds t
    * (every distinct feature value, plus one past the max = "predict all
    * negative"), training accuracy of the rule `predict 1 iff f ≥ t` is
    *   correct(t) = |pos with f ≥ t| + |neg with f < t|,
    * computed for ALL candidates in one pass: per-distinct-value label
    * counts, then prefix sums ordered by value (a window over the
    * distinct-value table, not the corpus). Winner = max correct, min
    * threshold on ties. Output (one row): (threshold, n_correct, n).
    *
    * `labeled` needs (f, y) columns; y ∈ {0, 1}. */
  def stumpFit(labeled: DataFrame): DataFrame = {
    val byVal = labeled.groupBy(col("f"))
      .agg(sum(col("y")).as("npos"),
        (count(lit(1)) - sum(col("y"))).as("nneg"))
    val wCum = Window.orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = labeled.agg(sum(col("y")).as("tot_pos"),
      (count(lit(1)) - sum(col("y"))).as("tot_neg"),
      count(lit(1)).as("n"),
      (max(col("f")) + 1L).as("f_max1"))
    // candidate rows: each distinct value, plus the all-negative sentinel
    val cands = byVal
      .withColumn("cum_pos", coalesce(sum(col("npos")).over(wCum), lit(0L)))
      .withColumn("cum_neg", coalesce(sum(col("nneg")).over(wCum), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(col("f").as("threshold"),
        (col("tot_pos") - col("cum_pos") + col("cum_neg")).as("n_correct"),
        col("n"))
      .unionByName(totals.select(col("f_max1").as("threshold"),
        col("tot_neg").as("n_correct"), col("n")))
    val best = cands
      .agg(min(struct((-col("n_correct")).as("neg"),
        col("threshold").as("t"))).as("m"))
      .select(col("m").getField("t").as("best_t"))
    cands.join(broadcast(best), col("threshold") === col("best_t"))
      .select(col("threshold"), col("n_correct"), col("n"))
  }
}
