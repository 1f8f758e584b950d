package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Aggregation layer (SURVEY.md §2.4) — hash aggregations with map-side
  * partials (Spark's partial/final agg replaces the reference's per-batch +
  * run-total two-level accumulation, `src/data_processor.py:121-140`).
  *
  * Cross-engine determinism: double sums are order-dependent, so any money/
  * measure aggregate is computed as a per-row scaled BIGINT
  * (`floor(x*scale+0.5)`) then integer-summed — bit-identical on Spark and
  * DuckDB regardless of partitioning. Division back to double is a single fp
  * op on identical integers.
  */
object Summaries {

  /** Modality coverage — the multimodal-completeness audit: per source,
    * how many docs have valid text, and how many have an embedding row
    * (the join every downstream similarity/ANN stage silently depends
    * on). A source at 60% embedding coverage under-represents itself in
    * every embedding-based dedup and retrieval pass — the report makes
    * the gap visible before the pipeline bakes it in. One validated map
    * pass + one slim (id)-keyed left join + one agg. */
  def modalityCoverage(docs: org.apache.spark.sql.DataFrame,
                       embeddings: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions.isValid
    val hasVec = embeddings.select(col("vec_id").as("doc_id"))
      .distinct().withColumn("has_vec", lit(1L))
    docs.select(col("doc_id"), col("source"),
        isValid(col("text"), col("lang"), col("source")).cast("long").as("valid_text"))
      .join(hasVec, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("valid_text")).as("n_valid_text"),
        sum(coalesce(col("has_vec"), lit(0L))).as("n_with_embedding"))
      .withColumn("embedding_coverage_x10000",
        floor(lit(10000.0) * col("n_with_embedding") /
          greatest(col("n_docs"), lit(1L)) + 0.5).cast("long"))
  }

  /** Per-row scaled fixed-point value: floor(x*scale + 0.5) as BIGINT. */
  def fx(c: Column, scale: Long): Column =
    floor(c * scale + lit(0.5)).cast("long")

  /** Exact sum of a double measure, returned as double with `dec` decimals. */
  def exactSum(c: Column, dec: Int): Column = {
    val s = math.pow(10, dec).toLong
    sum(fx(c, s)) / lit(s.toDouble)
  }

  /** Exact mean of a double measure (exact integer sum / count). */
  def exactAvg(c: Column, dec: Int): Column = {
    val s = math.pow(10, dec).toLong
    sum(fx(c, s)) / (lit(s.toDouble) * count(c))
  }

  /** A1 — corpus-level batch summary (reference `src/data_processor.py:121-140`):
    * count, total/avg content length, word totals. One partial+final agg. */
  def corpusSummary(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("total_docs"),
      sum(length(col("text")).cast("long")).as("total_content_length"),
      (sum(length(col("text")).cast("long")) / count(lit(1))).as("avg_content_length"),
      sum(wordCount(col("text")).cast("long")).as("total_words"),
      countDistinct(col("lang")).as("unique_langs"))

  /** A2 — per-source production summary + source histogram
    * (reference `src/production_data_processor.py:135-167`). One shuffle on
    * `source`; low cardinality → tiny exchange after map-side combine. */
  def sourceSummary(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("doc_count"),
      sum(length(col("text")).cast("long")).as("total_content_length"),
      (sum(length(col("text")).cast("long")) / count(lit(1))).as("avg_content_length"),
      countDistinct(col("lang")).as("unique_langs"))

  /** A3 — status counts (reference `src/queue_manager.py:86-114`). */
  def statusCounts(df: DataFrame, statusCol: String): DataFrame =
    df.groupBy(col(statusCol)).agg(count(lit(1)).as("n"))

  /** A7 — event-time window counts (the rate-limiter's 60 s sliding window,
    * reference `src/enhanced_production_mediawiki_client.py:43-64`), batch
    * form: tumbling windows via `window()`. Streaming form in
    * `graft.streaming.Streams`. */
  def eventWindowCounts(events: DataFrame, minutes: Int): DataFrame =
    events
      .groupBy(window(col("ts"), s"$minutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value"), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** A1 as a typed one-pass `Aggregator` — the SURVEY §4 custom-Catalyst
    * candidate: count, length sum/avg, word total, AND exact distinct langs
    * in a single pass (the reference's `create_summary` shape,
    * `src/data_processor.py:121-140`). The Set buffer is fine for
    * low-cardinality keys like languages; for unbounded keys use the
    * two-aggregation split or the HLL variant. */
  object CorpusSummaryAggregator
    extends org.apache.spark.sql.expressions.Aggregator[
      graft.Schemas.Doc, (Long, Long, Long, Set[String]), graft.Schemas.BatchSummary] {
    override def zero: (Long, Long, Long, Set[String]) = (0L, 0L, 0L, Set.empty)
    override def reduce(b: (Long, Long, Long, Set[String]), d: graft.Schemas.Doc) = {
      val words = if (d.text == null || d.text.trim.isEmpty) 0L
        else d.text.trim.split("\\s+").length.toLong
      (b._1 + 1, b._2 + (if (d.text == null) 0L else d.text.length.toLong),
        b._3 + words,
        if (d.lang == null) b._4 else b._4 + d.lang) // countDistinct skips nulls
    }
    override def merge(a: (Long, Long, Long, Set[String]),
                       b: (Long, Long, Long, Set[String])) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 ++ b._4)
    override def finish(b: (Long, Long, Long, Set[String])): graft.Schemas.BatchSummary =
      graft.Schemas.BatchSummary(b._1, b._2,
        if (b._1 == 0) 0.0 else b._2.toDouble / b._1, b._3, b._4.size.toLong)
    override def bufferEncoder = org.apache.spark.sql.Encoders.product
    override def outputEncoder = org.apache.spark.sql.Encoders.product
  }

  /** One-pass typed corpus summary (Dataset surface of A1). */
  def typedCorpusSummary(spark: SparkSession,
                         docs: org.apache.spark.sql.Dataset[graft.Schemas.Doc]):
      org.apache.spark.sql.Dataset[graft.Schemas.BatchSummary] = {
    import spark.implicits._
    docs.select(CorpusSummaryAggregator.toColumn)
  }

  /** A2's `sources` histogram as a map (dict shape fidelity,
    * reference `src/production_data_processor.py:149-153`). */
  def sourcesMap(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).count()
      .agg(map_from_entries(sort_array(collect_list(struct(col("source"), col("count")))))
        .as("sources"))

  /** Exact positional (nearest-rank) percentiles of doc length per source —
    * the corpus length-distribution report (p50/p90/p99 by default):
    * percentile q = the value at sorted row ceil(q·n/100), computed in
    * integer arithmetic (`(q·n + 99) div 100`) so the target rank is
    * bit-identical cross-engine (generalizes `Relational.medianValue`'s
    * interpolation-free lower median, which is the q=50 case).
    *
    * Plan shape: one window rank over (source) + a per-source count agg
    * exploded to |pcts| tiny target rows, broadcast-joined back on
    * (source, rank) — the big ranked table is scanned once and never
    * row-inflated. At 100 TB the full per-group sort is the intrinsic cost
    * of EXACT percentiles; [[approxLengthPercentiles]] is the sketch form
    * that replaces the sort with a mergeable quantile summary. */
  /** Corpus health report — the one-look dashboard a curation run ends
    * with, per source: doc count, validity, exact-duplicate burden (docs
    * that are non-canonical copies), mean quality, language spread, and
    * BPE-token volume. Pure composition of the already-checked signals,
    * rolled up in ONE scan: every signal except the dup check is a map-only
    * expression on the row itself, so the whole report is scan → one window
    * keyed on the 8-byte content hash (the exact-dup canonical; the oracle
    * mirrors the same hash — [[graft.operators.Dedup.exactDuplicates]]
    * convention) → one per-source conditional aggregation. Every map-only
    * signal is computed BEFORE the window, so the exchange carries only
    * slim numerics plus (source, lang) — never the document text. No
    * corpus self-joins: validity and quality were previously computed in
    * separate legs and equi-joined back on `doc_id` — two corpus-vs-corpus
    * sort-merge joins for columns the row already had. The mean is
    * integer-sum-then-one-divide ([[fx]] posture), so it is bit-identical
    * cross-engine. */
  def corpusHealth(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{isRedirect, tokens}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("normh"))
    val wc = wordCount(col("text")).cast("long")
    val wcDen = greatest(wc, lit(1L))
    val stopHits = graft.plans.ArrayExpressions
      .stopwordScores(tokens(col("text")),
        Seq(TextAnalysis.stopwords.head._2))(0).cast("long")
    // same formula as TextAnalysis.quality — inlined so it rides the scan
    val qualityX = floor(lit(10000.0) *
      least(lit(1.0), wc.cast("double") / 200.0) *
      (lit(0.5) + lit(0.5) * least(lit(1.0), lit(4.0) * stopHits / wcDen)) + 0.5)
      .cast("long")
    docs.select(col("doc_id"), col("source"), col("lang"),
        graft.plans.ArrayExpressions.contentHash(
          normalizeWhitespace(col("text"))).as("normh"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("bpe"),
        (isValid(col("text"), col("lang"), col("source")) &&
          !isRedirect(col("text"))).cast("long").as("valid"),
        qualityX.as("q"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("source"), col("lang"), col("bpe"), col("valid"),
        (col("doc_id") =!= col("canonical_id")).cast("long").as("is_dup"),
        col("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("valid")).as("n_valid"),
        sum(col("is_dup")).as("n_dup_docs"),
        floor(sum(col("q")).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("mean_quality_x10000"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("bpe")).as("bpe_tokens"))
      .select(col("source"), col("n_docs"), col("n_valid"), col("n_dup_docs"),
        col("mean_quality_x10000"), col("n_langs"), col("bpe_tokens"))
  }

  def lengthPercentiles(docs: DataFrame,
                        pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles are integers in [1, 100]")
    val base = docs.select(col("source"), col("doc_id"),
      length(col("text")).cast("long").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("v"), col("doc_id"))
    val ranked = base.withColumn("rn", row_number().over(w).cast("long"))
    val targets = base.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      .withColumn("rn", floor((col("pct") * col("cnt") + 99L) / 100L).cast("long"))
      .select(col("source"), col("pct"), col("rn"))
    ranked.join(broadcast(targets), Seq("source", "rn"))
      .select(col("source"), col("pct"), col("v").as("value"))
  }

  /** Sketch sibling of [[lengthPercentiles]] — `approx_percentile`'s
    * mergeable KLL-style summary instead of a full per-group sort: the
    * 100 TB form (no cross-engine oracle; accuracy is spec-gated against
    * the exact form, the a4/a9 pattern). */
  def approxLengthPercentiles(docs: DataFrame,
                              pcts: Seq[Int] = Seq(50, 90, 99),
                              accuracy: Int = 10000): DataFrame =
    docs.select(col("source"), length(col("text")).cast("long").as("v"))
      .groupBy(col("source"))
      .agg(percentile_approx(col("v"),
        array(pcts.map(p => lit(p / 100.0)): _*), lit(accuracy)).as("qs"))
      .select(col("source"), posexplode(col("qs")).as(Seq("i", "approx_value")))
      .withColumn("pct", element_at(array(pcts.map(p => lit(p.toLong)): _*),
        col("i") + 1))
      .select(col("source"), col("pct"), col("approx_value"))

  /** The dataset card as ONE long-format query: per source,
    * `(source, metric, value)` rows for the instruments a curation review
    * reads side by side — volume (docs, whitespace tokens), mean quality,
    * token-mass concentration ([[TextAnalysis.tokenGini]]), n-gram
    * type–token diversity ([[TextAnalysis.ngramDiversity]]), and the
    * top-decile token share ([[Mixing.lorenzDeciles]] at decile 1). Long
    * format so adding an instrument is a union leg, not a schema change —
    * the artifact a 100 TB snapshot publishes next to its data.
    *
    * Each leg is an independently-verified operator (every one also runs
    * under its own oracle-checked query); the card is their union over one
    * corpus snapshot. The parquet scan is read once per leg — column-pruned
    * to (source, text) each time — and every leg is map-only + one agg. */
  def datasetCard(docs: DataFrame, ngramN: Int = 3): DataFrame = {
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(wordCount(col("text")).cast("long")).as("ws_tokens"),
      sum(TextAnalysis.qualityX10000Col).as("sq"))
    def leg(from: DataFrame, metric: String, v: Column): DataFrame =
      from.select(col("source"), lit(metric).as("metric"), v.as("value"))
    leg(base, "n_docs", col("n_docs"))
      .unionByName(leg(base, "ws_tokens", col("ws_tokens")))
      .unionByName(leg(base, "mean_quality_x10000",
        floor(col("sq").cast("double") / col("n_docs")).cast("long")))
      .unionByName(leg(TextAnalysis.tokenGini(docs), "gini_ppm",
        col("gini_ppm")))
      .unionByName(leg(TextAnalysis.ngramDiversity(docs, ngramN),
        "ngram_diversity_ppm", col("diversity_ppm")))
      .unionByName(leg(Mixing.lorenzDeciles(docs, "ws")
          .where(col("decile") === 1L),
        "top_decile_share_ppm", col("cum_share_ppm")))
  }
}
