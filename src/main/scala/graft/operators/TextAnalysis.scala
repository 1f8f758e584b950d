package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis suite for corpus curation: language ID, quality scoring,
  * token counting, and document fingerprinting. All pure column expressions
  * (map-only, whole-stage codegen, zero shuffle) — exactly what you want in
  * the inner loop of a 100 TB filter pass.
  */
object TextAnalysis {

  /** Stopword lists per language for the n-gram/stopword-hit heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "y", "las", "un", "es"),
    "zh" -> Seq("de", "shi", "zai", "le"))

  /** Language-ID by stopword hit count with a fixed-priority tie-break
    * (order of `stopwords`). Emits per-language scores + the prediction.
    *
    * One tokenize pass + ONE codegen'd scoring pass
    * ([[graft.plans.StopwordScoresExpr]]: per token, one hash-set probe per
    * language) instead of 5 interpreted `filter`-HOF walks — the all-scores
    * array is bound as its own column so CollapseProject cannot inline the
    * scorer into each per-language extraction. */
  def langId(docs: DataFrame): DataFrame = {
    val names = stopwords.map(_._1)
    val scored = docs
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        graft.plans.ArrayExpressions.stopwordScores(col("toks"), stopwords.map(_._2)).as("sc"))
      .select(Seq(col("doc_id"), col("lang")) ++
        names.zipWithIndex.map { case (l, i) => col("sc")(i).as(s"score_$l") }: _*)
    val pred = names.foldRight(lit("und"): Column) { (l, rest) =>
      val isMax = names.filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
      when(isMax && col(s"score_$l") > 0, lit(l)).otherwise(rest)
    }
    scored.select(
      Seq(col("doc_id")) ++ names.map(l => col(s"score_$l")) ++
        Seq(pred.as("predicted_lang"), col("lang").as("actual_lang")): _*)
  }

  /** Sentence statistics — the Gopher-style document-shape signals word
    * counts can't see: sentence count, mean/max sentence length in words
    * (×100 fixed point), and the fraction of one-word "sentences"
    * (bullet-point debris). Sentences split on `[.!?]+` runs; segments
    * with no word characters don't count. Map-only; DuckDB mirrors the
    * same regex split. */
  def sentenceStats(docs: DataFrame): DataFrame = {
    val segs = split(col("text"), "[.!?]+")
    val sent = filter(
      transform(segs, s => normalizeWhitespace(s)),
      s => s =!= "")
    val lens = col("lens")
    docs
      .select(col("doc_id"),
        transform(sent, s => size(split(s, " "))).as("lens"))
      .select(col("doc_id"),
        size(lens).cast("long").as("n_sentences"),
        when(size(lens) === 0, lit(0L))
          .otherwise(floor(lit(100.0) *
            aggregate(lens, lit(0L), (a, x) => a + x) / size(lens)).cast("long"))
          .as("mean_sentence_len_x100"),
        coalesce(array_max(lens), lit(0)).cast("long").as("max_sentence_len"),
        when(size(lens) === 0, lit(0L))
          .otherwise(floor(lit(10000.0) *
            size(filter(lens, x => x === 1)) / size(lens)).cast("long"))
          .as("one_word_frac_x10000"))
  }

  /** Sliding SENTENCE-window passages — the RAG/retrieval chunker: windows
    * of `w` sentences advancing by `stride` (overlap `w − stride`), so a
    * fact straddling a window boundary appears INTACT in the next window.
    * Distinct from the packing family: `packChunks` cuts on a token budget
    * with no overlap (training sequences), this cuts on sentence
    * boundaries WITH deliberate redundancy (retrieval granularity). Tail
    * windows shrink (the last start points see fewer sentences) — the
    * standard chunker contract.
    *
    * Plan: one sentence split per doc (array ops, the [[sentenceStats]]
    * splitter), posexplode, `w−1` lead() columns over the per-doc
    * sentence order, start points `idx % stride == 0` — fan-out is
    * n_sentences/stride rows per doc and per-doc windows parallelize.
    * Output: (doc_id, passage_idx, n_sents, n_words, passage_hash). */
  def ragPassages(docs: DataFrame, w: Int = 3, stride: Int = 2): DataFrame = {
    require(w >= 1 && stride >= 1 && stride <= w, "need 1 <= stride <= w")
    val segs = split(col("text"), "[.!?]+")
    val sent = filter(transform(segs, s => normalizeWhitespace(s)),
      s => s =!= "")
    val st = docs.select(col("doc_id"), posexplode(sent).as(Seq("idx", "sent")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val leadCols = (1 until w).map(k => lead(col("sent"), k).over(wd).as(s"s$k"))
    st.select(col("doc_id") +: col("idx") +: col("sent").as("s0") +: leadCols: _*)
      .where(col("idx") % stride === 0)
      .select(col("doc_id"),
        expr(s"idx DIV $stride").cast("long").as("passage_idx"),
        concat_ws(" ", (0 until w).map(k => col(s"s$k")): _*).as("passage"),
        (lit(1) + (1 until w).map(k =>
          when(col(s"s$k").isNotNull, 1).otherwise(0)).reduce(_ + _))
          .cast("long").as("n_sents"))
      .select(col("doc_id"), col("passage_idx"), col("n_sents"),
        size(split(col("passage"), " ")).cast("long").as("n_words"),
        charPolyHash(col("passage")).as("passage_hash"))
  }

  /** Language-consistency audit: per (source, declared lang), how many docs
    * does the [[langId]] classifier agree with, disagree with, or abstain
    * on (`und`)? A source whose mismatch rate spikes is mislabeled or mixed
    * — the signal that routes it to re-tagging before language-filtered
    * training mixes are drawn. One classifier pass + one hash agg. */
  def langMismatchReport(docs: DataFrame): DataFrame =
    langId(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("actual_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted_lang") === col("actual_lang"), 1L)
          .otherwise(0L)).as("n_agree"),
        sum(when(col("predicted_lang") === "und", 1L).otherwise(0L))
          .as("n_undetermined"),
        sum(when(col("predicted_lang") =!= col("actual_lang") &&
          col("predicted_lang") =!= "und", 1L).otherwise(0L)).as("n_mismatch"))

  /** Quality scoring: length/punctuation/stopword/digit signals + a combined
    * fixed-point score. Mirrors the heuristics LLM-corpus filters use
    * (length fit, symbol density, stopword density). */
  /** The composite quality score as ONE inlineable Column over `text` —
    * for consumers that need the score BESIDE their own columns (e.g.
    * [[Mixing.curriculumOrder]]'s phase assignment) without joining
    * [[quality]]'s output back on doc_id: a map-only expression never
    * justifies a corpus self-join. Same arithmetic as [[quality]]'s
    * `quality_x10000` column, bit for bit. */
  def qualityX10000Col: Column = {
    val wc = wordCount(col("text")).cast("long")
    val wcDen = greatest(wc, lit(1L))
    val stopHits = graft.plans.ArrayExpressions
      .stopwordScores(tokens(col("text")), Seq(stopwords.head._2))(0).cast("long")
    floor(lit(10000.0) *
      least(lit(1.0), wc.cast("double") / 200.0) *
      (lit(0.5) + lit(0.5) * least(lit(1.0), lit(4.0) * stopHits / wcDen)) + 0.5)
      .cast("long")
  }

  def quality(docs: DataFrame): DataFrame = {
    val norm = normalizeWhitespace(col("text"))
    val wc = wordCount(col("text")).cast("long")
    // denominators guard against empty docs (0/0 differs across engines)
    val wcDen = greatest(wc, lit(1L))
    val stopHits = graft.plans.ArrayExpressions
      .stopwordScores(tokens(col("text")), Seq(stopwords.head._2))(0).cast("long")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long")
    val digits = regexp_count(col("text"), lit("[0-9]")).cast("long")
    val upper = regexp_count(col("text"), lit("[A-Z]")).cast("long")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("char_len"),
      wc.as("word_cnt"),
      // mean token length ×100: chars-in-tokens = len(norm) - (wc-1) spaces
      floor(lit(100.0) * (length(norm) - wc + 1) / wcDen + 0.5).cast("long")
        .as("avg_word_len_x100"),
      punct.as("punct_cnt"),
      digits.as("digit_cnt"),
      upper.as("upper_cnt"),
      floor(lit(10000.0) * stopHits / wcDen + 0.5).cast("long")
        .as("stopword_ratio_x10000"),
      // quality = length-fit (cap at 200 words) × (0.5 + 0.5·stopword density·4 capped)
      qualityX10000Col.as("quality_x10000"))
  }

  /** n-gram diversity (type–token ratio over word shingles) per source —
    * the boilerplate detector: a templated source (product pages, license
    * stubs, mirrored headers) repeats the same n-grams over and over, so
    * distinct/total collapses even when exact/near-dup DOC-level signals
    * stay quiet (every page differs in a few slots). Sits beside
    * [[novelty]] (per-doc, vs the rest of the corpus) as the per-SOURCE
    * aggregate a mixing decision reads.
    *
    * Output: (source, distinct_ngrams, total_ngrams, diversity_ppm). Two
    * map-combinable aggregations over one corpus scan — the (source, hash)
    * pre-aggregate does the heavy dedup before the per-source rollup; hash
    * collisions merge two shingle types (p≈n²·1e-9) identically on both
    * engines. */
  def ngramDiversity(docs: DataFrame, n: Int = 3): DataFrame =
    // tokens materialized as a bound column FIRST (the Dedup.shingleTable
    // posture): explode's inferred size()>0 filter substitutes its child
    // expressions, and an inlined tokenize would re-run the regexp per
    // shingle element inside that filter — measured 15.8 s vs 1-2 s at
    // sf0.1 for this exact query
    docs.select(col("source"), tokens(col("text")).as("toks"))
      .select(col("source"), explode(shinglesFromToks(col("toks"), n)).as("sh"))
      .select(col("source"), charPolyHash(col("sh")).as("h"))
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("distinct_ngrams"),
        sum(col("cnt")).as("total_ngrams"))
      .withColumn("diversity_ppm",
        floor(lit(1000000.0) * col("distinct_ngrams") /
          greatest(col("total_ngrams"), lit(1L)) + 0.5).cast("long"))

  /** Token counting: whitespace tokens, BPE-ish regex tokens (letter runs /
    * digit runs / single symbols), and characters. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      wordCount(col("text")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("chars"))

  /** First BPE merge iteration — the step after [[vocabulary]] in tokenizer
    * training: count adjacent character pairs across the corpus, weighted
    * by word frequency (BPE training counts pairs over the word-frequency
    * table, not the raw stream — a word seen 10⁶ times contributes its
    * pairs 10⁶ times but is processed once). The top pair is the first
    * merge a BPE trainer would pick; the full trainer is this primitive in
    * a driver loop (re-segment, re-count) over the frequency table, whose
    * corpus-sized part never moves again after the first aggregation.
    *
    * Plan shape: explode tokens → word-frequency hash agg (the only
    * corpus-sized shuffle) → bounded pair explode over the vocab (≤ |word|
    * rows per DISTINCT word) → hash agg → top-k. */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame = {
    // Direct explode, NOT explodeTokens: this shape is a single-column
    // explode straight into a distinct-word hash agg — the inferred
    // size()>0 filter's double-tokenize is cheaper than the extra binding
    // projection here (A/B measured 0.45 s direct vs 3.0 s bound at
    // sf0.1; the per-ELEMENT re-run pitfall needs a lambda over the
    // inlined array, which this plan has none of).
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      // guard: sequence(0, -1) would DESCEND, emitting phantom pairs for
      // 1-char words — short words contribute no pairs
      .where(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(0), length(col("w")) - 2)).as("i"))
      .select(col("w").substr(col("i") + 1, lit(2)).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** Iterative BPE training — [[bpePairCounts]] run to completion: `nMerges`
    * rounds of (count adjacent symbol pairs over the frequency-weighted
    * vocab → pick the top pair → merge it greedily left-to-right in every
    * word). Returns the merge table (merge_no, x, y, cnt) — THE artifact a
    * BPE tokenizer ships. The corpus-sized data moves once (the word-
    * frequency aggregation); every round after that runs on the distinct
    * vocab, checkpointed between rounds, with one 1-row argmax collected
    * per round (the k-means-training action pattern).
    *
    * Deterministic cross-engine: integer pair counts, (cnt DESC, x, y)
    * tie-break, and the greedy merge as a sequential left fold over each
    * word's symbols with a separator-encoded string accumulator (ends-with
    * check + trim — the same fold shape DuckDB's `list_reduce` runs, so the
    * oracle reproduces every round bit for bit). Tokens must not contain
    * U+001F (the accumulator separator) — true of any whitespace-tokenized
    * text. */
  def bpeTrain(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val SEP = "\u001F"
    // Direct explode for the same reason as [[bpePairCounts]]: one
    // corpus-sized explode→agg with no per-element lambda; the bound-array
    // form measured 6.7× slower at this shape.
    var vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (k <- 1 to nMerges if !exhausted) {
      val top = vocab
        .where(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("x"),
              element_at(col("syms"), i + 2).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, cnt) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((k.toLong, x, y, cnt))
        val merged = aggregate(col("syms"), lit(""),
          (acc, s) => when(acc.endsWith(SEP + x) && s === y,
            concat(acc.substr(lit(1),
              length(acc) - lit(x.length + 1)), lit(SEP + x + y)))
            .otherwise(concat(acc, lit(SEP), s)))
        vocab = vocab
          .withColumn("syms",
            filter(split(merged, SEP), z => z =!= ""))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("merge_no", "x", "y", "cnt")
  }

  /** Apply a trained merge table: one greedy left-to-right fold per merge,
    * in merge order — exactly how a BPE tokenizer segments at inference.
    * `merges` is [[bpeTrain]]'s output collected to (x, y) pairs (tiny: one
    * row per merge; rides into the plan as literals). Output: per-doc
    * BPE-symbol count — the trained-tokenizer bill for each doc (compare
    * `ta_tokens`' regex proxy). Map-only over the corpus plus one count
    * aggregate; expression depth grows with |merges| (fine for the
    * demonstration scale; a production segmenter with 10⁴ merges would be
    * one codegen'd expression holding the merge table as a reference
    * object, the [[graft.plans.StopwordScoresExpr]] pattern). */
  /** Persist a trained merge table ([[bpeTrain]] output) as the tokenizer
    * artifact — train once per corpus snapshot, segment anywhere from the
    * parquet (the [[Similarity.buildBm25Index]] lifecycle). */
  def saveBpeMerges(merges: DataFrame, dir: String): Unit =
    merges.write.mode("overwrite").parquet(s"$dir/merges")

  /** Load a persisted merge table back into the ordered in-memory form the
    * segmenter compiles into its codegen'd expression. The merge list is
    * vocabulary-bounded (tens of thousands of rows at production vocab
    * sizes) — a driver-side collect of a tokenizer, not of data. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/merges").orderBy(col("merge_no"))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"))).toSeq

  def bpeSegmentCounts(docs: DataFrame,
                       merges: Seq[(String, String)]): DataFrame = {
    val SEP = "\u001F"
    def applyMerge(syms: Column, x: String, y: String): Column =
      filter(split(
        aggregate(syms, lit(""),
          (acc, s) => when(acc.endsWith(SEP + x) && s === y,
            concat(acc.substr(lit(1),
              length(acc) - lit(x.length + 1)), lit(SEP + x + y)))
            .otherwise(concat(acc, lit(SEP), s))),
        SEP), z => z =!= "")
    val seg = merges.foldLeft(split(col("tok"), ""): Column) {
      case (acc, (x, y)) => applyMerge(acc, x, y)
    }
    explodeTokens(docs, "tok", "doc_id")
      .where(col("tok") =!= "")
      .withColumn("syms", seg)
      .groupBy(col("doc_id"))
      .agg(sum(size(col("syms"))).cast("long").as("n_syms"))
  }

  /** [[bpeSegmentCounts]] as ONE codegen'd expression per doc
    * ([[graft.plans.BpeSegmentCountExpr]]): the merge table rides as a
    * referenced object instead of |merges| stacked interpreted folds, and
    * the explode + hash agg disappear — pure map, zero shuffle, constant
    * plan size however large the tokenizer. Same output contract (docs
    * with at least one word; identical counts — the fold-equivalence
    * spec pins it). This is the form a production 10⁴-merge tokenizer
    * needs; the composed sibling stays as the oracle-shaped reference. */
  def bpeSegmentCountsFast(docs: DataFrame,
                           merges: Seq[(String, String)]): DataFrame =
    docs
      .where(wordCount(col("text")) > 0)
      .select(col("doc_id"),
        graft.plans.ArrayExpressions
          .bpeSegmentCount(tokens(col("text")), merges).as("n_syms"))

  /** Tokenizer FERTILITY per source — the multilingual-fairness metric:
    * BPE symbols billed per whitespace word (×10000). A tokenizer trained
    * on one source's distribution bills other sources more symbols per
    * word — those corpora pay more compute per token budget and get less
    * context. Per source: Σ segmented symbols / Σ words, via the
    * codegen'd one-expression segmenter ([[BpeSegmentCountExpr]]).
    *
    * ONE map-only projection: `n_syms`, `ws_words`, and `source` are all
    * derivations of the same row, so they come out of a single pass over
    * the bound token array — no `doc_id` self-join back to the corpus
    * (the round-5 `corpusHealth` defect class; a PlanAuditSpec canary
    * pins the join-free shape). */
  def bpeFertility(docs: DataFrame,
                   merges: Seq[(String, String)]): DataFrame =
    docs
      .where(wordCount(col("text")) > 0)
      .select(col("source"), tokens(col("text")).as("__toks"))
      .select(col("source"),
        graft.plans.ArrayExpressions
          .bpeSegmentCount(col("__toks"), merges).as("n_syms"),
        size(col("__toks")).cast("long").as("ws_words"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_syms")).as("total_syms"),
        sum(col("ws_words")).as("total_words"))
      .withColumn("fertility_x10000",
        floor(lit(10000.0) * col("total_syms") /
          greatest(col("total_words"), lit(1L))).cast("long"))

  /** Robust per-source length-outlier flags — the truncation/glitch
    * detector a scrape-quality review runs: exact nearest-rank MEDIAN and
    * MAD (median absolute deviation) of whitespace-token counts per
    * source, then flag docs with `|tok − med| > k·max(MAD, 1)`. Median/MAD
    * instead of mean/σ because scrape-length distributions are heavy-
    * tailed — one 10⁶-token glitch doc moves a mean beyond usefulness but
    * not a median. All-integer nearest-rank picks (the a11/a15 convention:
    * rank ⌈n/2⌉ by (value, doc_id)), so the flags are bit-reproducible.
    *
    * Plan shape: one map-only projection → two per-source rank windows
    * (median, then deviation median) with the rank targets joined
    * broadcast — sources parallelize; nothing global. */
  def lengthOutliers(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, "k must be positive")
    val base = docs.select(col("doc_id"), col("source"),
      wordCount(col("text")).cast("long").as("tok"))
    val counts = base.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("target", expr("(n + 1) DIV 2"))
    val w1 = Window.partitionBy(col("source")).orderBy(col("tok"), col("doc_id"))
    val med = base
      .withColumn("rn", row_number().over(w1).cast("long"))
      .join(broadcast(counts), "source")
      .where(col("rn") === col("target"))
      .select(col("source"), col("tok").as("med"))
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs(col("tok") - col("med")))
    val w2 = Window.partitionBy(col("source")).orderBy(col("dev"), col("doc_id"))
    val mad = dev
      .withColumn("rn", row_number().over(w2).cast("long"))
      .join(broadcast(counts), "source")
      .where(col("rn") === col("target"))
      .select(col("source"), col("dev").as("mad"))
    dev.join(broadcast(mad), "source")
      .where(col("dev") > lit(k.toLong) * greatest(col("mad"), lit(1L)))
      .select(col("doc_id"), col("source"), col("tok"), col("med"),
        col("mad"), col("dev"))
  }

  /** Per-document top-k salient terms by integer-exact TF-IDF:
    * `score = tf · floor(1e6 · nDocs / df)` — the idf factor is a
    * fixed-point integer (no `log`, whose libm rounding differs across
    * engines), so scores and ranks are bit-identical cross-engine while
    * preserving the tf-idf ordering semantics (rarer term ⇒ larger factor).
    *
    * Plan shape: explode → two hash aggregations (tf per (doc, term), df
    * per term) → equi-join on term → per-doc window top-k. The corpus size
    * rides along as a broadcast one-row aggregate (no driver action). df is
    * the classic skew point at 100 TB (every doc shares stopwords) — the
    * aggregation is map-side combined, and a df cap (drop terms in >X% of
    * docs, i.e. stopwords) is the standard pruning when the term join
    * itself skews. */
  def keywords(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = explodeTokens(docs, "term", "doc_id")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * floor(lit(1000000.0) * col("n_docs") / col("df")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank").cast("long").as("rank"),
        col("score"))
  }

  // PII patterns — RE2-safe (no backreferences or lookarounds), identical
  // semantics under Java regex (Spark) and RE2 (DuckDB). The URL class is
  // an explicit `[^ ]` rather than `\s` (whose char sets differ between the
  // two engines at the margins).
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^ ]+"
  val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4,}"

  /** PII detection + redaction over a text column — the scrub pass every
    * training-data pipeline runs before publishing a corpus: per-doc match
    * counts for emails / URLs / phone numbers, plus the redacted text with
    * typed placeholders. Map-only, codegen'd regex — the same posture as
    * [[quality]]. */
  def piiScan(docs: DataFrame, text: Column): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(text, lit(emailRe)).cast("long").as("email_cnt"),
      regexp_count(text, lit(urlRe)).cast("long").as("url_cnt"),
      regexp_count(text, lit(phoneRe)).cast("long").as("phone_cnt"),
      regexp_replace(
        regexp_replace(
          regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
          lit(urlRe), lit("<URL>")),
        lit(phoneRe), lit("<PHONE>")).as("redacted"))

  /** Document fingerprints: rolling token-sequence hash (order-sensitive),
    * plus min/max 3-gram shingle hashes (winnowing-style content anchors —
    * stable under small edits). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val sh = col("sh")
    val shHashes = transform(sh, s => charPolyHash(s))
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), shinglesFromToks(col("toks"), 3).as("sh"))
      .select(
        col("doc_id"),
        tokenSeqHash(col("toks")).as("fingerprint"),
        when(size(sh) > 0, array_min(shHashes)).otherwise(lit(-1L)).as("min_shingle_hash"),
        when(size(sh) > 0, array_max(shHashes)).otherwise(lit(-1L)).as("max_shingle_hash"))
  }

  /** Composite quality filter — the C4/Gopher-style keep/drop gate: each
    * doc is tested against fixed-point thresholds over the quality and
    * repetition signals, and dropped docs carry the FIRST failing rule as a
    * reason (rules tested in order: word count bounds, mean word length
    * bounds, stopword floor, repetition ceiling). The reason column is what
    * makes a filter auditable at corpus scale — per-reason drop counts are
    * one groupBy away.
    *
    * Plan shape: the signal computation is [[quality]]'s map-only pass plus
    * [[repetition]]'s one agg chain, joined per doc; the verdict itself is
    * a codegen'd CASE. */
  def qualityFilter(docs: DataFrame,
                    minWords: Long = 30, maxWords: Long = 100000,
                    minAvgWordLenX100: Long = 200,
                    maxAvgWordLenX100: Long = 1500,
                    minStopRatioX10000: Long = 200,
                    maxDupBigramX10000: Long = 3000): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("word_cnt"),
      col("avg_word_len_x100"), col("stopword_ratio_x10000"))
    val r = repetition(docs).select(col("doc_id"), col("dup_bigram_ratio_x10000"))
    val reason =
      when(col("word_cnt") < minWords, "too_short")
        .when(col("word_cnt") > maxWords, "too_long")
        .when(col("avg_word_len_x100") < minAvgWordLenX100, "words_too_short")
        .when(col("avg_word_len_x100") > maxAvgWordLenX100, "words_too_long")
        .when(col("stopword_ratio_x10000") < minStopRatioX10000, "low_stopwords")
        .when(col("dup_bigram_ratio_x10000") > maxDupBigramX10000, "repetitive")
        .otherwise("")
    q.join(r, Seq("doc_id"))
      .withColumn("reason", reason)
      .withColumn("keep", when(col("reason") === "", 1L).otherwise(0L))
      .select(col("doc_id"), col("keep"), col("reason"), col("word_cnt"),
        col("avg_word_len_x100"), col("stopword_ratio_x10000"),
        col("dup_bigram_ratio_x10000"))
  }

  /** Ablation report over [[qualityFilter]]'s rules — what a filter-tuning
    * pass reads before touching a threshold. Per rule: how many docs
    * VIOLATE it at all (marginal), how many it is the SOLE blocker for
    * (the docs this rule alone costs the corpus — relax it and exactly
    * these come back), and how many report it as their first-match
    * `reason` (the [[qualityFilter]] attribution, order-dependent).
    * `sole_blockers` is the number that matters: a rule with many
    * violations but few sole-blocks is redundant with its neighbors.
    *
    * Plan shape: the same one-pass signal derivation as [[qualityFilter]],
    * then EIGHTEEN conditional sums in ONE corpus aggregate (3 counters ×
    * 6 rules) reshaped from the single result row into 6 rule rows — no
    * per-rule corpus explode, no second scan; constant-size output however
    * large the corpus. */
  def gateAblation(docs: DataFrame,
                   minWords: Long = 30, maxWords: Long = 100000,
                   minAvgWordLenX100: Long = 200,
                   maxAvgWordLenX100: Long = 1500,
                   minStopRatioX10000: Long = 200,
                   maxDupBigramX10000: Long = 3000): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("word_cnt"),
      col("avg_word_len_x100"), col("stopword_ratio_x10000"))
    val r = repetition(docs).select(col("doc_id"), col("dup_bigram_ratio_x10000"))
    val flags: Seq[(String, Column)] = Seq(
      "too_short" -> (col("word_cnt") < minWords),
      "too_long" -> (col("word_cnt") > maxWords),
      "words_too_short" -> (col("avg_word_len_x100") < minAvgWordLenX100),
      "words_too_long" -> (col("avg_word_len_x100") > maxAvgWordLenX100),
      "low_stopwords" -> (col("stopword_ratio_x10000") < minStopRatioX10000),
      "repetitive" -> (col("dup_bigram_ratio_x10000") > maxDupBigramX10000))
    val nViol = flags.map { case (_, c) => c.cast("long") }.reduce(_ + _)
    val firstReason = flags.foldRight(lit("")) { case ((name, c), acc) =>
      when(c, name).otherwise(acc)
    }
    val sums = flags.flatMap { case (name, c) => Seq(
      sum(c.cast("long")).as(s"v__$name"),
      sum((c && col("n_viol") === 1L).cast("long")).as(s"s__$name"),
      sum((col("first_reason") === name).cast("long")).as(s"f__$name"))
    }
    val one = q.join(r, Seq("doc_id"))
      .withColumn("n_viol", nViol)
      .withColumn("first_reason", firstReason)
      .agg(sums.head, sums.tail: _*)
    one.select(explode(array(flags.map { case (name, _) =>
        struct(lit(name).as("rule"),
          col(s"v__$name").as("violations"),
          col(s"s__$name").as("sole_blockers"),
          col(s"f__$name").as("first_reason_cnt"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.sole_blockers").as("sole_blockers"),
        col("r.first_reason_cnt").as("first_reason_cnt"))
  }

  /** Per-source quality percentile gate — the RELATIVE form of corpus
    * filtering: keep each source's top `keepTopPct`% of docs by
    * [[quality]] score, instead of one absolute threshold for every source
    * ([[qualityFilter]]). Sources differ systematically (a curated wiki's
    * floor is a crawl's ceiling), so production filters cut per-source
    * quantiles; this is that operator.
    *
    * The threshold per source is the nearest-rank `(100-keepTopPct)`th
    * percentile of the quality score (ordered by `(quality, doc_id)` —
    * integer arithmetic, bit-identical cross-engine); kept = docs with
    * `quality >= threshold`, so ties at the cut survive (≥ keepTopPct% kept).
    *
    * Scale posture: thresholds are a tiny per-source table (the
    * [[Summaries.lengthPercentiles]] ranked-join shape) broadcast back for
    * the filter; the per-source sort is the exact-percentile cost — at
    * 100 TB swap the threshold computation for `approx_percentile` (the
    * `a15b` pattern) and keep the same broadcast-filter join. Output:
    * (doc_id, source, quality_x10000, q_threshold), kept docs only. */
  def qualityPercentileGate(docs: DataFrame, keepTopPct: Int): DataFrame =
    gateAgainstThresholds(docs, qualityThresholds(docs, keepTopPct))

  /** The per-source threshold table behind [[qualityPercentileGate]]:
    * (source, q_threshold). A deployment computes this once on a reference
    * corpus, persists it, and gates any stream/batch against it
    * ([[gateAgainstThresholds]]) — the quality sibling of the persisted
    * decontamination shingle universe. */
  def qualityThresholds(docs: DataFrame, keepTopPct: Int): DataFrame = {
    require(keepTopPct >= 1 && keepTopPct <= 100,
      s"keepTopPct ($keepTopPct) is a percentage in [1, 100]")
    val base = docs.select(col("doc_id"), col("source"))
      .join(quality(docs).select(col("doc_id"), col("quality_x10000")), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("quality_x10000"), col("doc_id"))
    val ranked = base.withColumn("rn", row_number().over(w).cast("long"))
    val targets = base.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", greatest(
        floor((lit(100L - keepTopPct) * col("cnt") + 99L) / 100L), lit(1L))
        .cast("long"))
      .select(col("source"), col("rn"))
    ranked.join(broadcast(targets), Seq("source", "rn"))
      .select(col("source"), col("quality_x10000").as("q_threshold"))
  }

  /** Filter docs against an already-computed per-source threshold table —
    * map-only plus one broadcast join, the shape that gates a 100 TB scan
    * (or each streaming micro-batch) without re-deriving percentiles. */
  def gateAgainstThresholds(docs: DataFrame, thresholds: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(quality(docs).select(col("doc_id"), col("quality_x10000")), Seq("doc_id"))
      .join(broadcast(thresholds), Seq("source"))
      .where(col("quality_x10000") >= col("q_threshold"))
      .select(col("doc_id"), col("source"), col("quality_x10000"),
        col("q_threshold"))

  /** Corpus vocabulary extraction — the tokenizer-training precursor: the
    * top-k terms by occurrence count, ties broken lexicographically.
    * Plan shape: explode → map-side-combinable hash agg →
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge on the
    * driver) — no global sort, the only corpus-wide top-k form that
    * survives 100 TB. */
  def vocabulary(docs: DataFrame, k: Int): DataFrame =
    explodeTokens(docs, "term")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k)

  /** Adjacent-token pairs of a token-array column as (x, y) structs —
    * shared by [[bigramModel]] / [[lmScore]] / [[repetition]]-style passes.
    * Docs with < 2 tokens contribute nothing. */
  private[operators] def bigramStructs(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<x:string,y:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("x"),
          element_at(toks, i + 2).as("y"))))

  /** Train a bigram language model over the corpus: conditional probability
    * `P(y|x) = cnt(x,y) / Σ_z cnt(x,z)` per adjacent token pair, fixed-point
    * ×1e6 (`floor(1e6·cnt/ctx)` — IEEE double division of exact integers,
    * bit-identical cross-engine; no libm `log`). This is the model table a
    * CCNet-style LM quality filter persists and scores corpora against —
    * the LM sibling of [[qualityThresholds]]' persisted threshold table.
    *
    * Plan shape: bigram explode → ONE corpus-sized map-side-combinable hash
    * agg; the context marginal and probability derive from the model table
    * itself (vocab²-bounded — tiny next to the corpus). */
  def bigramModel(docs: DataFrame): DataFrame = {
    val big = docs.select(tokens(col("text")).as("toks"))
      .select(explode(bigramStructs(col("toks"))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("cnt"))
    val ctx = big.groupBy(col("x")).agg(sum(col("cnt")).as("ctx_cnt"))
    big.join(ctx, Seq("x"))
      .withColumn("p_x1e6",
        floor(lit(1000000.0) * col("cnt") / col("ctx_cnt")).cast("long"))
      .select(col("x"), col("y"), col("cnt"), col("ctx_cnt"), col("p_x1e6"))
  }

  /** Score each document against a [[bigramModel]]: mean fixed-point bigram
    * probability over the doc's bigram occurrences (higher = more
    * model-typical text), plus the most surprising bigram's probability —
    * the fluency/quality signal an LM filter thresholds on (fixed-point
    * mean probability instead of log-perplexity, the documented
    * cross-engine-exact deviation; both order docs identically for a fixed
    * model when probabilities are well separated). Bigrams absent from the
    * model score 0 (the unseen floor). Docs with < 2 tokens report
    * `n_bigrams = 0` and `-1` sentinels.
    *
    * Plan shape: one bigram explode + per-(doc,x,y) hash agg → equi-join to
    * the model (vocab²-bounded ⇒ broadcastable; at 100 TB vocabs, key the
    * join on a 64-bit pair hash) → per-doc agg → left join back to the doc
    * list so short docs still report. */
  def lmScore(docs: DataFrame, model: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigramStructs(col("toks"))).as("p"))
      .groupBy(col("doc_id"), col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("tf"))
    val p = coalesce(col("p_x1e6"), lit(0L))
    val perDoc = occ
      .join(model.select(col("x"), col("y"), col("p_x1e6")), Seq("x", "y"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * p).as("sump"),
        min(p).as("min_p"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(floor(col("sump").cast("double") / col("n_bigrams")).cast("long"),
          lit(-1L)).as("lm_score_x1e6"),
        coalesce(col("min_p"), lit(-1L)).as("min_p_x1e6"))
  }

  /** CCNet-style per-language LM buckets (after Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * score every doc against the corpus [[bigramModel]] and cut each
    * LANGUAGE's score distribution into tertiles — `head` (most
    * model-typical third), `middle`, `tail`. CCNet's downstream policy
    * keeps head+middle for pretraining and routes tail to re-filtering;
    * the bucket column is that policy's input. Per-language (not global)
    * cuts are the operator's point: a global threshold under-selects
    * whichever languages the LM models worse.
    *
    * Tertile = `ntile(3)` over (score DESC, doc_id) — the deterministic
    * total order makes the assignment reproducible and oracle-exact
    * (SQL-standard ntile distributes remainders to the leading buckets in
    * both engines). Docs too short to score (the `-1` sentinel) sort last
    * and land in `tail`, which is also the right policy call. Plan shape:
    * the [[lmScore]] passes + one per-language window sort — the same
    * posture as [[qualityPercentileGate]]; at 100 TB swap the exact
    * window for approx-quantile thresholds per language (the `a15b`
    * sketch pattern) and the assignment becomes a map-only comparison. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = lmScore(docs, bigramModel(docs))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lm_score_x1e6").desc, col("doc_id"))
    scored
      .withColumn("tertile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("lm_score_x1e6"),
        when(col("tertile") === 1, "head")
          .when(col("tertile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** PMI collocation mining: the top-k adjacent-token pairs whose observed
    * co-occurrence most exceeds what their marginals predict —
    * `PMI(x,y) = log P(x,y) / (P(x)·P(y))`. The canonical multiword-
    * expression detector ("new york", "machine learning") a tokenizer or
    * phrase-merging pass reads before training. Ranked by the fixed-point
    * LIKELIHOOD RATIO `⌊10⁴ · cnt(x,y)·N / (c(x)·c(y))⌋` instead of its
    * log — the same ordering (log is monotone), zero transcendental ops,
    * bit-identical cross-engine (the [[Mixing.importanceWeights]]
    * deviation pattern). Marginals are positional (`c(x)` = pairs with x
    * on the left, `c(y)` = y on the right), the standard bigram-PMI
    * convention. `minCount` floors away the unstable low-frequency tail
    * (PMI's known pathology: a pair seen once between two rare words
    * maxes the ratio).
    *
    * Plan shape: ONE corpus-sized bigram explode + hash agg
    * (`localCheckpoint` pins it — vocab²-bounded, tiny); marginals and the
    * one-row total derive from that table, rejoined vocab²-to-vocab with
    * the one-row total riding along broadcast; top-k runs as
    * TakeOrderedAndProject. Exactness bound: `10⁴·cnt·N < 2⁵³` holds to
    * ~10⁹-token aggregates per pair; past that, swap the floor-double for
    * BIGINT `div` (the [[Mixing.importanceWeights]] posture). */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
                      k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val big = docs.select(tokens(col("text")).as("toks"))
      .select(explode(bigramStructs(col("toks"))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // corpus explode runs ONCE; 3 consumers below
    val cx = big.groupBy(col("x")).agg(sum(col("cnt")).as("cx"))
    val cy = big.groupBy(col("y")).agg(sum(col("cnt")).as("cy"))
    val nTot = big.agg(sum(col("cnt")).as("n_big"))
    big.where(col("cnt") >= minCount)
      .join(cx, Seq("x")).join(cy, Seq("y"))
      .crossJoin(broadcast(nTot))
      .select(col("x"), col("y"), col("cnt"), col("cx"), col("cy"),
        floor(lit(10000.0) * col("cnt") * col("n_big") /
          (col("cx") * col("cy"))).cast("long").as("pmi_ratio_x10000"))
      .orderBy(col("pmi_ratio_x10000").desc, col("x"), col("y"))
      .limit(k)
  }

  /** Blocklist scrub — the wordlist-based content gate every production
    * curation pipeline runs (C4 dropped any page containing a "List of
    * Dirty, Naughty…" term; refined pipelines count hits and threshold).
    * Per doc: total blocklist-token OCCURRENCES, the distinct matched
    * terms (sorted, comma-joined — the audit trail), and a three-way
    * verdict: `keep` (no hits), `flag` (1..flagMax — route to review),
    * `drop` (saturated). Map-only over the corpus — the blocklist rides
    * into the plan as a literal array (at real blocklist sizes, a
    * broadcast join against the exploded tokens or an Aho-Corasick-style
    * codegen'd expression takes over; the plumbing is identical). Token
    * array is bound ONCE before the lambdas (the [[ngramDiversity]]
    * posture). */
  def blocklistScrub(docs: DataFrame, terms: Seq[String],
                     flagMax: Int = 3): DataFrame = {
    require(terms.nonEmpty, "blocklist must be non-empty")
    require(flagMax >= 1, "flagMax must be positive")
    val tl = array(terms.distinct.sorted.map(lit): _*)
    docs.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        size(filter(col("toks"), t => array_contains(tl, t)))
          .cast("long").as("n_hits"),
        concat_ws(",", sort_array(array_distinct(
          filter(col("toks"), t => array_contains(tl, t))))).as("matched"))
      .withColumn("verdict",
        when(col("n_hits") === 0, "keep")
          .when(col("n_hits") <= flagMax.toLong, "flag")
          .otherwise("drop"))
  }

  /** [[blocklistScrub]] with the blocklist as a TABLE — the form the
    * scaladoc there promises for real blocklist sizes (10⁴–10⁶ terms,
    * where a literal in-plan array stops being a plan): one token explode
    * joined against the broadcast term table, then the per-doc rollup and
    * the same keep/flag/drop verdict. Output is row-identical to the
    * literal-array form for the same terms (the spec asserts it); at even
    * larger blocklists the broadcast becomes a shuffle join and nothing
    * else changes. */
  def blocklistScrubJoin(docs: DataFrame, blocklist: DataFrame,
                         flagMax: Int = 3): DataFrame = {
    require(flagMax >= 1, "flagMax must be positive")
    val hits = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .join(broadcast(blocklist.select(col("term"))), col("t") === col("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        concat_ws(",", sort_array(collect_set(col("t")))).as("matched"))
    docs.select(col("doc_id"), col("source"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("matched"), lit("")).as("matched"))
      .withColumn("verdict",
        when(col("n_hits") === 0, "keep")
          .when(col("n_hits") <= flagMax.toLong, "flag")
          .otherwise("drop"))
  }

  /** Count-Min-sketch term-frequency estimates, probed at the exact top-k
    * vocabulary: the frequency member of the sketch trio (HLL distinct →
    * `a9`, KLL-ish percentiles → `a15b`, CMS counts → here). At 100 TB the
    * exact vocabulary aggregate is itself huge; the sketch build moves one
    * d×w counter buffer per partition ([[graft.plans.CmsAgg]]) and any
    * term's estimate is d probes of the broadcast sketch. Counter merges
    * are elementwise sums, so unlike Misra-Gries summaries the estimates
    * are partitioning-independent — and therefore oracle-EXACT (DuckDB
    * groups occurrences by the same salted-hash buckets relationally).
    * `est_cnt >= exact_cnt` always; overcount = bucket collisions. */
  def cmsTermCounts(docs: DataFrame, k: Int = 20,
                    d: Int = 4, w: Int = 1024): DataFrame = {
    val toks = explodeTokens(docs, "term")
      .where(col("term") =!= "")
    val sketch = toks.agg(graft.plans.CmsAgg.sketch(col("term"), d, w).as("sk"))
    val est = array_min(transform(sequence(lit(0), lit(d - 1)),
      i => element_at(col("sk"),
        (i * w + pmod(charPolyHash(
          concat(lit("cms"), i.cast("string"), lit(":"), col("term"))),
          lit(w.toLong)) + 1L).cast("int"))))
    vocabulary(docs, k)
      .crossJoin(broadcast(sketch))
      .select(col("term"), col("cnt").as("exact_cnt"), est.as("est_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  /** Repetition signals — the repeated-n-gram quality filter every LLM
    * curation pipeline runs (machine-generated/boilerplate text repeats
    * itself; see the Gopher-style repetition rules): per doc,
    *  - `dup_bigram_ratio`  = fraction of bigram OCCURRENCES that are
    *    repeats of an earlier bigram (1 − distinct/total), and
    *  - `top_bigram_ratio`  = fraction taken by the single most frequent
    *    bigram.
    * Both fixed-point ×10000. Docs with < 2 tokens report 0s.
    *
    * Plan shape: one bigram explode → one map-side-combinable hash agg per
    * (doc, bigram) → one per-doc agg deriving ALL THREE counts (total =
    * Σcnt, distinct = rows, top = max cnt), rejoined to the doc-id list so
    * sub-2-token docs report zeros. Everything occurrence-shaped lives in
    * the aggregation; no array is referenced twice (a multi-referenced
    * array column gets its builder transform re-inlined per use by
    * CollapseProject — measured 8× slower on this query's first,
    * array-side formulation). */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
    val perDoc = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"), count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left") // short docs have no bigram rows
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        floor(lit(10000.0) * (col("n_bigrams") - col("n_distinct")) /
          greatest(col("n_bigrams"), lit(1L)) + 0.5).cast("long")
          .as("dup_bigram_ratio_x10000"),
        floor(lit(10000.0) * col("top_cnt") /
          greatest(col("n_bigrams"), lit(1L)) + 0.5).cast("long")
          .as("top_bigram_ratio_x10000"))
  }

  /** Per-doc n-gram novelty: what fraction of a doc's distinct n-gram
    * shingles appear NOWHERE else in the corpus (df = 1)? Low novelty means
    * the doc is assembled from phrases the corpus already has — boilerplate,
    * mirrors, templated text — and is the doc-level memorization-risk signal
    * training-data audits report next to dup rate. Complements pairwise
    * dedup: a doc can be 30% novel without having any single near-dup
    * partner above a Jaccard threshold.
    *
    * Docs too short to have an n-gram (< n tokens) report `-1` novelty
    * (unknown, not perfectly-novel).
    *
    * Plan shape: the [[Dedup.shingleTable]] explode keyed by the 64-bit
    * char-poly hash (O(1) compares, ~3× smaller exchange than the shingle
    * string — the `dedup_ngram` trick), one df hash agg on `h`, one h
    * equi-join back, one per-doc agg, one slim (doc_id)-only left join so
    * shingle-less docs still report. A hash collision merges two shingles'
    * df on both engines identically, so oracle parity is unaffected. */
  /** Quality-calibration report: per (source, within-source quality
    * quartile), doc count, exact-duplicate burden, quality mass, and
    * character volume — the sanity check that the quality score actually
    * separates the corpus (low quartiles should carry the dup burden; a
    * flat dup rate across quartiles means the score is noise for this
    * source). Quartiles are within-source (`ntile(4)` over the per-source
    * (quality, id) order — relative filtering, like
    * [[qualityPercentileGate]], because sources differ systematically).
    *
    * Plan shape: the [[Dedup.exactDuplicates]] norm-hash window + one
    * quality map pass + one per-source ntile window + one hash agg. */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality_x10000"))
    val dup = Dedup.exactDuplicates(docs)
      .select(col("doc_id"), (col("n_copies") > 1).cast("long").as("is_dup"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_x10000"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(q, Seq("doc_id")).join(dup, Seq("doc_id"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("source"), col("quartile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup_docs"),
        sum(col("quality_x10000")).as("sum_quality_x10000"),
        sum(col("n_chars")).as("sum_chars"))
  }

  /** Misra-Gries heavy hitters over the corpus vocabulary: WHICH terms are
    * frequent, in one pass and O(k) memory per partition — the
    * candidate-finding sibling of the CMS count estimator
    * ([[cmsTermCounts]]); see [[graft.plans.MgAgg]] for the guarantee. The
    * survivor SET below the N/(k+1) frequency line is merge-order
    * dependent, so the registered query is rows-only and the guarantee
    * specs are the gate. */
  def mgHeavyHitters(docs: DataFrame, k: Int = 32): DataFrame =
    explodeTokens(docs, "term")
      .where(col("term") =!= "")
      .agg(graft.plans.MgAgg.summary(col("term"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e").getField("term").as("term"),
        col("e").getField("cnt").as("est_cnt"))

  /** TextRank (Mihalcea & Tarau 2004): PageRank over the word co-occurrence
    * graph — the graph-centrality sibling of TF-IDF keyword ranking
    * ([[keywords]]). A term matters not because it is frequent but because
    * it co-occurs with other terms that matter; on a corpus it surfaces the
    * load-bearing vocabulary the way raw counts can't (a rare term glued to
    * hub terms outranks a frequent-but-peripheral one).
    *
    * Graph: nodes = the top-`vocabCap` terms by (count DESC, term); edges =
    * undirected token adjacencies between kept terms, weighted by
    * occurrence count. `iters` damped-PageRank rounds, d = 0.85, in FIXED-
    * POINT integer arithmetic (rank ×1e6; per-edge contribution
    * `(rank*w) DIV wdeg`, update `150000 + (85*Σ) DIV 100`) so the fixpoint
    * is bit-identical cross-engine — the DuckDB oracle replays the same
    * integer recurrence with unrolled CTEs. Because the graph is
    * undirected, every node has in-edges and the iteration never drops
    * nodes; isolated vocab terms (no kept-vocab neighbor) have no rank.
    *
    * Plan shape: corpus-sized work is ONE adjacency explode + two hash
    * aggs (vocab count, edge count); the iteration runs on the vocab-bounded
    * edge list (≤ vocabCap² but Zipf-sparse in practice) — per round one
    * equi-join + one map-combinable sum, `localCheckpoint` lineage cuts,
    * exactly the [[Dedup.dedupClusters]] iterative shape. At 100 TB the
    * corpus passes dominate and the graph stays vocab-bounded — the reason
    * TextRank scales where pairwise doc similarity doesn't. */
  def textRank(docs: DataFrame, vocabCap: Int = 500, iters: Int = 10,
               k: Int = 50): DataFrame = {
    // adjacent-token pairs (occurrences, not distinct), self-loops dropped
    val toksCol = col("toks")
    val adj = when(size(toksCol) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(0), size(toksCol) - 2),
        i => struct(element_at(toksCol, i + 1).as("a"),
          element_at(toksCol, i + 2).as("b"))))
    val pairs = docs.select(tokens(col("text")).as("toks"))
      .select(explode(adj).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    // vocab restriction: top-V terms by (cnt DESC, term) — deterministic cut
    val vocab = explodeTokens(docs, "term")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabCap)
      .select(col("term"))
    // canonical undirected edges between kept terms, then both directions.
    // Materialized once: the union below reads canon twice, and each read
    // would otherwise re-run the corpus adjacency explode + BOTH vocab
    // semi-joins (the vocab subtree is itself a corpus-scale aggregate —
    // its two semi-join uses ride inside canon)
    val canon = pairs
      .join(vocab.withColumnRenamed("term", "a"), Seq("a"), "left_semi")
      .join(vocab.withColumnRenamed("term", "b"), Seq("b"), "left_semi")
      .select(least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val edges = canon.select(col("x").as("src"), col("y").as("dst"), col("w"))
      .unionByName(canon.select(col("y").as("src"), col("x").as("dst"), col("w")))
    Graphs.graphRank(edges, iters)
      .orderBy(col("rank_x1e6").desc, col("node")).limit(k)
      .select(col("node").as("term"), col("rank_x1e6"))
  }

  def novelty(docs: DataFrame, n: Int = 8): DataFrame = {
    // materialized once: the hashed shingle table feeds the df aggregate
    // AND the per-doc join side — the lshCandidateEval rule
    val sh = Dedup.shingleTable(docs, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
      .localCheckpoint()
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val perDoc = sh.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("unique_shingles"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left") // short docs have no shingle rows
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("unique_shingles"), lit(0L)).as("unique_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("unique_shingles"),
        when(col("n_shingles") === 0L, lit(-1L))
          .otherwise(floor(lit(1000000.0) * col("unique_shingles") /
            col("n_shingles")).cast("long"))
          .as("novelty_x1e6"))
  }

  /** Per-source unigram Gini impurity — the token-distribution
    * CONCENTRATION signal ([[ngramDiversity]] measures type–token breadth;
    * this measures how evenly the mass spreads over the types): `1 − Σc²/N²`
    * over per-source token counts, ×1e6. A templated source whose tokens
    * concentrate on a few terms scores low even when its type count looks
    * healthy — the entropy-style signal computed with pure rational
    * arithmetic (no libm `log`, whose last-ulp rounding differs across
    * engines; both factors are exact int64 ratios pushed through one IEEE
    * double division, bit-identical cross-engine).
    *
    * Plan shape: direct explode → (source, term) map-side-combinable hash
    * agg → per-source rollup of (types, N, Σc²). Exact int64 up to ~3×10⁹
    * tokens per source (N² headroom); past that the rollup switches its
    * squares to doubles — the ORDERING the gate reads is unaffected. */
  def tokenGini(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("source"), col("n_terms"), col("n_tokens"),
        floor(lit(1000000.0) *
            (col("n_tokens") * col("n_tokens") - col("s2")).cast("double") /
            (col("n_tokens") * col("n_tokens")).cast("double") + 0.5)
          .cast("long").as("gini_ppm"))

  /** Rank–frequency readout at power-of-two ranks (1, 2, 4, … 2^maxExp) —
    * the Zipf-naturalness instrument: natural language shows freq ∝ 1/rank
    * (the log-spaced readout makes the slope readable from a dozen rows);
    * machine-generated or templated corpora flatten or cliff. `ratio_ppm`
    * is each rank's frequency relative to rank 1 — on a Zipfian corpus it
    * halves per row. `coverage_ppm` is the CUMULATIVE share of all token
    * occurrences covered by the vocabulary up to that rank — the
    * vocab-sizing curve a tokenizer-budget decision reads ("the top 2^k
    * terms cover X% of the corpus").
    *
    * Plan shape: explode → vocab hash agg (checkpointed once, consumed by
    * the top-k and the one-row total) → TakeOrderedAndProject top-2^maxExp
    * (per-partition heaps + a driver merge, no global sort) → the rank +
    * running-sum window runs over that k-row result only. Exact integers
    * throughout. */
  def zipfRanks(docs: DataFrame, maxExp: Int = 10): DataFrame = {
    require(maxExp >= 0 && maxExp <= 20, "maxExp out of range")
    val k = 1 << maxExp
    val vocabAll = docs.select(explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // consumed twice: top-k + the one-row total
    val top = vocabAll.orderBy(col("cnt").desc, col("w")).limit(k)
    val w2 = Window.orderBy(col("cnt").desc, col("w"))
    val ranked = top
      .withColumn("rank", row_number().over(w2).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val powers = (0 to maxExp).map(e => 1L << e)
    val stats = vocabAll.agg(sum(col("cnt")).as("total_cnt"))
      .crossJoin(ranked.where(col("rank") === 1L).select(col("cnt").as("top_cnt")))
    ranked.where(col("rank").isin(powers: _*))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("w").as("term"), col("cnt"),
        floor(lit(1000000.0) * col("cnt") / col("top_cnt")).cast("long")
          .as("ratio_ppm"),
        floor(lit(1000000.0) * col("cum_cnt") / col("total_cnt")).cast("long")
          .as("coverage_ppm"))
  }

  /** WordPiece-style substring vocabulary — the OTHER tokenizer-training
    * family next to [[bpeTrain]]'s merge learning: score every substring
    * (length ≤ `maxPieceLen`) of every distinct word by the total corpus
    * occurrences of words containing it, keep the top `k` (ties
    * lexicographic). This is the frequency-scored single-pass construction
    * (the published WordPiece/unigram trainers iterate a likelihood on top;
    * the candidate generation and corpus accounting are exactly this).
    *
    * Plan shape: ONE corpus-sized explode → word-frequency hash agg (the
    * only corpus shuffle — the [[bpePairCounts]] posture); the substring
    * explode is bounded by |word|·maxPieceLen rows per DISTINCT word, then
    * a vocab-bounded hash agg and a TakeOrderedAndProject top-k. */
  def wordpieceVocab(docs: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame = {
    require(k >= 1 && maxPieceLen >= 1, "k and maxPieceLen must be positive")
    val words = docs.select(explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("s"))
      .select(col("w"), col("freq"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("s") + 1))).as("l"))
      .select(col("w").substr(col("s"), col("l")).as("term"), col("freq"))
      .groupBy(col("term")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k)
  }

  /** Greedy longest-match piece counts per DISTINCT word against a
    * [[wordpieceVocab]] vocabulary — WordPiece inference: at each position
    * take the longest vocab piece (≤ `maxPieceLen`) prefixing the
    * remainder, else bill one unknown character and advance 1. Returns
    * (w, pieces).
    *
    * The loop runs on the distinct-word table ONLY (the corpus never
    * re-enters): each round explodes ≤ maxPieceLen candidate prefixes per
    * still-active word, resolves them against the broadcast vocabulary, and
    * advances every active word at least one character — so rounds ≤ the
    * longest word (computed once, the only extra action), each round
    * checkpointed ([[bpeTrain]]'s lineage discipline). Deterministic:
    * greedy + an exact tie-free vocabulary. */
  def wordpieceSegmentWords(words0: DataFrame, vocab: DataFrame,
                            maxPieceLen: Int = 4): DataFrame = {
    val terms = vocab.select(col("term"))
    val maxLen = Option(words0.agg(max(length(col("w")))).head().get(0))
      .map(_.asInstanceOf[Int]).getOrElse(0)
    var state = words0.select(col("w"), lit(0L).as("pos"),
        lit(0L).as("pieces"), lit(0L).as("unknowns"))
      .localCheckpoint()
    for (_ <- 1 to maxLen) {
      val active = state.where(col("pos") < length(col("w")))
      val matched = active
        .select(col("w"), col("pos"), col("pieces"), col("unknowns"),
          explode(sequence(lit(1),
            least(lit(maxPieceLen), length(col("w")) - col("pos")))).as("l"))
        .select(col("w"), col("pos"), col("pieces"), col("unknowns"), col("l"),
          col("w").substr((col("pos") + 1L).cast("int"), col("l")).as("piece"))
        .join(broadcast(terms), col("piece") === col("term"))
        .groupBy(col("w"), col("pos"), col("pieces"), col("unknowns"))
        .agg(max(col("l")).cast("long").as("step"))
      val stepped = active
        .join(matched, Seq("w", "pos", "pieces", "unknowns"), "left")
        .select(col("w"), (col("pos") + coalesce(col("step"), lit(1L))).as("pos"),
          (col("pieces") + 1L).as("pieces"),
          (col("unknowns") +
            when(col("step").isNull, 1L).otherwise(0L)).as("unknowns"))
      state = stepped
        .unionByName(state.where(col("pos") >= length(col("w"))))
        .localCheckpoint()
    }
    state.select(col("w"), col("pieces"), col("unknowns"))
  }

  /** Tokenizer fertility per source under the WordPiece greedy segmenter —
    * the [[bpeFertility]] twin for the substring-vocabulary family, and the
    * A/B a tokenizer bake-off reads: pieces billed per whitespace word
    * (×10000) per source, for the same corpus under two tokenizer designs.
    *
    * The segmentation loop runs on distinct words ([[wordpieceSegmentWords]]);
    * the corpus is billed through a (source, word)-count join against that
    * vocab-bounded piece table — the "segment the vocab, bill the corpus"
    * posture that never re-segments an occurrence. */
  def wordpieceFertility(docs: DataFrame, k: Int = 200,
                         maxPieceLen: Int = 4): DataFrame =
    wordpieceFertilityFrom(docs, wordpieceVocab(docs, k, maxPieceLen),
      maxPieceLen)

  /** [[wordpieceFertility]] against an already-built vocabulary — the
    * consume side of the persisted-vocab lifecycle ([[saveWordpieceVocab]] /
    * [[loadWordpieceVocab]]): train the vocabulary once per corpus
    * snapshot, bill any corpus from the parquet artifact (the
    * [[saveBpeMerges]] pattern). */
  def wordpieceFertilityFrom(docs: DataFrame, vocab: DataFrame,
                             maxPieceLen: Int = 4): DataFrame = {
    val srcWords = docs
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint() // consumed twice: distinct words + the billing join
    val words = srcWords.groupBy(col("w")).agg(sum(col("freq")).as("freq"))
    val pieces = wordpieceSegmentWords(words.select(col("w")), vocab, maxPieceLen)
    srcWords.join(pieces, Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("freq")).as("total_words"),
        sum(col("freq") * col("pieces")).as("total_pieces"),
        sum(col("freq") * col("unknowns")).as("total_unknowns"))
      .withColumn("fertility_x10000",
        floor(lit(10000.0) * col("total_pieces") /
          greatest(col("total_words"), lit(1L))).cast("long"))
      // tokenizer COVERAGE: fraction of billed pieces that fell through the
      // vocabulary to the unknown-char fallback — the OOV-rate column a
      // vocab-size decision reads (too-small k shows up here first)
      .withColumn("oov_ppm",
        floor(lit(1000000.0) * col("total_unknowns") /
          greatest(col("total_pieces"), lit(1L))).cast("long"))
  }

  /** Per-document WordPiece piece counts — [[bpeSegmentCounts]]' twin for
    * the substring-vocabulary family: each doc's billed pieces (and unknown
    * pieces) under the greedy longest-match segmenter. Segmentation still
    * runs on DISTINCT words only; the per-doc bill is the token explode
    * joined against the vocab-bounded piece table (broadcastable at any
    * corpus size — it is one row per distinct word). Docs with no words
    * report zero rows upstream and are re-attached with 0s. */
  def wordpieceSegmentCounts(docs: DataFrame, vocab: DataFrame,
                             maxPieceLen: Int = 4): DataFrame = {
    val docToks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
    val words = docToks.select(col("w")).distinct()
    val pieces = wordpieceSegmentWords(words, vocab, maxPieceLen)
    val billed = docToks.join(broadcast(pieces), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("pieces")).as("n_pieces"),
        sum(col("unknowns")).as("n_unknowns"))
    docs.select(col("doc_id"))
      .join(billed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unknowns"), lit(0L)).as("n_unknowns"))
  }

  /** Persist a [[wordpieceVocab]] vocabulary as the tokenizer artifact —
    * train once per corpus snapshot, segment anywhere from the parquet
    * (the [[saveBpeMerges]] lifecycle for the WordPiece family). */
  def saveWordpieceVocab(vocab: DataFrame, dir: String): Unit =
    vocab.write.mode("overwrite").parquet(s"$dir/wp_vocab")

  /** Load a persisted WordPiece vocabulary back into the (term, cnt) shape
    * the segmenter's broadcast resolve consumes. */
  def loadWordpieceVocab(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame =
    spark.read.parquet(s"$dir/wp_vocab")

  /** Viterbi piece/unknown bill per DISTINCT word — the THIRD tokenizer
    * family next to [[bpeTrain]] (merge learning) and
    * [[wordpieceSegmentWords]] (greedy longest-match): unigram-LM OPTIMAL
    * decoding against the same [[wordpieceVocab]] pieces, via the
    * codegen'd DP ([[graft.plans.ViterbiSegmentExpr]] — min pieces,
    * tie-break min unknowns, exact integer scoring). Where greedy commits
    * to the longest prefix and can strand the remainder in unknowns, the
    * DP considers every split — so `viterbi.pieces ≤ greedy.pieces` for
    * every word (the bake-off property the spec pins).
    *
    * Plan shape: a PURE MAP over the distinct-word table — zero iterative
    * rounds (the greedy frontier runs maxLen rounds of join+checkpoint),
    * zero joins; the vocabulary rides as one referenced hash set.
    * `vocab` is the collected term list (vocab-bounded driver pickup, ≤k
    * rows — the BPE merge-table discipline). */
  def viterbiSegmentWords(words: DataFrame, vocab: Seq[String]): DataFrame =
    words.select(col("w"),
      graft.plans.ArrayExpressions.viterbiSegment(col("w"), vocab).as("pu"))
      .select(col("w"), col("pu").getItem(0).as("pieces"),
        col("pu").getItem(1).as("unknowns"))

  /** Collect a [[wordpieceVocab]] table to the term list the Viterbi
    * expression references — legitimate driver-side pickup: the vocabulary
    * is k-bounded by construction (top-k), never corpus-sized. */
  def collectVocabTerms(vocab: DataFrame): Seq[String] =
    vocab.select(col("term")).collect().map(_.getString(0)).toSeq

  /** Per-document unigram (Viterbi) bill — [[wordpieceSegmentCounts]]'
    * twin under optimal decoding: pieces + unknown fallbacks per doc.
    * Segmentation runs on DISTINCT words only (one codegen map); the
    * per-doc bill is the token explode joined against the vocab-bounded
    * piece table; wordless docs re-attach with 0s. */
  def unigramSegmentCounts(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val docToks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
    val pieces = viterbiSegmentWords(docToks.select(col("w")).distinct(), vocab)
    val billed = docToks.join(broadcast(pieces), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("pieces")).as("n_pieces"),
        sum(col("unknowns")).as("n_unknowns"))
    docs.select(col("doc_id"))
      .join(billed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unknowns"), lit(0L)).as("n_unknowns"))
  }

  /** Per-source fertility under the unigram (Viterbi) decoder —
    * [[wordpieceFertilityFrom]]'s twin, and the third row of the tokenizer
    * bake-off (BPE merges / WordPiece greedy / unigram optimal over the
    * SAME corpus): pieces billed per whitespace word (×10000) and the OOV
    * ppm. Same "segment the vocab, bill the corpus" posture. */
  def unigramFertilityFrom(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val srcWords = docs
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint() // consumed twice: distinct words + the billing join
    val pieces = viterbiSegmentWords(
      srcWords.select(col("w")).distinct(), vocab)
    srcWords.join(broadcast(pieces), Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("freq")).as("total_words"),
        sum(col("freq") * col("pieces")).as("total_pieces"),
        sum(col("freq") * col("unknowns")).as("total_unknowns"))
      .withColumn("fertility_x10000",
        floor(lit(10000.0) * col("total_pieces") /
          greatest(col("total_words"), lit(1L))).cast("long"))
      .withColumn("oov_ppm",
        floor(lit(1000000.0) * col("total_unknowns") /
          greatest(col("total_pieces"), lit(1L))).cast("long"))
  }

  /** k-ANONYMITY audit over the metadata quasi-identifiers — the privacy
    * instrument next to [[piiReport]] in a dataset card: an attacker who
    * knows a document's (source, lang, coarse length) can re-identify it
    * iff its equivalence class has fewer than k members (Sweeney 2002).
    * Output: one row per quasi-identifier class — its size and the at-risk
    * flag — the table a release review reads to decide which classes to
    * suppress or generalize (widen `bucketWidth`) before publishing.
    *
    * Length rides in `bucketWidth`-char buckets: the generalization knob —
    * the exact `n_chars` would make nearly every doc its own class.
    * One map-side-combinable hash aggregation over (source, lang, bucket);
    * class cardinality is bounded by sources × langs × (max_len/width),
    * not by corpus size — map-only at 100 TB plus one tiny shuffle. */
  def kAnonymity(docs: DataFrame, k: Long = 10L,
                 bucketWidth: Long = 1000L): DataFrame = {
    require(k >= 1 && bucketWidth >= 1, "k and bucketWidth must be positive")
    docs
      .select(col("source"), col("lang"),
        floor(col("n_chars") / bucketWidth).cast("long").as("len_bucket"))
      .groupBy(col("source"), col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("class_n"))
      .withColumn("at_risk",
        when(col("class_n") < k, lit(1L)).otherwise(lit(0L)))
  }

  /** Flesch reading-ease per source, in EXACT rational arithmetic — the
    * classic readability gate (206.835 − 1.015·W/S − 84.6·Syl/W) as one
    * BIGINT expression: ×1000 with common denominator S·W,
    * `floor((206835·S·W − 1015·W² − 84600·Syl·S) / (S·W))`, so the per-doc
    * score is order-independent and bit-identical cross-engine (products
    * stay far under 2⁶³; the one division is exact-double < 2⁵³ then
    * floored). Syllables are approximated by vowel-group runs (the
    * standard regex proxy — each maximal [aeiouy]+ run bills one
    * syllable); sentences are [.!?]+ runs, min 1 (a fragment is one
    * sentence). Docs with no words are excluded (the score is undefined).
    *
    * Output per source: doc count, mean/min/max score ×1000 (per-doc
    * quantized THEN integer-averaged — the fixed-point rule every `a*`
    * summary follows). Map-only scoring + one tiny aggregation: the
    * cheapest quality signal in the suite at 100 TB. */
  def readability(docs: DataFrame): DataFrame = {
    val w = wordCount(col("text")).cast("long")
    docs
      .select(col("source"), w.as("w"),
        greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"),
          lit(1L)).as("s"),
        regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
          .as("syl"))
      .where(col("w") >= 1)
      .select(col("source"),
        floor((lit(206835L) * col("s") * col("w")
          - lit(1015L) * col("w") * col("w")
          - lit(84600L) * col("syl") * col("s")).cast("double")
          / (col("s") * col("w")).cast("double")).cast("long")
          .as("fre_x1000"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        floor(sum(col("fre_x1000")).cast("double")
          / count(lit(1)).cast("double")).cast("long").as("mean_fre_x1000"),
        min(col("fre_x1000")).as("min_fre_x1000"),
        max(col("fre_x1000")).as("max_fre_x1000"))
  }

  /** Deterministic SYNTHETIC CORPUS with a Zipf-like term distribution —
    * the retrieval-fixture generator: the driver's documents table carries
    * a ~31-term vocabulary, so at bench scale every term crosses any
    * sane df cap and a BM25 cell measures scan + empty join instead of
    * ranking. This derives, from nothing but `doc_id`, a corpus whose
    * ~8k-term vocabulary is log-uniform over scales (each token draws a
    * scale s ∈ [0, 13) uniformly, then a term id uniformly below 2^(s+1)
    * — term j's mass falls off ~1/j, the Zipf shape real text has), so
    * head terms df-cap away like true stopwords while the mid-frequency
    * tail genuinely ranks.
    *
    * ENGINE-EXACT by construction: every draw is integer LCG arithmetic
    * (multiply/add/mod/shift on BIGINT) that DuckDB reproduces bit-for-bit
    * in the oracle's CTE — no float, no engine hash, no RNG. Each doc gets
    * 20 + (doc_id mod 45) tokens; token p of doc d draws
    * h = (d·1000003 + p·7919 + 12345) mod (2³¹−1), s = h mod 13,
    * term = (h div 13) mod 2^(s+1), spelled `z<term>`. Plan shape: one
    * sequence-explode + one hash agg — corpus-scan cost, no shuffle wider
    * than doc_id. */
  def syntheticZipfCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .withColumn("p",
        explode(sequence(lit(0L), col("doc_id") % 45L + 19L)))
      .withColumn("h",
        (col("doc_id") * 1000003L + col("p") * 7919L + 12345L)
          % 2147483647L)
      .withColumn("t", concat(lit("z"),
        (expr("h DIV 13") %
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 13 + 1 AS INT))"))
          .cast("string")))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("t")))),
          x => x.getField("t")), " ").as("text"))
}
