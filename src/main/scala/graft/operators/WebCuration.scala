package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeWhitespace, tokens, wordCount}

/** Web-corpus curation filters — the published rule families every
  * large-scale LLM pretraining pipeline runs before dedup/mixing:
  * the Gopher quality heuristics (Rae et al. 2021, "Scaling Language
  * Models", appendix A1.1) and the C4 cleaning rules (Raffel et al.
  * 2020, §2.2). Both are MAP-ONLY: every signal is an expression on the
  * row itself — no joins, no shuffles, no state — so the filter pass
  * costs one scan at any corpus size and composes with the dedup /
  * mixing stages downstream ([[curationFunnel]]).
  *
  * All ratios are integer fixed-point (×100 / ×10000) so every signal is
  * bit-identical cross-engine and oracle-checkable.
  */
object WebCuration {

  /** The Gopher stop-word presence list (rule 7): a document of natural
    * prose contains at least 2 of these. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Internal: the Gopher signal columns over a text column. `sum` of
    * word lengths is derived arithmetically — the normalized text is
    * single-spaced, so Σ len(word) = len(norm) − (n_words − 1) — which
    * keeps the whole signal set lambda-free except the bounded per-line
    * and per-token predicates. */
  private case class GopherCols(nWords: Column, mwlX100: Column,
                                symX10000: Column, bulletX10000: Column,
                                ellipsisX10000: Column, alphaX10000: Column,
                                nStop: Column) {
    def rWc: Column = nWords >= 50L && nWords <= 100000L
    def rMwl: Column = mwlX100 >= 300L && mwlX100 <= 1000L
    def rSym: Column = symX10000 <= 1000L
    def rBullet: Column = bulletX10000 <= 9000L
    def rEllipsis: Column = ellipsisX10000 <= 3000L
    def rAlpha: Column = alphaX10000 >= 8000L
    def rStop: Column = nStop >= 2L
    def pass: Column =
      rWc && rMwl && rSym && rBullet && rEllipsis && rAlpha && rStop
  }

  private def gopherCols(text: Column): GopherCols = {
    val norm = normalizeWhitespace(text)
    val toks = tokens(text)
    val nWords = wordCount(text).cast("long")
    val den = greatest(nWords, lit(1L))
    val sumLen = (length(norm) - (nWords - 1L)).cast("long")
    val nSym = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* "))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      rtrim(l).endsWith("..."))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    GopherCols(
      nWords = nWords,
      mwlX100 = when(nWords === 0L, 0L).otherwise(
        floor(lit(100.0) * sumLen / nWords + 0.5).cast("long")),
      symX10000 = floor(lit(10000.0) * nSym / den + 0.5).cast("long"),
      bulletX10000 =
        floor(lit(10000.0) * nBullet / nLines + 0.5).cast("long"),
      ellipsisX10000 =
        floor(lit(10000.0) * nEllipsis / nLines + 0.5).cast("long"),
      alphaX10000 = floor(lit(10000.0) * nAlpha / den + 0.5).cast("long"),
      nStop = size(array_intersect(toks,
        array(gopherStopwords.map(lit): _*))).cast("long"))
  }

  /** Per-document Gopher quality report: the seven signals, the seven
    * rule verdicts, and the combined gate. Thresholds follow the paper:
    * 50 ≤ words ≤ 100k, mean word length in [3, 10], symbol (`#`/`…`)
    * to word ratio ≤ 0.1, bullet-started lines ≤ 90%, ellipsis-ended
    * lines ≤ 30%, ≥ 80% of words contain an alphabetic character, and
    * ≥ 2 distinct stop words present. */
  def gopherQualityReport(docs: DataFrame): DataFrame = {
    val g = gopherCols(col("text"))
    docs.select(col("doc_id"),
      g.nWords.as("n_words"), g.mwlX100.as("mwl_x100"),
      g.symX10000.as("sym_ratio_x10000"),
      g.bulletX10000.as("bullet_ratio_x10000"),
      g.ellipsisX10000.as("ellipsis_ratio_x10000"),
      g.alphaX10000.as("alpha_ratio_x10000"),
      g.nStop.as("n_stopwords"),
      g.rWc.as("r_word_count"), g.rMwl.as("r_mean_word_len"),
      g.rSym.as("r_symbol_ratio"), g.rBullet.as("r_bullet_lines"),
      g.rEllipsis.as("r_ellipsis_lines"), g.rAlpha.as("r_alpha_words"),
      g.rStop.as("r_stopwords"), g.pass.as("pass"))
  }

  /** Internal: the C4 signal columns. Line retention = ends in terminal
    * punctuation AND carries ≥ 5 words (Raffel et al. §2.2); page gates =
    * ≥ 3 sentences, no "lorem ipsum", no `{`. */
  private case class C4Cols(lines: Column, kept: Column, nSentences: Column,
                            hasLorem: Column, hasBrace: Column) {
    def pass: Column = nSentences >= 3L && !hasLorem && !hasBrace
  }

  private def c4Cols(text: Column): C4Cols = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => {
      val n = normalizeWhitespace(l)
      rtrim(l).rlike("[.!?\"]$") && (n =!= "") && size(split(n, " ")) >= 5
    })
    C4Cols(
      lines = lines,
      kept = kept,
      nSentences = regexp_count(text, lit("[.!?]")).cast("long"),
      hasLorem = lower(text).contains("lorem ipsum"),
      hasBrace = text.contains("{"))
  }

  /** Per-document C4 cleaning report: line counts before/after the
    * terminal-punctuation + ≥5-words line filter, the three page-level
    * gates, and the cleaned text (kept lines rejoined; empty when the
    * page fails). */
  def c4Filter(docs: DataFrame): DataFrame = {
    val c = c4Cols(col("text"))
    docs.select(col("doc_id"),
      size(c.lines).cast("long").as("n_lines"),
      size(c.kept).cast("long").as("n_kept_lines"),
      c.nSentences.as("n_sentences"),
      c.hasLorem.as("has_lorem"), c.hasBrace.as("has_brace"),
      c.pass.as("pass"),
      when(c.pass, array_join(c.kept, "\n")).otherwise(lit(""))
        .as("clean_text"))
  }

  /** The per-source CURATION FUNNEL — the readout a web-pipeline run ends
    * with: how many documents survive each stage (raw → Gopher gate → C4
    * gate → both → exact-dedup canonical), and the surviving token
    * volume. One scan + one window keyed on the 8-byte content hash (the
    * [[Dedup.exactDuplicates]] convention — no exchange carries text);
    * every filter signal rides the scan as a map-only expression. */
  def curationFunnel(docs: DataFrame): DataFrame = {
    val g = gopherCols(col("text"))
    val c = c4Cols(col("text"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("normh"))
    docs.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.contentHash(
          normalizeWhitespace(col("text"))).as("normh"),
        g.pass.cast("long").as("gp"), c.pass.cast("long").as("cp"),
        wordCount(col("text")).cast("long").as("wc"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("source"), col("gp"), col("cp"), col("wc"),
        (col("doc_id") === col("canonical_id")).cast("long").as("canon"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(col("gp")).as("n_gopher"),
        sum(col("cp")).as("n_c4"),
        sum(col("gp") * col("cp")).as("n_both"),
        sum(col("gp") * col("cp") * col("canon")).as("n_final"),
        sum(col("gp") * col("cp") * col("canon") * col("wc"))
          .as("final_ws_tokens"))
  }
}
