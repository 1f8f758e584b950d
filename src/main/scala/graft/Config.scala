package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Typed engine configuration — the Spark-side analog of the reference's
  * YAML config (`/root/reference/config/config.yaml:1-28`) with the
  * dot-path getter of `/root/reference/src/config_manager.py:14-64`.
  *
  * The reference threads one ConfigManager through every component
  * (batch size, file naming, retry envelope, checkpoint cadence); here the
  * same role is a case class with library defaults, overridable from a flat
  * YAML-subset file (`section:` headers + `key: value` lines — exactly the
  * reference file's shape; no external YAML dependency). Every tunable the
  * engine exposes as a function default is representable here, so a
  * deployment can retune thresholds without recompiling.
  */
case class GraftConfig(
    // processing (reference `processing:` section)
    batchSize: Int = 100,
    checkpointInterval: Int = 100,
    // naming (reference `naming:` section, printf-style)
    filePattern: String = "batch_%03d/article_%06d.json",
    // retry envelope (reference `api:` section)
    maxRetries: Int = 3,
    initialDelayMs: Long = 1000L,
    maxDelayMs: Long = 60000L,
    // event-time analytics
    windowMinutes: Int = 5,
    sessionGapMinutes: Int = 30,
    // dedup suite
    ngramN: Int = 3,
    minJaccardX10000: Long = 5000L,
    // hot-shingle document-frequency cap for the exact pair join
    // (0 = uncapped, the oracle-exact default); the standard candidate-
    // pruning lever when boilerplate shingles blow up the inverted index
    ngramDocFreqCap: Int = 0,
    minhashK: Int = 16,
    minhashBands: Int = 4,
    minEstJaccardX100: Long = 50L,
    simhashMaxHamming: Int = 3,
    lshPlanes: Int = 16,
    lshTables: Int = 8,
    embeddingDim: Int = 64,
    minCosX1000000: Long = 900000L,
    // ANN-candidate bitext mining: coarse-cell count = 2^planes, cells
    // probed per query = nProbe. Candidates per probe are ~n/2^planes, so
    // at 100 TB planes must GROW with log2(n) to hold the per-probe
    // candidate count constant - the measured sf10-syn knob (README)
    bitextPlanes: Int = 4,
    bitextNProbe: Int = 4,
    // similarity search
    annQueries: Int = 10,
    annK: Int = 5,
    // lexical retrieval (TF-IDF / BM25): postings document-frequency cap —
    // the inverted-index fan-out bound (Σ df over query terms). The
    // default is the oracle-exact 1000; on a real corpus scale it like
    // n/2 (runbook table)
    retrievalMaxDf: Long = 1000L,
    // IVF coarse-quantizer training sample — k-means iterates over its
    // input, so at scale the quantizer is fit on a corpus subset (cell
    // ASSIGNMENT still covers every vector); 1.0 = train on everything
    ivfTrainFraction: Double = 0.25,
    // corpus mixing / packing
    splitTrainPct: Int = 80,
    splitValPct: Int = 90,
    packTokenBudget: Int = 512,
    // eval-set decontamination: longer shingles than near-dup (a shared
    // 8-gram is evidence of copying, a 3-gram is shared vocabulary)
    decontamNgramN: Int = 8,
    decontamMinOverlapX10000: Long = 5000L,
    decontamMinCommon: Long = 5L,
    // shared-span detection: a run of >= minRun consecutive shared 8-grams
    // (i.e. a verbatim span of minRun + 7 tokens) counts as copying
    spanMinRun: Int = 5,
    // web curation — Gopher A1.1 form-rule thresholds + C4 page gates.
    // Defaults are PAPER-EXACT (Rae et al. 2021 A1.1; Raffel et al. 2020
    // §2.2), so a default config reproduces the published rules (and the
    // DuckDB oracles); real pipelines tune these per source
    gopherMinWords: Long = 50L,
    gopherMaxWords: Long = 100000L,
    gopherMinMwlX100: Long = 300L,
    gopherMaxMwlX100: Long = 1000L,
    gopherMaxSymbolX10000: Long = 1000L,
    gopherMaxBulletX10000: Long = 9000L,
    gopherMaxEllipsisX10000: Long = 3000L,
    gopherMinAlphaX10000: Long = 8000L,
    gopherMinStopwords: Long = 2L,
    c4MinSentences: Long = 3L,
    c4MinLineWords: Int = 5,
    // template line strip: the per-source document-frequency bar. A line
    // in >= templateMinDfDocs docs AND >= templateMinDfPct% of its
    // source's docs is boilerplate; defaults are the oracle-exact values
    templateWordsPerLine: Int = 10,
    templateMinDfPct: Int = 20,
    templateMinDfDocs: Long = 2L,
    // HTML→text extraction: drop lines whose anchor-text share exceeds
    // this (jusText's link-density boilerplate rule); oracle-exact default
    htmlMaxLinkDensityX100: Long = 50L,
    // perceptual image dedup: matching 16-bit bands required for a
    // candidate pair (multi-index hashing). 1 = the oracle-exact default
    // for sub-10^5-image corpora; at scale raise per the measured
    // schedule Multimodal.minBandMatchesFor (2 at 10^5..10^8 images,
    // 3 beyond) — the sf10-syn sweep that retired the suite's one
    // super-linear scale row
    phashMinBandMatches: Int = 1)

object GraftConfig {

  /** Library defaults — what `SparkEntry` runs with. */
  val default: GraftConfig = GraftConfig()

  /** Parse the flat YAML subset the reference uses: top-level `section:`
    * lines, two-space-indented `key: value` entries, `#` comments, optional
    * quotes around values. Returns dot-path → raw string, e.g.
    * `processing.batch_size -> "1000"`. */
  def parseFlatYaml(lines: Seq[String]): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    lines.foreach { raw =>
      // strip from the first '#' that sits OUTSIDE double quotes — a quoted
      // value followed by a trailing comment must not keep the comment
      val noComment = {
        var inQuote = false
        var cut = -1
        var i = 0
        while (cut < 0 && i < raw.length) {
          raw.charAt(i) match {
            case '"' => inQuote = !inQuote
            case '#' if !inQuote => cut = i
            case _ => ()
          }
          i += 1
        }
        if (cut >= 0) raw.take(cut) else raw
      }
      val line = noComment.replaceAll("\\s+$", "")
      if (line.nonEmpty) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        val t = line.trim
        val colon = t.indexOf(':')
        if (colon >= 0) {
          val key = t.take(colon).trim
          val value = t.drop(colon + 1).trim.stripPrefix("\"").stripSuffix("\"")
          if (!indented && value.isEmpty) section = key
          else if (value.nonEmpty)
            out += (if (indented && section.nonEmpty) s"$section.$key" else key) -> value
        }
      }
    }
    out.result()
  }

  /** Dot-path getter with default — `config_manager.py:64`'s `get`. */
  def get(m: Map[String, String], key: String, default: String): String =
    m.getOrElse(key, default)

  /** Build a typed config from dot-path entries; unknown keys are ignored
    * (the reference likewise carries sections this engine doesn't use). */
  def fromMap(m: Map[String, String]): GraftConfig = {
    val d = default
    def i(k: String, dv: Int): Int = m.get(k).map(_.toInt).getOrElse(dv)
    def l(k: String, dv: Long): Long = m.get(k).map(_.toLong).getOrElse(dv)
    def s(k: String, dv: String): String = m.getOrElse(k, dv)
    def dbl(k: String, dv: Double): Double = m.get(k).map(_.toDouble).getOrElse(dv)
    GraftConfig(
      batchSize = i("processing.batch_size", d.batchSize),
      checkpointInterval = i("processing.checkpoint_interval", d.checkpointInterval),
      filePattern = s("naming.file_pattern", d.filePattern),
      maxRetries = i("api.max_retries", d.maxRetries),
      initialDelayMs = l("api.initial_delay_ms", d.initialDelayMs),
      maxDelayMs = l("api.max_delay_ms", d.maxDelayMs),
      windowMinutes = i("windows.minutes", d.windowMinutes),
      sessionGapMinutes = i("sessions.gap_minutes", d.sessionGapMinutes),
      ngramN = i("dedup.ngram_n", d.ngramN),
      minJaccardX10000 = l("dedup.min_jaccard_x10000", d.minJaccardX10000),
      minhashK = i("dedup.minhash_k", d.minhashK),
      minhashBands = i("dedup.minhash_bands", d.minhashBands),
      minEstJaccardX100 = l("dedup.min_est_jaccard_x100", d.minEstJaccardX100),
      ngramDocFreqCap = i("dedup.ngram_df_cap", d.ngramDocFreqCap),
      simhashMaxHamming = i("dedup.simhash_max_hamming", d.simhashMaxHamming),
      lshPlanes = i("embedding.lsh_planes", d.lshPlanes),
      lshTables = i("embedding.lsh_tables", d.lshTables),
      embeddingDim = i("embedding.dim", d.embeddingDim),
      minCosX1000000 = l("embedding.min_cos_x1000000", d.minCosX1000000),
      bitextPlanes = i("bitext.planes", d.bitextPlanes),
      bitextNProbe = i("bitext.n_probe", d.bitextNProbe),
      annQueries = i("ann.queries", d.annQueries),
      annK = i("ann.k", d.annK),
      retrievalMaxDf = l("retrieval.max_df", d.retrievalMaxDf),
      ivfTrainFraction = dbl("ann.ivf_train_fraction", d.ivfTrainFraction),
      splitTrainPct = i("mix.train_pct", d.splitTrainPct),
      splitValPct = i("mix.val_pct", d.splitValPct),
      packTokenBudget = i("mix.pack_token_budget", d.packTokenBudget),
      decontamNgramN = i("decontam.ngram_n", d.decontamNgramN),
      decontamMinOverlapX10000 =
        l("decontam.min_overlap_x10000", d.decontamMinOverlapX10000),
      decontamMinCommon = l("decontam.min_common", d.decontamMinCommon),
      spanMinRun = i("dedup.span_min_run", d.spanMinRun),
      gopherMinWords = l("curation.gopher_min_words", d.gopherMinWords),
      gopherMaxWords = l("curation.gopher_max_words", d.gopherMaxWords),
      gopherMinMwlX100 = l("curation.gopher_min_mwl_x100", d.gopherMinMwlX100),
      gopherMaxMwlX100 = l("curation.gopher_max_mwl_x100", d.gopherMaxMwlX100),
      gopherMaxSymbolX10000 =
        l("curation.gopher_max_symbol_x10000", d.gopherMaxSymbolX10000),
      gopherMaxBulletX10000 =
        l("curation.gopher_max_bullet_x10000", d.gopherMaxBulletX10000),
      gopherMaxEllipsisX10000 =
        l("curation.gopher_max_ellipsis_x10000", d.gopherMaxEllipsisX10000),
      gopherMinAlphaX10000 =
        l("curation.gopher_min_alpha_x10000", d.gopherMinAlphaX10000),
      gopherMinStopwords = l("curation.gopher_min_stopwords", d.gopherMinStopwords),
      c4MinSentences = l("curation.c4_min_sentences", d.c4MinSentences),
      c4MinLineWords = i("curation.c4_min_line_words", d.c4MinLineWords),
      templateWordsPerLine =
        i("curation.template_words_per_line", d.templateWordsPerLine),
      templateMinDfPct = i("curation.template_min_df_pct", d.templateMinDfPct),
      templateMinDfDocs = l("curation.template_min_df_docs", d.templateMinDfDocs),
      htmlMaxLinkDensityX100 =
        l("curation.html_max_link_density_x100", d.htmlMaxLinkDensityX100),
      phashMinBandMatches =
        i("multimodal.phash_min_band_matches", d.phashMinBandMatches))
  }

  /** Load from a file path (missing file → defaults, mirroring the
    * reference's env-fallback posture rather than failing the pipeline). */
  def load(path: String): GraftConfig = {
    val p = Paths.get(path)
    if (Files.isRegularFile(p))
      fromMap(parseFlatYaml(Files.readAllLines(p).asScala.toSeq))
    else default
  }
}
