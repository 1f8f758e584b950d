package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftConfig: flat-YAML parsing, dot-path lookup, typed overrides —
  * mirrors the reference's ConfigManager surface
  * (`/root/reference/src/config_manager.py:14-64`). */
class ConfigSpec extends AnyFunSuite {

  private val sample = Seq(
    "# engine tunables",
    "processing:",
    "  batch_size: 1000",
    "  checkpoint_interval: 50   # trailing comment",
    "naming:",
    "  file_pattern: \"batch_%03d/article_%06d.json\"",
    "api:",
    "  max_retries: 5",
    "dedup:",
    "  minhash_k: 32",
    "  minhash_bands: 8",
    "embedding:",
    "  lsh_planes: 12",
    "  min_cos_x1000000: 950000")

  test("flat YAML parses into dot-path entries, skipping comments and blanks") {
    val m = GraftConfig.parseFlatYaml(sample)
    assert(m("processing.batch_size") == "1000")
    assert(m("processing.checkpoint_interval") == "50")
    assert(m("naming.file_pattern") == "batch_%03d/article_%06d.json")
    assert(!m.contains("# engine tunables"))
  }

  test("a trailing comment after a quoted value is stripped; '#' inside quotes is kept") {
    val m = GraftConfig.parseFlatYaml(Seq(
      "naming:",
      "  file_pattern: \"batch_%03d.json\" # per-article files",
      "  sep: \"#\" # a literal hash value",
      "processing:",
      "  batch_size: \"100\" # quoted numeric"))
    assert(m("naming.file_pattern") == "batch_%03d.json")
    assert(m("naming.sep") == "#")
    assert(GraftConfig.fromMap(m).batchSize == 100)
  }

  test("dot-path get falls back to the default for missing keys") {
    val m = GraftConfig.parseFlatYaml(sample)
    assert(GraftConfig.get(m, "api.max_retries", "3") == "5")
    assert(GraftConfig.get(m, "api.initial_delay_ms", "1000") == "1000")
  }

  test("typed config applies overrides and keeps defaults elsewhere") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(sample))
    assert(c.batchSize == 1000)
    assert(c.checkpointInterval == 50)
    assert(c.maxRetries == 5)
    assert(c.minhashK == 32 && c.minhashBands == 8)
    assert(c.lshPlanes == 12 && c.minCosX1000000 == 950000L)
    // untouched keys keep library defaults
    assert(c.sessionGapMinutes == GraftConfig.default.sessionGapMinutes)
    assert(c.annK == GraftConfig.default.annK)
  }

  test("bitext ANN cell/probe knobs parse; defaults match the eval-scale oracle") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "bitext:", "  planes: 10", "  n_probe: 8")))
    assert(c.bitextPlanes == 10 && c.bitextNProbe == 8)
    assert(GraftConfig.default.bitextPlanes == 4 &&
      GraftConfig.default.bitextNProbe == 4)
  }

  test("ngram df-cap knob parses; default 0 (uncapped) keeps the oracle exact") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "dedup:", "  ngram_df_cap: 500")))
    assert(c.ngramDocFreqCap == 500)
    assert(GraftConfig.default.ngramDocFreqCap == 0)
  }

  test("retrieval max-df knob parses; default is the oracle-exact 1000") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "retrieval:", "  max_df: 250000")))
    assert(c.retrievalMaxDf == 250000L)
    assert(GraftConfig.default.retrievalMaxDf == 1000L)
  }

  test("curation thresholds parse from the curation section; defaults are paper-exact") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "curation:",
      "  gopher_min_words: 20",
      "  c4_min_line_words: 3")))
    assert(c.gopherMinWords == 20L && c.c4MinLineWords == 3)
    assert(c.gopherMaxWords == 100000L && c.c4MinSentences == 3L)
    val d = GraftConfig.default
    assert(d.gopherMinWords == 50L && d.gopherMinMwlX100 == 300L &&
      d.gopherMaxMwlX100 == 1000L && d.gopherMaxSymbolX10000 == 1000L &&
      d.gopherMaxBulletX10000 == 9000L && d.gopherMaxEllipsisX10000 == 3000L &&
      d.gopherMinAlphaX10000 == 8000L && d.gopherMinStopwords == 2L)
    // the typed thresholds bridge carries overrides verbatim and nothing else
    val th = graft.operators.WebCuration.CurationThresholds.fromConfig(c)
    assert(th == graft.operators.WebCuration.CurationThresholds()
      .copy(minWords = 20L, c4MinLineWords = 3))
  }

  test("template-strip knobs parse; defaults are the oracle-exact bar") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "curation:",
      "  template_min_df_pct: 30",
      "  template_min_df_docs: 5")))
    assert(c.templateMinDfPct == 30 && c.templateMinDfDocs == 5L)
    assert(c.templateWordsPerLine == 10) // untouched key keeps its default
    val d = GraftConfig.default
    assert(d.templateWordsPerLine == 10 && d.templateMinDfPct == 20 &&
      d.templateMinDfDocs == 2L) // web_template_strip oracle constants
  }

  test("html link-density knob parses; default is the oracle-exact 50") {
    val c = GraftConfig.fromMap(GraftConfig.parseFlatYaml(Seq(
      "curation:",
      "  html_max_link_density_x100: 30")))
    assert(c.htmlMaxLinkDensityX100 == 30L)
    assert(GraftConfig.default.htmlMaxLinkDensityX100 == 50L)
  }

  test("load of a missing file yields the library defaults") {
    assert(GraftConfig.load("/nonexistent/config.yaml") == GraftConfig.default)
  }

  test("SparkEntry runs on defaults that match the oracle constants") {
    val c = SparkEntry.cfg
    assert(c.batchSize == 100)        // k1 oracle: // 100
    assert(c.sessionGapMinutes == 30) // a12 oracle: 30*60000000
    assert(c.windowMinutes == 5)      // a7 oracle: INTERVAL '5 minutes'
    assert(c.minJaccardX10000 == 5000L && c.minEstJaccardX100 == 50L)
    assert(c.minCosX1000000 == 900000L)
    // a14 oracle: BETWEEN p.tsu - 300000000; mix oracles: 80/90; pack: /512
    assert(c.windowMinutes * 60L * 1000000L == 300000000L)
    assert(c.splitTrainPct == 80 && c.splitValPct == 90)
    assert(c.packTokenBudget == 512)
  }
}
