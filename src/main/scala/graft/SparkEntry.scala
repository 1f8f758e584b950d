package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Flagship query on sf=0.001 — the reference's E2 pipeline shape
    * (scan → validate → clean → derive metadata → per-source summary). */
  def entry(spark: SparkSession): DataFrame =
    queries("e2e_pipeline")(spark, "/root/testdata/sf0.001")

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

    // ---- joins / dedup-shaped set ops (J1-J3) ----
    "j1_antijoin_dedup" -> ((s, d) =>
      ArticleOps.antiJoinNew(
        Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
          .withColumnRenamed("c_custkey", "o_custkey"),
        Tables.orders(s, d), "o_custkey")
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

    // ---- aggregations (A1-A3, A7) ----
    "a1_corpus_summary" -> ((s, d) =>
      Summaries.corpusSummary(Tables.documents(s, d))),

    "a2_source_summary" -> ((s, d) =>
      Summaries.sourceSummary(Tables.documents(s, d)).orderBy(col("source"))),

    "a3_status_counts" -> ((s, d) =>
      Summaries.statusCounts(Tables.orders(s, d), "o_orderstatus")
        .orderBy(col("o_orderstatus"))),

    "a7_event_window" -> ((s, d) =>
      Summaries.eventWindowCounts(Tables.events(s, d), 5)
        .orderBy(col("win_start"), col("event_type"))),

    "a8_props_summary" -> ((s, d) => Relational.propsSummary(s, d)),

    // ---- relational workload (J3 at scale: Q1/Q3/Q5-shaped) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_top_orders" -> ((s, d) => Relational.topRevenueOrders(s, d, 10)),
    "q5_region_revenue" -> ((s, d) => Relational.regionRevenue(s, d)),

    // ---- sink layout (K1/K2) ----
    "k1_batch_layout" -> ((s, d) =>
      ArticleOps.batchLayout(
        ArticleOps.validated(Tables.documents(s, d)).select(col("doc_id")),
        "doc_id", 100)
        .select(col("doc_id"), col("file_index"), col("batch_id"), col("file_name"))
        .orderBy(col("doc_id"))),

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
    // shared SQL fragments
    val norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    def normOf(c: String) = s"trim(regexp_replace($c, '\\s+', ' ', 'g'))"
    val toks = s"string_split($norm, ' ')"
    val wordCnt = s"CASE WHEN $norm = '' THEN 0 ELSE len($toks) END"
    val validWhere =
      "text IS NOT NULL AND text <> '' AND lang IS NOT NULL AND lang <> '' " +
        "AND source IS NOT NULL AND source <> '' AND lower(text) NOT LIKE '#redirect%'"

    Map(
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

      "j1_antijoin_dedup" ->
        """SELECT c_custkey, c_name FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
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
          |  sum(CAST(floor(value*10000 + 0.5) AS BIGINT)) / 10000.0 AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

      "a8_props_summary" ->
        """SELECT event_type, count(*)::BIGINT AS n,
          |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

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

      "k1_batch_layout" ->
        s"""SELECT doc_id,
           |  (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS file_index,
           |  ((row_number() OVER (ORDER BY doc_id) - 1) // 100)::BIGINT AS batch_id,
           |  printf('batch_%03d/article_%06d.json',
           |    (row_number() OVER (ORDER BY doc_id) - 1) // 100,
           |    row_number() OVER (ORDER BY doc_id) - 1) AS file_name
           |FROM documents WHERE $validWhere ORDER BY doc_id""".stripMargin,

      "e2e_pipeline" ->
        s"""SELECT source, count(*)::BIGINT AS doc_count,
           |  sum(length(text))::BIGINT AS total_content_length,
           |  sum(length($norm))::BIGINT / count(*)::BIGINT AS avg_clean_length,
           |  sum($wordCnt)::BIGINT AS total_words,
           |  count(DISTINCT lang)::BIGINT AS unique_langs
           |FROM documents WHERE $validWhere
           |GROUP BY source ORDER BY source""".stripMargin
    )
  }
}
