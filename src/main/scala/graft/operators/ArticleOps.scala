package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Reference pipeline operators over the document corpus (SURVEY.md §2.1-§2.3).
  *
  * All operators are `DataFrame => DataFrame` lazy logical-plan builders —
  * Catalyst handles pushdown/pruning — EXCEPT `batchLayout`, which eagerly
  * runs the sort (see its doc). Shuffle inventory is documented per op.
  */
object ArticleOps {

  /** S1/P1 — enumeration scan projected to stubs `{id, source, lang}`
    * (analog of `{title, pageid, ns}`, reference `src/mediawiki_client.py:94-98`).
    * Narrow: projection+filter reach the parquet scan (PushedFilters). */
  def stubScan(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"))
      .where(col("doc_id") >= 0) // F3 special-page analog (pageid != -1)

  /** S4/S6 — point lookup by key. At scale this is a parquet
    * row-group-pruned scan (predicate pushdown on the key column). */
  def pointLookup(docs: DataFrame, id: Long): DataFrame =
    docs.where(col("doc_id") === id)

  /** F1-F5 — the validator/filter stack
    * (reference `src/data_processor.py:48-56`, `src/mediawiki_client.py:139-150`). */
  def validated(docs: DataFrame): DataFrame =
    docs.where(isValid(col("text"), col("lang"), col("source")) &&
      !isRedirect(col("text")))

  /** P2/P3 — article projection + derived metadata struct
    * (reference `src/production_data_processor.py:9-61`). Narrow, codegen'd. */
  def withMetadata(docs: DataFrame): DataFrame =
    docs
      // materialize the normalized text once; every derived metric reads the
      // bound column instead of re-running the regex (expression hygiene —
      // see TextFunctions.shinglesFromToks)
      .withColumn("clean_text", normalizeWhitespace(col("text")))
      .withColumn("content_length", length(col("text")).cast("long"))
      .withColumn("clean_length", length(col("clean_text")).cast("long"))
      .withColumn("word_count",
        when(col("clean_text") === "", 0L)
          .otherwise(size(split(col("clean_text"), " ")).cast("long")))
      .withColumn("line_count", lineCount(col("text")).cast("long"))
      .withColumn("url", articleUrl(concat_ws("_", lit("doc"), col("doc_id"))))

  /** J1 — enqueue anti-join dedup: keep stubs whose key is NOT in `processed`
    * (reference `src/queue_manager.py:52-58`). `left_anti` lets Catalyst pick
    * broadcast when `processed` is small — at 100 TB with a large processed
    * set AQE falls back to shuffled hash; key-only projection keeps the
    * build side minimal. */
  def antiJoinNew(stubs: DataFrame, processed: DataFrame, key: String): DataFrame =
    stubs.join(processed.select(key).distinct(), Seq(key), "left_anti")

  /** J2 — idempotent set insert: union + dedup by key
    * (reference `src/queue_manager.py:74-84`). One shuffle on the key. */
  def idempotentUnion(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).dropDuplicates(key)

  /** J3 — the flagship stub→content enrichment equi-join
    * (reference `src/main.py:101-114` fetch loop). One shuffle each side on
    * the join key (or zero if bucketed/broadcast); Catalyst/AQE picks the
    * physical strategy. */
  def enrich(stubs: DataFrame, content: DataFrame, key: String): DataFrame =
    stubs.join(content, Seq(key), "inner")

  /** K1/K2 — batch layout assignment: the `batch_{NNN}/article_{NNNNNN}` sink
    * naming (reference `src/azure_manager.py:33-78`), expressed as columns so
    * the write is `partitionBy("batch_id")`. The global sequential index is
    * computed WITHOUT a single-partition window: a parallel range-sort on
    * `orderCol`, then RDD `zipWithIndex` (per-partition counts → cumulative
    * offsets → per-partition increment) — the same deterministic rank
    * (`orderCol` values should be unique, else ties rank in partition scan
    * order, exactly as `row_number` would).
    *
    * NOT lazy: `zipWithIndex` runs the per-partition count job in its
    * constructor, so merely building this DataFrame executes the full sort
    * as a Spark job. The sort's shuffle files are reused when the result is
    * subsequently acted on (the count job and the action read the same
    * exchange output), so the source is scanned once — no upstream caching
    * needed. The LogicalRDD boundary is also an optimizer barrier: filters
    * and projections do NOT push below it, so pre-filter/pre-project `docs`
    * before calling. */
  def batchLayout(docs: DataFrame, orderCol: String, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
    import org.apache.spark.sql.types.LongType
    val sorted = docs.orderBy(col(orderCol))
    val outSchema = sorted.schema.add("file_index", LongType, nullable = false)
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
    org.apache.spark.sql.GraftColumnBridge
      .internalCreateDataFrame(docs.sparkSession, indexed, outSchema)
      .withColumn("batch_id", (col("file_index") / batchSize).cast("long"))
      .withColumn("file_name",
        format_string("batch_%03d/article_%06d.json", col("batch_id"), col("file_index")))
  }

  /** P10 — JSON serialization of the storage document
    * (reference `src/data_processor.py:85-103`). */
  def toStorageJson(docs: DataFrame, cols: Seq[String]): DataFrame =
    docs.withColumn("json", to_json(struct(cols.map(col): _*)))

  /** Redirect-chain resolution by POINTER DOUBLING — the set-level form of
    * the reference's per-article redirect hop (F5; a redirect's target can
    * itself be a redirect, so storage canonicalization needs the CHAIN's
    * end, not one hop). Input: the redirect mapping `(id, target)`; output:
    * `(id, final_id, hops)` for every redirect source, where `final_id` is
    * the first non-redirect reached.
    *
    * Each round composes the mapping with itself (`f := f ∘ f` via one
    * self-equi-join + coalesce for already-final targets), so resolved
    * chain length DOUBLES per round: O(log maxChain) rounds, vs the O(chain)
    * rounds of one-hop-at-a-time — at 100 TB a 1000-hop pathological chain
    * is 10 joins, not 1000. `hops` accumulates exactly (each composition
    * adds the tail's hop count). A redirect CYCLE (a→b→a) never leaves the
    * domain and fails LOUDLY after `maxIters` (2^20-length chains) rather
    * than returning half-resolved targets. */
  def resolveRedirects(redirects: DataFrame, maxIters: Int = 20): DataFrame = {
    var f = redirects.select(col("id"), col("target"), lit(1L).as("hops"))
      .localCheckpoint()
    val domain = redirects.select(col("id").as("g_id")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val g = f.select(col("id").as("g_id"), col("target").as("g_target"),
        col("hops").as("g_hops"))
      f = f.alias("f").join(g, col("f.target") === col("g_id"), "left")
        .select(col("f.id").as("id"),
          coalesce(col("g_target"), col("f.target")).as("target"),
          (col("f.hops") + coalesce(col("g_hops"), lit(0L))).as("hops"))
        .localCheckpoint()
      converged = f.join(domain, f("target") === domain("g_id"), "left_semi").isEmpty
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"redirect resolution did not converge after $maxIters doubling rounds " +
        "— the mapping contains a cycle")
    f.select(col("id"), col("target").as("final_id"), col("hops"))
  }

  /** Wiki-link EDGE EXTRACTION — the U1 stripper's sibling that keeps the
    * links instead of erasing them: every `[[Target]]` / `[[Target|label]]`
    * in a wikitext column (MediaWiki link syntax, the reference's own
    * format — `src/production_mediawiki_client.py:107-118` parses the same
    * markup) becomes a directed `(src, dst)` edge, targets resolved by the
    * `Doc-<id>` title convention; non-doc targets (category links, red
    * links to other namespaces) and self-links drop. Map-only regexp
    * extraction — the edge list this produces is what
    * [[graft.operators.Graphs.graphRank]] consumes, turning raw wikitext
    * into the citation/link graph every wiki analysis starts from. */
  def wikiLinkEdges(docs: DataFrame, wt: Column): DataFrame =
    docs.select(col("doc_id").as("src"),
        regexp_extract_all(wt,
          lit("\\[\\[([^\\]|]+)(?:\\|[^\\]]*)?\\]\\]"), lit(1)).as("ts"))
      .select(col("src"), explode(col("ts")).as("t"))
      .select(col("src"),
        regexp_extract(col("t"), "^Doc-([0-9]+)$", 1).as("tid"))
      .where(col("tid") =!= "")
      .select(col("src"), col("tid").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
}
