package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus snapshot versioning — the dataset-diff layer of a training-data
  * pipeline: corpora ship as versioned snapshots, and both the release
  * notes ("what changed since v1?") and the drift monitors ("did the token
  * distribution move?") are first-class queries, not ad-hoc scripts.
  *
  * Everything is content-hash based (the portable char-polynomial over
  * normalized text), so two snapshots diff without any text join — one
  * map-only hash pass per side plus an id equi-join.
  */
object Versioning {

  /** Content identity of a doc: the wide (~2^60) dual-fold portable hash
    * of whitespace-normalized text (formatting-only churn does not count
    * as a change; a false hash-equality would silently hide a real edit,
    * hence the full-document-identity key width). */
  private def contentHash: Column =
    graft.functions.TextFunctions.contentHash(normalizeWhitespace(col("text")))

  /** The persisted baseline artifact a deployment diffs against: one
    * (id, old_hash) row per doc — what [[graft.streaming.Streams
    * .streamingSnapshotDiff]] probes per micro-batch. */
  def hashIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), contentHash.as("old_hash"))

  /** Row-level snapshot diff of two corpus versions keyed by doc id:
    * `added` (id only in new), `removed` (id only in old), `changed`
    * (both, content hash differs), `unchanged`. The full-outer id
    * equi-join is the only shuffle; both inputs reduce to (id, hash)
    * before it moves — at 100 TB that's two slim map passes and one
    * 16-byte-row join, never the text. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String = "doc_id"): DataFrame =
    oldDocs.select(col(idCol), contentHash.as("old_hash"))
      .join(newDocs.select(col(idCol), contentHash.as("new_hash")),
        Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))

  /** The diff rolled up to per-status counts — the release-notes headline. */
  def diffSummary(oldDocs: DataFrame, newDocs: DataFrame,
                  idCol: String = "doc_id"): DataFrame =
    corpusDiff(oldDocs, newDocs, idCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))

  /** Apply a CHANGESET to a snapshot — the MERGE/upsert step that produces
    * corpus v(N+1) from vN plus a (much smaller) batch of edits, without
    * rewriting untouched docs' content: `changes` carries full doc rows
    * plus an `op` column (`upsert` = insert-or-replace, `delete`).
    * Precondition: at most one change row per id (a delete and an upsert
    * for the same id would be order-ambiguous).
    *
    * Plan shape: ONE anti-join of the base against the change-id list —
    * slim, and broadcast by AQE at real change-set sizes, so the 100 TB
    * base never shuffles — plus a union with the upsert rows. Paired with
    * [[corpusDiff]], `corpusDiff(base, applyChanges(base, ch))` recovers
    * exactly the changeset — the round-trip the spec pins. */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   idCol: String = "doc_id", opCol: String = "op"): DataFrame = {
    val ids = changes.select(col(idCol)).distinct()
    val kept = base.join(ids, Seq(idCol), "left_anti")
    kept.unionByName(changes.where(col(opCol) === "upsert").drop(opCol))
  }

  /** Term-distribution drift between two snapshots: for each term, its
    * occurrence rate (fixed-point parts-per-million of the snapshot's
    * token volume — rates, not raw counts, so a corpus that doubled in
    * size doesn't read as 100% drift) in old vs new, ranked by absolute
    * rate change; the top-k movers are the drift monitor's output.
    *
    * Plan shape: one explode + hash agg per side → full-outer term
    * equi-join (vocabulary-sized, tiny next to the corpora) → two one-row
    * total aggregates riding along broadcast (the `ta_keywords` pattern) →
    * TakeOrderedAndProject top-k. */
  def termDrift(oldDocs: DataFrame, newDocs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    def counts(docs: DataFrame, c: String) =
      explodeTokens(docs, "term")
        .where(col("term") =!= "")
        .groupBy(col("term")).agg(count(lit(1)).as(c))
    val merged = counts(oldDocs, "cnt_old")
      .join(counts(newDocs, "cnt_new"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
        coalesce(col("cnt_new"), lit(0L)).as("cnt_new"))
    val totals = merged.agg(sum(col("cnt_old")).as("tot_old"),
      sum(col("cnt_new")).as("tot_new"))
    merged
      .crossJoin(broadcast(totals))
      .withColumn("rate_old_ppm",
        floor(lit(1000000.0) * col("cnt_old") / col("tot_old")).cast("long"))
      .withColumn("rate_new_ppm",
        floor(lit(1000000.0) * col("cnt_new") / col("tot_new")).cast("long"))
      .withColumn("drift_ppm", col("rate_new_ppm") - col("rate_old_ppm"))
      .orderBy(abs(col("drift_ppm")).desc, col("term"))
      .limit(k)
      .select(col("term"), col("cnt_old"), col("cnt_new"),
        col("rate_old_ppm"), col("rate_new_ppm"), col("drift_ppm"))
  }

  /** Length-distribution drift between snapshots — the KS-style monitor
    * [[termDrift]]'s vocabulary view can't see: a source whose docs got
    * uniformly truncated (a crawler change, a bad extraction release)
    * keeps its term MIX while every quantile of its length distribution
    * moves. Per (source, decile 1..9): the EXACT nearest-rank decile of
    * text length in old vs new and the shift in characters; a decile
    * missing on one side (source appeared/vanished) reports -1.
    *
    * Exact, not sketched: per-source window sort — per-source-sized
    * partitions, the packing posture, never a global sort. The nine
    * target ranks per source come from an explode over the per-source
    * COUNT table (sources × 9 rows, no product join anywhere), and the
    * pick is a hash equi-join on (source, rn); the nearest-rank formula
    * `rn == (d·n + 9) DIV 10` is all-integer with a (len, id) total
    * order, so the DuckDB oracle matches bit for bit. */
  def lengthDrift(oldDocs: DataFrame, newDocs: DataFrame,
                  idCol: String = "doc_id"): DataFrame = {
    def deciles(docs: DataFrame, qCol: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("len"), col(idCol))
      val ranked = docs.select(col("source"), col(idCol),
          length(col("text")).cast("long").as("len"))
        .withColumn("rn", row_number().over(w).cast("long"))
      val targets = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
        .select(col("source"), col("n"),
          explode(sequence(lit(1L), lit(9L))).as("decile"))
        .select(col("source"), col("decile"),
          expr("(decile * n + 9) DIV 10").as("rn"))
      ranked.join(targets, Seq("source", "rn"))
        .select(col("source"), col("decile"), col("len").as(qCol))
    }
    deciles(oldDocs, "q_old")
      .join(deciles(newDocs, "q_new"), Seq("source", "decile"), "full_outer")
      .select(col("source"), col("decile"),
        coalesce(col("q_old"), lit(-1L)).as("q_old_chars"),
        coalesce(col("q_new"), lit(-1L)).as("q_new_chars"),
        (coalesce(col("q_new"), lit(-1L)) - coalesce(col("q_old"), lit(-1L)))
          .as("shift_chars"))
  }
}
