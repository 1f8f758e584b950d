package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver's parquet tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Scale posture: `spark.read.parquet` gives partition discovery, column
  * pruning, and predicate pushdown for free; at 100 TB the same call reads a
  * partitioned lake directory — nothing here holds data on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns that have shipped as parquet TIMESTAMP(NANOS) in
    * some testdata generations — a physical type Spark's vectorized reader
    * rejects, read as Long (nanos) via the `nanosAsLong` legacy conf and
    * truncated to micros (the same ns→µs truncation DuckDB applies). Later
    * generations write plain TIMESTAMP(MICROS), which loads as a native
    * timestamp column. The loader sniffs the LOADED dtype and normalizes
    * both generations to the same `timestamp_ntz` — never keyed off the
    * file name, so a regenerated dataset cannot silently break every
    * consumer of the table. */
  private val nanoTsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    nanoTsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) files
          df.withColumn(c,
            org.apache.spark.sql.functions.timestamp_micros(
                org.apache.spark.sql.functions.expr(s"$c div 1000"))
              .cast("timestamp_ntz"))
        case _ => // native TIMESTAMP(MICROS) files
          df.withColumn(c,
            org.apache.spark.sql.functions.col(c).cast("timestamp_ntz"))
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Case classes for the typed (`Dataset[T]`) surface — FIXTURES.md §1/§2. */
object Schemas {
  /** Enumeration stub — reference `src/mediawiki_client.py:94-98`. */
  final case class ArticleStub(title: String, pageid: Long, ns: Int)

  /** Corpus document (article-table analog). */
  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  /** Embedding row for similarity search. */
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  /** Batch summary — reference `src/data_processor.py:133-140` (corpus
    * analog: words ↔ categories, langs ↔ unique categories). */
  final case class BatchSummary(total_docs: Long, total_content_length: Long,
                                avg_content_length: Double, total_words: Long,
                                unique_langs: Long)

  /** Media record for the multimodal pipeline (opaque binary + typed metadata). */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                               mime: String, meta_len: Long)

  /** Article STORAGE document — the sink-side schema the reference commits
    * to blob storage (FIXTURES.md §1.1; reference `README.md:115-129`,
    * `src/production_data_processor.py:25-44`): content + per-format
    * renditions, cleaned categories, normalized pageid, and the nested
    * processing/page metadata struct. `author` is always null in the
    * reference (`src/mediawiki_client.py:169`) — kept as Option for schema
    * fidelity. */
  final case class PageMetadata(pageid: Long, namespace: Int, revision: Long,
                                length: Int, touched: java.sql.Timestamp)
  final case class ArticleMetadata(content_length: Int,
                                   parsed_content_length: Int,
                                   plain_text_length: Int, category_count: Int,
                                   processing_timestamp: java.sql.Timestamp,
                                   source: String, page_metadata: PageMetadata)
  final case class ArticleDoc(title: String, url: String, content: String,
                              parsed_content: Option[String],
                              plain_text: Option[String],
                              categories: Seq[String], author: Option[String],
                              pageid: Long, source: String, format: String,
                              metadata: Option[ArticleMetadata])
}
