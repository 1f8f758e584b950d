package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Deduplication suite for large-scale corpus curation — exact, MinHash-LSH,
  * SimHash, and n-gram-Jaccard near-dup detection over the `documents` table.
  *
  * Scale posture (100 TB): every variant is explode → map-side-combinable
  * hash aggregation → key-equi-join on bounded-width keys (shingle, band
  * signature, bucket). No driver-side state, no cross joins except where a
  * candidate set is already LSH-bounded. The portable `charPolyHash` (cross-
  * engine checkable) can be swapped for `xxhash64` at the same call sites
  * when oracle parity is not needed.
  */
object Dedup {

  /** Exact duplicate grouping on normalized text: every doc is assigned the
    * canonical (min) doc_id of its content group. One shuffle keyed on the
    * 8-byte content hash — NOT the full normalized string — so the exchange
    * width is (doc_id, hash), never the document body. The key is the WIDE
    * dual-fold [[graft.functions.TextFunctions.contentHash]] (~2^60 space,
    * expected false merges n²/2e18 — none below ~1e9 distinct docs; a
    * single mod-1e9+7 fold would expect collisions from ~45k docs). The
    * oracle mirrors the same combined hash, so a collision would merge two
    * texts identically on both engines (the [[canonicalizationLadder]]
    * hash-stands-in-for-text convention); beyond ~1e9 docs swap in a
    * 128-bit hash at this one call site. */
  def exactDuplicates(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("normh"))
    docs
      .select(col("doc_id"),
        contentHash(normalizeWhitespace(col("text"))).as("normh"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"), col("n_copies"))
  }

  /** Cross-source duplication matrix — the curation question behind source
    * weighting: which sources duplicate which? For every duplicate copy (a
    * doc whose normalized content already exists under a smaller id), one
    * (copy's source, canonical's source) observation; the matrix is the
    * per-cell count. A crawl that mirrors a curated source lights up one
    * off-diagonal cell — the signal to de-weight it before mixing.
    *
    * Plan shape: [[exactDuplicates]]' one shuffle + two slim doc_id
    * equi-joins to attach sources (at 100 TB both join inputs are the
    * (id, source) projection, never text). */
  def crossSourceDupMatrix(docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    exactDuplicates(docs)
      .where(col("doc_id") =!= col("canonical_id"))
      .join(src, Seq("doc_id"))
      .withColumnRenamed("source", "dup_source")
      .join(src.select(col("doc_id").as("canonical_id"),
        col("source").as("canonical_source")), Seq("canonical_id"))
      .groupBy(col("dup_source"), col("canonical_source"))
      .agg(count(lit(1)).as("n_dup_docs"))
  }

  /** The canonicalization ladder — which normalization level reveals how
    * much duplication: per level (raw → whitespace → unicode → casefold →
    * alphanumeric-only), the corpus's exact-dup rate under that canonical
    * form. The decision instrument for "what is THE canonical text" before
    * an exact-dedup pass: each step is more aggressive (and more lossy),
    * and the marginal dup_ppm it buys is exactly this readout. One scan,
    * one shuffle: every doc emits 5 (level, hash) rows, distinct-counted
    * per level (the wide [[graft.functions.TextFunctions.contentHash]]
    * stands in for the canonical string — full-document identity, so the
    * ~2^60 dual-fold key, not the single fold). */
  def canonicalizationLadder(docs: DataFrame): DataFrame = {
    val ws = normalizeWhitespace(col("text"))
    val uni = normalizeUnicode(col("text"))
    val cf = lower(uni)
    val alnum = trim(regexp_replace(cf, "[^a-z0-9]+", " "))
    val lvls = array(
      struct(lit(1L).as("level"), lit("raw").as("form"),
        contentHash(col("text")).as("h")),
      struct(lit(2L).as("level"), lit("whitespace").as("form"),
        contentHash(ws).as("h")),
      struct(lit(3L).as("level"), lit("unicode").as("form"),
        contentHash(uni).as("h")),
      struct(lit(4L).as("level"), lit("casefold").as("form"),
        contentHash(cf).as("h")),
      struct(lit(5L).as("level"), lit("alnum").as("form"),
        contentHash(alnum).as("h")))
    docs.select(explode(lvls).as("l"))
      .select(col("l.level").as("level"), col("l.form").as("form"), col("l.h").as("h"))
      .groupBy(col("level"), col("form"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_distinct"))
      .withColumn("dup_docs", col("n_docs") - col("n_distinct"))
      .withColumn("dup_ppm",
        floor(lit(1000000.0) * col("dup_docs") /
          greatest(col("n_docs"), lit(1L))).cast("long"))
  }

  /** Exploded distinct word-n-gram shingles: (doc_id, sh). Tokens are
    * materialized as a column first so the shingle lambda reads a bound
    * attribute instead of re-tokenizing per element. */
  def shingleTable(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shinglesFromToks(col("toks"), n)).as("sh"))

  /** Exact n-gram Jaccard near-dup pairs via the inverted-index self-join:
    * explode shingles → hash → join on the 64-bit shingle hash → count
    * common → J = |∩|/|∪|. Joining on the codegen'd hash instead of the
    * shingle string shrinks the exchange ~3× and makes key compares O(1);
    * a hash collision (p≈n²/2·1e-9) inflates one pair's |∩| by 1 — the
    * oracle computes the same hash, so parity is unaffected.
    * Shuffles: one on `h` (the join), one on the pair key (the count).
    * At scale, cap shingle document-frequency (`docFreqCap`) to keep hot
    * shingles from exploding the join (standard candidate pruning). */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccardX10000: Long,
                        docFreqCap: Option[Int] = None): DataFrame =
    ngramJaccardPairsFromHashes(
      shingleTable(docs, n)
        .select(col("doc_id"), charPolyHash(col("sh")).as("h")),
      minJaccardX10000, docFreqCap,
      sizesOpt = if (docFreqCap.isEmpty) Some(shingleSizes(docs, n)) else None)

  /** Per-doc distinct-shingle count computed MAP-ONLY from the token array
    * (`size(shinglesFromToks)` — the explode side emits exactly one row per
    * array element, so the counts are identical by construction): replaces
    * [[pairOverlaps]]' explode → hash-per-shingle → Exchange → count
    * `sizes` subtree with a scan projection. Only valid for the UNCAPPED
    * shingle universe — under `docFreqCap` the sizes must come from the
    * capped table ([[pairOverlaps]] keeps the aggregate there). The
    * `coalesce` mirrors the explode semantics for NULL text: explode(NULL)
    * emits no rows, and such docs join nothing downstream either way. */
  private def shingleSizes(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        coalesce(size(shinglesFromToks(col("toks"), n)).cast("long"), lit(0L))
          .as("n_sh"))

  /** [[ngramJaccardPairs]] from a pre-built hashed shingle table
    * (doc_id, h) — the entry point for pipelines that already hold the
    * hashes (e.g. [[lshCandidateEval]], which shares ONE materialized
    * shingle scan between its truth and minhash legs; this plan consumes
    * its input three times — sizes + both self-join sides). */
  private[operators] def ngramJaccardPairsFromHashes(
      sh0: DataFrame, minJaccardX10000: Long,
      docFreqCap: Option[Int] = None,
      sizesOpt: Option[DataFrame] = None): DataFrame =
    pairOverlaps(sh0, docFreqCap, sizesOpt)
      .withColumn("jaccard_x10000",
        floor(lit(10000.0) * col("n_common") / (col("n_a") + col("n_b") - col("n_common")) + 0.5)
          .cast("long"))
      .where(col("jaccard_x10000") >= minJaccardX10000)
      .select(col("doc_a"), col("doc_b"), col("jaccard_x10000"))

  /** The inverted-index overlap core shared by the exact pair scorers:
    * (doc_a < doc_b, n_common, n_a, n_b) from a hashed shingle table
    * (doc_id, h). Shuffles: one on `h` (the self-join), one on the pair
    * key (the count). */
  private[operators] def pairOverlaps(
      sh0: DataFrame, docFreqCap: Option[Int] = None,
      sizesOpt: Option[DataFrame] = None): DataFrame = {
    val sh = docFreqCap match {
      case Some(cap) =>
        val hot = sh0.groupBy(col("h")).count().where(col("count") > cap).select(col("h"))
        sh0.join(hot, Seq("h"), "left_anti")
      case None => sh0
    }
    // sizes come from the SAME (possibly capped) shingle universe as the
    // intersection — otherwise capped pairs get a systematically
    // underestimated Jaccard and true dups can be missed. A caller holding
    // the source docs can pass the count as a MAP-ONLY projection
    // ([[shingleSizes]]) instead of paying this explode + hash + Exchange
    // subtree twice (n_a and n_b legs) — only honored uncapped, per the
    // consistency rule above.
    val sizes = sizesOpt match {
      case Some(sz) if docFreqCap.isEmpty => sz
      case _ => sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    }
    val common = sh.alias("a")
      .join(sh.alias("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
  }

  /** SOFT dedup — reweight instead of remove. Hard dedup keeps one copy
    * per cluster and drops the rest; the reweighting school (soft dedup)
    * keeps every document and hands the sampler a weight inversely
    * proportional to how COMMON the document's content is, so repeated
    * material contributes ~once in expectation without a cliff at the
    * near-dup threshold. Commonness here is the mean corpus-wide document
    * frequency of the doc's distinct word-n-gram shingles: an all-unique
    * doc has mean df 1 → weight 1.0 (×10000); a doc whose shingles each
    * appear in 10 docs gets 0.1. Fixed-point outputs (`mean_df_x100`,
    * `weight_x10000 = round(10⁴·n_sh/Σdf)`, the harmonic form — exactly
    * 10⁴/mean) keep the oracle bit-exact.
    *
    * Plan shape: explode distinct shingles → hash (the exchange carries
    * (doc_id, h), never shingle text) → df by ONE groupBy on h → join back
    * on h (row-linear: no pair explosion, unlike the Jaccard self-join) →
    * per-doc sum. Shuffles: h (df), h (join), doc_id (sum) — all 8-byte
    * keys. Shingle-less docs (< n tokens) keep weight 1.0 via the final
    * left join from the id spine. */
  def softDedupWeights(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingleTable(docs, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val agg = sh.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), sum(col("df")).as("sum_df"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_shingles"),
        when(col("n_sh").isNull, lit(0L))
          .otherwise(floor(lit(100.0) * col("sum_df") / col("n_sh") + 0.5))
          .cast("long").as("mean_df_x100"),
        when(col("n_sh").isNull, lit(10000L))
          .otherwise(floor(lit(10000.0) * col("n_sh") / col("sum_df") + 0.5))
          .cast("long").as("weight_x10000"))
  }

  /** Asymmetric CONTAINMENT pairs — the sub-document-copy detector Jaccard
    * structurally misses: a 50-shingle doc fully embedded in a 1000-shingle
    * doc has containment |∩|/min(|A|,|B|) = 1.0 but Jaccard ≈ 0.05, under
    * every symmetric threshold. Containment is the score for quote farms,
    * aggregator pages, and prefix/suffix boilerplate wrapping a copied
    * core. Emits both scores so the gap itself is the signal (high
    * containment + low Jaccard ⇒ asymmetric copy; both high ⇒ plain
    * near-dup), plus which side is the contained one.
    *
    * Same two-shuffle inverted-index core as [[ngramJaccardPairs]]
    * ([[pairOverlaps]]) with the same `docFreqCap` hot-shingle pruning; at
    * 100 TB the banded-minhash candidate pass runs first and this exact
    * scorer runs on candidates only (the [[lshCandidateEval]] pipeline). */
  def containmentPairs(docs: DataFrame, n: Int, minContainX10000: Long,
                       docFreqCap: Option[Int] = None): DataFrame =
    pairOverlaps(
      shingleTable(docs, n)
        .select(col("doc_id"), charPolyHash(col("sh")).as("h")),
      docFreqCap,
      sizesOpt = if (docFreqCap.isEmpty) Some(shingleSizes(docs, n)) else None)
      .withColumn("containment_x10000",
        floor(lit(10000.0) * col("n_common") / least(col("n_a"), col("n_b")) + 0.5)
          .cast("long"))
      .where(col("containment_x10000") >= minContainX10000)
      .select(col("doc_a"), col("doc_b"),
        col("containment_x10000"),
        floor(lit(10000.0) * col("n_common") / (col("n_a") + col("n_b") - col("n_common")) + 0.5)
          .cast("long").as("jaccard_x10000"),
        when(col("n_a") < col("n_b"), col("doc_a"))
          .when(col("n_b") < col("n_a"), col("doc_b"))
          .otherwise(lit(-1L)).as("contained_doc"))

  /** Persist the near-dup pair graph as a reusable artifact (the
    * [[Similarity.buildBm25Index]] pattern): the `(doc_a, doc_b,
    * jaccard_x10000)` table is the shared prefix of every downstream
    * curation consumer — clustering, cluster-safe splits, triplet mining,
    * the dedup verdict — and at 100 TB the shingle self-join that produces
    * it is the single most expensive stage in the pipeline. Building it
    * once per corpus snapshot and fanning consumers out over the parquet
    * artifact turns N recomputations into one; the columnar pair table is
    * tiny next to the corpus (pairs ≪ docs² by construction of the
    * threshold). */
  def buildPairsArtifact(docs: DataFrame, dir: String, n: Int,
                         minJaccardX10000: Long,
                         docFreqCap: Option[Int] = None): Unit =
    ngramJaccardPairs(docs, n, minJaccardX10000, docFreqCap)
      .write.mode("overwrite").parquet(s"$dir/pairs")

  /** Read a pair graph persisted by [[buildPairsArtifact]]. Column pruning
    * and predicate pushdown apply as for any parquet scan, so a consumer
    * that only needs `(doc_a, doc_b)` never deserializes the scores. */
  def pairsFromArtifact(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs")

  /** MinHash signature table: (doc_id, i, mh) for i in 0..k-1 —
    * mh = min over shingles of the i-th permuted shingle hash. One-pass
    * custom aggregate ([[graft.plans.MinHashAgg]]) holding the k minima in a
    * buffer (no k× row explosion; map-side combine ships one k-long array
    * per doc per partition); posexplode restores the (doc, i, mh) shape.
    * The equivalent built-in form is explode(0..k-1) → minhashPerm →
    * groupBy(doc, i).min — which is what the DuckDB oracle runs. */
  def minhashTable(docs: DataFrame, n: Int, k: Int): DataFrame =
    minhashTableFromHashes(
      shingleTable(docs, n).withColumn("h", charPolyHash(col("sh"))), k)

  /** [[minhashTable]] from a pre-hashed shingle table (doc_id, h). */
  private[operators] def minhashTableFromHashes(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(graft.plans.MinHashAgg.minhashSignature(col("h"), k).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("i", "mh")))

  /** MinHash-LSH near-dup pairs: band the k-row signature into `bands`
    * buckets, self-join on (band, band-signature) for candidates, then
    * estimate J as the fraction of matching signature rows. Candidate
    * generation is an equi-join on the band key — the crucial scale property
    * (no all-pairs comparison). */
  /** LSH band keys for a (doc_id, i, mh) signature table: one row per
    * (doc, band) keyed by the band's joined signature values. */
  private def bandKeyTable(mt: DataFrame, rowsPerBand: Int): DataFrame =
    mt.withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          x => x.getField("mh").cast("string")), "-").as("bkey"))

  /** Signature-match estimate for candidate pairs given the full signature
    * table; thresholded on the estimated Jaccard. */
  private def estimatePairs(cand: DataFrame, mt: DataFrame, k: Int,
                            minEstX100: Long): DataFrame =
    cand
      .join(mt.select(col("doc_id").as("doc_a"), col("i"), col("mh").as("mh_a")), Seq("doc_a"))
      .join(mt.select(col("doc_id").as("doc_b"), col("i"), col("mh").as("mh_b")), Seq("doc_b", "i"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(when(col("mh_a") === col("mh_b"), 1L).otherwise(0L)).as("matches"))
      .withColumn("est_jaccard_x100",
        floor(lit(100.0) * col("matches") / k + 0.5).cast("long"))
      .where(col("est_jaccard_x100") >= minEstX100)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard_x100"))

  def minhashPairs(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
                   minEstX100: Long = 50): DataFrame = {
    require(k % bands == 0,
      s"k ($k) must be divisible by bands ($bands) — a ragged band would " +
        "admit candidates on a single matching permutation")
    val mt = minhashTable(docs, n, k)
    val bandKeys = bandKeyTable(mt, k / bands)
    val cand = bandKeys.alias("x")
      .join(bandKeys.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    estimatePairs(cand, mt, k, minEstX100)
  }

  /** Incremental near-dup maintenance — the corpus-update path: given the
    * persisted signature table of the EXISTING corpus (the
    * [[minhashTable]] shape a deployment keeps as its dedup index) and a
    * batch of NEW documents, produce exactly the pairs involving a new doc.
    * Candidate generation joins the new docs' band keys against the whole
    * index (new side is the small probe side — broadcastable for typical
    * update batches), so the cost is O(new × collisions) instead of
    * re-running the corpus-wide self-join: adding 1% new docs costs ~1% of
    * the batch run. Estimates use the same signatures, so the output equals
    * [[minhashPairs]] over the merged corpus restricted to pairs with a
    * new member (OperatorsSpec asserts this). */
  def minhashPairsIncremental(existingSigs: DataFrame, newDocs: DataFrame,
                              n: Int = 3, k: Int = 16, bands: Int = 4,
                              minEstX100: Long = 50): DataFrame =
    minhashPairsIncrementalSigs(existingSigs, minhashTable(newDocs, n, k),
      k, bands, minEstX100)

  /** [[minhashPairsIncremental]] with the new side's signatures already
    * computed — for callers that persist the signature table anyway (the
    * streaming tier writes it to the index, then probes with the same
    * rows instead of re-running the shingle→hash→MinHash pipeline). */
  def minhashPairsIncrementalSigs(existingSigs: DataFrame, newSigs: DataFrame,
                                  k: Int = 16, bands: Int = 4,
                                  minEstX100: Long = 50): DataFrame = {
    require(k % bands == 0, s"k ($k) must be divisible by bands ($bands)")
    val allSigs = existingSigs.unionByName(newSigs)
    val newKeys = bandKeyTable(newSigs, k / bands)
    val allKeys = bandKeyTable(allSigs, k / bands)
    val cand = newKeys.alias("x")
      .join(allKeys.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    estimatePairs(cand, allSigs, k, minEstX100)
  }

  /** DELETE documents from a persisted MinHash signature index — the
    * dedup-side takedown leg (the [[Similarity.removeFromBm25Index]] /
    * `removeFromAnnIndex` lifecycle closed for the near-dup family): a
    * takedown that only removed the documents themselves would leave
    * their signatures in the index POISONING every future probe — the
    * deleted doc keeps surfacing as a near-dup partner, suppressing (or
    * mis-canonicalizing) genuinely new content. Signatures are per-doc
    * independent (no global statistic moves — unlike BM25's df there is
    * nothing to decrement), so deletion is ONE index-sized anti-join and
    * is EXACT against [[minhashTable]] over the survivors; it is also
    * idempotent by construction (a removed doc has no rows left).
    * Callers persist the survivor table back under their artifact
    * discipline; [[removeFromMinhashIndexDir]] is the partition-scoped
    * form for the streaming tier's batch_id-partitioned layout. */
  def removeFromMinhashIndex(sigs: DataFrame, removeIds: DataFrame): DataFrame =
    sigs.join(broadcast(removeIds.select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_anti")

  /** [[removeFromMinhashIndex]] against the PERSISTED index directory the
    * streaming near-dup tier maintains (`(doc_id, i, mh)` partitioned by
    * `batch_id` — [[graft.streaming.Streams.streamingNearDup]]'s layout),
    * PARTITION-SCOPED: only the batch_id partitions that actually contain
    * a removed doc are rewritten (dynamic-partition overwrite), so a
    * small takedown against a corpus-scale index costs O(touched
    * partitions), not O(index) — the write-amplification discipline of
    * the bucketed BM25/ANN merges. A touched partition left with NO
    * survivors is deleted outright (dynamic overwrite only replaces
    * partitions present in the written data, so an empty one would
    * otherwise keep its stale files). Idempotent: re-delivering the same
    * ids touches nothing the second time. The touched-batch list is a
    * bounded control table (one row per micro-batch ever absorbed), never
    * a data collect. */
  /** The SLIM doc→partition membership table's directory for a given
    * signature-index dir — a SIBLING (`<dir>_members`), never nested (a
    * foreign subdirectory would break the index's partition discovery).
    * Two columns, `(doc_id, batch_id)`, one row per absorbed doc: the
    * takedown probe reads THIS map to find touched partitions instead of
    * scanning the k-hashes-per-doc signature index — the probe's read
    * drops from O(index) to O(docs-absorbed), the round-12 scale row's
    * linear term. Maintained O(batch) on absorb by the streaming loop
    * and partition-rewritten alongside the index by takedowns. */
  def minhashMembersDir(indexDir: String): String = s"${indexDir}_members"

  /** Derive the membership table from an EXISTING signature index (one
    * distinct over (doc_id, batch_id)) — the backfill for indexes built
    * before the members tier (the streaming loop appends it per batch
    * thereafter). */
  def buildMinhashMembers(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String): Unit =
    // explicit schema: an index dir whose only batch produced zero
    // signatures holds no parquet files, and schema INFERENCE would
    // throw — with the schema the backfill just writes an empty map
    spark.read.schema(minhashIndexSchema).parquet(indexDir)
      .select(col("doc_id"), col("batch_id").cast("long").as("batch_id"))
      .distinct()
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(minhashMembersDir(indexDir))

  /** The persisted signature-index schema ((doc_id, i, mh) partitioned by
    * batch_id) — for inference-free reads of possibly-empty dirs. */
  private val minhashIndexSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", org.apache.spark.sql.types.LongType)
    .add("i", org.apache.spark.sql.types.IntegerType)
    .add("mh", org.apache.spark.sql.types.LongType)
    .add("batch_id", org.apache.spark.sql.types.LongType)

  private val minhashMembersSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", org.apache.spark.sql.types.LongType)
    .add("batch_id", org.apache.spark.sql.types.LongType)

  /** Rewrite `dir`'s touched batch_id partitions minus `gone` (dynamic
    * overwrite), deleting partitions left with no survivors — the shared
    * partition-scoped takedown step for the signature index and its
    * members sibling. */
  private def rewritePartitionsMinus(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      gone: DataFrame, touched: Seq[Long]): Unit = {
    // localCheckpoint: survivors must be materialized BEFORE the dynamic
    // overwrite replaces the very files the plan reads
    val survivors = spark.read.parquet(dir)
      .where(col("batch_id").isin(touched: _*))
      .join(broadcast(gone), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val survivedBatches = survivors.select(col("batch_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    if (survivedBatches.nonEmpty)
      survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(survivedBatches).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"batch_id=$b"), true)
    }
  }

  def removeFromMinhashIndexDir(spark: org.apache.spark.sql.SparkSession,
                                indexDir: String,
                                removeIds: DataFrame): Unit = {
    val gone = removeIds.select(col("doc_id")).distinct().localCheckpoint()
    val membersDir = minhashMembersDir(indexDir)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasMembers = fs.exists(new org.apache.hadoop.fs.Path(membersDir))
    // the members sibling is a valid probe only when it COVERS every
    // index batch (a partial map — e.g. per-batch appends started on top
    // of a pre-members index — would silently miss every uncovered doc's
    // signatures: an incomplete takedown with no error). Coverage is a
    // cheap listing compare: every index batch_id= partition must exist
    // in the members map (the reverse need not hold — an index partition
    // emptied by an earlier takedown may linger members-side briefly).
    def batchParts(dir: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName).toSet
    }
    val membersCover =
      hasMembers && batchParts(indexDir).subsetOf(batchParts(membersDir))
    // the touched-partition PROBE: against the slim members map when it
    // provably covers the index (O(docs) read, the scale path), else the
    // signature scan (pre-members or partial-members indexes stay
    // serviceable — and correct). Explicit schemas: either side may be an
    // empty directory (a fully-taken-down index), where inference throws.
    val probe =
      if (membersCover)
        spark.read.schema(minhashMembersSchema).parquet(membersDir)
      else spark.read.schema(minhashIndexSchema).parquet(indexDir)
    val touched = probe.join(broadcast(gone), Seq("doc_id"))
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return
    // the index and members rewrites target DIFFERENT directories from
    // the same materialized `gone` — independent, so overlap them (the
    // Similarity.parallelWrites discipline)
    if (membersCover)
      Similarity.parallelWrites(spark)(
        () => rewritePartitionsMinus(spark, indexDir, gone, touched),
        () => rewritePartitionsMinus(spark, membersDir, gone, touched))
    else {
      rewritePartitionsMinus(spark, indexDir, gone, touched)
      // self-heal a PARTIAL map: this takedown already paid the signature
      // scan; rebuilding the sibling here restores O(docs) probes for
      // every later takedown instead of falling back forever
      if (hasMembers) buildMinhashMembers(spark, indexDir)
    }
  }

  /** DELETE documents from a persisted [[spanIndex]] — the span family's
    * takedown leg: positional shingles are per-doc independent, so
    * deletion is one anti-join and the survivor index equals
    * [[spanIndex]] over the survivors exactly; without it a deleted doc's
    * shingle positions keep matching every future
    * [[sharedSpansIncremental]] probe. */
  def removeFromSpanIndex(index: DataFrame, removeIds: DataFrame): DataFrame =
    index.join(broadcast(removeIds.select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_anti")

  /** DELETE documents from a [[buildPairsArtifact]] pair graph — the
    * takedown leg for the persisted artifact every downstream consumer
    * (clustering, safe splits, triplet mining, verdict) fans out from: a
    * pair is evidence ABOUT both members, so removing a doc removes
    * every pair it participates in (two index-sized anti-joins; surviving
    * pairs' scores are pairwise facts and do not move). Staged through
    * [[graft.sources.AtomicSwap]] so a crash mid-rewrite leaves the old
    * or the new graph, never a torn one. Idempotent by construction. */
  def removeFromPairsArtifact(spark: org.apache.spark.sql.SparkSession,
                              dir: String, removeIds: DataFrame): Unit = {
    graft.sources.AtomicSwap.recover(spark, dir)
    val gone = removeIds.select(col("doc_id")).distinct()
    spark.read.parquet(s"$dir/pairs")
      .join(broadcast(gone.select(col("doc_id").as("doc_a"))),
        Seq("doc_a"), "left_anti")
      .join(broadcast(gone.select(col("doc_id").as("doc_b"))),
        Seq("doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("jaccard_x10000"))
      .write.mode("overwrite")
      .parquet(graft.sources.AtomicSwap.stageDir(dir, "pairs"))
    graft.sources.AtomicSwap.commit(spark, dir, Seq("pairs"))
  }

  /** Incremental containment maintenance — [[containmentPairs]]' corpus-
    * update path, completing the incremental tier (minhash / clusters /
    * spans / containment): given the persisted hashed-shingle index of the
    * EXISTING corpus (`(doc_id, h)`, the [[shingleTable]]-hash shape) and a
    * batch of NEW documents (ids disjoint from the index — the standing
    * incremental contract), produce exactly the containment pairs involving
    * a new doc. New docs probe the index (O(new × collisions), never
    * O(corpus)); new-new pairs come from the batch's own self-join; sizes
    * read the MERGED universe so scores equal the batch run restricted to
    * new-member pairs (the spec asserts equality). */
  def containmentPairsIncremental(existingSh: DataFrame, newDocs: DataFrame,
                                  n: Int, minContainX10000: Long): DataFrame = {
    val newSh = shingleTable(newDocs, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
      .localCheckpoint() // probe side consumed three times
    val allSh = existingSh.unionByName(newSh)
    val sizes = allSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // new-vs-existing: ids disjoint by contract, one row per match
    val ne = newSh.alias("a")
      .join(existingSh.alias("b"), col("a.h") === col("b.h"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    // new-vs-new: ordered self-join so each match counts once
    val nn = newSh.alias("a")
      .join(newSh.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    ne.unionByName(nn)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("containment_x10000",
        floor(lit(10000.0) * col("n_common") / least(col("n_a"), col("n_b")) + 0.5)
          .cast("long"))
      .where(col("containment_x10000") >= minContainX10000)
      .select(col("doc_a"), col("doc_b"),
        col("containment_x10000"),
        floor(lit(10000.0) * col("n_common") / (col("n_a") + col("n_b") - col("n_common")) + 0.5)
          .cast("long").as("jaccard_x10000"),
        when(col("n_a") < col("n_b"), col("doc_a"))
          .when(col("n_b") < col("n_a"), col("doc_b"))
          .otherwise(lit(-1L)).as("contained_doc"))
  }

  /** MinHash-LSH candidate-recall evaluation — the dedup analog of the ANN
    * eval harness: how many TRUE near-dup pairs (exact n-gram Jaccard ≥
    * `minJaccardX10000`, computed by [[ngramJaccardPairs]]) does the banded
    * candidate generation of [[minhashPairs]] actually surface, per Jaccard
    * decile band? LSH theory gives P(candidate) = 1-(1-J^r)^b, but the
    * achieved recall on THIS corpus's shingle distribution is what decides
    * whether (k, bands) is enough before committing a 100 TB dedup run —
    * measure, don't guess. Set the truth threshold well BELOW the dedup cut
    * so the curve's knee is visible (recall should be ~0 far below the cut
    * and ~1 above it; a sagging top band means more bands are needed).
    *
    * Output: (jaccard_band, n_true, n_caught, recall_ppm), band =
    * ⌊J×10⌋ ∈ [minJ/1000 .. 10].
    *
    * Scale shape: truth is the audited inverted-index self-join; candidates
    * are the banded equi-join; the two meet in ONE left join on the
    * (doc_a, doc_b) pair key, and the rollup output is ≤ 11 rows. Nothing
    * here costs more than the dedup run it de-risks. */
  def lshCandidateEval(docs: DataFrame, n: Int = 3, k: Int = 16,
                       bands: Int = 4, minJaccardX10000: Long = 3000,
                       docFreqCap: Option[Int] = None): DataFrame = {
    require(k % bands == 0, s"k ($k) must be divisible by bands ($bands)")
    // ONE materialized shingle scan feeds both legs: the truth side reads
    // it three times (sizes + both self-join sides) and the minhash side
    // once — without the checkpoint the tokenize→shingle→hash chain (and
    // the planted-copy union above it) re-runs per consumer. (doc_id, h)
    // is ~1% of corpus bytes — the persisted-dedup-index posture at
    // 100 TB.
    val sh0 = shingleTable(docs, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
      .localCheckpoint()
    val truth = ngramJaccardPairsFromHashes(sh0, minJaccardX10000, docFreqCap)
    val bandKeys = bandKeyTable(minhashTableFromHashes(sh0, k), k / bands)
    val cand = bandKeys.alias("x")
      .join(bandKeys.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .withColumn("caught", lit(1L))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .groupBy(floor(col("jaccard_x10000") / 1000).cast("long")
        .as("jaccard_band"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
      .withColumn("recall_ppm",
        floor(lit(1000000.0) * col("n_caught") / col("n_true") + 0.5)
          .cast("long"))
  }

  /** 32-bit SimHash per doc over token hashes weighted by term frequency.
    * One-pass custom aggregate ([[graft.plans.SimHashAgg]]): the 32 bit
    * votes live in a mutable buffer, so the plan is two hash aggregations
    * (term counts, then simhash) with no 32× row explosion. Votes are exact
    * integer sums — order-independent, so the relational DuckDB oracle
    * (explode bits → per-bit vote → regroup) matches bit-for-bit. */
  def simhashTable(docs: DataFrame): DataFrame =
    explodeTokens(docs, "tok", "doc_id")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      // charPolyHash < 1e9+7 < 2^30 would leave bits 30-31 permanently
      // unset (weakening the top blocking band); an LCG step mod the prime
      // 4294967291 spreads the hash over the full 32-bit range — same
      // arithmetic in the DuckDB oracle
      .withColumn("h", (charPolyHash(col("tok")) * 48271L) % 4294967291L)
      .groupBy(col("doc_id"))
      .agg(graft.plans.SimHashAgg.simhashAgg(col("h"), col("cnt")).as("simhash"))

  // NOTE: there is deliberately NO 32-bit pair path. Banding a 32-bit
  // fingerprint on 8-bit bands collides randomly at E[pairs] ≈ 4·n²/2·2⁻⁸
  // — measured 15× slower than the 60-bit form at 500k docs and quadratic
  // past that — so the ONLY pair operator is [[simhashPairs60]]; the
  // 32-bit table survives as the compact per-doc fingerprint (and the
  // SimHashAgg oracle pin), never as a blocking key.

  /** 60-bit SimHash table — the SCALE-PATH fingerprint width. The 32-bit
    * table's 8-bit blocking bands collide RANDOMLY at
    * `E[pairs] ≈ 4·n²/2·2⁻⁸`: negligible at eval scale, ~2×10⁹ spurious
    * candidates at n = 500k (measured 178 s at sf10-syn), quadratic at
    * 100 TB. Widening to a 60-bit fingerprint (token hash = the dual-fold
    * [[graft.functions.TextFunctions.contentHash]], ~2⁶⁰ space) with
    * 15-bit bands cuts random band collisions 128× while keeping the
    * pigeonhole guarantee (hamming ≤ 3 over 4 bands → ≥ 1 band clean →
    * 100% recall). Same one-buffer [[graft.plans.SimHashAgg]] pass,
    * `bits = 60`. */
  def simhashTable60(docs: DataFrame): DataFrame =
    explodeTokens(docs, "tok", "doc_id")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", contentHash(col("tok")))
      .groupBy(col("doc_id"))
      .agg(graft.plans.SimHashAgg.simhashAgg(col("h"), col("cnt"), 60)
        .as("simhash"))

  /** SimHash near-dup pairs over the 60-bit fingerprint: block on the 4
    * 15-bit bands, verify exact hamming — hamming ≤ 3 pair semantics at
    * the blocking width a web-scale corpus needs. */
  def simhashPairs60(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val st = simhashTable60(docs)
    val banded = st.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("bkey",
        expr("shiftright(simhash, CAST(j * 15 AS INT)) & 32767"))
    val cand = banded.alias("x")
      .join(banded.alias("y"),
        col("x.j") === col("y.j") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.simhash").as("sim_a"),
        col("y.doc_id").as("doc_b"), col("y.simhash").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Order-fixed dot product over double arrays — bit-identical to DuckDB's
    * sequential `list_dot_product`. Codegen'd custom expression
    * ([[graft.plans.DotProductExpr]]); the equivalent (interpreted) built-in
    * form is `aggregate(sequence(1,size(a)), 0.0, (s,i) => s+a[i]*b[i])`. */
  def dotCol(a: Column, b: Column): Column =
    graft.plans.ArrayExpressions.dotProduct(a, b)

  /** Attach a unit-normalized copy of the embedding: `vn = v / ‖v‖`.
    * Norm is materialized as its own column first so the division inside
    * `transform` doesn't re-fold the dot product per element. After this,
    * cosine(a, b) = dot(vn_a, vn_b) — one fold per pair instead of three. */
  def withUnitVector(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))

  /** Embedding pairs above a cosine threshold, all-pairs form.
    *
    * Deliberately NOT banded: this query's regime (threshold 0.4 on this
    * corpus) has Ω(n²) output — measured on the test embeddings, ~0.05% of
    * ALL pairs qualify and the background cosine distribution is dense just
    * below the threshold (99.9th pct ≈ 0.38) — so no candidate-generation
    * scheme can beat the output size. The LSH recall math agrees: a random
    * hyperplane agrees on a cos-0.4 pair with p = 1−acos(0.4)/π ≈ 0.631 vs
    * 0.5 for a random pair; driving the miss rate of the threshold pair to
    * ≤1e-4 needs (1−0.631^b)^T ≤ 1e-4, and at every band width b that T
    * admits ≥44% of random pairs while costing more plane-dot work than
    * the 64-mult exact dot it tries to avoid (b=12 ⇒ T≈2350 tables ⇒ 28k
    * dots/vector). Low-threshold all-pairs similarity is intrinsically
    * quadratic — at 100 TB you either raise the threshold into the
    * near-dup regime ([[embeddingNearDupPairsBanded]], which IS banded) or
    * accept a distributed blocked cartesian sized to the cluster.
    *
    * That regime choice is enforced: below `quadraticSafeFloor` (cos 0.9,
    * where the banded sibling answers the same question in O(n)) the caller
    * must opt in with `allowQuadratic = true` — a low threshold can't be
    * aimed at a 100 TB corpus by accident. */
  val quadraticSafeFloor = 900000L
  def embeddingNearDupPairs(emb: DataFrame, minCosX1000000: Long,
                            allowQuadratic: Boolean = false): DataFrame = {
    require(minCosX1000000 >= quadraticSafeFloor || allowQuadratic,
      s"threshold $minCosX1000000 < $quadraticSafeFloor is the all-pairs " +
        "regime (Ω(n²) output): use embeddingNearDupPairsBanded, or pass " +
        "allowQuadratic = true to accept a corpus-sized cartesian")
    val e = withUnitVector(emb).select(col("vec_id"), col("vn"))
    e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_x1000000",
        floor(dotCol(col("a.vn"), col("b.vn")) * 1000000.0 + 0.5).cast("long"))
      .where(col("cos_x1000000") >= minCosX1000000)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cos_x1000000"))
  }

  /** Embedding near-dup pairs via random-hyperplane LSH banding — the
    * 100 TB path for the regime LSH is actually for: near-identical copies
    * (cosine ≥ ~0.9, p_agree ≥ 0.856, output O(n)).
    *
    * Plan shape: one map-only pass packs `planes` sign bits per (vector,
    * table) — all tables·planes hyperplane dots run inside ONE codegen'd
    * expression ([[graft.plans.MultiPlaneBucketsExpr]]) that carries the
    * dim×(tables·planes) weight matrix as a referenced object, so the plan
    * holds one node and the task binary one `double[]` (the previous
    * literal-matrix formulation expanded to ~10⁶ expression nodes and
    * multi-MiB task binaries — pure plan overhead that dwarfed the data) —
    * then candidates come from an equi-join on (table, bucket) carrying the
    * vector as payload — the standard LSH index layout: one shuffle of
    * n·tables index rows, exact-cosine verification inline in the join, no
    * re-join against the corpus to fetch vectors (re-fetching shuffles every
    * candidate pair a second and third time; candidates outnumber vectors
    * ~50× on this corpus). A pair colliding in several tables computes its
    * dot once per collision before the final distinct — cheaper than the
    * extra pair-sized shuffles it avoids, since true near-dups are O(n) and
    * random collisions average ~1 table. No cross join anywhere. With the
    * default 16 planes × 8 tables on the test corpus: 100% recall of all
    * ≥0.9 pairs, 0.65% of all pairs admitted as candidates (measured).
    *
    * Miss probability for a pair at cosine c: (1 − p^planes)^tables with
    * p = 1 − acos(c)/π — at c=0.999 (a true near-copy) ≈ 3e-7; raise
    * `tables` for more recall, `planes` for fewer candidates. */
  def embeddingNearDupPairsBanded(emb: DataFrame, minCosX1000000: Long,
                                  planes: Int = 16, tables: Int = 8,
                                  dim: Int = 64): DataFrame = {
    val buckets = withUnitVector(emb)
      .select(col("vec_id"), col("vn"),
        posexplode(graft.plans.ArrayExpressions.planeBuckets(
          col("vn"), planes, tables, dim)).as(Seq("t", "bucket")))
    buckets.alias("x")
      .join(buckets.alias("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos_x1000000",
        floor(dotCol(col("x.vn"), col("y.vn")) * 1000000.0 + 0.5).cast("long"))
      .where(col("cos_x1000000") >= minCosX1000000)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("cos_x1000000"))
      .distinct() // a pair may collide in several tables — emit it once
  }

  /** Connected components over a near-dup pair list — the step after pair
    * generation in every dedup pipeline: pairs only relate docs two at a
    * time, but the KEEP/DROP decision needs the transitive closure (a~b,
    * b~c ⇒ one cluster {a,b,c} with one canonical survivor).
    *
    * Iterative min-label propagation: each round every node takes the min
    * label among itself and its neighbors; converged when no label changes.
    * Rounds = graph diameter — near-dup components are tiny (pairs/chains),
    * so 2–3 rounds in practice; `maxIters` bounds pathological chains. Each
    * round is one equi-join + one map-side-combinable min aggregation, and
    * `localCheckpoint` cuts the growing lineage (the standard Spark
    * iterative-algorithm shape, same as MLlib). At 100 TB diameter-bound
    * propagation still holds for near-dup graphs; for adversarial diameters
    * the upgrade path is the large-star/small-star decomposition, which
    * keeps this exact per-round join shape.
    *
    * Output: (id, canonical_id) for every node that appears in a pair —
    * singletons are implicitly their own canonical. Matches a DuckDB
    * recursive-CTE min-reachable-id oracle exactly (both compute the same
    * fixpoint). */
  def dedupClusters(pairs: DataFrame, aCol: String = "doc_a",
                    bCol: String = "doc_b", maxIters: Int = 20): DataFrame = {
    // materialize the pair input ONCE before the symmetrize union reads it
    // twice — callers pass the raw near-dup pair QUERY (a shingle
    // self-join), and an unmaterialized lineage would re-run that whole
    // chain per union leg
    val p = pairs.localCheckpoint()
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint() // reused every round: compute the edge set once
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nbr_min"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      converged = updated.where(col("label") =!= col("old_label")).isEmpty
      labels = updated.select(col("id"), col("label"))
      i += 1
    }
    // silent exhaustion would return INTERMEDIATE labels — one real cluster
    // reported as several, each with its own "canonical" survivor, and a
    // consumer would silently keep duplicates. Fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge in $maxIters rounds — the pair " +
        "graph has a long-diameter component; use dedupClustersStar " +
        "(O(log) rounds) or raise maxIters")
    labels.select(col("id"), col("label").as("canonical_id"))
  }

  /** Connected components in O(log) rounds — the alternating
    * large-star/small-star decomposition (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): the scale upgrade over
    * [[dedupClusters]]' diameter-bound propagation for graphs with long
    * chains.
    *
    * Each round: **large-star** connects every strictly-larger neighbor of
    * a node to the minimum of its closed neighborhood; **small-star**
    * (edges oriented larger→smaller) connects all smaller neighbors and the
    * node itself to that minimum. Both are one groupBy-min plus one
    * equi-join over the edge set — the same per-round shuffle shape as
    * propagation, but the edge set contracts toward a star per component
    * in a logarithmic number of rounds instead of one hop per round.
    * Fixpoint = the edge set stops changing; then every edge is
    * (node → component min).
    *
    * Same output contract as [[dedupClusters]] (and the same recursive-CTE
    * oracle): (id, canonical_id) for every node appearing in a pair. */
  def dedupClustersStar(pairs: DataFrame, aCol: String = "doc_a",
                        bCol: String = "doc_b", maxIters: Int = 25): DataFrame = {
    // materialize the pair QUERY before the three reads below (both node
    // union legs + the edge normalization) — the dedupClusters rule
    val p = pairs.localCheckpoint()
    // same node universe as dedupClusters: every id appearing in a pair —
    // including self-pairs, whose nodes must still come out as their own
    // canonical even though the (a, a) edge itself carries no information
    val nodes = p.select(col(aCol).as("id"))
      .unionByName(p.select(col(bCol).as("id"))).distinct()
      .localCheckpoint()
    var e = p
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v")).distinct()
      .localCheckpoint()
    // order-independent edge-set signature: (count, XOR of xxhash64(u, v))
    // in ONE map-side-combinable aggregate — the fixpoint test costs one
    // action per round instead of count + count + except (two jobs + an
    // anti-join shuffle). Both edge sets are distinct-normalized, so equal
    // signatures ⇔ equal sets up to a 2^-64-scale hash collision —
    // negligible next to the corpus-level MinHash/LSH error budget this
    // feeds. (XOR, not sum: a 64-bit hash sum overflows under ANSI mode.)
    def edgeSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = edgeSig(e)
    var converged = prevSig._1 == 0L
    var i = 0
    while (!converged && i < maxIters) {
      // large-star: for each directed (u, v) with v > u, emit (v, m_u)
      val dir = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mL = dir.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val afterLarge = dir.join(mL, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // small-star: orient larger→smaller, then point every smaller
      // neighbor AND the node itself at the minimum
      val el = afterLarge.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).distinct()
      val mS = el.groupBy(col("u")).agg(min(col("v")).as("m"))
      val joined = el.join(mS, Seq("u"))
      val afterSmall = joined.select(col("v").as("u"), col("m").as("v"))
        .unionByName(joined.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v")).distinct()
        .localCheckpoint()
      // fixpoint: the (normalized) edge set is unchanged
      val sig = edgeSig(afterSmall)
      converged = sig == prevSig
      prevSig = sig
      e = afterSmall
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not converge in $maxIters rounds " +
        "(log-round bound exceeded — raise maxIters)")
    nodes
      .join(e.select(col("u").as("id"), col("v").as("root")), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("root"), col("id"))).as("canonical_id"))
  }

  /** Test-corpus builder for the near-dup regime: the synthetic embeddings
    * have no high-cosine pairs (max ≈ 0.6), so near-dup demos plant one
    * deterministic near-copy per vector — component 1 scaled ×1.05 after
    * the double cast (cosine ≥ 0.9998 to its source), id offset so pairs
    * are identifiable. Bit-identical cross-engine (IEEE multiply on the
    * same doubles).
    *
    * Precondition: every base `vec_id` must be < `idOffset`, else planted
    * ids collide with base ids and pair identification silently corrupts on
    * BOTH engines (OperatorsSpec asserts this on the test corpus). */
  /** Cluster-size histogram — the dedup report's headline number: how many
    * duplicate clusters of each size the corpus carries (size 1 = docs in
    * the pair graph whose component collapsed to themselves). Two tiny
    * aggregations over the clustering output. */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Incremental connected components — the cluster-maintenance path
    * (sibling of [[minhashPairsIncremental]] one stage later in the dedup
    * pipeline): fold NEW near-dup pairs into EXISTING cluster assignments
    * without re-clustering the corpus. The existing assignment is already
    * a star (every member points at its canonical), and stars preserve
    * connectivity — so clustering (existing-as-pairs ∪ new pairs) yields
    * exactly the batch clustering of (old pairs ∪ new pairs), at the cost
    * of an edge set sized |clustered nodes| + |new pairs| instead of the
    * full pair graph, converging in ~1 star round when new pairs only
    * attach to cluster fringes. Rows with `id = canonical_id` ride along
    * as self-pairs, keeping singleton nodes in the output. */
  def dedupClustersIncremental(existing: DataFrame, newPairs: DataFrame,
                               aCol: String = "doc_a", bCol: String = "doc_b",
                               maxIters: Int = 25): DataFrame =
    dedupClustersStar(
      existing.select(col("id").as(aCol), col("canonical_id").as(bCol))
        .unionByName(newPairs.select(col(aCol), col(bCol))),
      aCol, bCol, maxIters)

  def withNearCopies(emb: DataFrame, idOffset: Long = 1000000L,
                     dim: Int = 64): DataFrame = {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val pert = base.select((col("vec_id") + idOffset).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) * 1.05),
        slice(col("embedding"), 2, dim - 1)).as("embedding"))
    base.unionByName(pert)
  }

  // ------------------------------------------------------------------
  // Line-level deduplication (CCNet / RefinedWeb style)
  // ------------------------------------------------------------------

  /** Exploded "lines" of each document: fixed-width runs of `wordsPerLine`
    * whitespace tokens, `(doc_id, line_no, line)`. The synthetic corpus has
    * no newlines, so lines are derived by deterministic chunking — on real
    * web text the same operator runs over `split(text, '\n')` instead.
    *
    * Map-only: tokens are materialized once, then each chunk is a `slice`
    * over the bound array (no re-tokenization per element, no shuffle). */
  def lineTable(docs: DataFrame, wordsPerLine: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(
          graft.functions.TextFunctions.lineChunks(col("toks"), wordsPerLine)))
      .select(col("doc_id"), col("pos").cast("long").as("line_no"),
        col("col").as("line"))

  /** Corpus-wide line-level dedup: a line survives only in its FIRST
    * occurrence (ordered by `(doc_id, line_no)`); every later copy — the
    * boilerplate header, the syndicated paragraph — is dropped, and each
    * document is reassembled from its surviving lines in original order.
    * Output: `(doc_id, n_lines, n_kept, kept_text)` — a fully-deduplicated
    * doc has `kept_text = ''` and `n_kept = 0`, it is not silently lost.
    *
    * Scale posture (100 TB): first-occurrence is a map-side-combinable
    * `min(struct(doc_id, line_no))` aggregate + equi-join back on the line —
    * NOT `row_number() over (partition by line)`, which sorts every copy of
    * a hot boilerplate line inside one partition. Shuffles: one on the line
    * key (agg + join share it), one on doc_id for reassembly. At 100 TB join
    * on `xxhash64(line)` instead of the string to shrink both exchanges. */
  def lineDedup(docs: DataFrame, wordsPerLine: Int = 10): DataFrame = {
    val lines = lineTable(docs, wordsPerLine)
    val firsts = lines.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_no"))).as("first"))
    lines.join(firsts, Seq("line"))
      .withColumn("keep",
        col("first.doc_id") === col("doc_id") && col("first.line_no") === col("line_no"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          " ").as("kept_text"))
  }

  /** Positional (non-distinct) word-n-gram shingles: (doc_id, pos, sh) with
    * `pos` the 0-based token offset of the shingle's first token. The
    * positional sibling of [[shingleTable]] (which deduplicates and drops
    * offsets) — span detection needs every occurrence AND its position. */
  def posShingleTable(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) < n, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*)))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("sh"))

  /** Shared-span detection — the exact-substring dedup signal (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): for each
    * doc pair, the maximal runs of CONSECUTIVE shared n-gram shingles. A
    * run of `r` consecutive shared n-grams is a verbatim shared span of
    * `r + n - 1` tokens — long spans are copying evidence even when
    * whole-doc Jaccard is low (a quote, a syndicated paragraph, a license
    * header), which is exactly what set-based near-dup ([[ngramJaccardPairs]],
    * [[minhashPairs]]) cannot see.
    *
    * Algorithm (gaps-and-islands, fully relational): positional shingles →
    * hash → inverted-index self-join on the shingle hash → matches at
    * `(pos_a, pos_b)` belong to the same diagonal iff `pos_a - pos_b` is
    * constant, and consecutive positions on a diagonal form an island
    * (`pos_a - row_number()` is constant within it). Per island: run length
    * and start offsets; per pair: the longest run, run count, and total
    * shared positions — runs shorter than `minRun` are noise (shared
    * vocabulary) and are dropped before the per-pair rollup.
    *
    * Scale shape (100 TB): the join is the same bounded inverted-index
    * equi-join as [[ngramJaccardPairs]] (use `docFreqCap` to prune hot
    * shingles — boilerplate diagonals are exactly the skew point); the
    * island window partitions by `(pair, diagonal)` — bounded by the
    * matched positions of one pair, never corpus-sized. Output is bounded
    * by true shared spans, not |docs|².
    *
    * Output: (doc_a, doc_b, n_runs, max_run, shared_pos, max_span_tokens).
    */
  def sharedSpans(docs: DataFrame, n: Int, minRun: Int,
                  docFreqCap: Option[Int] = None): DataFrame =
    spanRuns(docs, n, minRun, docFreqCap)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"),
        sum(col("run_len")).as("shared_pos"))
      .withColumn("max_span_tokens", col("max_run") + lit(n.toLong) - 1L)

  /** The qualifying islands behind [[sharedSpans]]: one row per maximal run
    * of >= `minRun` consecutive shared n-grams —
    * (doc_a, doc_b, diag, run_len, start_a, start_b). */
  def spanRuns(docs: DataFrame, n: Int, minRun: Int,
               docFreqCap: Option[Int] = None): DataFrame = {
    require(n >= 1 && minRun >= 1, "n and minRun must be positive")
    val sh0 = posShingleTable(docs, n)
      .select(col("doc_id"), col("pos"), charPolyHash(col("sh")).as("h"))
    val sh = docFreqCap match {
      case Some(cap) =>
        val hot = sh0.groupBy(col("h")).count()
          .where(col("count") > cap).select(col("h"))
        sh0.join(hot, Seq("h"), "left_anti")
      case None => sh0
    }
    val m = sh.alias("a")
      .join(sh.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    m.withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run_len"),
        min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"))
      .where(col("run_len") >= minRun)
      .select(col("doc_a"), col("doc_b"), col("diag"), col("run_len"),
        col("start_a"), col("start_b"))
  }

  /** Within-doc repeated spans — internal self-copy detection (the
    * span-granular analog of Gopher's duplicate-paragraph fraction, which
    * [[graft.operators.TextAnalysis.repetition]] approximates at bigram
    * granularity): maximal runs of consecutive n-gram positions that
    * REAPPEAR verbatim later in the SAME doc. A generated or scraped doc
    * that loops a paragraph shows up as a long internal run; organic prose
    * doesn't. Same gaps-and-islands machinery as [[spanRuns]], restricted
    * to one doc with `pos_a < pos_b` (each repeat pairs with its earliest
    * earlier occurrence once per diagonal).
    * Output: (doc_id, n_runs, max_run, rep_pos) — docs with no qualifying
    * internal repeat are absent (join back for a full report). */
  def selfSpans(docs: DataFrame, n: Int, minRun: Int): DataFrame = {
    require(n >= 1 && minRun >= 1, "n and minRun must be positive")
    val sh = posShingleTable(docs, n)
      .select(col("doc_id"), col("pos"), charPolyHash(col("sh")).as("h"))
    val m = sh.alias("a")
      .join(sh.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.h") === col("b.h") &&
          col("a.pos") < col("b.pos"))
      .select(col("a.doc_id").as("doc_id"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .withColumn("diag", col("pos_b") - col("pos_a"))
    val w = Window.partitionBy(col("doc_id"), col("diag")).orderBy(col("pos_a"))
    m.withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_id"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .where(col("run_len") >= minRun)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"),
        sum(col("run_len")).as("rep_pos"))
  }

  /** Winnowing fingerprints (Schleimer et al., the MOSS algorithm) — the
    * guaranteed-coverage alternative to MinHash sampling: slide a window
    * of `w` consecutive shingle-hash positions over each doc and keep the
    * window's minimum hash (rightmost position on ties). Any shared
    * substring of length ≥ w + n − 1 tokens is GUARANTEED to contribute at
    * least one common fingerprint (MinHash gives only probabilistic
    * coverage), while storing ~2/(w+1) of the shingles. One analytic
    * window per doc — map-side after a per-doc sort, no shuffle beyond the
    * doc partitioning.
    *
    * The (min h, rightmost pos) selection packs into ONE integer key —
    * `(HashMod − h)·2²⁰ + pos`, maximized — so the window aggregate and
    * its cross-engine oracle are plain integer max (a struct/tuple max
    * orders differently across engines). Supports docs up to 2²⁰ shingle
    * positions (≈10⁶ tokens; split longer docs upstream).
    * Output: (doc_id, pos, h) distinct fingerprints. */
  def winnowingFingerprints(docs: DataFrame, n: Int, w: Int): DataFrame = {
    require(w >= 1, "window must be >= 1")
    val K = 1048576L // 2^20
    val sh = posShingleTable(docs, n)
      .select(col("doc_id"), col("pos"), charPolyHash(col("sh")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    sh
      .withColumn("selKey",
        max((lit(graft.functions.TextFunctions.HashMod) - col("h")) * K + col("pos"))
          .over(win))
      // emit only full windows (pos >= w-1): partial leading windows would
      // over-select early shingles
      .where(col("pos") >= w - 1)
      .select(col("doc_id"),
        (col("selKey") % K).as("pos"),
        // division by 2^20 is exact in double; cast truncates = floor (>=0)
        (lit(graft.functions.TextFunctions.HashMod) -
          (col("selKey") / K).cast("long")).as("h"))
      .distinct()
  }

  /** Near-dup pairs from shared winnowing fingerprints: the inverted-index
    * join of [[ngramJaccardPairs]] running on the winnowed ~2/(w+1)
    * sample instead of every shingle — with the winnowing guarantee that
    * any shared run of ≥ w + n − 1 tokens still collides. */
  def winnowingPairs(docs: DataFrame, n: Int, w: Int,
                     minCommon: Long): DataFrame = {
    require(minCommon >= 1, "minCommon must be positive")
    val fp = winnowingFingerprints(docs, n, w).select(col("doc_id"), col("h"))
    fp.alias("a")
      .join(fp.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
  }

  /** Per-document span coverage — the doc-level ACTION of span dedup (Lee
    * et al. drop or trim docs whose content is substantially covered by
    * spans shared with other docs): for each doc, the fraction of its
    * shingle positions lying inside a qualifying shared run (either side
    * of any pair). Output: (doc_id, n_pos, n_covered, coverage_x10000) for
    * EVERY doc — uncovered docs report 0, they are not silently dropped.
    *
    * Runs may overlap across partners and diagonals (the same passage
    * shared with many docs), so coverage counts DISTINCT positions: each
    * run explodes into its position interval (bounded: `run_len` rows per
    * run, only for qualifying runs), then a per-doc distinct count. Scale
    * shape: [[spanRuns]]'s joins + one distinct + one agg, all on bounded
    * span output — no corpus-sized blowup beyond the shingle join itself. */
  /** Jaccard similarity histogram — the THRESHOLD-TUNING curve: how many
    * candidate pairs sit at each similarity decile? Cutting at 0.5 vs 0.8
    * changes the drop count by whatever lives between the buckets, and
    * this is the query that shows it before anyone commits to a number.
    * Same inverted-index candidate generation as [[ngramJaccardPairs]]
    * (df-capped), WITHOUT the threshold; each pair lands in
    * `min(jx DIV 1000, 9)` (so bucket 9 is [0.9, 1.0] inclusive).
    * Output per decile: pair count, min/max jx. */
  def jaccardHistogram(docs: DataFrame, n: Int,
                       docFreqCap: Long = 1000): DataFrame = {
    // materialized once: the hashed shingle table feeds the df-cap
    // aggregate, the anti-join probe side, and (through `sh`) the sizes
    // aggregate and both self-join sides — uncheckpointed, the
    // tokenize→shingle→hash chain re-runs per consumer
    val sh0 = shingleTable(docs, n)
      .select(col("doc_id"), charPolyHash(col("sh")).as("h"))
      .localCheckpoint()
    val hot = sh0.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > docFreqCap).select(col("h"))
    val sh = sh0.join(hot, Seq("h"), "left_anti")
    // sizes from the SAME capped universe as the intersections — the
    // ngramJaccardPairs consistency rule
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.alias("a")
      .join(sh.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("jx", floor(lit(10000.0) * col("n_common") /
        (col("na") + col("nb") - col("n_common")) + 0.5).cast("long"))
      .withColumn("decile", least(expr("jx DIV 1000"), lit(9L)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"), min(col("jx")).as("min_jx"),
        max(col("jx")).as("max_jx"))
  }

  /** Quality-aware survivor selection — WHICH copy to keep: min-id
    * canonicals are arbitrary; a curation pipeline keeps each cluster's
    * highest-QUALITY member (the cleanest scrape of the mirrored page),
    * with id as the tie-break. One slim join of the cluster assignment
    * against the quality scores + one map-combinable min(struct) per
    * cluster. Output: `(cluster_id, survivor_id, survivor_quality_x10000,
    * n_members)`. */
  def bestSurvivors(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_x10000"))
    clusters.select(col("id").as("doc_id"), col("canonical_id").as("cluster_id"))
      .join(q, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("quality_x10000")).as("nq"), col("doc_id").as("id")))
        .as("m"), count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("m").getField("id").as("survivor_id"),
        (-col("m").getField("nq")).as("survivor_quality_x10000"),
        col("n_members"))
  }

  /** Cluster labels — the human-facing line of the dedup report: for each
    * near-dup cluster (≥ 2 members), its top `k` distinguishing terms by
    * cluster-tf × corpus-idf (the [[graft.operators.TextAnalysis
    * .keywords]] integer fixed-point idf — no libm, oracle-exact). "278
    * docs, label: 'invoice payment reminder'" reads; a bare canonical id
    * doesn't.
    *
    * Plan shape: the pair-graph closure ([[dedupClusters]]) is reused as
    * given; member docs explode once, one (cluster, term) agg, a term
    * equi-join against the corpus df table, one per-cluster window top-k. */
  def clusterLabels(docs: DataFrame, clusters: DataFrame, k: Int = 3,
                    idfCapX100: Long = 10000): DataFrame = {
    val members = clusters.select(col("id").as("doc_id"),
      col("canonical_id").as("cluster_id"))
    val terms = explodeTokens(docs.join(members, Seq("doc_id")),
        "term", "cluster_id")
      .where(col("term") =!= "")
      .groupBy(col("cluster_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = docs
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("dts"))
      .select(col("doc_id"), explode(col("dts")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = terms.join(dfT, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * least(
        floor(lit(100.0) * col("n_docs") / col("df")).cast("long"),
        lit(idfCapX100)))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("cluster_id"), col("rank").cast("long").as("rank"),
        col("term"), col("score"))
  }

  /** The dedup VERDICT table — the one output downstream actually
    * consumes: per doc, KEEP or DROP with the first-failing reason, in
    * fixed priority order (the [[graft.operators.TextAnalysis
    * .qualityFilter]] auditable-reasons pattern):
    *
    *  1. `exact_duplicate` — normalized text already exists under a
    *     smaller id ([[exactDuplicates]]);
    *  2. `near_duplicate` — non-canonical member of an n-gram Jaccard
    *     cluster ([[ngramJaccardPairs]] → [[dedupClusters]]);
    *  3. `span_copy` — too much of the doc sits inside verbatim shared
    *     runs ([[spanCoverage]] ≥ the threshold) even though no single
    *     partner crossed the Jaccard bar — the stitched-copy case.
    *
    * Each signal also ships raw (canonical ids, coverage), so a report can
    * re-cut at different thresholds without re-running the pipeline. */
  def dedupVerdict(docs: DataFrame, ngramN: Int, minJaccardX10000: Long,
                   spanN: Int, spanMinRun: Int,
                   maxSpanCoverageX10000: Long = 5000L): DataFrame = {
    val exact = exactDuplicates(docs)
      .select(col("doc_id"), col("canonical_id").as("exact_canonical"))
    val clusters = dedupClusters(ngramJaccardPairs(docs, ngramN, minJaccardX10000))
      .select(col("id").as("doc_id"), col("canonical_id").as("cluster_canonical"))
    val cov = spanCoverage(docs, spanN, spanMinRun)
      .select(col("doc_id"), col("coverage_x10000"))
    docs.select(col("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(clusters, Seq("doc_id"), "left") // unpaired docs: own cluster
      .join(cov, Seq("doc_id"))
      .withColumn("cluster_canonical",
        coalesce(col("cluster_canonical"), col("doc_id")))
      .withColumn("reason",
        when(col("exact_canonical") =!= col("doc_id"), "exact_duplicate")
          .when(col("cluster_canonical") =!= col("doc_id"), "near_duplicate")
          .when(col("coverage_x10000") >= maxSpanCoverageX10000, "span_copy")
          .otherwise(""))
      .withColumn("keep", (col("reason") === "").cast("long"))
      .select(col("doc_id"), col("keep"), col("reason"),
        col("exact_canonical"), col("cluster_canonical"), col("coverage_x10000"))
  }

  /** The persistable positional-shingle index behind the span family —
    * (doc_id, pos, h): what a deployment keeps on disk per corpus snapshot
    * (the [[minhashTable]] lifecycle) so span maintenance probes an index
    * instead of re-running the corpus self-join. */
  def spanIndex(docs: DataFrame, n: Int): DataFrame =
    posShingleTable(docs, n)
      .select(col("doc_id"), col("pos"), charPolyHash(col("sh")).as("h"))

  /** Incremental span maintenance — the corpus-update path for exact-
    * substring dedup, completing the incremental tier ([[minhashPairsIncremental]],
    * [[dedupClustersIncremental]]) for the span family: given the persisted
    * [[spanIndex]] of the EXISTING corpus and a batch of NEW docs, produce
    * exactly [[sharedSpans]] over the merged corpus restricted to pairs
    * with a new member. The new docs' shingles probe the merged index on
    * the hash (new side is the small probe side), so cost is
    * O(new × collisions), never O(corpus²); every h-match for a qualifying
    * pair is present (the probe sees the full index), so run detection is
    * bit-identical to the batch form. New-new pairs surface from both
    * probe directions — the 4-tuple distinct collapses them to the batch
    * row set. */
  def sharedSpansIncremental(existingIndex: DataFrame, newDocs: DataFrame,
                             n: Int, minRun: Int): DataFrame = {
    require(n >= 1 && minRun >= 1, "n and minRun must be positive")
    val newSh = spanIndex(newDocs, n)
    val all = existingIndex.unionByName(newSh)
    val m = newSh.alias("x")
      .join(all.alias("y"),
        col("x.h") === col("y.h") && col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        when(col("x.doc_id") < col("y.doc_id"), col("x.pos"))
          .otherwise(col("y.pos")).as("pos_a"),
        when(col("x.doc_id") < col("y.doc_id"), col("y.pos"))
          .otherwise(col("x.pos")).as("pos_b"))
      .distinct()
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    m.withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .where(col("run_len") >= minRun)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"),
        sum(col("run_len")).as("shared_pos"))
      .withColumn("max_span_tokens", col("max_run") + lit(n.toLong) - 1L)
  }

  /** The exact-substring dedup ACTION (Lee et al. §4: remove the duplicated
    * span, keep the document) — where [[dedupVerdict]] drops whole docs by
    * span COVERAGE, this surgically cuts the copied tokens out of the text,
    * keeping the FIRST occurrence: for every qualifying shared run between
    * `doc_a < doc_b`, `doc_b` loses the run's tokens (a run of r shared
    * n-grams spans r+n−1 tokens from its 0-based start), `doc_a` keeps
    * them. Overlapping runs union their positions, so nothing double-cuts.
    *
    * Output: (doc_id, clean_text, n_removed) for EVERY input doc —
    * untouched docs pass through with n_removed 0 (their clean_text is the
    * whitespace-normalized original, the same canonical form every
    * downstream op tokenizes).
    *
    * Plan shape for 100 TB: [[spanRuns]] (the one expensive stage — the
    * positional inverted-index self-join, docFreqCap-prunable) → bounded
    * explode of run ranges → distinct → per-doc position-set agg (ONLY
    * docs that lost spans — corpus-sparse) → left join back → ONE map-only
    * indexed-lambda filter over the bound token array. The corpus text
    * moves once and is never re-grouped: reconstruction happens in the
    * row, not in a shuffle. */
  def removeSharedSpans(docs: DataFrame, n: Int, minRun: Int,
                        docFreqCap: Option[Int] = None): DataFrame = {
    val cuts = spanRuns(docs, n, minRun, docFreqCap)
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("run_len") + lit(n.toLong - 2L))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("cut_ps"))
    docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("cut_ps",
        coalesce(col("cut_ps"), array().cast("array<long>")))
      .select(col("doc_id"),
        array_join(filter(col("__toks"),
          (_, i) => !array_contains(col("cut_ps"), i.cast("long"))), " ")
          .as("clean_text"),
        size(col("cut_ps")).cast("long").as("n_removed"))
  }

  def spanCoverage(docs: DataFrame, n: Int, minRun: Int,
                   docFreqCap: Option[Int] = None): DataFrame = {
    val runs = spanRuns(docs, n, minRun, docFreqCap)
    val covered = runs
      .select(col("doc_a").as("doc_id"),
        explode(sequence(col("start_a"), col("start_a") + col("run_len") - 1L))
          .as("pos"))
      .unionByName(runs.select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"), col("start_b") + col("run_len") - 1L))
          .as("pos")))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        greatest(size(col("toks")) - n + 1, lit(0)).cast("long").as("n_pos"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("coverage_x10000",
        floor(lit(10000.0) * col("n_covered") / greatest(col("n_pos"), lit(1L)) + 0.5)
          .cast("long"))
  }

  // ------------------------------------------------------------------
  // SemDeDup — cluster-scoped semantic deduplication
  // ------------------------------------------------------------------

  /** Deterministic centroids of a (vec_id, vn, cell) assignment: exact
    * BIGINT component sums per cell (fixed-point ×10⁶ per coordinate, so
    * the mean is order-independent and bit-identical cross-engine), with
    * |c|² riding along so per-vector consumers never re-fold it. Output is
    * ≤ 2^planes rows — always broadcast at the call sites. */
  private[operators] def centroidsOf(assigned: DataFrame): DataFrame = {
    val S = 1000000.0
    assigned
      .select(col("cell"), posexplode(col("vn")).as(Seq("d", "x")))
      .withColumn("xi", floor(col("x") * S + 0.5).cast("long"))
      .groupBy(col("cell"), col("d"))
      .agg(sum(col("xi")).as("sd"), count(lit(1)).as("cnt"))
      .withColumn("cd", col("sd").cast("double") / (col("cnt").cast("double") * S))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cd")))),
        x => x.getField("cd")).as("centroid"))
      .withColumn("csq", dotCol(col("centroid"), col("centroid")))
  }

  /** The deterministic k-means shared by [[semanticDedup]] and
    * [[clusterSilhouette]] (the [[Similarity.ivfTopKDet]] machinery):
    * fixed integer-derived hyperplane signs seed 2^`planes` cells over the
    * unit-normalized vectors, exact-integer centroids, then ONE Lloyd
    * round reassigns each vector to its argmin `|c|² − 2·x·c` centroid
    * (ties on cell id). Returns the refined (vec_id, vn, cell)
    * assignment, checkpointed — every consumer re-reads it at least
    * twice. Reproducible cross-engine, so operators built on it stay
    * oracle-checkable, unlike library k-means with random init. */
  private[operators] def detKMeansAssign(emb: DataFrame, planes: Int,
                                         dim: Int): DataFrame = {
    // checkpointed: every later stage (both centroid aggs and each
    // consumer's joins) re-reads the assignment — without the lineage cut
    // the normalize + plane-sign subtree re-executes once per consumer
    val init = withUnitVector(emb)
      .select(col("vec_id"), col("vn"))
      .withColumn("cell",
        element_at(graft.plans.ArrayExpressions.planeBuckets(
          col("vn"), planes, 1, dim), 1))
      .localCheckpoint()
    // one Lloyd round: argmin |c|²−2·x·c over all centroids, ties on cell.
    // min(struct) not a window — map-side combinable, and the pre-agg
    // projection drops `vn` so the exchange carries (vec_id, cdist, cell),
    // not 64-double arrays
    val best0 = init.select(col("vec_id"), col("vn"))
      .crossJoin(broadcast(centroidsOf(init)))
      .select(col("vec_id"), struct(
        (col("csq") - lit(2.0) * dotCol(col("vn"), col("centroid")))
          .as("cdist"),
        col("cell")).as("sc"))
      .groupBy(col("vec_id")).agg(min(col("sc")).as("m"))
      .select(col("vec_id"), col("m").getField("cell").as("cell"))
    init.drop("cell").join(best0, Seq("vec_id"))
      .localCheckpoint()
  }

  /** Per-cluster SIMPLIFIED SILHOUETTE over the deterministic k-means —
    * the cluster-quality instrument an operator reads BEFORE paying for
    * [[semanticDedup]]: is the partition tight enough that within-cluster
    * pair checks will see the near-dups? Classic silhouette needs all
    * pairwise distances (O(n²)); the simplified form (Hruschka et al.)
    * replaces mean-distance-to-cluster with distance-to-CENTROID —
    * a(x) = ‖x − c_own‖, b(x) = min over other centroids ‖x − c_other‖,
    * s(x) = (b−a)/max(a,b) ∈ [−1, 1] — which is one broadcast join and
    * two aggs, O(n·k), the only form that survives 100 TB.
    *
    * Determinism: unit vectors make ‖x−c‖² = (1 + |c|²) − 2·x·c with the
    * same left-fold dot both engines run; sqrt is correctly rounded IEEE
    * in both, and s is quantized floor(s·10⁶ + 0.5) per vector BEFORE the
    * per-cluster integer mean (sum/count in exact doubles < 2⁵³) — so the
    * whole readout is oracle-exact. Singleton clusters get a ≈ 0 (exactly
    * the centroid's ×10⁶ quantization error) → s ≈ 1, the standard
    * convention; the max(a,b) = 0 guard returns 0, not NaN, if both
    * degenerate.
    *
    * Output: (cell, n_members, mean_sil_x1000000), one row per refined
    * cluster. Plan: det-k-means (two broadcast-centroid passes) → one
    * crossJoin with the ≤ 2^planes broadcast centroid table → per-vector
    * min-agg → per-cell agg. Nothing driver-side, nothing quadratic. */
  def clusterSilhouette(emb: DataFrame, planes: Int = 6,
                        dim: Int = 64): DataFrame = {
    val S = 1000000.0
    val refined = detKMeansAssign(emb, planes, dim)
    val cents = broadcast(centroidsOf(refined)
      .select(col("cell").as("ccell"), col("centroid"), col("csq")))
    val dist = refined.crossJoin(cents)
      .select(col("vec_id"), col("cell"),
        col("ccell"),
        sqrt(greatest(
          (lit(1.0) + col("csq")) - lit(2.0) * dotCol(col("vn"), col("centroid")),
          lit(0.0))).as("dist"))
    dist
      .groupBy(col("vec_id"), col("cell"))
      .agg(min(when(col("ccell") === col("cell"), col("dist"))).as("a"),
        min(when(col("ccell") =!= col("cell"), col("dist"))).as("b"))
      .select(col("cell"),
        // b IS NULL ⟺ the k-means degenerated to ONE cluster (silhouette
        // undefined at k=1 → 0 by convention); the ≤0 guard covers the
        // all-identical-vectors case
        when(col("b").isNull || greatest(col("a"), col("b")) <= 0.0, lit(0L))
          .otherwise(floor(lit(S) * (col("b") - col("a"))
            / greatest(col("a"), col("b")) + 0.5).cast("long"))
          .as("sil"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("sil")).as("ssum"))
      .select(col("cell"), col("n_members"),
        floor(col("ssum").cast("double") / col("n_members").cast("double"))
          .cast("long").as("mean_sil_x1000000"))
  }

  /** SemDeDup (after Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540): embedding
    * near-dup pruning scoped WITHIN k-means clusters. Where
    * [[embeddingNearDupPairs]] pays n² and [[embeddingNearDupPairsBanded]]
    * buckets by random hyperplane signs alone, SemDeDup first partitions the
    * space with k-means, then runs the pairwise cosine check only inside
    * each cluster — pair cost Σ|c|² with |c| ≈ n/k, the published recipe for
    * semantic dedup at web scale (k grows with n to bound cluster size).
    *
    * Clustering is the deterministic k-means of
    * [[Similarity.ivfTopKDet]]/[[Similarity.pqTopK]]: fixed integer-derived
    * hyperplane signs seed 2^`planes` cells, exact BIGINT component sums
    * give the centroids, and ONE Lloyd round reassigns each vector to its
    * nearest centroid by `|c|² − 2·x·c` (ties on cell id) — reproducible
    * cross-engine, so the whole operator is oracle-checkable, unlike
    * library k-means with random init.
    *
    * Within each refined cluster, members are ranked FARTHEST-from-centroid
    * first (the paper's diversity-preserving keeper choice; ties on vec_id),
    * and a member is a duplicate iff some higher-ranked member of the same
    * cluster has cosine ≥ the threshold with it (the dominated rule — one
    * EXISTS, no greedy chaining; documented deviation from the paper's
    * sequential sweep, same ε-ball semantics for transitive groups).
    *
    * Output: one row per vector — `(vec_id, cell, cent_rank, keep 0/1,
    * dup_of)` with `dup_of` = the highest-ranked dominator (−1 for keepers;
    * a sentinel, not NULL — nullable BIGINTs decay to doubles in both
    * engines' parquet/pandas paths and weaken the driver's hash compare).
    * Cross-cluster near-dups are invisible by design (the documented
    * SemDeDup recall trade-off).
    *
    * Plan shape (100 TB posture): unit-normalize (map-only) → plane-sign
    * cell assignment (map-only) → centroid hash agg (map-side combinable
    * integer sums, ≤ 2^planes·dim rows) → broadcast-centroid argmin
    * reassign → second centroid agg → within-cluster pair equi-join on
    * `cell` (the bounded quadratic term) → dominator agg → left join back.
    * Centroid tables are broadcast both times; nothing driver-side. */
  def semanticDedup(emb: DataFrame, minCosX1000000: Long,
                    planes: Int = 6, dim: Int = 64): DataFrame = {
    val S = 1000000.0
    val refined = detKMeansAssign(emb, planes, dim)
    // rank within the refined cluster: farthest from centroid first
    val wRank = Window.partitionBy(col("cell"))
      .orderBy(col("cdist").desc, col("vec_id"))
    val ranked = refined.join(broadcast(centroidsOf(refined)), Seq("cell"))
      .withColumn("cdist",
        col("csq") - lit(2.0) * dotCol(col("vn"), col("centroid")))
      .withColumn("cent_rank", row_number().over(wRank).cast("long"))
      .select(col("vec_id"), col("vn"), col("cell"), col("cent_rank"))
      .localCheckpoint()
    // dominated rule: the within-cluster pair join (the bounded quadratic)
    val a = ranked.select(col("cell"), col("vec_id").as("id_a"),
      col("vn").as("vn_a"), col("cent_rank").as("rank_a"))
    val b = ranked.select(col("cell"), col("vec_id").as("id_b"),
      col("vn").as("vn_b"), col("cent_rank").as("rank_b"))
    val dominators = a.join(b, Seq("cell"))
      .where(col("rank_a") < col("rank_b"))
      .where(floor(dotCol(col("vn_a"), col("vn_b")) * S + 0.5).cast("long")
        >= minCosX1000000)
      .groupBy(col("id_b"))
      .agg(min(struct(col("rank_a"), col("id_a"))).as("m"))
      .select(col("id_b").as("vec_id"), col("m").getField("id_a").as("dup_of"))
    ranked
      .join(dominators, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("cent_rank"),
        when(col("dup_of").isNull, lit(1L)).otherwise(lit(0L)).as("keep"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
  }

  /** Blocked fuzzy ENTITY RESOLUTION (record linkage) over a name column —
    * the structured-data twin of the text near-dup family: find distinct
    * name values that are small edits of each other ("red widget" /
    * "rad widget") without comparing every name to every name.
    *
    * Scale design, in order:
    *  1. collapse entities to DISTINCT names first (the "segment the vocab,
    *     bill the corpus" posture — the pair join runs on the name
    *     vocabulary, never on the entity table);
    *  2. BLOCK on the name's last token (`substring_index`): only names
    *     sharing a block meet the quadratic comparator, so candidate pairs
    *     are Σ block² over the name vocabulary, not |names|². Recall
    *     caveat: a pair whose edit sits IN the last token ("red widget" /
    *     "red widgets") lands in different blocks and is never compared —
    *     the standard blocking trade; run a second pass blocked on the
    *     FIRST token (or a q-gram block) to recover those;
    *  3. `levenshtein` (codegen'd built-in) gates pairs at `maxDist`.
    * Output: one row per matched unordered name pair with its edit
    * distance and how many entities carry each spelling — the merge
    * worklist an ER pipeline reviews before canonicalizing.
    *
    * Oracle parity note: DuckDB's `levenshtein` counts BYTES while Spark's
    * counts CHARACTERS — identical on ASCII name data (the part table);
    * non-ASCII name columns keep the Spark semantics. */
  def fuzzyNameMatch(entities: DataFrame, nameCol: String,
                     maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be positive")
    val names = entities
      .groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_entities"))
      .withColumn("blk", substring_index(col("name"), " ", -1))
    val a = names.select(col("blk"), col("name").as("name_a"),
      col("n_entities").as("n_a"))
    val b = names.select(col("blk"), col("name").as("name_b"),
      col("n_entities").as("n_b"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_a"), col("n_b"))
      .where(col("dist") <= maxDist)
  }
}
