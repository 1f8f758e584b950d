package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.TextFunctions._

/** Incremental/streaming layer (SURVEY.md §2.7).
  *
  * The reference is a resumable micro-batch consumer: a persistent FIFO
  * queue (`src/queue_manager.py`), a checkpoint file
  * (`src/checkpoint_manager.py`), batch-of-1000 sinks, and a 60 s
  * sliding-window rate limiter (`src/enhanced_production_mediawiki_client.py:43-64`).
  * Structured Streaming supplies each of those natively — and strictly
  * stronger: the reference pops the queue *before* processing (a crash loses
  * the in-flight article); Spark's offset log + idempotent sink gives
  * exactly-once.
  *
  * | reference mechanism            | here                                   |
  * |--------------------------------|----------------------------------------|
  * | persistent queue + checkpoint  | `checkpointLocation` + `Trigger.AvailableNow` |
  * | batch-of-1000 upload           | `foreachBatch` → partitioned JSON sink |
  * | failed-title quarantine        | dead-letter split (`splitValid`)       |
  * | 60 s sliding request window    | watermarked sliding window aggregate   |
  * | running processed/failed count | `mapGroupsWithState` running counters  |
  */
object Streams {

  /** File-stream source over a directory of parquet drops — the "queue".
    * `maxFilesPerTrigger` plays the reference's batch-size throttle. */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** F1 dead-letter split: (valid, quarantined-with-error). The reference
    * appends failed titles to a `failed` list and continues
    * (`src/main.py:122-135`); here both legs are DataFrames. */
  def splitValid(docs: DataFrame): (DataFrame, DataFrame) = {
    val ok = isValid(col("text"), col("lang"), col("source")) && !isRedirect(col("text"))
    (docs.where(ok),
      docs.where(!ok).withColumn("error",
        when(col("text").isNull || col("text") === "", "empty_content")
          .when(isRedirect(col("text")), "redirect")
          .otherwise("invalid_metadata")))
  }

  /** A7 — sliding event-time window counts with a watermark (the adaptive
    * rate limiter's trailing 60 s view, generalized). Late data beyond the
    * watermark is dropped — the lateness semantics the reference lacks. */
  def slidingEventCounts(events: DataFrame, window_ : String = "60 seconds",
                         slide: String = "20 seconds",
                         watermark: String = "2 minutes"): DataFrame =
    events
      // watermarks require TIMESTAMP (with local tz); the lake stores NTZ —
      // under the UTC session the cast is instant-preserving
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"))

  /** Streaming exact dedup — the incremental form of the batch dedup suite:
    * re-deliveries of the same normalized content (re-crawls, source
    * overlap, replayed files) are dropped as they arrive. Keyed on
    * `xxhash64(normalized text)` — a 64-bit state key instead of the full
    * string, the same exchange-shrinking trade as the batch path.
    *
    * `dropDuplicatesWithinWatermark` bounds the dedup state by the event
    * time horizon: a duplicate arriving within `watermark` of the original
    * is dropped, older state is evicted. The unbounded-state
    * `dropDuplicates` variant is exact forever but its state grows with the
    * corpus — at 100 TB the horizoned form is the only sustainable one, and
    * a periodic batch `exactDuplicates` pass catches cross-horizon dupes. */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("content_hash", xxhash64(normalizeWhitespace(col("text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream attribution join — the incremental form of the batch
    * bounded range join ([[graft.operators.Relational.boundedRangeJoin]]):
    * each purchase matched to the same user's clicks within the trailing
    * `windowMinutes`. Both sides carry watermarks, and the time-range
    * predicate in the join condition is what lets Spark BOUND the join
    * state: click state older than the window + watermark is evicted
    * instead of accumulating forever (an unconstrained stream-stream join
    * would buffer both streams indefinitely).
    *
    * `joinType = "inner"` emits matches as soon as both sides are
    * buffered; `"left_outer"` additionally emits each UNMATCHED purchase
    * with a null `click_id` — but only once the watermark passes the end
    * of its candidate interval (`p_ts`, since clicks at or before the
    * purchase qualify), i.e. once no qualifying click can still arrive.
    * That deferral is exactly the state-expiry semantics inner joins
    * never exercise: a null-leg row emitted early would be WRONG if the
    * click later arrived, so correctness of the outer form proves the
    * join's state eviction honors the time bounds. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      windowMinutes: Int = 5,
                      watermark: String = "10 minutes",
                      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"attribution join supports inner / left_outer, got $joinType")
    val p = purchases
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").cast("timestamp").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"),
      joinType)
      .select(col("event_id"), col("user_id"), col("click_id"))
  }

  /** Drive [[attributionJoin]] to a parquet sink (the 6th driven
    * pipeline's runner): inner stream-stream matches emit the micro-batch
    * both sides are present — time-ordered source slices guarantee the
    * earlier-timestamped click is already in (bounded) state when its
    * purchase arrives, so the accumulated output equals the batch
    * bounded-range inner join exactly, with no flush sentinel needed.
    * For `left_outer`, null-leg rows flush only as the watermark passes
    * each purchase's interval end — the caller must drive the watermark
    * past the last real event (a late sentinel on BOTH input streams;
    * the global watermark is the minimum across them), and Spark's
    * no-data final micro-batch under AvailableNow performs the flush. */
  def runAttributionToParquet(spark: SparkSession, purchases: DataFrame,
                              clicks: DataFrame, outDir: String,
                              checkpointDir: String,
                              windowMinutes: Int = 5,
                              joinType: String = "inner"): StreamingQuery =
    attributionJoin(purchases, clicks, windowMinutes, joinType = joinType)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()

  /** Checkpointed ingest: stream → validate → partitioned JSON batches via
    * foreachBatch (micro-batch id = the reference's batch number). Restart
    * with the same checkpoint dir resumes from the offset log — the
    * `--reset` analog is deleting the checkpoint dir. */
  def ingest(spark: SparkSession, srcDir: String, schema: StructType,
             outDir: String, checkpointDir: String): StreamingQuery =
    fileSource(spark, srcDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // idempotent on micro-batch replay: overwrite THIS batch's partition
        // (dynamic partition overwrite) instead of blindly appending — a
        // crash between the two writes re-runs batchId with the same data
        val (valid, dead) = splitValid(batch.toDF())
        def writeLeg(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
          df.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").json(dir)
        writeLeg(valid, outDir)
        writeLeg(dead, outDir + "_deadletter")
        ()
      }
      .start()

  /** Streaming near-dup tier — the streaming sibling of
    * [[graft.operators.Dedup.minhashPairsIncremental]]: each micro-batch of
    * new documents (1) probes the PERSISTED MinHash signature index for
    * near-dup pairs involving the batch's docs — cost O(batch × collisions),
    * not a corpus re-scan — then (2) appends its own signatures to the
    * index. This is how a production dedup index absorbs a live crawl: the
    * index directory is the long-lived artifact, the stream keeps it
    * current, and accumulated pairs equal the batch [[graft.operators.Dedup
    * .minhashPairs]] over everything seen (StreamingSpec asserts this).
    *
    * Exactly-once on replay: both writes are dynamic-partition overwrites
    * keyed by micro-batch id (the `ingest` pattern), and the probe reads
    * the index EXCLUDING the current batch's partition — a replayed batch
    * whose signatures already landed would otherwise double its signature
    * rows and corrupt the match estimates. Partition pruning makes the
    * exclusion free. */
  def streamingNearDup(spark: SparkSession, docs: DataFrame,
                       indexDir: String, pairsDir: String,
                       checkpointDir: String,
                       n: Int = 3, k: Int = 16, bands: Int = 4,
                       minEstX100: Long = 50): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val newDocs = batch.toDF().select(col("doc_id"), col("text"))
        def writePartition(df: DataFrame, dir: String): Unit =
          df.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(dir)
        // append the batch's signatures FIRST, then probe with the
        // persisted rows — the expensive shingle→hash→MinHash pipeline runs
        // exactly once per batch, and the probe reads both sides from the
        // index (its own rows via the batch_id partition, everything else
        // via the exclusion), so replay stays self-join-safe
        writePartition(
          graft.operators.Dedup.minhashTable(newDocs, n, k), indexDir)
        // explicit schema: a batch yielding zero signatures (all docs
        // shorter than n tokens) leaves the dir without parquet files, and
        // schema INFERENCE would throw and kill the stream
        val idxSchema = new StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("i", org.apache.spark.sql.types.IntegerType)
          .add("mh", org.apache.spark.sql.types.LongType)
          .add("batch_id", org.apache.spark.sql.types.LongType)
        val idx = spark.read.schema(idxSchema).parquet(indexDir)
        // the SLIM doc→partition membership sibling (O(batch) append,
        // replay-idempotent like the index write): takedowns probe this
        // map for touched partitions instead of scanning the signature
        // index — the batch's doc list comes off the just-written
        // partition (partition-pruned), so docs too short to signature
        // never become members. When the sibling is ABSENT — first batch
        // of a fresh index (then the backfill IS this batch), or a
        // pre-members legacy index being absorbed into — a per-batch
        // append would leave a PARTIAL map covering only new batches, and
        // the takedown probing it would silently miss every pre-members
        // doc; backfill from the full index instead (one-time O(index),
        // O(batch) per batch thereafter).
        val membersDir = graft.operators.Dedup.minhashMembersDir(indexDir)
        val mfs = new org.apache.hadoop.fs.Path(membersDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val sigCols = Seq(col("doc_id"), col("i"), col("mh"))
        // the members append and the pairs probe both read the
        // just-written index and write DIFFERENT directories —
        // independent, so overlap them (the parallelWrites discipline)
        graft.operators.Similarity.parallelWrites(spark)(
          () =>
            if (!mfs.exists(new org.apache.hadoop.fs.Path(membersDir)))
              graft.operators.Dedup.buildMinhashMembers(spark, indexDir)
            else writePartition(
              idx.where(col("batch_id") === lit(batchId))
                .select(col("doc_id")).distinct(),
              membersDir),
          () => writePartition(
            graft.operators.Dedup.minhashPairsIncrementalSigs(
              idx.where(col("batch_id") =!= lit(batchId)).select(sigCols: _*),
              idx.where(col("batch_id") === lit(batchId)).select(sigCols: _*),
              k, bands, minEstX100),
            pairsDir))
        ()
      }
      .start()

  /** Streaming decontamination — the third streaming sibling (after exact
    * dedup and near-dup): each micro-batch of incoming eval docs is probed
    * against a PERSISTED train shingle universe
    * ([[graft.operators.Decontaminate.shingleUniverse]] written once per
    * train corpus), so a continuously-arriving eval/holdout stream is
    * contamination-flagged without ever re-scanning train. Per-batch
    * reports land under the micro-batch id (dynamic-partition overwrite —
    * replay-idempotent, the `ingest` pattern); each eval doc lives in
    * exactly one micro-batch, so the accumulated report equals the batch
    * [[graft.operators.Decontaminate.overlapReport]]. */
  def streamingDecontaminate(spark: SparkSession, docs: DataFrame,
                             universeDir: String, reportDir: String,
                             checkpointDir: String,
                             n: Int = 8,
                             minOverlapX10000: Long = 5000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val universe = spark.read
          .schema(new StructType().add("h", org.apache.spark.sql.types.LongType))
          .parquet(universeDir)
        graft.operators.Decontaminate
          .overlapReportAgainstUniverse(universe,
            batch.toDF().select(col("doc_id"), col("text")),
            n, minOverlapX10000)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(reportDir)
        ()
      }
      .start()

  /** Streaming corpus curation — the assembly tier: each micro-batch of
    * incoming docs is quality-gated against a PERSISTED per-source
    * threshold table ([[graft.operators.TextAnalysis.qualityThresholds]],
    * computed once on a reference corpus — the same persisted-artifact
    * pattern as the decontamination shingle universe) and shard-assigned
    * ([[graft.operators.Mixing.withShard]], hash-stable so replay and
    * re-partitioning never move a doc). Survivors land partitioned by
    * (batch_id, shard) with dynamic-partition overwrite — replay-idempotent;
    * since every doc lives in exactly one micro-batch and the gate +
    * shard are per-row deterministic against a fixed threshold table, the
    * accumulated output equals the batch
    * [[graft.operators.TextAnalysis.gateAgainstThresholds]] + shard run
    * (StreamingSpec asserts this). */
  def streamingCurate(spark: SparkSession, docs: DataFrame,
                      thresholdsDir: String, outDir: String,
                      checkpointDir: String,
                      numShards: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val thresholds = spark.read
          .schema(new StructType()
            .add("source", org.apache.spark.sql.types.StringType)
            .add("q_threshold", org.apache.spark.sql.types.LongType))
          .parquet(thresholdsDir)
        graft.operators.Mixing.withShard(
            graft.operators.TextAnalysis.gateAgainstThresholds(
              batch.toDF().select(col("doc_id"), col("source"), col("text")),
              thresholds),
            numShards)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id", "shard").parquet(outDir)
        ()
      }
      .start()

  /** Streaming template-strip apply — the streaming leg of the template
    * lifecycle, completing the build/apply/stream triple the other
    * artifact families (near-dup index, decontamination universe, quality
    * thresholds) already have: the per-source strip set is TRAINED ONCE on
    * a corpus snapshot ([[graft.operators.WebCuration.templateStripSet]])
    * and persisted; each micro-batch of newly-arriving documents is
    * cleansed against that frozen artifact
    * ([[graft.operators.WebCuration.templateApplyStrip]] — strip set rides
    * a broadcast, rewrite is map-only, so a batch costs one scan
    * regardless of the snapshot size the set was trained on). Output lands
    * under the micro-batch id with dynamic-partition overwrite
    * (replay-idempotent, the `ingest` pattern); every doc lives in exactly
    * one micro-batch and the rewrite is per-row deterministic against a
    * fixed artifact, so the accumulated output equals the batch apply
    * (StreamingSpec asserts it). */
  def streamingTemplateStrip(spark: SparkSession, docs: DataFrame,
                             stripSetDir: String, outDir: String,
                             checkpointDir: String,
                             wordsPerLine: Int = 10): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val stripSet = spark.read
          .schema(new StructType()
            .add("source", org.apache.spark.sql.types.StringType)
            .add("h", org.apache.spark.sql.types.LongType)
            .add("df", org.apache.spark.sql.types.LongType))
          .parquet(stripSetDir)
        graft.operators.WebCuration.templateApplyStrip(
            batch.toDF().select(col("doc_id"), col("source"), col("text")),
            stripSet, wordsPerLine)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outDir)
        ()
      }
      .start()

  /** Streaming hashed-NB quality scoring — the 9th driven pipeline and
    * the model-based sibling of [[streamingCurate]]'s threshold gate: the
    * ~`buckets`-row NB model ([[graft.operators.Classifier.hashedNBFit]])
    * is TRAINED ONCE and persisted; each micro-batch of incoming docs is
    * featurized ([[graft.operators.Classifier.hashedNgramFeatures]]) and
    * scored against the frozen artifact
    * ([[graft.operators.Classifier.hashedNBScore]] — the model rides a
    * broadcast, unseen buckets take its default weight, so a batch costs
    * one scan + one bounded groupBy regardless of what the model was
    * trained on). Per-batch scores land under the micro-batch id with
    * dynamic-partition overwrite (replay-idempotent); every doc lives in
    * exactly one micro-batch and scoring is deterministic against the
    * fixed artifact, so the accumulated output equals the batch score
    * (StreamingSpec asserts it). */
  def streamingNBScore(spark: SparkSession, docs: DataFrame,
                       modelDir: String, outDir: String,
                       checkpointDir: String,
                       buckets: Int = 1024): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val model = spark.read
          .schema(new StructType()
            .add("b", org.apache.spark.sql.types.LongType)
            .add("n1", org.apache.spark.sql.types.LongType)
            .add("n0", org.apache.spark.sql.types.LongType)
            .add("w_x1e6", org.apache.spark.sql.types.LongType))
          .parquet(modelDir)
        graft.operators.Classifier.hashedNBScore(
            graft.operators.Classifier.hashedNgramFeatures(
              batch.toDF().select(col("doc_id"), col("source"), col("text")),
              buckets),
            model)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outDir)
        ()
      }
      .start()

  /** The 10th driven pipeline: streaming BM25 index MAINTENANCE — each
    * micro-batch of new documents is absorbed into a persisted
    * [[graft.operators.Similarity.buildBm25Index]] artifact through the
    * exactly-once [[graft.operators.Similarity.updateBm25IndexOnce]]
    * wrapper. Structured Streaming re-delivers a micro-batch (same
    * batch_id) after a failure or a checkpoint-reusing restart, and the
    * raw update contract is append-only — the wrapper's applied-batch
    * ledger commits atomically with the merged index tables, so a replayed
    * batch is a NO-OP instead of doubled postings (the dedupe layer the
    * `updateBm25Index` scaladoc defers to, driven here). After the stream
    * drains, the artifact equals the full rebuild over base ∪ all batches
    * — `stream_bm25_incr` shares the full-corpus BM25 oracle verbatim. */
  def streamingBm25Update(spark: SparkSession, docs: DataFrame,
                          indexDir: String, checkpointDir: String,
                          autoCompactSegments: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.updateBm25IndexOnce(spark, indexDir,
          batch.toDF().select(col("doc_id"), col("text")), batchId)
        // the LSM merge policy, driven in-loop: fold when the segment log
        // outgrows the read-fan-in bound. Compaction preserves answers
        // (sim_bm25_compact's oracle) and the applied-batch ledger (a
        // separate component), so it composes with exactly-once replay:
        // a crash inside the fold is repaired by the swap's recover, a
        // replayed batch after a fold no-ops through the ledger as usual.
        // 0 (the default) disables — the one-shot cadence stays a policy
        // knob above this loop.
        if (autoCompactSegments > 0)
          graft.operators.Similarity.maybeCompactBm25Index(spark, indexDir,
            autoCompactSegments)
        ()
      }
      .start()

  /** The 12th driven pipeline: streaming ANN index MAINTENANCE — the
    * vector-side twin of [[streamingBm25Update]]: each micro-batch of new
    * embeddings is absorbed into a persisted
    * [[graft.operators.Similarity.buildAnnIndex]] IVF+PQ artifact through
    * the exactly-once [[graft.operators.Similarity.updateAnnIndexOnce]]
    * wrapper (frozen quantizers; the applied-batch ledger commits
    * atomically with the five index components, so replayed micro-batches
    * cannot duplicate vectors or double-count centroid sums). Batch order
    * is immaterial: codes are per-vector argmin against the frozen
    * codebook and coarse sums merge associatively, so the drained
    * artifact equals one update of the union — `stream_ann_incr` shares
    * `ann_index_incr`'s oracle verbatim. */
  def streamingAnnUpdate(spark: SparkSession, emb: DataFrame,
                         indexDir: String, checkpointDir: String,
                         planes: Int = 4, m: Int = 8,
                         dim: Int = 64,
                         autoCompactSegments: Int = 0): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.updateAnnIndexOnce(spark, indexDir,
          batch.toDF().select(col("vec_id"), col("embedding")), batchId,
          planes, m, dim)
        // the LSM merge policy, vector-side (see streamingBm25Update):
        // compaction preserves probe answers and the ledger, so it
        // composes with exactly-once replay; 0 disables
        if (autoCompactSegments > 0)
          graft.operators.Similarity.maybeCompactAnnIndex(spark, indexDir,
            autoCompactSegments)
        ()
      }
      .start()

  /** The 18th driven pipeline: streaming maintenance of a SHARDED BM25
    * index — the streaming face of the shard-parallel serving shape:
    * each micro-batch routes by doc hash to its owning shards and each
    * shard absorbs its slice through its OWN exactly-once ledger and
    * lease ([[graft.operators.Similarity.updateBm25IndexShardedOnce]]),
    * so shards proceed independently (at cluster scale, in parallel) and
    * a replayed micro-batch no-ops per shard. The drained sharded index
    * serves identically to the unsharded full-corpus rebuild —
    * `stream_bm25_sharded` shares the full-corpus BM25 oracle verbatim
    * (`sim_bm25_incr`'s SQL). */
  def streamingBm25UpdateSharded(spark: SparkSession, docs: DataFrame,
                                 indexDir: String,
                                 checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.updateBm25IndexShardedOnce(spark, indexDir,
          batch.toDF().select(col("doc_id"), col("text")), batchId)
        ()
      }
      .start()

  /** The 19th driven pipeline: [[streamingBm25UpdateSharded]]'s ANN twin —
    * per-shard ledgered frozen-quantizer absorbs; the drained sharded
    * probe equals the one-shot incremental update of one artifact
    * (`stream_ann_sharded` shares `ann_index_incr`'s oracle verbatim). */
  def streamingAnnUpdateSharded(spark: SparkSession, emb: DataFrame,
                                indexDir: String, checkpointDir: String,
                                planes: Int = 4, m: Int = 8,
                                dim: Int = 64): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.updateAnnIndexShardedOnce(spark, indexDir,
          batch.toDF().select(col("vec_id"), col("embedding")), batchId,
          planes, m, dim)
        ()
      }
      .start()

  /** The 13th driven pipeline: streaming TAKEDOWN — delete requests
    * (right-to-be-forgotten, DMCA, policy removals) arrive as a stream of
    * doc ids and each micro-batch is applied to the persisted BM25 index
    * through [[graft.operators.Similarity.removeFromBm25Index]]. Unlike
    * the APPEND side (which needs the applied-batch ledger to stay
    * exactly-once), deletion is IDEMPOTENT BY CONSTRUCTION: an
    * already-removed id has no posting/doclen rows left, so its
    * re-delivery — a replayed micro-batch after a failure, or the same id
    * arriving in two batches — subtracts nothing and anti-joins nothing.
    * No ledger, no dedupe layer; the atomic swap per batch keeps every
    * crash repairable. The drained index equals the one-shot delete of
    * the union of all requests (`stream_bm25_takedown` shares
    * `sim_bm25_del`'s oracle verbatim). */
  /** Pending-pool directory for [[streamingTakedown]]'s batched trigger —
    * a SIBLING of the index (never nested inside an artifact dir). */
  def takedownPendingDir(indexDir: String): String =
    s"${indexDir}_takedown_pending"

  /** Apply and clear any POOLED takedown requests stashed by a batched
    * [[streamingTakedown]] — the drain step a caller runs after the
    * stream terminates so no tail of requests is left unapplied. Safe to
    * call any time: deletion is idempotent, and a crash between the apply
    * and the clear just re-applies a no-op on the next flush. */
  def flushPendingTakedowns(spark: SparkSession, indexDir: String): Unit = {
    val pending = takedownPendingDir(indexDir)
    val fs = new org.apache.hadoop.fs.Path(pending)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pending))) return
    // explicit schema: a pool dir that exists but holds no parquet files
    // (a replayed empty micro-batch, or a crash right after mkdir) would
    // make schema INFERENCE throw and kill the stream/flush — with a
    // schema the read is just empty and the delete below no-ops
    val poolSchema = new StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("batch_id", org.apache.spark.sql.types.LongType)
    graft.operators.Similarity.removeFromBm25Index(spark, indexDir,
      spark.read.schema(poolSchema).parquet(pending).select(col("doc_id")))
    fs.delete(new org.apache.hadoop.fs.Path(pending), true)
  }

  /** `batchEvery = 1` applies each micro-batch immediately (the original
    * per-batch cadence). `batchEvery > 1` is the BATCHED TRIGGER the
    * takedown's cost model wants at scale: each delete pays an index-read
    * to derive its df decrements (partition-pruned to the touched
    * postings buckets, but still the dominant term for frequent tiny
    * requests), while deletion itself is IDEMPOTENT and ASSOCIATIVE —
    * applying the union of k batches equals applying them one by one, so
    * pooling is correctness-free and divides the per-request read cost
    * by k. Requests stash to a pending pool (dynamic-partition overwrite
    * by micro-batch id — replay-idempotent), and the pool applies as ONE
    * delete every `batchEvery` stashed batches; callers drain the tail
    * with [[flushPendingTakedowns]] after the stream ends. */
  def streamingTakedown(spark: SparkSession, ids: DataFrame,
                        indexDir: String, checkpointDir: String,
                        batchEvery: Int = 1): StreamingQuery = {
    require(batchEvery >= 1, "batchEvery must be positive")
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (batchEvery <= 1) {
          graft.operators.Similarity.removeFromBm25Index(spark, indexDir,
            batch.toDF().select(col("doc_id")))
        } else {
          val pending = takedownPendingDir(indexDir)
          batch.toDF().select(col("doc_id"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(pending)
          val fs = new org.apache.hadoop.fs.Path(pending)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val stashed = fs.listStatus(new org.apache.hadoop.fs.Path(pending))
            .count(st => st.isDirectory &&
              st.getPath.getName.startsWith("batch_id="))
          if (stashed >= batchEvery) flushPendingTakedowns(spark, indexDir)
        }
        ()
      }
      .start()
  }

  /** The 14th driven pipeline: streaming ANN TAKEDOWN — the vector twin of
    * [[streamingTakedown]], closing the takedown story's asymmetry (BM25
    * had a streamed delete leg; the IVF+PQ artifact only had the one-shot
    * [[graft.operators.Similarity.removeFromAnnIndex]]): delete requests
    * arrive as a stream of vec ids and each micro-batch is applied to the
    * persisted index. Deletion is IDEMPOTENT BY CONSTRUCTION, exactly as
    * lexical-side: an already-removed id has no vectors/cells/codes rows
    * left to anti-join and its coarse sums were already subtracted, so a
    * replayed micro-batch (or the same id in two batches) is a no-op — no
    * ledger needed; the atomic swap per batch keeps every crash
    * repairable. The drained index equals the one-shot delete of the
    * union of all requests (`stream_ann_takedown` shares `ann_index_del`'s
    * oracle verbatim). */
  /** [[flushPendingTakedowns]]' ANN twin: apply and clear the pooled
    * vec_id requests a batched [[streamingAnnTakedown]] stashed. */
  def flushPendingAnnTakedowns(spark: SparkSession, indexDir: String): Unit = {
    val pending = takedownPendingDir(indexDir)
    val fs = new org.apache.hadoop.fs.Path(pending)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pending))) return
    // explicit schema, same as flushPendingTakedowns: an empty pool dir
    // must read as zero requests, not an inference AnalysisException
    val poolSchema = new StructType()
      .add("vec_id", org.apache.spark.sql.types.LongType)
      .add("batch_id", org.apache.spark.sql.types.LongType)
    graft.operators.Similarity.removeFromAnnIndex(spark, indexDir,
      spark.read.schema(poolSchema).parquet(pending).select(col("vec_id")))
    fs.delete(new org.apache.hadoop.fs.Path(pending), true)
  }

  /** `batchEvery > 1` pools k request batches into ONE applied delete —
    * [[streamingTakedown]]'s trigger economics, vector-side: each applied
    * ANN delete pays a (bucket-pruned) vectors/cells read for its exact
    * negative coarse sums, and deletion is idempotent + associative, so
    * pooling divides that per-request read by k correctness-free. Drain
    * the tail with [[flushPendingAnnTakedowns]] after the stream ends. */
  def streamingAnnTakedown(spark: SparkSession, ids: DataFrame,
                           indexDir: String, checkpointDir: String,
                           batchEvery: Int = 1): StreamingQuery = {
    require(batchEvery >= 1, "batchEvery must be positive")
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (batchEvery <= 1) {
          graft.operators.Similarity.removeFromAnnIndex(spark, indexDir,
            batch.toDF().select(col("vec_id")))
        } else {
          val pending = takedownPendingDir(indexDir)
          batch.toDF().select(col("vec_id"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(pending)
          val fs = new org.apache.hadoop.fs.Path(pending)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val stashed = fs.listStatus(new org.apache.hadoop.fs.Path(pending))
            .count(st => st.isDirectory &&
              st.getPath.getName.startsWith("batch_id="))
          if (stashed >= batchEvery) flushPendingAnnTakedowns(spark, indexDir)
        }
        ()
      }
      .start()
  }

  /** The 15th driven pipeline: streaming NEAR-DUP INDEX TAKEDOWN —
    * closing the takedown tier across all three index families (BM25,
    * ANN, and now the MinHash signature index the streaming near-dup
    * pipeline maintains): delete requests arrive as a stream of doc ids
    * and each micro-batch applies
    * [[graft.operators.Dedup.removeFromMinhashIndexDir]] to the persisted
    * batch_id-partitioned index — PARTITION-SCOPED writes (only the
    * partitions holding a removed doc's signatures rewrite; emptied
    * partitions delete). Idempotent by construction: an id with no
    * surviving signature rows touches no partition, so re-delivered
    * micro-batches and duplicate requests are no-ops — no ledger. The
    * drained index equals the one-shot delete of the union of requests
    * (`stream_neardup_takedown` shares `dedup_minhash_del`'s oracle
    * verbatim). */
  def streamingNearDupTakedown(spark: SparkSession, ids: DataFrame,
                               indexDir: String,
                               checkpointDir: String): StreamingQuery =
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup.removeFromMinhashIndexDir(spark, indexDir,
          batch.toDF().select(col("doc_id")))
        ()
      }
      .start()

  /** Streaming data-quality audit — the streaming sibling of
    * [[graft.operators.DataQuality.audit]] for the rule classes that are
    * micro-batch ADDITIVE: row predicates (violations sum across batches)
    * and FK checks against a STATIC reference (each batch anti-joins the
    * same broadcast key set). Key UNIQUENESS is deliberately refused — it
    * is a cross-batch property (a seen-keys state store, the incremental-
    * index pattern) and belongs to the batch audit. Per-batch reports land
    * under their micro-batch id (dynamic-partition overwrite —
    * replay-idempotent); summing the accumulated reports equals the batch
    * audit of the same rules over the full table (spec + oracle pin it). */
  def streamingAudit(spark: SparkSession, rows: DataFrame, table: String,
                     rules: Seq[graft.operators.DataQuality.Rule],
                     outDir: String, checkpointDir: String): StreamingQuery = {
    require(rules.forall {
      case _: graft.operators.DataQuality.UniqueRule => false
      case _ => true
    }, "uniqueness is cross-batch state — run it in the batch audit")
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.DataQuality.audit(table, batch.toDF(), rules)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outDir)
        ()
      }
      .start()
  }

  /** Streaming multimodal decode — the streaming sibling of
    * [[graft.operators.Multimodal.decodeFeatures]]: media records (binary
    * payload + typed metadata) arrive as micro-batches, each batch runs
    * the same per-partition header decode, and features land under the
    * micro-batch id (dynamic-partition overwrite — replay-idempotent).
    * The decode is map-only, so the streaming form carries NO state:
    * ingest-time feature extraction, which is how a 100 TB media crawl
    * avoids a second full pass over the binary columns. */
  def streamingMediaDecode(spark: SparkSession, media: DataFrame,
                           outDir: String,
                           checkpointDir: String): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Multimodal.decodeFeatures(spark,
            batch.toDF().as[graft.Schemas.MediaRecord](
              org.apache.spark.sql.Encoders.product[graft.Schemas.MediaRecord]))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outDir)
        ()
      }
      .start()

  /** Streaming snapshot diff — the streaming sibling of
    * [[graft.operators.Versioning.corpusDiff]]: the OLD snapshot's content
    * hashes are persisted once as the baseline
    * ([[graft.operators.Versioning.hashIndex]]); each micro-batch of the
    * NEW snapshot probes it (one broadcast-friendly id equi-join — the
    * baseline is (id, hash), never text) and lands per-doc
    * added/changed/unchanged statuses under its micro-batch id
    * (dynamic-partition overwrite — replay-idempotent). `removed` is
    * inherently not a streaming event — absence never arrives — so it
    * stays the one end-of-stream reconciliation: an anti-join of the
    * baseline against the accumulated seen ids (StreamingSpec runs it and
    * checks the combined result equals the batch diff). */
  def streamingSnapshotDiff(spark: SparkSession, newDocs: DataFrame,
                            baselineDir: String, reportDir: String,
                            checkpointDir: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val baseline = spark.read
          .schema(new StructType()
            .add("doc_id", org.apache.spark.sql.types.LongType)
            .add("old_hash", org.apache.spark.sql.types.LongType))
          .parquet(baselineDir)
        graft.operators.Versioning.hashIndex(batch.toDF(), "doc_id")
          .withColumnRenamed("old_hash", "new_hash")
          .join(baseline, Seq("doc_id"), "left")
          .withColumn("status",
            when(col("old_hash").isNull, "added")
              .when(col("old_hash") === col("new_hash"), "unchanged")
              .otherwise("changed"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(reportDir)
        ()
      }
      .start()

  /** Streaming session windows — the arbitrary-stateful tier
    * (`flatMapGroupsWithState` + event-time timeout) beneath the native
    * `session_window`: per user, open sessions live in state as merged
    * intervals; a session is emitted (and its state dropped) once the
    * watermark passes `end + gap`, when no in-order event can extend it.
    * Out-of-order events within the watermark merge correctly because the
    * state is a sorted interval list, not a single running session.
    * Semantics match the batch forms: events exactly `gap` apart merge
    * (split only when the delta exceeds the gap). */
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                                 n_events: Long)

  def streamingSessions(spark: SparkSession, events: DataFrame,
                        gapMinutes: Int = 30,
                        watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("tsc", col("ts").cast("timestamp"))
      .withWatermark("tsc", watermark)
      // the watermarked column must survive into the stateful operator's
      // input (event-time timeout requires it in the child output)
      .select(col("user_id").cast("long").as("_1"),
        unix_micros(col("tsc")).as("_2"), col("tsc").as("_3"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[List[OpenSession]]) =>
          val existing = state.getOption.getOrElse(Nil)
          val wmNow = state.getCurrentWatermarkMs() * 1000L
          // late-data policy: flatMapGroupsWithState DELIVERS rows older
          // than the watermark (unlike windowed aggs) — drop them here, or
          // a late event would reopen a session the watermark already
          // closed and the result would depend on arrival order
          val incoming = rows.map { case (_, tsu, _) => OpenSession(tsu, tsu, 1L) }
            .filter(_.start_us >= wmNow).toList
          val merged =
            if (incoming.isEmpty) existing
            else {
              val all = (existing ++ incoming).sortBy(s => (s.start_us, s.end_us))
              all.tail.foldLeft(List(all.head)) { (acc, s) =>
                val cur = acc.head
                if (s.start_us <= cur.end_us + gapUs)
                  OpenSession(cur.start_us, math.max(cur.end_us, s.end_us),
                    cur.n + s.n) :: acc.tail
                else s :: acc
              }.reverse
            }
          // same watermark value as the late-drop filter above — the two
          // thresholds must share it or a dropped-late event could reopen
          // a closed session
          val (closed, open) = merged.partition(_.end_us + gapUs < wmNow)
          if (open.nonEmpty) {
            state.update(open)
            // wake when the watermark could close the earliest open session
            state.setTimeoutTimestamp(
              open.map(_.end_us).min / 1000L + gapUs / 1000L + 1L)
          } else state.remove()
          closed.map(s => ClosedSession(user, s.start_us, s.end_us, s.n)).iterator
      }
  }

  /** Drive [[streamingSessions]] end to end into parquet — the runner the
    * `stream_sessions` gate query uses: Append-mode session rows land in
    * `outDir` as each session becomes watermark-final. With a far-future
    * sentinel event per user in the source (the [[streamingFunnel]] spec's
    * flush device), the final no-data micro-batch's watermark closes every
    * REAL session, so the parquet output equals the batch
    * `session_window` result exactly — the sentinel's own singleton
    * sessions stay open in state forever and are never emitted. */
  def runSessionsToParquet(spark: SparkSession, events: DataFrame,
                           outDir: String, checkpointDir: String,
                           gapMinutes: Int = 30): StreamingQuery =
    streamingSessions(spark, events, gapMinutes)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()

  /** Streaming funnel — the incremental sibling of [[graft.operators
    * .Relational.funnel]]: per user, emit `(user, step_no, step_ts)` the
    * moment a funnel step becomes REACHED-AND-FINAL. Exactness under
    * out-of-order arrival is the whole problem: "earliest step-2 strictly
    * after the earliest step-1" can be invalidated by a late-arriving
    * earlier step-1, so events are BUFFERED in state until the watermark
    * passes them, then folded into the per-user frontier in event-time
    * order (ties by step index) — at that point no in-watermark event can
    * precede them, so every emitted row is final and Append-safe; events
    * later than the watermark are dropped (the [[streamingSessions]]
    * late-data policy). State per user: k frontier longs + the
    * watermark-bounded pending buffer.
    *
    * Semantics match the batch operator exactly over the matured prefix:
    * the spec drives the full corpus through, flushes with a far-future
    * sentinel, and checks per-step counts equal `Relational.funnel`'s. */
  final case class FunnelHit(user_id: Long, step_no: Int, step_ts: Long)
  final case class FunnelState(frontier: List[Long], pending: List[(Int, Long)])

  def streamingFunnel(spark: SparkSession, events: DataFrame,
                      steps: Seq[String],
                      watermark: String = "10 minutes"): Dataset[FunnelHit] = {
    import spark.implicits._
    require(steps.nonEmpty, "need at least one funnel step")
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.length
    events
      .withColumn("tsc", col("ts").cast("timestamp"))
      .withWatermark("tsc", watermark)
      .where(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long").as("_1"),
        col("event_type").as("_2"), unix_micros(col("tsc")).as("_3"),
        col("tsc").as("_4"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          val st = state.getOption
            .getOrElse(FunnelState(List.fill(k)(Long.MaxValue), Nil))
          val wmNow = state.getCurrentWatermarkMs() * 1000L
          val incoming = rows
            .map { case (_, et, tsu, _) => (stepIdx(et), tsu) }
            .filter(_._2 >= wmNow) // late beyond watermark: drop, like sessions
            .toList
          val (mature, pending) =
            (st.pending ++ incoming).partition(_._2 < wmNow)
          val frontier = st.frontier.toArray
          val hits = scala.collection.mutable.ListBuffer.empty[FunnelHit]
          // ascending event time ⇒ when an event folds, every earlier
          // in-watermark event has already folded: the strict-after check
          // against frontier(i-1) is final
          mature.sortBy { case (i, t) => (t, i) }.foreach { case (i, t) =>
            val prevOk = i == 0 || frontier(i - 1) < t
            if (prevOk && t < frontier(i)) {
              frontier(i) = t
              hits += FunnelHit(user, i + 1, t)
            }
          }
          if (pending.nonEmpty || frontier.exists(_ != Long.MaxValue)) {
            state.update(FunnelState(frontier.toList, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._2).min / 1000L + 1L)
          } else state.remove()
          hits.iterator
      }
  }

  /** Per-key running counters via mapGroupsWithState — the reference's
    * `total_processed`/`total_failed` checkpoint counters
    * (`src/checkpoint_manager.py:9-17`) as managed state. */
  final case class SourceProgress(source: String, processed: Long, totalChars: Long)

  def runningTotals(spark: SparkSession, docs: Dataset[graft.Schemas.Doc]):
      Dataset[SourceProgress] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[SourceProgress, SourceProgress](
        GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[SourceProgress]) =>
          val prev = state.getOption.getOrElse(SourceProgress(src, 0L, 0L))
          var n = prev.processed
          var chars = prev.totalChars
          rows.foreach { d => n += 1; chars += d.n_chars }
          val next = SourceProgress(src, n, chars)
          state.update(next)
          next
      }
  }
}
