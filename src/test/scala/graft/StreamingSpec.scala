package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Structured Streaming layer (SURVEY.md §2.7): windowed aggregates against
  * their batch equivalents, checkpointed ingest with resume, dead-letter
  * split, and stateful running totals. */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("A7 sliding window counts: streaming equals batch") {
    val events = Tables.events(spark, sfDir)
    // batch ground truth with the same window spec
    val batch = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "60 seconds", "20 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val srcDir = tmp("stream-src")
    events.write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, events.schema, maxFilesPerTrigger = 2)
    val q = Streams.slidingEventCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("win_counts")
      .select(col("win_start"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("checkpointed ingest writes batches and resumes without duplicates") {
    val srcDir = tmp("ingest-src")
    val outDir = tmp("ingest-out") + "/data"
    val ckDir = tmp("ingest-ck")
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").parquet(srcDir)

    val q1 = Streams.ingest(spark, srcDir, docs.schema, outDir, ckDir)
    q1.awaitTermination()
    val afterFirst = spark.read.json(outDir).count()
    assert(afterFirst == docs.count()) // all docs valid in testdata

    // resume with no new files: offset log says everything is processed
    val q2 = Streams.ingest(spark, srcDir, docs.schema, outDir, ckDir)
    q2.awaitTermination()
    assert(spark.read.json(outDir).count() == afterFirst)

    // new file arrives -> only it is processed on the next run
    docs.limit(7).withColumn("doc_id", col("doc_id") + 100000L)
      .write.mode("append").parquet(srcDir)
    val q3 = Streams.ingest(spark, srcDir, docs.schema, outDir, ckDir)
    q3.awaitTermination()
    assert(spark.read.json(outDir).count() == afterFirst + 7)
  }

  test("streaming near-dup pairs accumulate to the batch minhash result") {
    import graft.operators.Dedup
    // plant near-copies (the corpus alone may have none at this sf): every
    // 10th doc re-delivered under an offset id
    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val docs = docs0.unionByName(
      docs0.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val srcDir = tmp("ndup-src")
    val indexDir = tmp("ndup-idx") + "/index"
    val pairsDir = tmp("ndup-pairs") + "/pairs"
    val ckDir = tmp("ndup-ck")
    // several files + maxFilesPerTrigger=1 → several micro-batches, so
    // pairs must be found across batch boundaries via the persisted index
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, docs.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingNearDup(spark, stream, indexDir, pairsDir, ckDir)
    q.awaitTermination()
    val streamed = spark.read.parquet(pairsDir)
      .select("doc_a", "doc_b", "est_jaccard_x100")
      .distinct().as[(Long, Long, Long)].collect().toSet
    val batch = Dedup.minhashPairs(docs).as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // the planted copies must actually pair up
    // the index now covers the whole corpus: one signature set per doc
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("doc_id").distinct().count() == docs.count())
  }

  test("streaming decontamination equals the batch report over all micro-batches") {
    import graft.operators.Decontaminate
    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val train = docs0.where(col("doc_id") % 2 === 0)
    // eval stream: the odd half plus planted copies of train docs
    val eval = docs0.where(col("doc_id") % 2 === 1)
      .unionByName(train.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val universeDir = tmp("dec-uni") + "/u"
    val srcDir = tmp("dec-src")
    val reportDir = tmp("dec-rep") + "/r"
    // the persisted artifact: train's shingle universe, written once
    Decontaminate.shingleUniverse(train, 8).write.parquet(universeDir)
    eval.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, eval.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingDecontaminate(spark, stream, universeDir,
      reportDir, tmp("dec-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(reportDir)
      .select("doc_id", "n_sh", "n_hit", "overlap_x10000", "contaminated")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = Decontaminate.overlapReport(train, eval, 8, 5000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists(_._5 == 1L)) // planted copies flagged
  }

  test("streaming media decode equals the batch features over all micro-batches") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
    val media = Multimodal.toMediaTable(spark, docs)
    val srcDir = tmp("mm-src")
    val outDir = tmp("mm-out") + "/o"
    media.toDF().repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, media.toDF().schema,
      maxFilesPerTrigger = 1)
    val q = Streams.streamingMediaDecode(spark, stream, outDir, tmp("mm-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("media_id", "kind", "mime", "n_bytes", "parsed", "width",
        "height", "n_frames")
      .as[(Long, String, String, Long, Long, Int, Int, Long)].collect().toSet
    val batch = Multimodal.mediaFeatures(spark, docs)
      .as[(Long, String, String, Long, Long, Int, Int, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.forall(_._5 == 1L)) // every planted container parses
  }

  test("streaming snapshot diff + end-of-stream reconciliation equals the batch diff") {
    import graft.operators.Versioning
    val old = Tables.documents(spark, sfDir).select("doc_id", "text")
    val nw = old.where(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" changed")))
          .otherwise(col("text")))
      .unionByName(old.where(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val baseDir = tmp("ver-base") + "/b"
    val srcDir = tmp("ver-src")
    val repDir = tmp("ver-rep") + "/r"
    // the persisted artifact: the old snapshot's hash index, written once
    Versioning.hashIndex(old).write.parquet(baseDir)
    nw.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, nw.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingSnapshotDiff(spark, stream, baseDir, repDir,
      tmp("ver-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(repDir).select("doc_id", "status")
      .as[(Long, String)].collect().toSet
    // removed never arrives as an event: reconcile baseline vs seen ids once
    val seen = spark.read.parquet(repDir).select("doc_id")
    val removed = spark.read.parquet(baseDir)
      .join(seen, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet.map((id: Long) => id -> "removed")
    val batch = Versioning.corpusDiff(old, nw).select("doc_id", "status")
      .as[(Long, String)].collect().toSet
    assert((streamed ++ removed) == batch)
    assert(streamed.exists(_._2 == "added") && streamed.exists(_._2 == "changed")
      && removed.nonEmpty)
  }

  test("streaming curation equals the batch gate + shard over all micro-batches") {
    import graft.operators.{Mixing, TextAnalysis}
    val docs0 = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val thrDir = tmp("cur-thr") + "/t"
    val srcDir = tmp("cur-src")
    val outDir = tmp("cur-out") + "/o"
    // the persisted artifact: per-source thresholds from the reference
    // corpus (here: the corpus itself), written once
    TextAnalysis.qualityThresholds(docs0, 60).write.parquet(thrDir)
    docs0.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, docs0.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingCurate(spark, stream, thrDir, outDir, tmp("cur-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "source", "quality_x10000", "q_threshold", "shard")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val batch = Mixing.withShard(
        TextAnalysis.gateAgainstThresholds(docs0,
          spark.read.parquet(thrDir)), 16)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < docs0.count())
  }

  test("streaming template-strip apply equals the batch apply against the " +
    "same frozen strip set") {
    import graft.operators.WebCuration
    import org.apache.spark.sql.functions._
    // base corpus trains the set; the stream carries NEW docs, some made
    // of pure template lines (must strip to empty), some clean
    val base = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val setDir = tmp("tmpl-set") + "/s"
    val srcDir = tmp("tmpl-src")
    val outDir = tmp("tmpl-out") + "/o"
    WebCuration.templateStripSet(
        base.withColumn("text",
          concat(col("source"),
            lit(" alpha beta gamma delta epsilon zeta eta theta iota "),
            col("text"))))
      .write.parquet(setDir)
    val incoming = base.limit(40)
      .withColumn("text",
        when(col("doc_id") % 2 === 0,
          concat(col("source"),
            lit(" alpha beta gamma delta epsilon zeta eta theta iota "),
            col("text")))
          .otherwise(col("text")))
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    val q = Streams.streamingTemplateStrip(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      setDir, outDir, tmp("tmpl-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "source", "n_lines", "n_boiler", "kept_text")
      .as[(Long, String, Long, Long, String)].collect().toSet
    val batch = WebCuration.templateApplyStrip(
        spark.read.parquet(srcDir), spark.read.parquet(setDir))
      .as[(Long, String, Long, Long, String)].collect().toSet
    assert(streamed == batch)
    // the planted header really stripped from every planted incoming doc
    assert(streamed.filter(_._1 % 2 == 0).forall(_._4 > 0))
    assert(streamed.exists(_._4 == 0))
  }

  test("streaming NB scoring equals the batch score against the same " +
    "frozen model, including unseen-bucket defaults") {
    import graft.operators.Classifier
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val train = docs.where(col("doc_id") % 4 =!= 0)
    val incoming = docs.where(col("doc_id") % 4 === 0)
    val modelDir = tmp("nb-model") + "/m"
    val srcDir = tmp("nb-src")
    val outDir = tmp("nb-out") + "/o"
    Classifier.hashedNBFit(Classifier.hashedNgramFeatures(train, 256), 256)
      .write.parquet(modelDir)
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    val q = Streams.streamingNBScore(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      modelDir, outDir, tmp("nb-ck"), buckets = 256)
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "label", "score_x1e6", "predicted", "correct")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = Classifier.hashedNBScore(
        Classifier.hashedNgramFeatures(incoming, 256),
        spark.read.parquet(modelDir))
      .select(col("doc_id"), col("label"), col("score_x1e6"),
        col("predicted"), col("correct"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming BM25 maintenance equals the full rebuild; a replayed " +
    "micro-batch (same batch_id) is a no-op through the applied ledger; " +
    "a checkpoint-reusing restart absorbs nothing twice") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val incoming = docs.where(col("doc_id") % 4 === 0)
    val idxDir = tmp("bm25s-idx") + "/index"
    val srcDir = tmp("bm25s-src")
    val ckDir = tmp("bm25s-ck")
    Similarity.buildBm25Index(base, idxDir, maxDf = 100)
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    def runStream(): Unit =
      Streams.streamingBm25Update(spark,
        Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
        idxDir, ckDir).awaitTermination()
    runStream()
    // segment boundaries differ (3 streamed appends vs 1 base) — the
    // SERVED surface is what must equal the rebuild
    val fullDir = tmp("bm25s-full") + "/index"
    Similarity.buildBm25Index(docs, fullDir, maxDf = 100)
    Bm25Views.assertServedEqual(spark, idxDir, fullDir)
    // the ledger recorded each micro-batch exactly once
    val applied = spark.read.parquet(s"$idxDir/applied")
      .select("batch_id").as[Long].collect().sorted
    assert(applied.length == applied.distinct.length && applied.nonEmpty)
    // REPLAY the first batch id with extra docs: the ledger must refuse
    def postingsRows(): Set[Seq[Any]] =
      Bm25Views.livePostings(spark, idxDir).collect().map(_.toSeq).toSet
    val before = postingsRows()
    val replayed = Similarity.updateBm25IndexOnce(spark, idxDir,
      incoming.limit(5), batchId = applied.head)
    assert(!replayed && postingsRows() == before,
      "a re-delivered batch_id mutated the index")
    // restart against the SAME checkpoint: committed offsets, no new files
    // -> nothing re-absorbed
    runStream()
    assert(postingsRows() == before &&
      spark.read.parquet(s"$idxDir/applied").count() == applied.length,
      "a checkpoint-reusing restart re-absorbed data")
  }

  test("streaming ANN maintenance equals the one-shot incremental update " +
    "component for component; a replayed batch_id is a no-op; the frozen " +
    "codebook survives the whole stream") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where(col("vec_id") % 4 =!= 0)
    val incoming = emb.where(col("vec_id") % 4 === 0)
      .select($"vec_id", $"embedding")
    val sIdx = tmp("anns-idx") + "/index"
    val oIdx = tmp("anns-one") + "/index"
    val srcDir = tmp("anns-src")
    Similarity.buildAnnIndex(base, sIdx)
    Similarity.buildAnnIndex(base, oIdx)
    val frozen = spark.read.parquet(s"$sIdx/pq_centroids")
      .collect().map(_.toSeq).toSet
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingAnnUpdate(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      sIdx, tmp("anns-ck")).awaitTermination()
    Similarity.updateAnnIndex(spark, oIdx, incoming)
    // segment boundaries differ (3 streamed appends vs 1) — compare the
    // logical surface: row content, aggregated sums, derived centroids
    def comp(dir: String, name: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/$name").drop("seg")
        .collect().map(_.toSeq).toSet
    def sumsAgg(dir: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/coarse_sums")
        .groupBy($"cell", $"d").agg(sum($"sd").as("sd"), sum($"cnt").as("cnt"))
        .where($"cnt" > 0).collect().map(_.toSeq).toSet
    Seq("vectors", "cells", "codes", "coarse_centroids").foreach { n =>
      assert(comp(sIdx, n) == comp(oIdx, n),
        s"$n diverged between the stream and the one-shot update")
    }
    assert(sumsAgg(sIdx) == sumsAgg(oIdx),
      "aggregated coarse sums diverged between stream and one-shot update")
    assert(comp(sIdx, "pq_centroids") == frozen, "codebook moved")
    val applied = spark.read.parquet(s"$sIdx/applied")
      .select("batch_id").as[Long].collect().sorted
    assert(applied.length == applied.distinct.length && applied.nonEmpty)
    val before = comp(sIdx, "cells")
    assert(!Similarity.updateAnnIndexOnce(spark, sIdx, incoming.limit(3),
      batchId = applied.head))
    assert(comp(sIdx, "cells") == before, "replayed batch mutated the index")
  }

  test("streaming takedown drains to the one-shot delete component for " +
    "component; re-delivered delete ids are no-ops (idempotent by " +
    "construction, no ledger needed)") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val gone = docs.where(col("doc_id") % 7 === 5).select($"doc_id")
    val sIdx = tmp("td-s") + "/index"
    val oIdx = tmp("td-o") + "/index"
    Similarity.buildBm25Index(docs, sIdx, maxDf = 100)
    Similarity.buildBm25Index(docs, oIdx, maxDf = 100)
    val srcDir = tmp("td-src")
    gone.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingTakedown(spark,
      Streams.fileSource(spark, srcDir, gone.schema, maxFilesPerTrigger = 1),
      sIdx, tmp("td-ck")).awaitTermination()
    Similarity.removeFromBm25Index(spark, oIdx, gone)
    // tombstone segment boundaries differ (3 streamed batches vs 1) —
    // the served surface is what must match
    Bm25Views.assertServedEqual(spark, sIdx, oIdx)
    // re-deliver the whole request set: nothing left to subtract — a
    // fully-redundant delete is a NO-OP that writes no new segments
    def segDirs(): Set[String] = {
      val fs = new org.apache.hadoop.fs.Path(sIdx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("postings", "doclen", "stats", "termdf", "deleted").flatMap { c =>
        val d = new org.apache.hadoop.fs.Path(s"$sIdx/$c")
        if (!fs.exists(d)) Nil
        else fs.listStatus(d).toSeq.map(st => s"$c/${st.getPath.getName}")
      }.toSet
    }
    val beforeSegs = segDirs()
    val beforeRows = Bm25Views.livePostings(spark, sIdx)
      .collect().map(_.toSeq).toSet
    Similarity.removeFromBm25Index(spark, sIdx, gone)
    assert(segDirs() == beforeSegs,
      "a fully-redundant delete must write no new segments")
    assert(Bm25Views.livePostings(spark, sIdx)
      .collect().map(_.toSeq).toSet == beforeRows,
      "re-delivered deletes changed the served postings")
  }

  test("in-loop auto-compaction folds the segment log mid-stream, keeps " +
    "answers rebuild-identical, and composes with the exactly-once ledger") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val incoming = docs.where(col("doc_id") % 4 === 0)
    val idxDir = tmp("bm25ac-idx") + "/index"
    val srcDir = tmp("bm25ac-src")
    Similarity.buildBm25Index(base, idxDir, maxDf = 100)
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingBm25Update(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      idxDir, tmp("bm25ac-ck"), autoCompactSegments = 2).awaitTermination()
    // the policy fired: no component's segment count exceeds the bound
    Seq("postings", "termdf", "doclen", "stats").foreach { c =>
      val segsNow = new java.io.File(s"$idxDir/$c").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(segsNow.size <= 2, s"$c not folded by the policy: $segsNow")
      assert(segsNow.contains("seg=base"), s"$c lost its base segment")
    }
    // answers equal the full rebuild despite the mid-stream folds
    val fullDir = tmp("bm25ac-full") + "/index"
    Similarity.buildBm25Index(docs, fullDir, maxDf = 100)
    Bm25Views.assertServedEqual(spark, idxDir, fullDir)
    // the ledger survived compaction: a replayed batch_id still refuses
    val applied = spark.read.parquet(s"$idxDir/applied")
      .select("batch_id").as[Long].collect().sorted
    assert(applied.nonEmpty)
    assert(!Similarity.updateBm25IndexOnce(spark, idxDir,
      incoming.limit(5), batchId = applied.head),
      "compaction must not reset the applied-batch ledger")
  }

  test("ANN in-loop auto-compaction folds mid-stream; probe answers equal " +
    "the uncompacted stream's; ledger survives") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where(col("vec_id") % 4 =!= 0)
    val incoming = emb.where(col("vec_id") % 4 === 0)
      .select($"vec_id", $"embedding")
    val acIdx = tmp("annac-idx") + "/index"
    val plainIdx = tmp("annac-plain") + "/index"
    val srcDir = tmp("annac-src")
    Similarity.buildAnnIndex(base, acIdx)
    Similarity.buildAnnIndex(base, plainIdx)
    incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingAnnUpdate(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      acIdx, tmp("annac-ck"), autoCompactSegments = 2).awaitTermination()
    Streams.streamingAnnUpdate(spark,
      Streams.fileSource(spark, srcDir, incoming.schema, maxFilesPerTrigger = 1),
      plainIdx, tmp("annac-ck2")).awaitTermination()
    Seq("vectors", "cells", "codes", "coarse_sums").foreach { c =>
      val segsNow = new java.io.File(s"$acIdx/$c").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(segsNow.size <= 2, s"$c not folded by the policy: $segsNow")
    }
    assert(Similarity.annQueryIndex(spark, acIdx, nQueries = 10, k = 5)
      .collect().map(_.toSeq).toSet ==
      Similarity.annQueryIndex(spark, plainIdx, nQueries = 10, k = 5)
        .collect().map(_.toSeq).toSet,
      "auto-compaction changed the probe answers")
    val applied = spark.read.parquet(s"$acIdx/applied")
      .select("batch_id").as[Long].collect().sorted
    assert(applied.nonEmpty)
    assert(!Similarity.updateAnnIndexOnce(spark, acIdx,
      incoming.limit(3), batchId = applied.head),
      "compaction must not reset the applied-batch ledger")
  }

  test("streaming near-dup takedown drains to the one-shot partition-" +
    "scoped delete; re-delivered requests rewrite nothing") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .where($"doc_id" < 300)
    def stageIndex(dir: String): Unit =
      Dedup.minhashTable(docs, 3, 16)
        .withColumn("batch_id", pmod($"doc_id", lit(3L)))
        .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    val sIdx = tmp("mhtd-s") + "/index"
    val oIdx = tmp("mhtd-o") + "/index"
    stageIndex(sIdx); stageIndex(oIdx)
    val gone = docs.where($"doc_id" % 7 === 5).select($"doc_id")
    val srcDir = tmp("mhtd-src")
    gone.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingNearDupTakedown(spark,
      Streams.fileSource(spark, srcDir, gone.schema, maxFilesPerTrigger = 1),
      sIdx, tmp("mhtd-ck")).awaitTermination()
    Dedup.removeFromMinhashIndexDir(spark, oIdx, gone)
    def rows(dir: String): Set[Seq[Any]] =
      spark.read.parquet(dir).select($"doc_id", $"i", $"mh")
        .collect().map(_.toSeq).toSet
    assert(rows(sIdx) == rows(oIdx),
      "streamed takedown diverged from the one-shot delete")
    assert(spark.read.parquet(sIdx).join(gone, Seq("doc_id")).isEmpty,
      "residue after the streamed takedown")
    // re-deliver the whole request set: no partition may rewrite
    val fs = new org.apache.hadoop.fs.Path(sIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snapshot(): Set[(String, Long, Long)] = {
      val out = Set.newBuilder[(String, Long, Long)]
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(sIdx), true)
      while (it.hasNext) {
        val st = it.next()
        out += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
      out.result()
    }
    val before = snapshot()
    Dedup.removeFromMinhashIndexDir(spark, sIdx, gone)
    assert(snapshot() == before,
      "a fully-redundant takedown rewrote index files")
  }

  test("streaming ANN takedown drains to the one-shot delete component " +
    "for component; re-delivered delete ids are no-ops") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val gone = emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 10)
      .select($"vec_id")
    val sIdx = tmp("atd-s") + "/index"
    val oIdx = tmp("atd-o") + "/index"
    Similarity.buildAnnIndex(emb, sIdx)
    Similarity.buildAnnIndex(emb, oIdx)
    val srcDir = tmp("atd-src")
    gone.repartition(3).write.mode("overwrite").parquet(srcDir)
    Streams.streamingAnnTakedown(spark,
      Streams.fileSource(spark, srcDir, gone.schema, maxFilesPerTrigger = 1),
      sIdx, tmp("atd-ck")).awaitTermination()
    Similarity.removeFromAnnIndex(spark, oIdx, gone)
    // tombstone segment boundaries differ (3 streamed batches vs 1) —
    // compare the LIVE surface the probe reads
    def live(dir: String, c: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/$c").drop("seg")
        .join(spark.read.parquet(s"$dir/deleted").drop("seg")
          .select($"vec_id").distinct(), Seq("vec_id"), "left_anti")
        .collect().map(_.toSeq).toSet
    def sumsAgg(dir: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/coarse_sums")
        .groupBy($"cell", $"d").agg(sum($"sd").as("sd"), sum($"cnt").as("cnt"))
        .where($"cnt" > 0).collect().map(_.toSeq).toSet
    Seq("vectors", "cells", "codes").foreach { n =>
      assert(live(sIdx, n) == live(oIdx, n),
        s"$n diverged between the stream and the one-shot delete")
    }
    assert(sumsAgg(sIdx) == sumsAgg(oIdx),
      "aggregated sums diverged between stream and one-shot delete")
    Seq("coarse_centroids", "pq_centroids").foreach { n =>
      assert(spark.read.parquet(s"$sIdx/$n").collect().map(_.toSeq).toSet ==
        spark.read.parquet(s"$oIdx/$n").collect().map(_.toSeq).toSet,
        s"$n diverged between the stream and the one-shot delete")
    }
    // re-deliver the whole request set: nothing left to subtract — a
    // fully-redundant delete writes no new segments
    val beforeCells = live(sIdx, "cells")
    val beforeSegs = {
      val fs = new org.apache.hadoop.fs.Path(sIdx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$sIdx/deleted"))
        .map(_.getPath.getName).toSet
    }
    Similarity.removeFromAnnIndex(spark, sIdx, gone)
    assert(live(sIdx, "cells") == beforeCells,
      "re-delivered deletes changed the live cells")
    assert({
      val fs = new org.apache.hadoop.fs.Path(sIdx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$sIdx/deleted"))
        .map(_.getPath.getName).toSet
    } == beforeSegs, "a fully-redundant delete must write no tombstones")
  }

  test("streaming audit accumulates to the batch audit of the same rules") {
    import graft.operators.DataQuality._
    val docs = Tables.documents(spark, sfDir)
    val srcDir = tmp("dq-src")
    val outDir = tmp("dq-out") + "/o"
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val langs = Seq("en", "de", "fr", "es").toDF("lang") // zh absent
    def rules = Seq(
      RowRule("nchar_consistent",
        col("n_chars") === length(col("text")).cast("long")),
      RowRule("text_nonempty", length(col("text")) > 0),
      RefRule("fk_lang", "lang", langs, "lang"))
    val q = Streams.streamingAudit(spark,
      Streams.fileSource(spark, srcDir, docs.schema, maxFilesPerTrigger = 1),
      "documents", rules, outDir, tmp("dq-ck"))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .groupBy("table_name", "check_name")
      .agg(sum("violations").as("violations"), sum("total").as("total"))
      .as[(String, String, Long, Long)].collect().toSet
    val batch = audit("documents", docs, rules)
      .select("table_name", "check_name", "violations", "total")
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    // the planted gap is a REAL finding: zh docs fail the fk_lang check
    assert(streamed.exists { case (_, c, v, _) => c == "fk_lang" && v > 0 })
    // and uniqueness is refused loudly
    assertThrows[IllegalArgumentException] {
      Streams.streamingAudit(spark,
        Streams.fileSource(spark, srcDir, docs.schema, 1), "documents",
        Seq(UniqueRule("pk", Seq("doc_id"))), outDir, tmp("dq-ck2"))
    }
  }

  test("streaming near-dup survives a first batch that yields no signatures") {
    // docs below the shingle width produce an empty signature table; the
    // index dir then has no parquet files and schema INFERENCE would kill
    // the stream — the explicit-schema read must keep it alive
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val srcDir = tmp("ndup0-src")
    val indexDir = tmp("ndup0-idx") + "/index"
    val pairsDir = tmp("ndup0-pairs") + "/pairs"
    docs.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, docs.schema)
    val q = Streams.streamingNearDup(spark, stream, indexDir, pairsDir,
      tmp("ndup0-ck"))
    q.awaitTermination() // must complete, not die on schema inference
    assert(q.exception.isEmpty)
  }

  test("streaming sessions emit exactly the batch sessions once the watermark closes them") {
    val ev = Tables.events(spark, sfDir)
    // batch ground truth: the very operator a12 is gated on
    val batch = operators.Relational.sessionize(spark, sfDir, 30)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val srcDir = tmp("sess-src")
    // time-sliced files WRITTEN SEQUENTIALLY in range order: the file
    // source orders by modification time, so each micro-batch covers the
    // next time slice and the watermark trails the data (range k's max ≤
    // range k+1's min ⇒ wm = max − 30min never passes unseen events). A
    // single repartitionByRange write would leave file order to parallel
    // task-commit timing — flaky.
    val sliced = ev.withColumn("_p",
      ntile(8).over(org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    (1 to 8).foreach { p =>
      sliced.where(col("_p") === p).drop("_p").coalesce(1)
        .write.mode("append").parquet(srcDir)
      Thread.sleep(10) // distinct mod-times preserve the range order
    }
    val stream = Streams.fileSource(spark, srcDir, ev.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingSessions(spark, stream)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sessions_stream")
      .as[Streams.ClosedSession].collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
    // the stream can only emit sessions the final watermark already closed,
    // but everything it emits must be a real batch session, closed exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch: ${streamed.diff(batch).take(3)}")
  }

  test("streaming funnel equals the batch funnel once a sentinel flushes the watermark") {
    val ev = Tables.events(spark, sfDir)
    val steps = Seq("view", "click", "purchase")
    val batch = operators.Relational.funnel(
        ev.withColumn("tsu", unix_micros(col("ts").cast("timestamp"))), steps)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap

    val srcDir = tmp("funnel-src")
    // time-sliced sequential files (see the sessions test) + one final
    // sentinel event a day past the end: the last micro-batch's watermark
    // then clears every real event, so every funnel hit is emitted
    val sliced = ev.withColumn("_p",
      ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    (1 to 4).foreach { p =>
      sliced.where(col("_p") === p).drop("_p").coalesce(1)
        .write.mode("append").parquet(srcDir)
      Thread.sleep(10)
    }
    ev.limit(1)
      .withColumn("ts", (col("ts").cast("timestamp") + expr("INTERVAL 1 DAY"))
        .cast(ev.schema("ts").dataType))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("view"))
      .coalesce(1).write.mode("append").parquet(srcDir)

    val stream = Streams.fileSource(spark, srcDir, ev.schema, maxFilesPerTrigger = 1)
    val q = Streams.streamingFunnel(spark, stream, steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val hits = spark.table("funnel_stream")
      .as[Streams.FunnelHit].collect().filter(_.user_id >= 0)
    // each (user, step) is emitted at most once — Append-safety
    assert(hits.groupBy(h => (h.user_id, h.step_no)).values.forall(_.size == 1))
    val streamedCounts = hits.groupBy(_.step_no)
      .map { case (s, hs) => s.toLong -> hs.size.toLong }
    assert(streamedCounts == batch.map { case (s, n) => s -> n },
      s"stream $streamedCounts vs batch $batch")
  }

  test("stream-stream attribution join equals the batch bounded range join") {
    val ev = Tables.events(spark, sfDir)
    // batch ground truth: inner matches of the same (user, trailing-5m) rule
    val evU = ev.withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
    val batch = operators.Relational.boundedRangeJoin(
        evU.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu")),
        evU.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("tsu").as("click_tsu")),
        "user_id", "tsu", "click_tsu", -5L * 60L * 1000000L, 0L)
      .select(col("event_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet

    val srcDir = tmp("attr-src")
    ev.write.mode("overwrite").parquet(srcDir)
    val s1 = Streams.fileSource(spark, srcDir, ev.schema, maxFilesPerTrigger = 2)
      .where(col("event_type") === "purchase")
    val s2 = Streams.fileSource(spark, srcDir, ev.schema, maxFilesPerTrigger = 2)
      .where(col("event_type") === "click")
    val q = Streams.attributionJoin(s1, s2)
      .writeStream.format("memory").queryName("attr_join")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("attr_join")
      .select(col("event_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("left-outer attribution emits each unmatched purchase exactly once, after the watermark") {
    // crafted cases: a matched purchase (no null leg), a purchase with no
    // click at all, and a purchase whose only click arrives AFTER it (both
    // null legs). Sentinels (negative users, far-future ts) drive the
    // per-stream watermarks past every interval end; null-leg rows then
    // flush in Spark's final no-data micro-batch — the mechanism the
    // stream_attribution_outer harness relies on.
    val rows = Seq(
      (10L, 1L, "2024-01-01 10:00:00", "click"),
      (11L, 1L, "2024-01-01 10:02:00", "purchase"), // matches click 10
      (20L, 2L, "2024-01-01 10:03:00", "purchase"), // no click: null leg
      (30L, 3L, "2024-01-01 10:01:00", "purchase"), // click after: null leg
      (31L, 3L, "2024-01-01 10:04:00", "click"),
      (-1L, -1L, "2024-01-01 12:00:00", "purchase"), // watermark sentinels
      (-2L, -2L, "2024-01-01 12:00:00", "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val srcDir = tmp("attr-outer-src")
    rows.write.mode("overwrite").parquet(srcDir)
    def src() = Streams.fileSource(spark, srcDir, rows.schema, maxFilesPerTrigger = 2)
    val q = Streams.attributionJoin(
        src().where(col("event_type") === "purchase"),
        src().where(col("event_type") === "click"),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("attr_outer").where(col("user_id") >= 0L)
      .select(col("event_id"), col("click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    // exact MULTISET: each null-leg row exactly once, never duplicated by
    // the flush batch, and the matched purchase has no null sibling
    assert(got.sorted == Seq(
      (11L, Some(10L)), (20L, None), (30L, None)).sorted, s"got $got")
  }

  test("streaming dedup drops in-horizon re-deliveries; equals batch distinct") {
    val docs = Seq(
      (1L, "alpha beta gamma", "2024-01-01 10:00:00"),
      (2L, "  alpha   beta\tgamma ", "2024-01-01 10:01:00"), // ws-variant dupe
      (3L, "other text", "2024-01-01 10:02:00"),
      (4L, "alpha beta gamma", "2024-01-01 10:03:00"),       // exact dupe
      (5L, "third body", "2024-01-01 10:04:00")
    ).toDF("doc_id", "text", "ts")
    val srcDir = tmp("dedup-src")
    docs.write.mode("overwrite").parquet(srcDir)
    val stream = Streams.fileSource(spark, srcDir, docs.schema, maxFilesPerTrigger = 1)
    val q = Streams.dedupStream(stream)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_stream")
    // one survivor per distinct normalized content, same as the batch form
    assert(got.count() == 3)
    assert(got.select("content_hash").distinct().count() == 3)
    val batchHashes = docs
      .select(xxhash64(graft.functions.TextFunctions.normalizeWhitespace(col("text"))))
      .distinct().as[Long].collect().toSet
    assert(got.select("content_hash").as[Long].collect().toSet == batchHashes)
  }

  test("dead-letter split quarantines invalid rows with a reason") {
    val docs = Seq(
      (1L, "good content", "en", "src0", 12L),
      (2L, "", "en", "src0", 0L),
      (3L, "#REDIRECT [[X]]", "en", "src0", 15L),
      (4L, "more good content", "en", "src0", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val (ok, dead) = Streams.splitValid(docs)
    assert(ok.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val reasons = dead.select("doc_id", "error").as[(Long, String)].collect().toMap
    assert(reasons == Map(2L -> "empty_content", 3L -> "redirect"))
  }

  test("running totals keep per-source state across micro-batches") {
    import Schemas.Doc
    val docs = Tables.documents(spark, sfDir).as[Doc]
    val got = Streams.runningTotals(spark, docs).collect()
      .map(p => p.source -> (p.processed, p.totalChars)).toMap
    val expect = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)), sum("n_chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
  }

  test("watermark drops late events in update mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val agg = df
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Update()).trigger(Trigger.ProcessingTime(0)).start()
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((ts(0), "a"), (ts(1), "a"))
    q.processAllAvailable()
    // advance the watermark far past 10:00
    mem.addData((ts(30), "a"))
    q.processAllAvailable()
    // this event is an hour late -> dropped by the watermark
    mem.addData((ts(0), "a"))
    q.processAllAvailable()
    q.stop()
    val n1000 = spark.table("late_out")
      .where(col("win_start") === ts(0) && col("event_type") === "a")
      .agg(max("n")).collect().head.getLong(0)
    assert(n1000 == 1L) // the late re-count never landed
  }
}
