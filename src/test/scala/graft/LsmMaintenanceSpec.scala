package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.sources.AtomicSwap

/** Round-13 LSM maintenance contracts: tombstone ordering under re-ingest,
  * the tiered (leveled) merge policy's O(tier) fold cost, the takedown's
  * partition-pruned decrement read, the pooled takedown trigger, the
  * writer-writer lease, the slim minhash membership probe, and the
  * band-count fix for new-new incremental pHash pairs. */
class LsmMaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-lsm-$tag-").toString

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (relativePath, length, mtime) of every data file under dir. */
  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = fs.makeQualified(new Path(dir))
    val out = Map.newBuilder[String, (Long, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(root.toString)
        .stripPrefix("/")
      out += rel -> (st.getLen, st.getModificationTime)
    }
    out.result()
  }

  private def docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")

  test("BM25 tombstone ordering: a taken-down doc_id re-ingested before " +
    "compaction is SKIPPED (stats/df equal the rebuild without it); after " +
    "compaction clears the tombstones the same id re-admits cleanly") {
    val dir = tmp("readd") + "/index"
    val base = docs.where($"doc_id" < 300)
    val gone = docs.where($"doc_id" < 300 && $"doc_id" % 10 === 0)
      .select($"doc_id")
    val batchNew = docs.where($"doc_id" >= 300 && $"doc_id" < 350)
    val batchReAdd = docs.where($"doc_id" % 10 === 0 && $"doc_id" < 300)
    Similarity.buildBm25Index(base, dir, maxDf = 1000)
    Similarity.removeFromBm25Index(spark, dir, gone)
    // the poisoned update: batch = genuinely-new docs ∪ tombstoned ids
    Similarity.updateBm25Index(spark, dir, batchNew.unionByName(batchReAdd))
    // reference: rebuild over survivors ∪ the genuinely-new docs only
    val refDir = tmp("readd-ref") + "/index"
    Similarity.buildBm25Index(
      base.join(gone, Seq("doc_id"), "left_anti").unionByName(batchNew),
      refDir, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, refDir)
    // compaction clears the tombstone tier; the id is then re-admittable
    Similarity.compactBm25Index(spark, dir)
    Similarity.updateBm25Index(spark, dir, batchReAdd)
    val refDir2 = tmp("readd-ref2") + "/index"
    Similarity.buildBm25Index(
      base.join(gone, Seq("doc_id"), "left_anti")
        .unionByName(batchNew).unionByName(batchReAdd),
      refDir2, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, refDir2)
  }

  test("ANN tombstone ordering: a taken-down vec_id in an update batch is " +
    "skipped — probe answers and aggregated coarse sums equal the update " +
    "without it") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where($"vec_id" < 300)
    val gone = emb.where($"vec_id" < 300 && $"vec_id" % 10 === 0)
      .select($"vec_id")
    val batchNew = emb.where($"vec_id" >= 300 && $"vec_id" < 350)
    val batchReAdd = emb.where($"vec_id" % 10 === 0 && $"vec_id" < 300)
    val poisoned = tmp("ann-readd") + "/index"
    val clean = tmp("ann-clean") + "/index"
    Seq(poisoned, clean).foreach(Similarity.buildAnnIndex(base, _))
    Seq(poisoned, clean).foreach(
      Similarity.removeFromAnnIndex(spark, _, gone))
    Similarity.updateAnnIndex(spark, poisoned,
      batchNew.unionByName(batchReAdd))
    Similarity.updateAnnIndex(spark, clean, batchNew)
    def probe(d: String) =
      Similarity.annQueryIndex(spark, d, nQueries = 10, k = 5)
        .collect().map(_.toSeq).toSet
    assert(probe(poisoned) == probe(clean),
      "re-ingested tombstoned vectors leaked into the probe")
    def sums(d: String) = spark.read.parquet(s"$d/coarse_sums").drop("seg")
      .groupBy($"cell", $"d").agg(sum($"sd").as("sd"), sum($"cnt").as("cnt"))
      .where($"cnt" =!= 0 || $"sd" =!= 0)
      .collect().map(_.toSeq).toSet
    assert(sums(poisoned) == sums(clean),
      "tombstoned vectors still counted in the aggregated coarse sums")
  }

  test("tiered compaction folds only the chosen tier — base files " +
    "untouched (O(tier) cost), served answers identical, maybeCompact " +
    "picks the tier and lands the count at maxSegments") {
    val dir = tmp("tier") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 200), dir, maxDf = 100)
    (0 to 2).foreach { i =>
      Similarity.updateBm25Index(spark, dir,
        docs.where($"doc_id" >= 200 + i * 50 && $"doc_id" < 250 + i * 50))
    }
    def segsOf(c: String): Set[String] =
      fs.listStatus(new Path(s"$dir/$c")).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("seg=")).toSet
    assert(segsOf("postings").size == 4) // base + 3 deltas
    val served = Bm25Views.servedPostings(spark, dir)
      .collect().map(_.toSeq).toSet
    val baseFiles = snapshot(dir).filter(_._1.contains("/seg=base/"))
    // fold the two smallest deltas
    assert(Similarity.compactBm25IndexTier(spark, dir, k = 2))
    val after = snapshot(dir)
    baseFiles.foreach { case (rel, sig) =>
      assert(after.get(rel).contains(sig),
        s"tier fold touched a base-segment file: $rel — the fold is not " +
          "O(tier)")
    }
    assert(segsOf("postings").size == 3, "2 deltas must fold into 1")
    assert(Bm25Views.servedPostings(spark, dir)
      .collect().map(_.toSeq).toSet == served,
      "tier fold changed the served postings")
    // the policy: count 3 > maxSegments 2 → tier fold (not a full fold)
    assert(Similarity.maybeCompactBm25Index(spark, dir, maxSegments = 2))
    val after2 = snapshot(dir)
    baseFiles.foreach { case (rel, sig) =>
      assert(after2.get(rel).contains(sig),
        s"the policy ran a full fold (touched $rel) where a tier fold " +
          "suffices")
    }
    assert(segsOf("postings").size == 2)
    assert(Bm25Views.servedPostings(spark, dir)
      .collect().map(_.toSeq).toSet == served)
    // below the bound: no fold
    assert(!Similarity.maybeCompactBm25Index(spark, dir, maxSegments = 2))
  }

  test("ANN tiered compaction: tier fold leaves base untouched, probe " +
    "identical, negative-sum segments fold associatively") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = tmp("ann-tier") + "/index"
    Similarity.buildAnnIndex(emb.where($"vec_id" < 300), dir)
    Similarity.updateAnnIndex(spark, dir,
      emb.where($"vec_id" >= 300 && $"vec_id" < 350))
    Similarity.removeFromAnnIndex(spark, dir,
      emb.where($"vec_id" % 9 === 1).select($"vec_id"))
    Similarity.updateAnnIndex(spark, dir,
      emb.where($"vec_id" >= 350 && $"vec_id" < 400))
    val probeBefore = Similarity.annQueryIndex(spark, dir, 10, 5)
      .collect().map(_.toSeq).toSet
    val baseFiles = snapshot(dir).filter(_._1.contains("/seg=base/"))
    // folds the delta tier: s-append + d-tombstone + s-append
    assert(Similarity.compactAnnIndexTier(spark, dir, k = 3))
    val after = snapshot(dir)
    baseFiles.foreach { case (rel, sig) =>
      assert(after.get(rel).contains(sig),
        s"ANN tier fold touched a base-segment file: $rel")
    }
    assert(Similarity.annQueryIndex(spark, dir, 10, 5)
      .collect().map(_.toSeq).toSet == probeBefore,
      "ANN tier fold changed the probe")
    // the folded tombstones still mask: deleted ids never surface
    val del = emb.where($"vec_id" % 9 === 1).select($"vec_id")
      .as[Long].collect().toSet
    val served = spark.read.parquet(s"$dir/deleted").drop("seg")
      .select($"vec_id").as[Long].collect().toSet
    assert(served.nonEmpty && served.subsetOf(del),
      "folded tombstone tier lost or corrupted the deleted ids")
  }

  test("takedown decrement read partition-prunes to the touched postings " +
    "buckets: a one-doc takedown reads a small fraction of the index") {
    val dir = tmp("pruned") + "/index"
    Similarity.buildBm25Index(docs, dir, maxDf = 1000)
    val indexBytes = fs.getContentSummary(new Path(dir)).getLength
    val bytesRead = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) bytesRead.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.removeFromBm25Index(spark, dir,
        spark.range(7, 8).select($"id".as("doc_id")))
      // listener bus is async — wait for quiescence
      var last = -1L
      var attempts = 0
      while (bytesRead.get() != last && attempts < 50) {
        last = bytesRead.get(); Thread.sleep(100); attempts += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(bytesRead.get() > 0, "no input read measured — listener broke")
    assert(bytesRead.get() < indexBytes / 2,
      s"one-doc takedown read ${bytesRead.get()} of $indexBytes index " +
        "bytes — the decrement read is not pruning to touched buckets")
    // and the decrements stay EXACT despite the pruned read
    val refDir = tmp("pruned-ref") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" =!= 7), refDir,
      maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, refDir)
  }

  test("ANN takedown negative-sums read partition-prunes to the touched " +
    "vectors/cells buckets: a one-vector takedown reads a small fraction " +
    "of the index, decrements stay exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = tmp("ann-pruned") + "/index"
    Similarity.buildAnnIndex(emb, dir)
    val indexBytes = fs.getContentSummary(new Path(dir)).getLength
    val bytesRead = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) bytesRead.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.removeFromAnnIndex(spark, dir,
        spark.range(7, 8).select($"id".as("vec_id")))
      var last = -1L
      var attempts = 0
      while (bytesRead.get() != last && attempts < 50) {
        last = bytesRead.get(); Thread.sleep(100); attempts += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(bytesRead.get() > 0, "no input read measured — listener broke")
    assert(bytesRead.get() < indexBytes / 2,
      s"one-vector takedown read ${bytesRead.get()} of $indexBytes index " +
        "bytes — the negative-sums read is not pruning to touched buckets")
    // exactness: probe equals the delete over a freshly-built twin
    val refDir = tmp("ann-pruned-ref") + "/index"
    Similarity.buildAnnIndex(emb, refDir)
    Similarity.removeFromAnnIndex(spark, refDir,
      spark.range(7, 8).select($"id".as("vec_id")))
    assert(Similarity.annQueryIndex(spark, dir, 10, 5)
      .collect().map(_.toSeq).toSet ==
      Similarity.annQueryIndex(spark, refDir, 10, 5)
        .collect().map(_.toSeq).toSet)
  }

  test("pooled takedown trigger: 3 request batches apply as ONE delete " +
    "(single tombstone segment), flush drains the tail, index equals the " +
    "one-shot delete") {
    val stage = tmp("pooled")
    val dir = s"$stage/index"
    Similarity.buildBm25Index(docs, dir, maxDf = 100)
    val gone = docs.where($"doc_id" % 7 === 5).select($"doc_id")
    gone.repartition(3).write.mode("overwrite").parquet(s"$stage/src")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
    streaming.Streams.streamingTakedown(spark,
      streaming.Streams.fileSource(spark, s"$stage/src", schema,
        maxFilesPerTrigger = 1),
      dir, s"$stage/ck", batchEvery = 3).awaitTermination()
    streaming.Streams.flushPendingTakedowns(spark, dir)
    val delSegs = fs.listStatus(new Path(s"$dir/deleted")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("seg="))
    assert(delSegs.size == 1,
      s"pooling must apply the 3 batches as ONE delete, got $delSegs")
    assert(!fs.exists(new Path(
      streaming.Streams.takedownPendingDir(dir))),
      "flush must clear the pending pool")
    val refDir = tmp("pooled-ref") + "/index"
    Similarity.buildBm25Index(docs, refDir, maxDf = 100)
    Similarity.removeFromBm25Index(spark, refDir, gone)
    Bm25Views.assertServedEqual(spark, dir, refDir)
  }

  test("ANN pooled takedown: 3 request batches apply as ONE delete " +
    "(single tombstone segment), flush drains, probe equals one-shot") {
    val emb = Tables.embeddings(spark, sfDir)
    val stage = tmp("ann-pooled")
    val dir = s"$stage/index"
    Similarity.buildAnnIndex(emb, dir)
    val gone = emb.where($"vec_id" % 7 === 3 && $"vec_id" >= 10)
      .select($"vec_id")
    gone.repartition(3).write.mode("overwrite").parquet(s"$stage/src")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("vec_id", org.apache.spark.sql.types.LongType)
    streaming.Streams.streamingAnnTakedown(spark,
      streaming.Streams.fileSource(spark, s"$stage/src", schema,
        maxFilesPerTrigger = 1),
      dir, s"$stage/ck", batchEvery = 3).awaitTermination()
    streaming.Streams.flushPendingAnnTakedowns(spark, dir)
    val delSegs = fs.listStatus(new Path(s"$dir/deleted")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("seg="))
    assert(delSegs.size == 1,
      s"ANN pooling must apply the 3 batches as ONE delete, got $delSegs")
    assert(!fs.exists(new Path(
      streaming.Streams.takedownPendingDir(dir))),
      "flush must clear the pending pool")
    val refDir = tmp("ann-pooled-ref") + "/index"
    Similarity.buildAnnIndex(emb, refDir)
    Similarity.removeFromAnnIndex(spark, refDir, gone)
    assert(Similarity.annQueryIndex(spark, dir, 10, 5)
      .collect().map(_.toSeq).toSet ==
      Similarity.annQueryIndex(spark, refDir, 10, 5)
        .collect().map(_.toSeq).toSet)
  }

  test("writer-writer lease: a second updater fails fast with the " +
    "holder's identity, the index stays serveable, and the lease releases " +
    "for the next writer") {
    val dir = tmp("lease") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 200), dir, maxDf = 100)
    val batch = docs.where($"doc_id" >= 200 && $"doc_id" < 250)
    AtomicSwap.withLease(spark, dir) {
      val e = intercept[AtomicSwap.LeaseHeldException] {
        Similarity.updateBm25Index(spark, dir, batch)
      }
      assert(e.getMessage.contains("pid="),
        "lease error must name the holder")
    }
    // loser wrote nothing; index serves and the lease is gone
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
    assert(Similarity.bm25QueryIndex(spark, dir, Seq(0L, 1L), 5).count() >= 0)
    // the winner's release lets the next update through
    Similarity.updateBm25Index(spark, dir, batch)
    val refDir = tmp("lease-ref") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 250), refDir, maxDf = 100)
    Bm25Views.assertServedEqual(spark, dir, refDir)
  }

  test("minhash members map: the takedown probes the slim (doc_id, " +
    "batch_id) sibling instead of the signature index, and keeps it " +
    "exact through partition-scoped rewrites") {
    val d = docs.where($"doc_id" < 300)
    val dir = tmp("members") + "/index"
    Dedup.minhashTable(d, 3, 16)
      .withColumn("batch_id", pmod($"doc_id", lit(3L)))
      .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    Dedup.buildMinhashMembers(spark, dir)
    val membersDir = Dedup.minhashMembersDir(dir)
    val sigBytes = fs.getContentSummary(new Path(dir)).getLength
    val memBytes = fs.getContentSummary(new Path(membersDir)).getLength
    assert(memBytes < sigBytes / 2,
      s"members map ($memBytes B) must be slim next to the signature " +
        s"index ($sigBytes B)")
    val gone = d.where($"doc_id" % 3 === 1 && $"doc_id" % 5 === 0)
      .select($"doc_id")
    // untouched partitions (batch 0/2) of BOTH tables keep their files
    val keepIdx = snapshot(dir).filter(p =>
      p._1.contains("batch_id=0") || p._1.contains("batch_id=2"))
    val keepMem = snapshot(membersDir).filter(p =>
      p._1.contains("batch_id=0") || p._1.contains("batch_id=2"))
    Dedup.removeFromMinhashIndexDir(spark, dir, gone)
    val idxAfter = snapshot(dir)
    keepIdx.foreach { case (rel, sig) =>
      assert(idxAfter.get(rel).contains(sig), s"index $rel rewritten")
    }
    val memAfter = snapshot(membersDir)
    keepMem.foreach { case (rel, sig) =>
      assert(memAfter.get(rel).contains(sig), s"members $rel rewritten")
    }
    // members stays the exact (doc_id, batch_id) projection of the index
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(spark.read.parquet(membersDir)
        .select($"doc_id", $"batch_id".cast("long"))) ==
      rows(spark.read.parquet(dir)
        .select($"doc_id", $"batch_id".cast("long")).distinct()),
      "members map diverged from the index after the takedown")
    // a takedown that empties a partition removes it from both tables
    Dedup.removeFromMinhashIndexDir(spark, dir,
      d.where($"doc_id" % 3 === 2).select($"doc_id"))
    assert(!fs.exists(new Path(dir, "batch_id=2")))
    assert(!fs.exists(new Path(membersDir, "batch_id=2")))
  }

  test("incremental pHash pairs count each band ONCE for new-new pairs: " +
    "minBandMatches=2 equals the batch run (the double-count would halve " +
    "the threshold exactly at the scale schedule's k=2)") {
    // hand-built band table: x/y share exactly ONE band (must be dropped
    // at k=2), x/z share three (must survive); Hamming well under 6
    val bands = Seq(
      (1L, 1L, 2L, 3L, 4L), // x
      (2L, 1L, 3L, 2L, 12L), // y: shares only b0 with x; Hamming 3
      (3L, 1L, 3L, 3L, 4L) // z: shares b0/b2/b3 with x; Hamming 1
    ).toDF("media_id", "b0", "b1", "b2", "b3")
    val empty = bands.where(lit(false))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val batch = Multimodal.phashPairs(bands, maxHamming = 6L,
      minBandMatches = 2)
    val incr = Multimodal.phashPairsIncremental(empty, bands,
      maxHamming = 6L, minBandMatches = 2)
    assert(rows(incr.select($"doc_a", $"doc_b")) ==
      rows(batch.select($"doc_a", $"doc_b")),
      "incremental k=2 diverged from batch — band double-count")
    // x/y share ONE band (dropped at k=2 — the double-count would have
    // kept it); x/z share three and y/z share two (both kept)
    assert(rows(batch.select($"doc_a", $"doc_b")) ==
      Set(Seq(1L, 3L), Seq(2L, 3L)),
      "fixture must drop the 1-band pair and keep the 2+-band pairs")
    // mixed old/new still exact: y existing, x/z new
    val incr2 = Multimodal.phashPairsIncremental(
      bands.where($"media_id" === 2L), bands.where($"media_id" =!= 2L),
      maxHamming = 6L, minBandMatches = 2)
    assert(rows(incr2.select($"doc_a", $"doc_b")) ==
      Set(Seq(1L, 3L), Seq(2L, 3L)))
  }
}
