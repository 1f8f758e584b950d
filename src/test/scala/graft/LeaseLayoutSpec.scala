package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.sources.AtomicSwap

/** Round-14 hardening contracts: lease liveness (heartbeat staleness,
  * provably-dead reclaim, breakLease fencing), the parameterized index
  * bucket count (recorded in meta/, layout-invariant answers), canonical
  * id-type hashing for takedown probes, legacy (pre-bucket) artifact
  * serviceability with compaction as the migration path, and the minhash
  * members-map coverage check. */
class LeaseLayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-r14-$tag-").toString

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")

  private def plantLease(dir: String, holder: String, ageMs: Long): Path = {
    val lease = new Path(s"$dir/_writer_lease")
    val out = fs.create(lease, true)
    out.write(holder.getBytes("UTF-8")); out.close()
    if (ageMs > 0)
      fs.setTimes(lease, System.currentTimeMillis() - ageMs, -1)
    lease
  }

  // ---------------------------------------------------------------- lease

  test("lease: a PROVABLY-DEAD same-host holder is reclaimed immediately " +
    "and the reclaiming writer proceeds (running recover first)") {
    val dir = tmp("lease-dead") + "/index"
    val base = docs.where($"doc_id" < 100)
    Similarity.buildBm25Index(base, dir, maxDf = 1000)
    val host = java.net.InetAddress.getLocalHost.getHostName
    // pid far above any real pid space — ProcessHandle.of is empty → the
    // holder is provably dead, no staleness wait needed
    val lease = plantLease(dir, s"pid=999999999@$host", 0)
    val batch = docs.where($"doc_id" >= 100 && $"doc_id" < 150)
    Similarity.updateBm25Index(spark, dir, batch) // must reclaim, not throw
    assert(!fs.exists(lease), "reclaimed lease must be released after")
    val ref = tmp("lease-dead-ref") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 150), ref, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, ref)
  }

  test("lease: a cross-host holder is held while fresh, reclaimed once " +
    "its heartbeat is stale; breakLease applies the same rule") {
    val dir = tmp("lease-stale") + "/art"
    fs.mkdirs(new Path(dir))
    // cross-host: never provably live OR dead from here — age decides
    plantLease(dir, "pid=1@some-other-host", 0)
    intercept[AtomicSwap.LeaseHeldException] {
      AtomicSwap.withLease(spark, dir, staleMs = 3600000) { () }
    }
    assert(!AtomicSwap.breakLease(spark, dir, staleMs = 3600000),
      "breakLease must refuse a fresh cross-host lease")
    plantLease(dir, "pid=1@some-other-host", 7200000)
    var ran = false
    AtomicSwap.withLease(spark, dir, staleMs = 3600000) { ran = true }
    assert(ran, "stale cross-host lease must be reclaimed")
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
    plantLease(dir, "pid=1@some-other-host", 7200000)
    assert(AtomicSwap.breakLease(spark, dir, staleMs = 3600000))
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
  }

  test("lease: a LIVE holder is never broken — a contender fails held " +
    "even at staleMs=0, and breakLease refuses") {
    val dir = tmp("lease-live") + "/art"
    fs.mkdirs(new Path(dir))
    AtomicSwap.withLease(spark, dir) {
      // holder is THIS pid on THIS host: provably live
      intercept[AtomicSwap.LeaseHeldException] {
        AtomicSwap.withLease(spark, dir, staleMs = 0) { () }
      }
      assert(!AtomicSwap.breakLease(spark, dir, staleMs = 0),
        "breakLease must never break a provably-live holder")
    }
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
  }

  test("lease: heartbeat keeps a long-running holder fresh — its lease " +
    "age stays under the beat cadence while the body runs") {
    val dir = tmp("lease-beat") + "/art"
    fs.mkdirs(new Path(dir))
    AtomicSwap.withLease(spark, dir, staleMs = 90) { // beat every ~30ms
      Thread.sleep(400)
      val age = System.currentTimeMillis() -
        fs.getFileStatus(new Path(s"$dir/_writer_lease"))
          .getModificationTime
      assert(age < 400, s"heartbeat must have re-touched the lease (age $age ms)")
    }
  }

  // ----------------------------------------------------- bucket parameter

  test("bucket count is a build parameter recorded in meta/: served views " +
    "after takedown+update are identical across counts, and each layout " +
    "carries its own count") {
    val base = docs.where($"doc_id" < 400)
    val gone = docs.where($"doc_id" % 7 === 2 && $"doc_id" < 400)
      .select($"doc_id")
    val batch = docs.where($"doc_id" >= 400 && $"doc_id" < 450)
    val dirs = Seq(4, 16).map { b =>
      val d = tmp(s"buckets-$b") + "/index"
      Similarity.buildBm25Index(base, d, maxDf = 1000, buckets = b)
      assert(spark.read.parquet(s"$d/meta")
        .select($"n_buckets").head().getInt(0) == b)
      val pb = fs.listStatus(new Path(s"$d/postings/seg=base"))
        .count(_.getPath.getName.startsWith("pbucket="))
      assert(pb > 0 && pb <= b,
        s"postings base must carry <= $b pbucket dirs, got $pb")
      Similarity.removeFromBm25Index(spark, d, gone)
      Similarity.updateBm25Index(spark, d, batch)
      d
    }
    Bm25Views.assertServedEqual(spark, dirs(0), dirs(1))
    val ref = tmp("buckets-ref") + "/index"
    Similarity.buildBm25Index(
      base.join(gone, Seq("doc_id"), "left_anti").unionByName(batch),
      ref, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dirs(0), ref)
  }

  test("ANN bucket counts: probe answers equal across counts after a " +
    "takedown, and compaction at a NEW count re-buckets the layout " +
    "without moving any answer") {
    val emb = Tables.embeddings(spark, sfDir)
    val gone1 = emb.where($"vec_id" % 5 === 1).select($"vec_id")
    val gone2 = emb.where($"vec_id" % 5 === 2).select($"vec_id")
    val d8 = tmp("ann-b8") + "/index"
    val d32 = tmp("ann-b32") + "/index"
    Similarity.buildAnnIndex(emb, d8, buckets = 8)
    Similarity.buildAnnIndex(emb, d32, buckets = 32)
    Similarity.removeFromAnnIndex(spark, d8, gone1)
    Similarity.removeFromAnnIndex(spark, d32, gone1)
    def probe(d: String) = Similarity.annQueryIndex(spark, d, 10, 5)
      .collect().map(_.toSeq).toSet
    assert(probe(d8) == probe(d32))
    // resize: compact re-buckets 8 → 64 and records the new count
    Similarity.compactAnnIndex(spark, d8, buckets = 64)
    assert(spark.read.parquet(s"$d8/meta")
      .select($"n_buckets").head().getInt(0) == 64)
    assert(probe(d8) == probe(d32))
    // post-resize takedowns prune at the NEW recorded count — and match
    Similarity.removeFromAnnIndex(spark, d8, gone2)
    Similarity.removeFromAnnIndex(spark, d32, gone2)
    assert(probe(d8) == probe(d32))
  }

  test("takedown probe hashes caller ids at canonical width: IntegerType " +
    "removeIds against a LongType index prune to the RIGHT buckets — the " +
    "delete lands instead of silently no-opping") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = tmp("inttype") + "/index"
    val ref = tmp("inttype-ref") + "/index"
    Similarity.buildAnnIndex(emb, dir, buckets = 8)
    Similarity.buildAnnIndex(emb, ref, buckets = 8)
    val goneLong = emb.where($"vec_id" % 5 === 1).select($"vec_id")
    Similarity.removeFromAnnIndex(spark, dir,
      goneLong.select($"vec_id".cast("int").as("vec_id")))
    Similarity.removeFromAnnIndex(spark, ref, goneLong)
    assert(spark.read.parquet(s"$dir/deleted").count() > 0,
      "the int-typed takedown must actually tombstone rows")
    assert(Similarity.annQueryIndex(spark, dir, 10, 5)
      .collect().map(_.toSeq).toSet ==
      Similarity.annQueryIndex(spark, ref, 10, 5)
        .collect().map(_.toSeq).toSet)
  }

  // ------------------------------------------------------- legacy layout

  /** Devolve a component to the round-12 (pre-bucket) layout: flatten
    * seg=base (drop the pbucket level). */
  private def devolve(dir: String, c: String): Unit = {
    val flat = spark.read.parquet(s"$dir/$c/seg=base").drop("pbucket")
      .localCheckpoint()
    fs.delete(new Path(s"$dir/$c/seg=base"), true)
    flat.write.mode("overwrite").parquet(s"$dir/$c/seg=base")
  }

  test("pre-bucket legacy BM25 artifact: deltas write at the LEGACY depth " +
    "(no conflicting directory structures — every read keeps working), " +
    "tier folds match, the takedown full-read fallback is exact, and a " +
    "full compaction migrates the layout in one swap") {
    val base = docs.where($"doc_id" < 300)
    val dir = tmp("legacy") + "/index"
    Similarity.buildBm25Index(base, dir, maxDf = 1000, buckets = 4)
    devolve(dir, "postings")
    // meta of that era had no n_buckets
    val maxDfV = Bm25Views.maxDf(spark, dir)
    fs.delete(new Path(s"$dir/meta"), true)
    spark.range(1).select(lit(maxDfV).as("max_df"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    // first mutating entries on the legacy artifact — the round-13 code
    // bricked partition discovery here
    Similarity.updateBm25Index(spark, dir,
      docs.where($"doc_id" >= 300 && $"doc_id" < 350))
    Similarity.updateBm25Index(spark, dir,
      docs.where($"doc_id" >= 350 && $"doc_id" < 380))
    val ref = tmp("legacy-ref") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 380), ref, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, ref)
    // tier fold over legacy deltas keeps the flat depth
    assert(Similarity.compactBm25IndexTier(spark, dir, 2))
    Bm25Views.assertServedEqual(spark, dir, ref)
    assert(!fs.listStatus(new Path(s"$dir/postings")).exists(st =>
      st.isDirectory && fs.listStatus(st.getPath)
        .exists(_.getPath.getName.startsWith("pbucket="))),
      "legacy component must stay at uniform flat depth until compaction")
    // takedown: full-read fallback, still exact
    val gone = docs.where($"doc_id" % 9 === 4 && $"doc_id" < 380)
      .select($"doc_id")
    Similarity.removeFromBm25Index(spark, dir, gone)
    Similarity.removeFromBm25Index(spark, ref, gone)
    Bm25Views.assertServedEqual(spark, dir, ref)
    // full compaction migrates to the bucketed layout
    Similarity.compactBm25Index(spark, dir)
    assert(fs.listStatus(new Path(s"$dir/postings/seg=base"))
      .exists(_.getPath.getName.startsWith("pbucket=")),
      "full compaction must graduate the legacy layout")
    Bm25Views.assertServedEqual(spark, dir, ref)
    // post-migration deltas are sentinel-bucketed again
    Similarity.updateBm25Index(spark, dir,
      docs.where($"doc_id" >= 380 && $"doc_id" < 400))
    val ref2 = tmp("legacy-ref2") + "/index"
    Similarity.buildBm25Index(
      docs.where($"doc_id" < 400).join(gone, Seq("doc_id"), "left_anti"),
      ref2, maxDf = 1000)
    Bm25Views.assertServedEqual(spark, dir, ref2)
  }

  test("pre-bucket legacy ANN artifact: update + takedown + compaction " +
    "stay serviceable and migrate") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where($"vec_id" < 300)
    val batch = emb.where($"vec_id" >= 300 && $"vec_id" < 360)
    val dir = tmp("legacy-ann") + "/index"
    Similarity.buildAnnIndex(base, dir, buckets = 8)
    devolve(dir, "vectors")
    devolve(dir, "cells")
    fs.delete(new Path(s"$dir/meta"), true) // that era had no ANN meta
    Similarity.updateAnnIndex(spark, dir, batch)
    val gone = emb.where($"vec_id" % 6 === 3 && $"vec_id" < 360)
      .select($"vec_id")
    Similarity.removeFromAnnIndex(spark, dir, gone)
    // reference: the SAME op sequence on a non-devolved artifact (a
    // rebuild over the union would train a different PQ codebook — the
    // frozen-quantizer contract; only the layout is under test here)
    val ref = tmp("legacy-ann-ref") + "/index"
    Similarity.buildAnnIndex(base, ref, buckets = 8)
    Similarity.updateAnnIndex(spark, ref, batch)
    Similarity.removeFromAnnIndex(spark, ref, gone)
    def probe(d: String) = Similarity.annQueryIndex(spark, d, 10, 5)
      .collect().map(_.toSeq).toSet
    assert(probe(dir) == probe(ref))
    Similarity.compactAnnIndex(spark, dir)
    assert(fs.listStatus(new Path(s"$dir/vectors/seg=base"))
      .exists(_.getPath.getName.startsWith("pbucket=")))
    assert(probe(dir) == probe(ref))
  }

  // ----------------------------------------------------- members coverage

  test("minhash takedown: a PARTIAL members sibling is detected by the " +
    "coverage listing and bypassed — a pre-members doc is actually " +
    "removed — then the sibling self-heals to full coverage") {
    val d = docs.where($"doc_id" < 300)
    val dir = tmp("partial-members") + "/index"
    Dedup.minhashTable(d, 3, 16)
      .withColumn("batch_id", pmod($"doc_id", lit(3L)))
      .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    // a PARTIAL map: covers batch 2 only — the failure mode of per-batch
    // appends started atop a pre-members index
    spark.read.parquet(dir).where($"batch_id" === 2)
      .select($"doc_id", $"batch_id".cast("long").as("batch_id")).distinct()
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(Dedup.minhashMembersDir(dir))
    val victim = spark.read.parquet(dir).where($"batch_id" === 1)
      .select($"doc_id").head().getLong(0)
    Dedup.removeFromMinhashIndexDir(spark, dir, Seq(victim).toDF("doc_id"))
    assert(spark.read.parquet(dir).where($"doc_id" === victim).count() == 0,
      "a doc the partial members map does not cover must still be removed")
    def batches(p: String): Set[String] =
      fs.listStatus(new Path(p)).toSeq
        .filter(_.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName).toSet
    assert(batches(dir).subsetOf(batches(Dedup.minhashMembersDir(dir))),
      "after the fallback takedown the members sibling must self-heal " +
        "to cover every index batch")
  }

  test("streamingNearDup atop a PRE-MEMBERS index backfills the sibling " +
    "from the full index — a later takedown of a pre-members doc removes " +
    "its signatures (no silent right-to-be-forgotten gap)") {
    val stage = tmp("backfill")
    val indexDir = s"$stage/index"
    val pre = docs.where($"doc_id" < 150)
    // legacy index: signatures present, NO members sibling (batch 99
    // avoids colliding with the stream's micro-batch ids)
    Dedup.minhashTable(pre, 3, 16).withColumn("batch_id", lit(99L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(indexDir)
    docs.where($"doc_id" >= 150 && $"doc_id" < 200)
      .write.mode("overwrite").parquet(s"$stage/src")
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    graft.streaming.Streams.streamingNearDup(spark,
      graft.streaming.Streams.fileSource(spark, s"$stage/src", schema),
      indexDir, s"$stage/pairs", s"$stage/ck").awaitTermination()
    // the absorb found no members sibling → it must have backfilled one
    // covering the PRE-members batch too
    val members = spark.read
      .parquet(Dedup.minhashMembersDir(indexDir))
    assert(members.where($"batch_id" === 99).count() > 0,
      "backfill must cover the pre-members batch")
    val victim = spark.read.parquet(indexDir).where($"batch_id" === 99)
      .select($"doc_id").head().getLong(0)
    Dedup.removeFromMinhashIndexDir(spark, indexDir,
      Seq(victim).toDF("doc_id"))
    assert(spark.read.parquet(indexDir)
      .where($"doc_id" === victim).count() == 0,
      "the takedown must reach pre-members signatures")
  }
}
