package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Shard-parallel index serving (round-14): N hash-sharded sub-indexes
  * per artifact, query fan-out + exact merge. The claims under test:
  * shard count changes NO score (BM25 statistics and ANN coarse sums are
  * associative integer merges; the PQ codebook is trained once and frozen
  * into every shard), maintenance routes to the owning shards only, and
  * untouched shards' files never move. */
class ShardedIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-shard-$tag-").toString

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")

  /** (relativePath, length, mtime) of every data file under dir. */
  private def snapshot(dir: String): Map[String, (Long, Long)] = {
    val root = fs.makeQualified(new Path(dir))
    val out = Map.newBuilder[String, (Long, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      out += st.getPath.toString.stripPrefix(root.toString)
        .stripPrefix("/") -> (st.getLen, st.getModificationTime)
    }
    out.result()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("sharded BM25 equals the single artifact through the full " +
    "lifecycle (build, update, takedown) — shard count changes no score") {
    val base = docs.where($"doc_id" < 400)
    val batch = docs.where($"doc_id" >= 400 && $"doc_id" < 460)
    val gone = docs.where($"doc_id" % 8 === 5 && $"doc_id" < 460)
      .select($"doc_id")
    val one = tmp("bm25-one") + "/index"
    val sh = tmp("bm25-sh") + "/index"
    Similarity.buildBm25Index(base, one, maxDf = 1000)
    Similarity.buildBm25IndexSharded(base, sh, shards = 3, maxDf = 1000)
    def q(unsharded: Boolean) =
      if (unsharded) Similarity.bm25QueryIndex(spark, one,
        Seq(0L, 1L, 2L, 3L, 4L), 5)
      else Similarity.bm25QueryIndexSharded(spark, sh,
        Seq(0L, 1L, 2L, 3L, 4L), 5)
    assert(rows(q(true)) == rows(q(false)), "post-build scores must match")
    Similarity.updateBm25Index(spark, one, batch)
    Similarity.updateBm25IndexSharded(spark, sh, batch)
    assert(rows(q(true)) == rows(q(false)), "post-update scores must match")
    Similarity.removeFromBm25Index(spark, one, gone)
    Similarity.removeFromBm25IndexSharded(spark, sh, gone)
    assert(rows(q(true)) == rows(q(false)), "post-takedown scores must match")
  }

  test("sharded BM25 maintenance touches ONLY the owning shards: a " +
    "one-doc takedown leaves every other shard's files byte-identical") {
    val sh = tmp("bm25-route") + "/index"
    Similarity.buildBm25IndexSharded(docs.where($"doc_id" < 400), sh,
      shards = 4, maxDf = 1000)
    val victim = 37L
    // which shard owns it — same canonical hash the router uses
    val owner = Seq(victim).toDF("doc_id")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"doc_id".cast("long"))
          .cast("long"),
        org.apache.spark.sql.functions.lit(4L)).cast("int"))
      .head().getInt(0)
    val others = (0 until 4).filter(_ != owner)
    val before = others.map(i => snapshot(f"$sh/shard=$i%03d"))
    Similarity.removeFromBm25IndexSharded(spark, sh,
      Seq(victim).toDF("doc_id"))
    val after = others.map(i => snapshot(f"$sh/shard=$i%03d"))
    assert(before == after,
      "untouched shards must keep their exact files — per-request cost " +
        "must be independent of total index size")
    // and the owner actually tombstoned it
    assert(spark.read.parquet(f"$sh/shard=$owner%03d/deleted")
      .where($"doc_id" === victim).count() == 1)
  }

  test("sharded ANN equals the single artifact through the full " +
    "lifecycle (one frozen codebook, mergeable coarse sums) — shard " +
    "count changes no probe answer") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where($"vec_id" < 300)
    val batch = emb.where($"vec_id" >= 300 && $"vec_id" < 360)
    val gone = emb.where($"vec_id" % 6 === 5 && $"vec_id" >= 10)
      .select($"vec_id")
    val one = tmp("ann-one") + "/index"
    val sh = tmp("ann-sh") + "/index"
    Similarity.buildAnnIndex(base, one)
    Similarity.buildAnnIndexSharded(base, sh, shards = 3)
    def q(unsharded: Boolean) =
      if (unsharded) Similarity.annQueryIndex(spark, one, 10, 5)
      else Similarity.annQueryIndexSharded(spark, sh, 10, 5)
    assert(rows(q(true)) == rows(q(false)), "post-build probes must match")
    Similarity.updateAnnIndex(spark, one, batch)
    Similarity.updateAnnIndexSharded(spark, sh, batch)
    assert(rows(q(true)) == rows(q(false)), "post-update probes must match")
    Similarity.removeFromAnnIndex(spark, one, gone)
    Similarity.removeFromAnnIndexSharded(spark, sh, gone)
    assert(rows(q(true)) == rows(q(false)), "post-takedown probes must match")
    // per-shard compaction (each shard folds alone) moves no answer
    (0 until 3).foreach(i => Similarity.compactAnnIndex(spark,
      f"$sh/shard=$i%03d"))
    assert(rows(q(true)) == rows(q(false)), "post-compaction probes must match")
  }

  test("streamed sharded maintenance drains to the one-shot sharded " +
    "update (per-shard exactly-once ledgers make replays no-ops) and " +
    "serves the unsharded full-corpus answer") {
    val base = docs.where($"doc_id" < 400)
    val batch = docs.where($"doc_id" >= 400 && $"doc_id" < 460)
    val stage = tmp("stream-sh")
    val sh = s"$stage/index"
    Similarity.buildBm25IndexSharded(base, sh, shards = 3, maxDf = 1000)
    batch.repartition(3).write.mode("overwrite").parquet(s"$stage/src")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    graft.streaming.Streams.streamingBm25UpdateSharded(spark,
      graft.streaming.Streams.fileSource(spark, s"$stage/src", schema,
        maxFilesPerTrigger = 1),
      sh, s"$stage/ck").awaitTermination()
    // drained index serves the unsharded full-corpus answer
    val one = tmp("stream-sh-ref") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" < 460), one, maxDf = 1000)
    assert(rows(Similarity.bm25QueryIndexSharded(spark, sh,
        Seq(0L, 1L, 2L, 3L, 4L), 5)) ==
      rows(Similarity.bm25QueryIndex(spark, one, Seq(0L, 1L, 2L, 3L, 4L), 5)))
    // a RE-DELIVERED micro-batch (same batch_id, same content — what
    // Structured Streaming replays after a failure) is a per-shard no-op
    // through the per-shard ledgers
    val extra = docs.where($"doc_id" >= 460 && $"doc_id" < 480)
    Similarity.updateBm25IndexShardedOnce(spark, sh, extra, 99L)
    val before = snapshot(sh)
    Similarity.updateBm25IndexShardedOnce(spark, sh, extra, 99L)
    assert(snapshot(sh) == before,
      "a replayed batch_id must absorb nothing on any shard")
  }

  test("a WEDGED shard does not block the fan-out: the other shards " +
    "complete their ledgered absorbs, the failure rethrows, and the " +
    "ledgered replay heals exactly the missing shard — the healed index " +
    "serves the unsharded same-op answer (round-15 parallel-shard " +
    "failure contract)") {
    val base = docs.where($"doc_id" < 400)
    val batch = docs.where($"doc_id" >= 400 && $"doc_id" < 460)
    val sh = tmp("bm25-wedge") + "/index"
    Similarity.buildBm25IndexSharded(base, sh, shards = 4, maxDf = 1000)
    // shards that own at least one batch doc — the router's own hash
    val owners = batch.select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"doc_id".cast("long"))
          .cast("long"),
        org.apache.spark.sql.functions.lit(4L)).cast("int").as("sh"))
      .distinct().collect().map(_.getInt(0)).toSet
    assume(owners.contains(0) && owners.size > 1,
      "test fixture must route batch docs to shard 0 and at least one other")
    // wedge shard 0: a provably-LIVE lease (this pid) is never reclaimed
    val host = java.net.InetAddress.getLocalHost.getHostName
    val lease = new Path(s"$sh/shard=000/_writer_lease")
    val out = fs.create(lease, true)
    out.write(s"pid=${ProcessHandle.current().pid()}@$host"
      .getBytes("UTF-8")); out.close()
    intercept[graft.sources.AtomicSwap.LeaseHeldException] {
      Similarity.updateBm25IndexShardedOnce(spark, sh, batch, 7L)
    }
    def ledgerHas(i: Int): Boolean = {
      val p = f"$sh/shard=$i%03d/applied"
      fs.exists(new Path(p)) &&
        spark.read.parquet(p).where($"batch_id" === 7L).count() > 0
    }
    assert(!ledgerHas(0), "the wedged shard must not have absorbed")
    assert((owners - 0).forall(ledgerHas),
      "every healthy owning shard must complete despite the wedged one")
    // heal: unwedge and REPLAY the same batch id — completed shards
    // no-op through their ledgers, only shard 0 absorbs
    fs.delete(lease, false)
    val healthyBefore =
      (owners - 0).map(i => i -> snapshot(f"$sh/shard=$i%03d")).toMap
    Similarity.updateBm25IndexShardedOnce(spark, sh, batch, 7L)
    assert(owners.forall(ledgerHas), "the replay must heal the wedged shard")
    healthyBefore.foreach { case (i, snap) =>
      assert(snapshot(f"$sh/shard=$i%03d") == snap,
        s"replay must not touch already-absorbed shard $i")
    }
    // the healed index serves the unsharded SAME-OP answer
    val one = tmp("bm25-wedge-ref") + "/index"
    Similarity.buildBm25Index(base, one, maxDf = 1000)
    Similarity.updateBm25IndexOnce(spark, one, batch, 7L)
    assert(rows(Similarity.bm25QueryIndexSharded(spark, sh,
        Seq(0L, 1L, 2L, 3L, 4L), 5)) ==
      rows(Similarity.bm25QueryIndex(spark, one, Seq(0L, 1L, 2L, 3L, 4L), 5)))
  }

  test("ANN twin of the wedged-shard contract: healthy shards absorb, the " +
    "replay heals only the wedged one, and the healed sharded probe " +
    "equals the unsharded same-op answer") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where($"vec_id" < 300)
    val batch = emb.where($"vec_id" >= 300 && $"vec_id" < 360)
    val sh = tmp("ann-wedge") + "/index"
    Similarity.buildAnnIndexSharded(base, sh, shards = 4)
    val owners = batch.select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"vec_id".cast("long"))
          .cast("long"),
        org.apache.spark.sql.functions.lit(4L)).cast("int").as("sh"))
      .distinct().collect().map(_.getInt(0)).toSet
    assume(owners.contains(0) && owners.size > 1,
      "test fixture must route batch vecs to shard 0 and at least one other")
    val host = java.net.InetAddress.getLocalHost.getHostName
    val lease = new Path(s"$sh/shard=000/_writer_lease")
    val out = fs.create(lease, true)
    out.write(s"pid=${ProcessHandle.current().pid()}@$host"
      .getBytes("UTF-8")); out.close()
    intercept[graft.sources.AtomicSwap.LeaseHeldException] {
      Similarity.updateAnnIndexShardedOnce(spark, sh, batch, 7L)
    }
    def ledgerHas(i: Int): Boolean = {
      val p = f"$sh/shard=$i%03d/applied"
      fs.exists(new Path(p)) &&
        spark.read.parquet(p).where($"batch_id" === 7L).count() > 0
    }
    assert(!ledgerHas(0) && (owners - 0).forall(ledgerHas))
    fs.delete(lease, false)
    Similarity.updateAnnIndexShardedOnce(spark, sh, batch, 7L)
    assert(owners.forall(ledgerHas))
    val one = tmp("ann-wedge-ref") + "/index"
    Similarity.buildAnnIndex(base, one)
    Similarity.updateAnnIndexOnce(spark, one, batch, 7L)
    assert(rows(Similarity.annQueryIndexSharded(spark, sh, 10, 5)) ==
      rows(Similarity.annQueryIndex(spark, one, 10, 5)))
  }
}
