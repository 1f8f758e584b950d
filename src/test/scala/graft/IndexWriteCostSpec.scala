package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The write-amplification contract of the segmented index lifecycle: an
  * incremental update APPENDS O(batch) bytes (no pre-existing index file
  * is touched), a takedown appends O(deleted) bytes, and only compaction
  * is allowed to be index-sized. This is the structural pin for the
  * round-11 finding that per-batch maintenance rewrote the whole index. */
class IndexWriteCostSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-wcost-$tag-").toString

  /** Recursive (relativePath, length, mtime) snapshot of the index tree. */
  private def snapshot(dir: String,
                       exclude: Set[String] = Set.empty)
      : Map[String, (Long, Long)] = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(root0)
    val out = Map.newBuilder[String, (Long, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(root.toString).stripPrefix("/")
      if (!exclude.exists(rel.startsWith))
        out += rel -> (st.getLen, st.getModificationTime)
    }
    out.result()
  }

  private def totalBytes(s: Map[String, (Long, Long)]): Long =
    s.values.map(_._1).sum

  test("BM25: an incremental update appends O(batch) segments and never " +
    "touches a pre-existing index file; a takedown appends O(deleted); " +
    "compaction folds back to a single base segment") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val dir = tmp("bm25") + "/index"
    Similarity.buildBm25Index(docs.where($"doc_id" % 4 =!= 0), dir,
      maxDf = 100)
    val pre = snapshot(dir)
    val indexBytes = totalBytes(pre)
    // UPDATE: a small batch (1/20 of the corpus)
    Similarity.updateBm25Index(spark, dir, docs.where($"doc_id" % 20 === 0))
    val postUpdate = snapshot(dir)
    pre.foreach { case (rel, sig) =>
      assert(postUpdate.get(rel).contains(sig),
        s"update rewrote or removed pre-existing file $rel")
    }
    val updateNew = postUpdate.filterNot { case (rel, _) => pre.contains(rel) }
    assert(updateNew.keys.forall(_.contains("/seg=s")),
      s"update wrote outside its segments: ${updateNew.keys}")
    // O(batch) content: every row the update wrote references a batch doc
    // (at toy sf, parquet per-file overhead hides byte ratios — row
    // provenance is the scale-true pin)
    val batchIds = docs.where($"doc_id" % 20 === 0)
      .select($"doc_id").as[Long].collect().toSet
    Seq("postings", "doclen").foreach { c =>
      val seg = spark.read.parquet(s"$dir/$c")
        .where($"seg" =!= "base")
      assert(seg.select($"doc_id").as[Long].collect().toSet.subsetOf(batchIds),
        s"$c segment carries non-batch rows — the append is not O(batch)")
      assert(seg.count() > 0)
    }
    // TAKEDOWN: a handful of ids
    Similarity.removeFromBm25Index(spark, dir,
      docs.where($"doc_id" % 50 === 1).select($"doc_id"))
    val postDelete = snapshot(dir)
    postUpdate.foreach { case (rel, sig) =>
      assert(postDelete.get(rel).contains(sig),
        s"delete rewrote or removed pre-existing file $rel")
    }
    val deleteNew = postDelete.filterNot { case (rel, _) =>
      postUpdate.contains(rel)
    }
    assert(deleteNew.keys.forall(_.contains("/seg=d")),
      s"delete wrote outside its tombstone segments: ${deleteNew.keys}")
    // O(deleted) content: the tombstone tier holds exactly the deleted ids
    val delIds = docs.where($"doc_id" % 50 === 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(spark.read.parquet(s"$dir/deleted")
      .select($"doc_id").as[Long].collect().toSet.subsetOf(delIds),
      "tombstones carry non-deleted ids — the delete is not O(deleted)")
    // COMPACTION is the one index-sized fold: afterwards a single base
    // segment per component, no tombstones, same query answers (the
    // sim_bm25_compact oracle pins answer equality at sf scale)
    val servedBefore = Bm25Views.servedPostings(spark, dir)
      .collect().map(_.toSeq).toSet
    Similarity.compactBm25Index(spark, dir)
    Seq("postings", "termdf", "doclen", "stats").foreach { c =>
      val segsNow = new java.io.File(s"$dir/$c").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(segsNow == Set("seg=base"), s"$c not folded: $segsNow")
    }
    assert(Bm25Views.servedPostings(spark, dir)
      .collect().map(_.toSeq).toSet == servedBefore,
      "compaction changed the served postings")
  }

  test("ANN: an incremental update appends O(batch) segments (only the " +
    "cell-bounded coarse_centroids rewrites); a takedown appends " +
    "O(deleted); compaction folds back to base") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = tmp("ann") + "/index"
    Similarity.buildAnnIndex(emb.where($"vec_id" % 4 =!= 0), dir)
    // coarse_centroids is the documented always-rewritten, CELL-bounded
    // exception — excluded from the untouched check, but its size must
    // stay trivial next to the index
    val pre = snapshot(dir, exclude = Set("coarse_centroids"))
    val indexBytes = totalBytes(pre)
    Similarity.updateAnnIndex(spark, dir,
      emb.where($"vec_id" % 20 === 0))
    val postUpdate = snapshot(dir, exclude = Set("coarse_centroids"))
    pre.foreach { case (rel, sig) =>
      assert(postUpdate.get(rel).contains(sig),
        s"update rewrote or removed pre-existing file $rel")
    }
    val updateNew = postUpdate.filterNot { case (rel, _) => pre.contains(rel) }
    assert(updateNew.keys.forall(_.contains("/seg=s")),
      s"update wrote outside its segments: ${updateNew.keys}")
    // O(batch) content: every appended row references a batch vector
    val batchIds = emb.where($"vec_id" % 20 === 0)
      .select($"vec_id").as[Long].collect().toSet
    Seq("vectors", "cells", "codes").foreach { c =>
      val seg = spark.read.parquet(s"$dir/$c").where($"seg" =!= "base")
      assert(seg.select($"vec_id").as[Long].collect().toSet.subsetOf(batchIds),
        s"$c segment carries non-batch rows — the append is not O(batch)")
      assert(seg.count() > 0)
    }
    // the always-rewritten centroids stay CELL-bounded (2^planes rows)
    assert(spark.read.parquet(s"$dir/coarse_centroids").count() <= 16L,
      "coarse_centroids must stay cell-bounded")
    // TAKEDOWN
    Similarity.removeFromAnnIndex(spark, dir,
      emb.where($"vec_id" % 50 === 1).select($"vec_id"))
    val postDelete = snapshot(dir, exclude = Set("coarse_centroids"))
    postUpdate.foreach { case (rel, sig) =>
      assert(postDelete.get(rel).contains(sig),
        s"delete rewrote or removed pre-existing file $rel")
    }
    val deleteNew = postDelete.filterNot { case (rel, _) =>
      postUpdate.contains(rel)
    }
    assert(deleteNew.keys.forall(_.contains("/seg=d")),
      s"delete wrote outside its tombstone segments: ${deleteNew.keys}")
    val delIds = emb.where($"vec_id" % 50 === 1)
      .select($"vec_id").as[Long].collect().toSet
    assert(spark.read.parquet(s"$dir/deleted")
      .select($"vec_id").as[Long].collect().toSet.subsetOf(delIds),
      "tombstones carry non-deleted ids — the delete is not O(deleted)")
    // COMPACTION folds; probe answers unchanged
    val before = Similarity.annQueryIndex(spark, dir, nQueries = 10, k = 5)
      .collect().map(_.toSeq).toSet
    Similarity.compactAnnIndex(spark, dir)
    Seq("vectors", "cells", "codes", "coarse_sums").foreach { c =>
      val segsNow = new java.io.File(s"$dir/$c").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(segsNow == Set("seg=base"), s"$c not folded: $segsNow")
    }
    assert(Similarity.annQueryIndex(spark, dir, nQueries = 10, k = 5)
      .collect().map(_.toSeq).toSet == before,
      "compaction changed the probe answers")
  }
}
