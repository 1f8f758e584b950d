package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LakeLayout
import graft.operators.TextAnalysis

/** Z-order layout operator + CCNet bucket operator units. */
class LayoutZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zorderKey2 interleaves bits exactly (a at odd positions, b at even)") {
    // a=0b101, b=0b011 → key bits (msb→lsb): a2 b2 a1 b1 a0 b0 =
    // 1 0 0 1 1 1 = 0b100111 = 39
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(LakeLayout.zorderKey2(col("a"), col("b"), 3).as("k"))
      .as[Long].head()
    assert(got == 39L)
    // exhaustive 4-bit cross-check against a reference interleave
    def ref(a: Int, b: Int): Long =
      (0 until 4).map(i => (((a >> i) & 1) << (2 * i + 1)) |
        (((b >> i) & 1) << (2 * i))).sum.toLong
    val all = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val keys = all.toDF("a", "b")
      .select(col("a"), col("b"),
        LakeLayout.zorderKey2(col("a"), col("b"), 4).as("k"))
      .as[(Long, Long, Long)].collect()
    keys.foreach { case (a, b, k) => assert(k == ref(a.toInt, b.toInt)) }
    // bijective on the 8-bit grid: 256 distinct keys covering [0, 256)
    assert(keys.map(_._3).toSet == (0L until 256L).toSet)
  }

  test("zorder skipping report: both boxes prune under zorder, only the " +
       "sort key under linear") {
    // uniform 16x16 grid, bits=4: zorder files = key>>4 (16 quadrant
    // files), linear files = a-bucket (16 stripe files)
    val grid = (for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong))
      .toDF("va", "vb")
    val rep = LakeLayout.zorderSkippingReport(grid, "va", "vb",
        bits = 4, zFileShift = 4, linFileShift = 0,
        boxLoBucket = 4, boxHiBucket = 7)
      .orderBy("layout", "box")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rep == Seq(
      // linear prunes the a-box to its 4 stripes but the b-box hits all 16
      ("linear", "a", 16L, 4L, 64L),
      ("linear", "b", 16L, 16L, 256L),
      // zorder prunes BOTH boxes to 4 quadrant files of 16 rows
      ("zorder", "a", 16L, 4L, 64L),
      ("zorder", "b", 16L, 4L, 64L)))
  }

  test("compactionApply: multi-file groups rewrite to one file each, rows " +
    "are identical across the swap, and a second apply is a no-op") {
    import graft.sources.LakeLayout
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(16).write.mode("overwrite").parquet(dir)
    val before = LakeLayout.parquetManifest(spark, dir)
    assert(before.length == 16, s"staging wrote ${before.length} files")
    val target = math.max(1L, before.map(_._3).sum / 4)
    val report = LakeLayout.compactionApply(spark, dir, target)
      .as[(String, Long, Long, Long, Long)].collect()
    val after = LakeLayout.parquetManifest(spark, dir)
    // every multi-file group became exactly one file; ~4 groups at /4
    val nGroups = report.length
    assert(nGroups < 16 && after.length == nGroups,
      s"expected $nGroups files after compaction, found ${after.length}")
    assert(report.filter(_._5 == 1L).forall(_._3 > 1L))
    // row identity across the swap
    val got = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val want = docs.as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, "compaction changed the data")
    // convergence: merged files re-encode smaller, so one pass need not be
    // a fixpoint — but file count strictly decreases until every group is
    // a single file; require the fixpoint within a couple of extra passes
    // and row identity once there
    var passes = 0
    var lastCompacted = 1L
    while (lastCompacted > 0L && passes < 4) {
      lastCompacted = LakeLayout.compactionApply(spark, dir, target)
        .agg(sum(col("compacted"))).as[Long].head()
      passes += 1
    }
    assert(lastCompacted == 0L, s"no fixpoint after $passes extra passes")
    val finalGot = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(finalGot == want, "repeated compaction changed the data")
    assert(LakeLayout.parquetManifest(spark, dir).nonEmpty)
  }

  test("ccnetBuckets: per-language tertiles are balanced and score-ordered") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.ccnetBuckets(docs)
      .as[(Long, String, Long, String)].collect()
    assert(got.length == docs.count())
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      val sizes = Seq("head", "middle", "tail").map(b =>
        byBucket.getOrElse(b, Array.empty[Long]).length)
      // ntile balance: sizes differ by at most 1
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // desc ordering: every head score >= every middle score >= tail
      // (ties may straddle the cut, hence >=)
      for (hi <- byBucket.get("head"); mid <- byBucket.get("middle"))
        assert(hi.min >= mid.max, s"$lang head/middle overlap")
      for (mid <- byBucket.get("middle"); lo <- byBucket.get("tail"))
        assert(mid.min >= lo.max, s"$lang middle/tail overlap")
    }
  }
}
