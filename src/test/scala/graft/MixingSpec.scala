package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mixing

/** Corpus assembly operators: hash-stable splits, mixture downsampling,
  * and greedy contiguous sequence packing. */
class MixingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("importance reweighting ranks target-like docs above target-unlike docs") {
    def srcDF(src: String, rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit(src))
    val target = srcDF("tgt",
      1L -> "alpha beta gamma delta alpha beta gamma delta",
      2L -> "alpha beta gamma delta epsilon")
    val raw = srcDF("crawl",
      10L -> "alpha beta gamma delta",          // target-like bigrams
      11L -> "zonk quux blarg wibble nothing",  // disjoint bigrams
      12L -> "single")                          // < 2 tokens: unscored
    val got = Mixing.importanceWeights(raw, target, buckets = 4096,
        keepPerSource = 1)
      .orderBy(col("rank"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(10L, 11L)) // doc 12 has no bigrams
    val Seq(like, unlike) = got
    assert(like._4 > unlike._4, s"target-like must outscore: $got")
    assert(like._5 == 1L && like._6 == 1L)  // rank 1, selected
    assert(unlike._6 == 0L)                 // past keepPerSource
    // repartition-stable: hashed features, no RNG
    val again = Mixing.importanceWeights(raw.repartition(5), target,
        buckets = 4096, keepPerSource = 1)
      .orderBy(col("rank"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("packBoundaries: in-sequence intervals tile each doc and each sequence") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5"),        // 5 ws tokens
      (2L, "u1 u2 u3 u4"),           // 4 — spans seq 0→1 at budget 8
      (3L, "v1 v2 v3 v4 v5 v6"))     // 6
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
    val got = Mixing.packBoundaries(docs, tokenBudget = 8, metric = "ws")
      .orderBy("seq_no", "doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("src0", 0L, 1L, 0L, 5L),
      ("src0", 0L, 2L, 5L, 8L),  // first 3 tokens of doc 2 close seq 0
      ("src0", 1L, 2L, 0L, 1L),  // its 4th token opens seq 1
      ("src0", 1L, 3L, 1L, 7L)))
    // every doc's intervals sum to its token count; sequences tile [0, B)
    val perDoc = got.groupBy(_._3).view.mapValues(_.map(r => r._5 - r._4).sum)
    assert(perDoc.toMap == Map(1L -> 5L, 2L -> 4L, 3L -> 6L))
    got.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L) // each sequence starts at offset 0
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4) // contiguous, no gaps
        case _ =>
      }
    }
  }

  test("doremiWeights: harder domains gain weight, ppm mass conserved, stable") {
    def srcDF(src: String, rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit(src))
    // "rich": long stopword-dense docs (high quality → low deficit);
    // "junk": short stopword-free docs (low quality → high deficit)
    val rich = (1L to 4L).map(i =>
      i -> ("the and is in to of a for on with " * 25).trim)
    val junk = (11L to 14L).map(i => i -> "zonk quux blarg")
    val docs = srcDF("rich", rich: _*).unionByName(srcDF("junk", junk: _*))
    val got = Mixing.doremiWeights(docs, steps = 5)
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    val bySrc = got.map(r => r._1 -> r).toMap
    // excess signs: junk above corpus mean deficit, rich below
    assert(bySrc("junk")._3 > 0L && bySrc("rich")._3 < 0L)
    // MW direction: the hard domain gains vs its token-share reference
    assert(bySrc("junk")._4 > bySrc("junk")._2)
    assert(bySrc("rich")._4 < bySrc("rich")._2)
    // ppm mass conserved up to per-domain floor loss
    val mass = got.map(_._4).sum
    assert(mass <= 1000000L && mass >= 1000000L - got.length)
    // repartition-stable (hash-free arithmetic, one deterministic agg)
    val again = Mixing.doremiWeights(docs.repartition(7), steps = 5)
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(again == got)
    // degenerate single domain: the mixture is that domain, exactly
    val solo = Mixing.doremiWeights(srcDF("only", rich: _*), steps = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(solo.map(_._4) == Seq(1000000L))
  }

  test("split partitions the corpus completely and is repartition-stable") {
    val docs = Tables.documents(spark, sfDir)
    val split = Mixing.withSplit(docs)
    val bySplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == docs.count())
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L)) // 80/10/10-ish
    // stability: the same doc lands in the same split under any partitioning
    val a = split.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Mixing.withSplit(docs.repartition(7)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("chunkDocuments: sliding windows cover every token, tail short, no suffix chunk") {
    val docs = Seq(
      (1L, "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10"), // 10 toks
      (2L, "a b c"),                                    // <= chunk: one chunk
      (3L, ""))                                         // zero words: none
      .toDF("doc_id", "text")
    val got = Mixing.chunkDocuments(docs, chunkTokens = 8, strideTokens = 4)
      .orderBy("doc_id", "chunk_no")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 8L, "t01 t02 t03 t04 t05 t06 t07 t08"),
      (1L, 1L, 6L, "t05 t06 t07 t08 t09 t10"), // covers to the end, stops
      (2L, 0L, 3L, "a b c")))
  }

  test("chunkDocuments: stride == chunk gives non-overlapping chunks with ragged tail") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 toks
    val got = Mixing.chunkDocuments(docs, 3, 3).orderBy("chunk_no")
      .as[(Long, Long, Long, String)].collect()
    assert(got.map(c => (c._3, c._4)).toSeq ==
      Seq((3L, "a b c"), (3L, "d e f"), (1L, "g")))
  }

  test("sampleBySource keeps a deterministic per-source subset honoring quotas") {
    val docs = Tables.documents(spark, sfDir)
    val kept = Mixing.sampleBySource(docs, Map("src0" -> 100, "src1" -> 0), defaultPct = 50)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src0", 0L) == totals("src0")) // 100% quota keeps all
    assert(!bySrc.contains("src1"))                        // 0% quota drops all
    // deterministic: run twice, identical kept set
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Mixing.sampleBySource(docs, Map("src0" -> 100, "src1" -> 0), 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("shard assignment is complete, in-range, repartition-stable, and balanced") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val sharded = Mixing.withShard(docs, 16)
    val byShard = sharded.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    assert(byShard.values.sum == n)
    // the same doc lands in the same shard under any partitioning
    val a = sharded.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Mixing.withShard(docs.repartition(7), 16).select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // hash balance: every shard populated, none more than 2x the mean
    assert(byShard.size == 16)
    assert(byShard.values.max <= 2 * (n / 16).max(1L))
    // the summary aggregates the same assignment
    val sum16 = Mixing.shardSummary(docs, 16, metric = "ws")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sum16 == byShard)
  }

  test("lptShards: serpentine dealing, exact totals, tighter spread than hash") {
    // 6 docs of 6..1 words, 2 shards: serpentine deals 6→s0 5→s1 | 4→s1
    // 3→s0 | 2→s0 1→s1 ⇒ totals (11, 10); plain round-robin would be (12, 9)
    val tiny = docsDF((1L to 6L).map(i => i -> ("w " * (7 - i).toInt).trim): _*)
    val got = Mixing.lptShards(tiny, 2, metric = "ws")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0L -> ((3L, 11L)), 1L -> ((3L, 10L))))
    // on the real corpus: every doc dealt once, and the token spread is no
    // worse than hash sharding's (the entire point of the ordered dealer)
    val docs = Tables.documents(spark, sfDir)
    val lpt = Mixing.lptShards(docs, 16, metric = "ws")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val hash = Mixing.shardSummary(docs, 16, metric = "ws")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(lpt.map(_._1).sum == docs.count())
    assert(lpt.map(_._2).sum == hash.map(_._2).sum)
    val lptSpread = lpt.map(_._2).max - lpt.map(_._2).min
    val hashSpread = hash.map(_._2).max - hash.map(_._2).min
    assert(lptSpread <= hashSpread,
      s"serpentine spread $lptSpread must not exceed hash spread $hashSpread")
  }

  test("exact-k sample: precise count, repartition-stable, hash-uniform-ish") {
    val docs = Tables.documents(spark, sfDir)
    val a = Mixing.sampleExactK(docs, 25).select("doc_id").as[Long].collect().toSet
    assert(a.size == 25)
    val b = Mixing.sampleExactK(docs.repartition(7), 25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // nested property: the k smallest hashes contain the (k-1) smallest
    val smaller = Mixing.sampleExactK(docs, 24).select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(a))
    // k beyond the corpus returns everything
    assert(Mixing.sampleExactK(docs, 1000000).count() == docs.count())
  }

  test("capPerSource keeps exactly k per oversized source, all of small ones, stable") {
    val docs = Tables.documents(spark, sfDir)
    val k = 5
    val capped = Mixing.capPerSource(docs, k)
    // every source capped at k; sources with <= k docs keep everything
    val before = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (src, n) =>
      assert(after.getOrElse(src, 0L) == math.min(n, k.toLong),
        s"source $src: $n docs before, ${after.getOrElse(src, 0L)} after cap $k")
    }
    // survivors match the window formulation (hash ASC, id ASC rank <= k)
    val hk = graft.functions.TextFunctions.charPolyHash(
      concat(lit("cap:"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(hk.asc, col("doc_id").asc)
    val windowIds = docs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).select("doc_id").as[Long].collect().toSet
    val heapIds = capped.select("doc_id").as[Long].collect().toSet
    assert(heapIds == windowIds)
    // repartition-stable: same survivors under a different partitioning
    val again = Mixing.capPerSource(docs.repartition(7), k)
      .select("doc_id").as[Long].collect().toSet
    assert(again == heapIds)
  }

  test("lengthBucketedBatches bands by log2 length and bounds batch size and waste") {
    val docs = Tables.documents(spark, sfDir)
    val batches = Mixing.lengthBucketedBatches(docs, batchSize = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(batches.nonEmpty)
    batches.foreach { case (band, _, n, maxT, sumT, waste) =>
      assert(n >= 1 && n <= 8)
      // every doc in a band has the same bit length ⇒ max < 2·min ⇒ the
      // worst padding is under (n−1)·max/2
      assert(maxT < (1L << band) && maxT >= (1L << (band - 1)))
      assert(waste == n * maxT - sumT && waste < n * maxT / 2 + maxT)
    }
    // all docs with tokens are batched exactly once
    val total = batches.map(_._3).sum
    val expected = docs
      .where(Mixing.tokenMetric("bpe") > 0).count()
    assert(total == expected)
  }

  test("temperatureWeights upsample small sources and downsample big ones") {
    val docs = Tables.documents(spark, sfDir)
    val w = Mixing.temperatureWeights(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    // weights form a distribution (ppm, floor rounding leaves a remainder)
    val total = w.map(_._4).sum
    assert(total <= 1000000L && total > 1000000L - w.length)
    // sqrt flattening: the biggest source's weight share shrinks vs its
    // token share, the smallest source's grows
    val biggest = w.maxBy(_._2)
    val smallest = w.minBy(_._2)
    if (biggest._2 > smallest._2) {
      assert(biggest._5 <= 10000L, s"big source not downsampled: $biggest")
      assert(smallest._5 >= 10000L, s"small source not upsampled: $smallest")
    }
    // exact integer sqrt per source
    w.foreach { case (_, tokens, isqrt, _, _) =>
      assert(isqrt * isqrt <= tokens && (isqrt + 1) * (isqrt + 1) > tokens)
    }
  }

  test("epochPlan allocates the budget by sqrt weight; epochs read off repeats") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 100000L
    val plan = Mixing.epochPlan(docs, budget)
      .as[(String, Long, Long, Long, Long)].collect()
    // allocations never exceed the budget and integer-floor near it
    val allocated = plan.map(_._4).sum
    assert(allocated <= budget && allocated > budget - plan.length * 2)
    // epochs = allocation / available, floored at 1e4 scale
    plan.foreach { case (_, avail, _, alloc, epochs) =>
      assert(epochs == math.floor(10000.0 * alloc / math.max(avail, 1L)).toLong)
    }
    // the budget dwarfs this corpus: every source repeats (epochs > 1)
    assert(plan.forall(_._5 > 10000L))
  }

  test("interleaveSources deals one doc per source per round, hash-shuffled, stable") {
    val docs = Tables.documents(spark, sfDir)
    val ordered = Mixing.interleaveSources(docs)
      .orderBy("rr_rank", "source", "doc_id")
      .select("doc_id", "source", "rr_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(ordered.size == docs.count())
    val nSources = docs.select("source").distinct().count().toInt
    // while every source still has docs, each full round covers all sources
    val minPerSource = ordered.groupBy(_._2).map(_._2.map(_._3).max).min
    (1L to minPerSource).foreach { r =>
      val round = ordered.filter(_._3 == r).map(_._2)
      assert(round.size == nSources && round.toSet.size == nSources,
        s"round $r covers ${round.toSet.size}/$nSources sources")
    }
    // stable under repartitioning
    val again = Mixing.interleaveSources(docs.repartition(7))
      .select("doc_id", "rr_rank").as[(Long, Long)].collect().toMap
    assert(ordered.map(o => o._1 -> o._3).toMap == again)
  }

  test("hard negatives come from outside the cluster, by best surviving rank") {
    import spark.implicits._
    // docs 1,2,3 are a dup cluster sharing "alpha beta gamma"; doc 4 shares
    // "alpha beta" (confusable, NOT a dup); doc 5 is unrelated. For anchor
    // 1 (pairs 1-2, 1-3) the hard negative must be 4 — the top BM25 hit
    // outside cluster {1,2,3} — never 2 or 3.
    val docs = docsDF(
      1L -> "alpha beta gamma one",
      2L -> "alpha beta gamma two",
      3L -> "alpha beta gamma three",
      4L -> "alpha beta unrelated tail words here",
      5L -> "totally different content z")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Mixing.hardNegativeTriplets(docs, pairs, bmK = 10)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got.map(x => (x._1, x._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    got.foreach { case (a, p, n) =>
      assert(!Set(1L, 2L, 3L).contains(n), s"negative $n inside the cluster ($a,$p)")
    }
    assert(got.forall(_._3 == 4L), s"expected doc 4 as the hard negative: $got")
  }

  test("contrastiveTriplets: one negative per pair, never the pair itself, stable") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val pairs = Seq((1L, 2L), (3L, 4L), (10L, 20L)).toDF("doc_a", "doc_b")
    val t = Mixing.contrastiveTriplets(docs, pairs, numBuckets = 8)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // with 500 docs over 8 buckets no probe bucket can be empty
    assert(t.map(x => (x._1, x._2)) == Seq((1L, 2L), (3L, 4L), (10L, 20L)))
    t.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"negative $n collides with pair ($a, $p)")
    }
    // deterministic under repartitioning
    val again = Mixing.contrastiveTriplets(docs.repartition(7), pairs.repartition(3),
      numBuckets = 8).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(again == t)
    // the negative is the (hash, id)-minimal eligible doc of the probe bucket:
    // cross-check one pair against a brute-force recomputation
    val hk = graft.functions.TextFunctions.charPolyHash(
      concat(lit("neg:"), col("doc_id").cast("string")))
    val withH = docs.select(col("doc_id"), hk.as("h"), (hk % 8).as("bucket"))
      .as[(Long, Long, Long)].collect()
    val probeBucket = graft.functions.TextFunctions.charPolyHash(
      concat(lit("probe:"), lit(1L).cast("string"), lit(":"), lit(2L).cast("string")))
    val pb = spark.range(1).select((probeBucket % 8).as("b")).as[Long].head()
    val expectNeg = withH.filter(x => x._3 == pb && x._1 != 1L && x._1 != 2L)
      .minBy(x => (x._2, x._1))._1
    assert(t.find(x => x._1 == 1L && x._2 == 2L).get._3 == expectNeg)
  }

  test("token-budget sampling meters in tokens, stable across partitioning") {
    val docs = Tables.documents(spark, sfDir)
    val kept = Mixing.sampleByTokenBudget(docs, Map("src0" -> 2000L),
      defaultBudget = 1000L, metric = "ws")
    // per source: tokens BEFORE the last kept doc stay under the budget,
    // and the next doc in hash order would cross it (unless exhausted)
    val bySrc = kept.groupBy("source")
      .agg(max(col("cum_tokens") - col("tok_cnt")).as("max_before"),
        sum(col("tok_cnt")).as("kept_tokens"),
        count(lit(1)).as("n_kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, (maxBefore, keptTokens, nKept)) =>
      val budget = if (src == "src0") 2000L else 1000L
      assert(maxBefore < budget, s"$src overran: $maxBefore")
      // budgets are floors: unless the source ran out of docs, the kept
      // tokens reach the budget (the crossing doc is kept)
      if (nKept < totals(src)) assert(keptTokens >= budget, s"$src under")
    }
    // deterministic under repartition
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Mixing.sampleByTokenBudget(docs.repartition(7), Map("src0" -> 2000L),
      defaultBudget = 1000L, metric = "ws").select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // zero budget keeps nothing; unlimited keeps everything
    assert(Mixing.sampleByTokenBudget(docs, Map(), defaultBudget = 0L).count() == 0L)
    assert(Mixing.sampleByTokenBudget(docs, Map()).count() == docs.count())
  }

  test("packSequences matches a sequential greedy reference per source") {
    val budget = 50
    val docs = Seq(
      (1L, "a " * 10), (2L, "b " * 30), (3L, "c " * 30),  // 10+30 | 30
      (4L, "d " * 120),                                    // oversized: own seq
      (5L, "e " * 5)
    ).map { case (id, t) => (id, t.trim, "srcX") }.toDF("doc_id", "text", "source")
    val got = operators.Mixing.packSequences(docs, budget)
      .orderBy("seq_no").as[(String, Long, Long, Long)].collect().toSeq
    // reference loop: running prefix / budget
    // doc tokens: 10, 30, 30, 120, 5; prefixes before: 0, 10, 40, 70, 190
    // seq_no = prefix/50: 0, 0, 0, 1, 3
    assert(got == Seq(
      ("srcX", 0L, 3L, 70L),   // docs 1-3 (the 3rd starts at 40 < 50)
      ("srcX", 1L, 1L, 120L),  // oversized doc alone
      ("srcX", 3L, 1L, 5L)))   // next doc lands past the oversized span
  }

  test("packSequences bpe metric bills punctuation/subwords, ws does not") {
    // "it's state-of-the-art." = 2 ws tokens but 11 BPE-ish tokens
    // (it ' s state - of - the - art .  → letter runs + single symbols)
    val docs = Seq((1L, "it's state-of-the-art.", "s")).toDF("doc_id", "text", "source")
    val ws = Mixing.packSequences(docs, 512, metric = "ws")
      .select("seq_tokens").as[Long].head()
    val bpe = Mixing.packSequences(docs, 512, metric = "bpe")
      .select("seq_tokens").as[Long].head()
    assert(ws == 2L)
    assert(bpe == 11L)
    intercept[IllegalArgumentException] {
      Mixing.packSequences(docs, 512, metric = "chars")
    }
  }

  test("packSequencesSplit chunks the concatenated stream at exact budgets") {
    // token stream per source s: 10 + 30 + 120 + 5 = 165, budget 50 →
    // seqs of 50/50/50/15; doc 3 (120 toks at offset 40) spans seqs 0-3
    val docs = Seq(
      (1L, "a " * 10), (2L, "b " * 30), (3L, "d " * 120), (4L, "e " * 5),
      (5L, ""))                                     // zero-token doc vanishes
      .map { case (id, t) => (id, t.trim, "s") }.toDF("doc_id", "text", "source")
    val got = Mixing.packSequencesSplit(docs, 50)
      .orderBy("seq_no").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s", 0L, 3L, 50L),  // docs 1, 2 and the head of doc 3
      ("s", 1L, 1L, 50L),  // doc 3 alone
      ("s", 2L, 1L, 50L),  // doc 3 alone
      ("s", 3L, 2L, 15L))) // doc 3's tail (10) + doc 4 (5)
    // every seq but the last is exactly full; totals are preserved
    assert(got.dropRight(1).forall(_._4 == 50L))
    assert(got.map(_._4).sum == 165L)
  }

  test("packSequences packs independently per extra partition column") {
    val docs = Seq(
      (1L, "a " * 30, "s", "train"), (2L, "b " * 30, "s", "train"),
      (3L, "c " * 30, "s", "test"))
      .map { case (id, t, src, sp) => (id, t.trim, src, sp) }
      .toDF("doc_id", "text", "source", "split")
    val got = Mixing.packSequences(docs, 50, metric = "ws",
        partitionCols = Seq("source", "split"))
      .orderBy("split", "seq_no")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // test split packs alone from prefix 0; train docs share the greedy
    // prefix within their own group (doc 2 STARTS at 30 < 50, so it joins
    // seq 0 — same start-based rule as the per-source reference test)
    assert(got == Seq(
      ("s", "test", 0L, 1L, 30L),
      ("s", "train", 0L, 2L, 60L)))
  }

  test("unimaxPlan: waterfilling caps small sources, spreads the rest uniformly") {
    // ws tokens per source: a=2, b=10, c=16 → capacities ×2 = 4, 20, 32.
    // budget 30: i=1 share 30/3=10 ≥ 4 → a capped at 4; i=2 share
    // (30-4)/2=13 < 20 → level 13; b and c get 13 each. Σ = 4+13+13 = 30.
    def src(s: String, id: Long, text: String) =
      Seq((id, text)).toDF("doc_id", "text").withColumn("source", lit(s))
    val docs = src("a", 1L, "t1 t2")
      .unionByName(src("b", 2L, (1 to 10).map("b" + _).mkString(" ")))
      .unionByName(src("c", 3L, (1 to 16).map("c" + _).mkString(" ")))
    val got = Mixing.unimaxPlan(docs, budgetTokens = 30L, maxEpochs = 2,
        metric = "ws")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 4L, 4L, 20000L),     // capped: 2 full epochs
      ("b", 10L, 20L, 13L, 13000L),  // fill level 13 → 1.3 epochs
      ("c", 16L, 32L, 13L, 8125L)))  // same level, bigger source
    // budget beyond total capacity: everyone caps at maxEpochs
    val all = Mixing.unimaxPlan(docs, budgetTokens = 1000L, maxEpochs = 2,
        metric = "ws")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(all.forall(r => r._4 == r._3 && r._5 == 20000L))
  }

  test("curriculumOrder: quality-descending phases, contiguous ranks, stable") {
    val docs = Tables.documents(spark, sfDir)
    val got = Mixing.curriculumOrder(docs)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got.length == docs.count())
    assert(got.forall(r => r._4 >= 1 && r._4 <= 4))
    // within each source: phases are quality-descending (no doc in a later
    // phase outscores a doc in an earlier one), ranks contiguous per phase
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byPhase = rows.groupBy(_._4)
      byPhase.toSeq.sortBy(_._1).sliding(2).foreach {
        case Seq((_, hi), (_, lo)) =>
          assert(hi.map(_._3).min >= lo.map(_._3).max,
            "phase boundary must not invert quality")
        case _ => ()
      }
      byPhase.values.foreach { ph =>
        assert(ph.map(_._5).sorted == (1L to ph.length).toSeq)
      }
    }
    // repartition-stable: salted hash, no RNG
    val again = Mixing.curriculumOrder(docs.repartition(7))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) == got.sortBy(_._1))
  }

  test("lorenzDeciles: exact decile boundaries, monotone shares, top-decile = 1e6") {
    // one source, token counts 10/5/3/2 (desc) ⇒ cum 10,15,18,20 of 20
    val docs = docsDF(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "),
      2L -> (1 to 5).map(i => s"u$i").mkString(" "),
      3L -> "v1 v2 v3",
      4L -> "x1 x2")
    val got = Mixing.lorenzDeciles(docs, metric = "ws")
      .orderBy("decile")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 10)
    // decile d reads rank ceil(d·4/10): 1,1,2,2,2,3,3,4,4,4
    assert(got.map(_._3) == Seq(1L, 1L, 2L, 2L, 2L, 3L, 3L, 4L, 4L, 4L))
    assert(got.map(_._4) == Seq(10L, 10L, 15L, 15L, 15L, 18L, 18L, 20L, 20L, 20L))
    assert(got.head._6 == 500000L) // top quarter of docs holds half the tokens
    assert(got.last._6 == 1000000L)
    assert(got.map(_._6) == got.map(_._6).sorted) // Lorenz curve is monotone
  }

  test("batchPaddingReport: same useful tokens per policy, sorted beats naive") {
    // one source, token counts 1..32: sorted batching is the padding
    // optimum for a single source; naive (hash order) pays for the spread
    val docs = docsDF((1L to 32L).map(i => i -> ("w " * i.toInt).trim): _*)
    val got = Mixing.batchPaddingReport(docs, batchSize = 4, metric = "ws")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("bucketed", "naive", "sorted"))
    val useful = got.values.map(_._3).toSet
    assert(useful == Set((1L to 32L).sum)) // no policy loses a token
    got.values.foreach { case (_, nb, u, cost, ppm) =>
      assert(nb >= 8L && cost >= u)
      assert(ppm == math.floor(1000000.0 * (cost - u) / cost).toLong)
    }
    assert(got("sorted")._5 <= got("naive")._5)
  }

  test("shardSkew: one-row verdict with exact totals and the max/mean ratio") {
    val docs = docsDF((1L to 40L).map(i =>
      i -> (1 to 5).map(j => s"w${i}_$j").mkString(" ")): _*)
    val Seq((nSh, minD, maxD, minT, maxT, totT, skew)) =
      Mixing.shardSkew(docs, numShards = 4, metric = "ws")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(nSh == 4L && totT == 200L)
    assert(minD <= maxD && minT <= maxT && maxT <= totT)
    assert(skew == math.floor(1000000.0 * maxT * nSh / totT).toLong)
    assert(skew >= 1000000L) // max ≥ mean always
  }

  test("quotaAllocation: quotas sum exactly to the budget; largest " +
    "remainders get the extra units") {
    // ws tokens: a=3, b=3, c=4 (T=10); B=11 → floor quotas 3,3,4 (Σ=10),
    // remainders (11·t) mod 10 = 3,3,4 → the single extra unit goes to c
    val docs = Seq(
      (1L, "w1 w2 w3", "a"), (2L, "w1 w2 w3", "b"), (3L, "w1 w2 w3 w4", "c"))
      .toDF("doc_id", "text", "source")
    val r = Mixing.quotaAllocation(docs, 11L, metric = "ws").collect()
      .map(x => x.getString(0) -> x.getAs[Long]("quota_tokens")).toMap
    assert(r == Map("a" -> 3L, "b" -> 3L, "c" -> 5L))
    assert(r.values.sum == 11L)
    // tie-break: B=10, T=10 → exact thirds impossible; all remainders 0,
    // quotas are the exact proportional integers, no extras
    val r2 = Mixing.quotaAllocation(docs, 10L, metric = "ws").collect()
      .map(x => x.getString(0) -> x.getAs[Long]("quota_tokens")).toMap
    assert(r2 == Map("a" -> 3L, "b" -> 3L, "c" -> 4L))
    // remainder ties broken by source name: B=7, T=10 → floors 2,2,2
    // (Σ=6), remainders 1,1,8 → extra to c... craft a true tie instead:
    // sources a,b identical (rem equal) and one extra unit → 'a' wins
    val docs2 = Seq((1L, "w1 w2", "a"), (2L, "w1 w2", "b"))
      .toDF("doc_id", "text", "source")
    val r3 = Mixing.quotaAllocation(docs2, 3L, metric = "ws").collect()
      .map(x => x.getString(0) -> x.getAs[Long]("quota_tokens")).toMap
    assert(r3 == Map("a" -> 2L, "b" -> 1L))
  }

  test("softTokenBudget: duplicated source discounted to half, unique source full") {
    val docs = Seq(
      (1L, "a b c d", "srcA"), (2L, "a b c d", "srcA"),
      (3L, "x y z w", "srcB"))
      .toDF("doc_id", "text", "source")
    val r = Mixing.softTokenBudget(docs, n = 3).collect()
      .map(x => x.getString(0) -> x).toMap
    // srcA: both docs' shingles have df 2 → weight 5000; wc 4 each
    assert(r("srcA").getAs[Long]("n_docs") == 2L)
    assert(r("srcA").getAs[Long]("ws_tokens") == 8L)
    assert(r("srcA").getAs[Long]("eff_tokens_x10000") == 40000L)
    assert(r("srcA").getAs[Long]("eff_ratio_x10000") == 5000L)
    // srcB: unique → full weight
    assert(r("srcB").getAs[Long]("eff_tokens_x10000") == 40000L)
    assert(r("srcB").getAs[Long]("eff_ratio_x10000") == 10000L)
  }
}
