package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Operator-level behavior tests on crafted micro-corpora (the oracle gate
  * covers the full driver tables; these pin down semantics and edge cases). */
class OperatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("tfidf neighbors rank the near-copy first and skip disjoint docs") {
    val a = "one two three four five six seven eight nine ten"
    val b = "one two three four five six seven eight nine eleven"
    val c = "totally different words with no shared trigrams at all"
    val got = Similarity.tfidfNeighbors(docsDF(1L -> a, 2L -> b, 3L -> c), k = 3)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, Long, Long)].collect()
    // only the overlapping pair produces rows, symmetric, rank 1 each way
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq((1L, 2L, 1L), (2L, 1L, 1L)))
    assert(got(0)._4 == got(1)._4) // cosine is symmetric
    assert(got(0)._4 > 500000L && got(0)._4 < 1000000L) // high but < 1
  }

  test("tfidf neighbors: identical docs score floor(1e6·nsq/sqrt(nsq)²), df cap prunes") {
    val t = "alpha beta gamma delta epsilon"
    val pair = Similarity.tfidfNeighbors(docsDF(1L -> t, 2L -> t), k = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(pair.length == 2)
    // expected value via the same IEEE ops the operator runs: 3 shingles,
    // df=2, nDocs=2 → idf = min(floor(100·2/2), 10000) = 100; w=100 each
    val nsq = 3.0 * 100 * 100
    val exp = math.floor(1000000.0 * nsq / (math.sqrt(nsq) * math.sqrt(nsq))).toLong
    assert(pair.forall(_._4 == exp))
    // every shared shingle has df 2 — a df cap of 1 leaves no candidates
    assert(Similarity.tfidfNeighbors(docsDF(1L -> t, 2L -> t), k = 1, maxDf = 1L)
      .isEmpty)
  }

  test("hashed neighbors: identical docs are mutual rank-1, disjoint docs still project") {
    val a = "one two three four five six seven eight nine ten"
    val c = "totally different words with no shared trigrams at all"
    val got = Similarity.hashedNeighbors(
        docsDF(1L -> a, 2L -> a, 3L -> c), nQueries = 10, k = 1)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long)].collect()
    // 1 and 2 hash to identical vectors: mutual rank-1; their cosine is the
    // same IEEE floor(1e6·nsq/sqrt(nsq)²) both ways. 3 shares no shingle
    // with them, but random projection can still land nonzero dots — only
    // assert the identical pair dominates.
    val m = got.map(r => (r._1, (r._2, r._4))).toMap
    assert(m(1L)._1 == 2L && m(2L)._1 == 1L)
    assert(m(1L)._2 == m(2L)._2 && m(1L)._2 > 999990L)
  }

  test("hashed neighbors: sign-cancelled dimensions drop without changing cosine") {
    // one doc, one shingle → exactly one nonzero entry of ±1; a query doc
    // identical to it must see cosine floor(1e6·1/sqrt(1)²) = 1000000
    val t = "alpha beta gamma"
    val got = Similarity.hashedNeighbors(docsDF(1L -> t, 2L -> t), 10, 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 2 && got.forall(_._4 == 1000000L))
  }

  test("dense-assembled hashed vectors feed bruteForceTopK with identical rankings") {
    val docs = docsDF(
      1L -> "one two three four five six seven eight nine ten",
      2L -> "one two three four five six seven eight nine eleven",
      3L -> "totally different words with no shared trigrams at all",
      4L -> "yet another clump of fully distinct vocabulary right here")
    val sparse = Similarity.hashedNeighbors(docs, nQueries = 10, k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    val dense = Similarity.bruteForceTopK(
        Similarity.hashedDocVectors(docs), nQueries = 10, k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(sparse.keySet == dense.keySet)
    sparse.foreach { case (key, (nbr, cos)) =>
      assert(dense(key)._1 == nbr) // same neighbor at every (query, rank)
      // integer-exact path vs normalize-then-fold: ±2 fixed-point ulps
      assert(math.abs(dense(key)._2 - cos) <= 2L)
    }
  }

  test("bigram LM: model probabilities and per-doc scores, short docs sentinel") {
    val docs = docsDF(1L -> "a b", 2L -> "a c", 3L -> "x")
    val model = TextAnalysis.bigramModel(docs)
    val m = model.orderBy("x", "y")
      .as[(String, String, Long, Long, Long)].collect()
    // ctx(a)=2 → P(b|a)=P(c|a)=0.5
    assert(m.toSeq == Seq(("a", "b", 1L, 2L, 500000L), ("a", "c", 1L, 2L, 500000L)))
    val s = TextAnalysis.lmScore(docs, model).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(s.toSeq == Seq(
      (1L, 1L, 500000L, 500000L),
      (2L, 1L, 500000L, 500000L),
      (3L, 0L, -1L, -1L))) // no bigrams → sentinels
  }

  test("bigram LM: bigrams unseen by a held-out model score the zero floor") {
    val model = TextAnalysis.bigramModel(docsDF(1L -> "p q"))
    val s = TextAnalysis.lmScore(docsDF(9L -> "a b a b"), model)
      .as[(Long, Long, Long, Long)].collect()
    // 3 bigram occurrences ("a b" ×2, "b a"), all unseen → mean 0, min 0
    assert(s.toSeq == Seq((9L, 3L, 0L, 0L)))
  }

  test("PMI collocations: hand-computed ratios, tie-break, min-count floor") {
    val docs = docsDF(1L -> "b c b c b c", 2L -> "a a a a")
    // bigrams: (b,c)×3, (c,b)×2, (a,a)×3 → N=8; cx: a=3,b=3,c=2; cy: a=3,b=2,c=3
    val got = TextAnalysis.pmiCollocations(docs, minCount = 1L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("c", "b", 2L, 2L, 2L, 40000L),   // 1e4·2·8/(2·2)
      ("a", "a", 3L, 3L, 3L, 26666L),   // 1e4·3·8/(3·3); ties break on x
      ("b", "c", 3L, 3L, 3L, 26666L)))
    // min-count floor drops the cnt=2 pair
    val floored = TextAnalysis.pmiCollocations(docs, minCount = 3L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(floored.map(r => (r._1, r._2)).toSeq == Seq(("a", "a"), ("b", "c")))
  }

  test("gateAblation agrees with qualityFilter attribution; sole blocker isolated") {
    val docs = docsDF(
      1L -> "hi",                                    // too_short (+ low_stopwords)
      2L -> ("the of and to a in is " * 10).trim,    // repetitive ONLY (70 words)
      3L -> ("the quick brown fox jumps over a lazy dog near the riverbank " * 5).trim)
    val ab = TextAnalysis.gateAblation(docs).orderBy("rule")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(ab.map(_._1) == Seq("low_stopwords", "repetitive", "too_long",
      "too_short", "words_too_long", "words_too_short"))
    val byRule = ab.map(r => r._1 -> r).toMap
    // cross-check first-match attribution against qualityFilter itself
    val reasons = TextAnalysis.qualityFilter(docs)
      .where(col("reason") =!= "").groupBy("reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ab.foreach { case (rule, viol, sole, first) =>
      assert(first == reasons.getOrElse(rule, 0L), s"attribution for $rule")
      assert(sole <= viol && first <= viol)
    }
    // doc 2 is long and stopword-dense but maximally repetitive: the
    // repetitive rule alone blocks it
    assert(byRule("repetitive")._3 >= 1L)
    // doc 1 violates two rules at once: sole-blocker must not count it
    assert(byRule("too_short")._2 == 1L && byRule("too_short")._3 == 0L)
  }

  test("blocklistScrub: keep/flag/drop verdicts and the sorted audit trail") {
    val docs = docsDF(
      1L -> "good text only",
      2L -> "bad good bad",
      3L -> "bad evil bad evil bad")
    val got = TextAnalysis.blocklistScrub(docs, Seq("evil", "bad"), flagMax = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, String, String)].collect()
    assert(got.toSeq == Seq(
      (1L, "src0", 0L, "", "keep"),
      (2L, "src0", 2L, "bad", "flag"),
      (3L, "src0", 5L, "bad,evil", "drop")))
  }

  test("CMS estimates upper-bound exact counts and are partitioning-independent") {
    val docs = docsDF(
      1L -> "apple apple apple banana cherry",
      2L -> "apple banana banana date elder fig grape")
    val got = TextAnalysis.cmsTermCounts(docs, k = 7, d = 4, w = 512)
      .as[(String, Long, Long)].collect()
    assert(got.length == 7)
    got.foreach { case (_, exact, est) => assert(est >= exact) }
    // 7 terms into 512 buckets × 4 rows: no full-row collision → exact
    assert(got.forall { case (_, exact, est) => est == exact })
    val re = TextAnalysis.cmsTermCounts(
      docs.repartition(7), k = 7, d = 4, w = 512)
      .as[(String, Long, Long)].collect()
    assert(re.toSeq == got.toSeq) // sum-merged counters: layout-independent
  }

  test("CMS collisions only overcount (never undercount) at a tiny width") {
    val docs = docsDF(1L -> "a b c d e f g h i j a a")
    val got = TextAnalysis.cmsTermCounts(docs, k = 10, d = 2, w = 4)
      .as[(String, Long, Long)].collect()
    // 10 terms in 4 buckets: collisions guaranteed; bound must still hold
    got.foreach { case (_, exact, est) => assert(est >= exact) }
    assert(got.exists { case (_, exact, est) => est > exact })
  }

  test("codegen'd BPE segment count equals the composed fold form, hand-checked") {
    val docs = docsDF(1L -> "aaa abab banana", 2L -> "a", 3L -> "abcabc abc")
    // chained merges: 'ab' from merge 2 must be eligible for merge 3
    val merges = Seq(("a", "a"), ("a", "b"), ("ab", "c"))
    val fold = TextAnalysis.bpeSegmentCounts(docs, merges).orderBy("doc_id")
      .as[(Long, Long)].collect()
    val fast = TextAnalysis.bpeSegmentCountsFast(docs, merges).orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(fold.toSeq == fast.toSeq)
    // aaa → [aa, a] = 2; abab → [ab, ab] = 2; banana stays 6 → 10
    // abcabc → [ab, c, ab, c] → [abc, abc] = 2; abc → 1
    assert(fast.toSeq == Seq((1L, 10L), (2L, 1L), (3L, 3L)))
  }

  test("corpusDiff labels added/removed/changed/unchanged; formatting churn is unchanged") {
    val old = docsDF(1L -> "same text", 2L -> "will change", 3L -> "will vanish")
    val nw = docsDF(1L -> "  same   text ", 2L -> "has changed", 4L -> "brand new")
    val got = Versioning.corpusDiff(old, nw).orderBy("doc_id")
      .select("doc_id", "status").as[(Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, "unchanged"), // whitespace-only difference hashes identically
      (2L, "changed"), (3L, "removed"), (4L, "added")))
    val summary = Versioning.diffSummary(old, nw)
      .as[(String, Long)].collect().toMap
    assert(summary == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("applyChanges: upserts replace, inserts add, deletes drop; diff recovers the changeset") {
    val base = docsDF(1L -> "one", 2L -> "two", 3L -> "three")
    val changes = docsDF(2L -> "two prime", 4L -> "four", 3L -> "three")
      .withColumn("op",
        when(col("doc_id") === 3L, "delete").otherwise("upsert"))
    val applied = Versioning.applyChanges(base, changes)
    val got = applied.select("doc_id", "text").as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, "one"), (2L, "two prime"), (4L, "four")))
    // the round-trip: diffing base against the applied corpus yields
    // exactly the changeset's effect
    val diff = Versioning.corpusDiff(base, applied)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(diff == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("termDrift ranks rate movers, not raw-count movers") {
    // old: 'a' 2/4, 'b' 1/4, 'c' 1/4. new: 'a' 2/4 (rate flat even though
    // the corpus re-shuffled), 'b' 0, 'd' 2/4 new arrival.
    val old = docsDF(1L -> "a a b c")
    val nw = docsDF(1L -> "a a d d", 2L -> "c")
    val got = Versioning.termDrift(old, nw, 10)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byTerm = got.map(r => r._1 -> r).toMap
    assert(byTerm("a")._6 == 400000L - 500000L) // 2/5 vs 2/4
    assert(byTerm("b")._6 == -250000L)          // vanished
    assert(byTerm("d")._6 == 400000L)           // arrived: biggest mover
    assert(got.head._1 == "d")                  // ranked by |drift|
  }

  test("dedup_exact groups whitespace-variant copies under the min id") {
    val docs = docsDF(
      1L -> "alpha beta gamma", 2L -> "  alpha   beta\tgamma ",
      3L -> "other text here", 4L -> "alpha beta gamma")
    val got = Dedup.exactDuplicates(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 3L, 1L), (4L, 1L, 3L)))
  }

  test("crossSourceDupMatrix counts copy-to-canonical source cells") {
    val docs = Seq(
      (1L, "shared text", "wiki"),
      (2L, "shared  text ", "crawl"), // whitespace-variant copy of 1
      (3L, "other text", "crawl"),
      (4L, "other text", "crawl"),    // same-source copy of 3
      (5L, "unique here", "wiki"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(docs)
      .orderBy("dup_source", "canonical_source")
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("crawl", "crawl", 1L), ("crawl", "wiki", 1L)))
  }

  test("ngram jaccard finds the overlapping pair and respects the threshold") {
    val a = "one two three four five six seven eight nine ten"
    val b = "one two three four five six seven eight nine eleven" // 7/11 shared 3-grams
    val c = "totally different words with no shared trigrams at all"
    val got = Dedup.ngramJaccardPairs(docsDF(1L -> a, 2L -> b, 3L -> c), 3, 5000L)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (da, db, j) = got.head
    assert((da, db) == (1L, 2L))
    assert(j == math.floor(10000.0 * 7 / (8 + 8 - 7) + 0.5).toLong)
  }

  test("line dedup keeps first occurrence, drops later copies, reassembles in order") {
    // lines are 3-token chunks here. doc 1 owns both its lines; doc 2 repeats
    // doc 1's first line (dropped) then adds its own; doc 3 is an exact copy
    // of doc 1 (fully deduplicated but still present with n_kept = 0); doc 4
    // repeats a line WITHIN itself (second occurrence dropped too).
    val docs = docsDF(
      1L -> "a b c d e f",
      2L -> "a b c x y z",
      3L -> "a b c d e f",
      4L -> "p q r p q r")
    val got = Dedup.lineDedup(docs, wordsPerLine = 3).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, ""),
      (4L, 2L, 1L, "p q r")))
  }

  test("line dedup ragged tail: last short chunk is its own line") {
    val docs = docsDF(1L -> "a b c d", 2L -> "z z z d")
    val got = Dedup.lineDedup(docs, wordsPerLine = 3).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    // doc 1 = ["a b c", "d"]; doc 2 = ["z z z", "d"] — the shared tail "d"
    // survives only in doc 1.
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "z z z")))
  }

  test("minhash estimates ~1 for identical docs and finds no false pair vs disjoint") {
    val a = "one two three four five six seven eight nine ten"
    val c = "totally different words with no shared trigrams at all"
    val got = Dedup.minhashPairs(docsDF(1L -> a, 2L -> a, 3L -> c))
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 100L)))
  }

  test("incremental minhash equals the batch pairs restricted to new-member pairs") {
    val docs = Tables.documents(spark, sfDir)
    val split = 250L
    val fullRestricted = Dedup.minhashPairs(docs)
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a >= split || b >= split }.toSet
    val incr = Dedup.minhashPairsIncremental(
        Dedup.minhashTable(docs.where(col("doc_id") < split), 3, 16),
        docs.where(col("doc_id") >= split))
      .as[(Long, Long, Long)].collect().toSet
    assert(incr == fullRestricted && incr.nonEmpty)
  }

  test("32-bit simhash TABLE: identical docs get identical fingerprints " +
    "(the pair path is 60-bit only — the 8-bit-banded 32-bit form was " +
    "removed as quadratic-prone)") {
    val a = "one two three four five six seven eight nine ten"
    val t = Dedup.simhashTable(docsDF(1L -> a, 2L -> a))
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(t.length == 2 && t(0) == t(1) && t(0) > 0)
  }

  test("simhash60: identical docs pair at hamming 0; one-token edit stays " +
    "within the banded recall; fingerprints use the high bits") {
    val a = "one two three four five six seven eight nine ten"
    val got = Dedup.simhashPairs60(docsDF(1L -> a, 2L -> a), maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0L)))
    // the 60-bit fingerprint actually spreads past bit 31 (the point of
    // the widening): some doc's simhash must exceed 2^32
    val sims = Dedup.simhashTable60(Tables.documents(spark, sfDir).limit(50))
      .select(max(col("simhash"))).head().getLong(0)
    assert(sims > (1L << 32), s"60-bit simhash never used high bits: $sims")
    // banding recall sanity: a pair within hamming<=3 of each other (one
    // rare token swapped in a long doc) is found by the 15-bit bands iff
    // its true hamming <= 3 — verify against the exact distance
    val b = a + " eleven twelve thirteen fourteen fifteen"
    val c = a + " eleven twelve thirteen fourteen sixteen"
    val pairs = Dedup.simhashPairs60(docsDF(1L -> b, 2L -> c), maxHamming = 60)
      .as[(Long, Long, Long)].collect()
    val exact = {
      val t = Dedup.simhashTable60(docsDF(1L -> b, 2L -> c))
        .orderBy("doc_id").select("simhash").as[Long].collect()
      java.lang.Long.bitCount(t(0) ^ t(1)).toLong
    }
    if (exact <= 3) assert(pairs.map(_._3).toSeq == Seq(exact))
    else assert(pairs.isEmpty || pairs.head._3 == exact)
  }

  test("embedding near-dup flags an identical vector pair at cos=1") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), 0),
      (2L, Array(2.0f, 4.0f, 6.0f), 0),  // same direction => cos 1
      (3L, Array(-3.0f, 1.0f, 0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingNearDupPairs(emb, 950000L).as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1000000L)))
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = Similarity.bruteForceTopK(emb, 3, 5)
    val rows = got.orderBy("query_id", "rank").collect()
    assert(rows.length == 15)
    // per query: ranks 1..5, cosines non-increasing
    rows.grouped(5).foreach { g =>
      assert(g.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val cs = g.map(_.getLong(3)).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("lsh candidates are a subset ranked identically to brute force where they overlap") {
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val ls = Similarity.lshTopK(emb, 5, 5).collect()
    // every LSH cosine must equal the exact cosine for the same pair
    ls.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(bf.contains(k) && bf(k) == r.getLong(3))
    }
  }

  test("batch layout numbers files sequentially into fixed-size batches") {
    val docs = (0L until 25L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val got = ArticleOps.batchLayout(docs, "doc_id", 10)
      .select("doc_id", "file_index", "batch_id", "file_name")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(2)).toSeq == (0 until 25).map(_ / 10).map(_.toLong))
    assert(got.head.getString(3) == "batch_000/article_000000.json")
    assert(got.last.getString(3) == "batch_002/article_000024.json")
  }

  test("fitInside never upscales, preserves aspect by integer floor, resize re-encodes") {
    import graft.Schemas.MediaRecord
    // no upscaling: already inside the box → unchanged
    assert(Multimodal.fitInside(100, 50, 128, 128) == ((100, 50)))
    // height binds (w <= h at square bounds): out_h hits the bound
    assert(Multimodal.fitInside(200, 400, 128, 128) == ((64, 128)))
    // width binds: out_w hits the bound
    assert(Multimodal.fitInside(400, 200, 128, 128) == ((128, 64)))
    // extreme ratio floors to >= 1, never 0 (16/415 at 128 box)
    val (ew, eh) = Multimodal.fitInside(16, 415, 128, 128)
    assert(ew >= 1 && eh == 128)
    // the re-encoded container really carries the target dims (round trip)
    val body = "pixels".getBytes("UTF-8")
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", Multimodal.pngPayload(515, 100, body), "image/png", 0L),
      MediaRecord(2L, "image", Multimodal.jpegPayload(90, 300, body), "image/jpeg", 0L),
      MediaRecord(3L, "audio", Multimodal.wavPayload(body), "audio/wav", 0L)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = Multimodal.resizeImages(spark, media, 128, 128)
      .orderBy("media_id")
      .as[(Long, Int, Int, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 515, 100, 128, 24, 1L, 1L),   // width binds: 100*128/515 = 24
      (2L, 90, 300, 38, 128, 1L, 1L)))   // height binds: 90*128/300 = 38
    // audio dropped; parsed = 1 proves the rewritten header parses back
  }

  test("sampleFrames emits k integer ticks per video from the real container duration") {
    import graft.Schemas.MediaRecord
    val body = "frames".getBytes("UTF-8")
    val media = spark.createDataset(Seq(
      MediaRecord(5L, "video", Multimodal.mp4Payload(1000L, body), "video/mp4", 0L),
      MediaRecord(6L, "image", Multimodal.pngPayload(8, 8, body), "image/png", 0L)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = Multimodal.sampleFrames(spark, media, k = 4)
      .orderBy("media_id", "frame_idx")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 0L, 0L), (5L, 1L, 250L), (5L, 2L, 500L), (5L, 3L, 750L)))
  }

  test("multimodal decode parses real PNG/JPEG/WAV/MP4 containers, flags corruption") {
    val body = "hello media payload".getBytes("UTF-8")
    // fixture round-trips: build real format bytes, parse the dims back
    assert(Multimodal.parsePngDims(Multimodal.pngPayload(640, 480, body))
      .contains((640, 480)))
    assert(Multimodal.parseJpegDims(Multimodal.jpegPayload(515, 415, body))
      .contains((515, 415)))
    assert(Multimodal.parseWavFrames(Multimodal.wavPayload(body))
      .contains(body.length.toLong / 2))
    assert(Multimodal.parseMp4Duration(Multimodal.mp4Payload(4242L, body))
      .contains(4242L))
    // corrupt / unsupported payloads degrade to None, never throw
    assert(Multimodal.parsePngDims(body).isEmpty)
    assert(Multimodal.parseJpegDims(Array[Byte]()).isEmpty)
    assert(Multimodal.parseWavFrames(body).isEmpty)
    assert(Multimodal.parseMp4Duration(body).isEmpty)
    // a truncated moov (size field past the payload) degrades, not throws
    assert(Multimodal.parseMp4Duration(
      Multimodal.mp4Payload(7L, body).take(40)).isEmpty)
    // decoders sniff magic bytes, not the kind column
    assert(Multimodal.decodeOne(graft.Schemas.MediaRecord(
      9L, "video", Multimodal.pngPayload(5, 7, body), "video/mp4",
      0L)).width == 5)
    // end to end over the corpus: planted dims come back exactly
    val feats = Multimodal.mediaFeatures(spark, Tables.documents(spark, sfDir))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val len1 = Tables.documents(spark, sfDir)
      .where(col("doc_id") === 1L).select(length(col("text"))).as[Int].head()
    assert(feats(0L).getAs[Int]("width") == 16 &&
      feats(0L).getAs[Long]("parsed") == 1L)            // PNG, dims 16x16
    assert(feats(3L).getAs[Int]("width") == 19 &&
      feats(3L).getAs[Int]("height") == 37)             // JPEG, 16+3 / 16+21
    assert(feats(1L).getAs[Long]("n_frames") == len1.toLong / 2) // WAV
    assert(feats(2L).getAs[Long]("parsed") == 1L &&
      feats(2L).getAs[Int]("width") == -1 &&
      feats(2L).getAs[Long]("n_frames") == Multimodal.plantedDuration(2L)) // MP4
  }

  test("anti-join + idempotent union behave as set operations") {
    val processed = Seq(1L, 2L).toDF("doc_id")
    val incoming = Seq(1L, 2L, 3L, 3L, 4L).toDF("doc_id")
    val fresh = ArticleOps.antiJoinNew(incoming, processed, "doc_id")
    assert(fresh.distinct().as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    val merged = ArticleOps.idempotentUnion(processed, incoming, "doc_id")
    assert(merged.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("typed one-pass corpus summary equals the DataFrame aggregation") {
    import Schemas.Doc
    val docs = Tables.documents(spark, sfDir).as[Doc]
    val typed = operators.Summaries.typedCorpusSummary(spark, docs).head()
    val df = operators.Summaries.corpusSummary(Tables.documents(spark, sfDir)).head()
    assert(typed.total_docs == df.getLong(0))
    assert(typed.total_content_length == df.getLong(1))
    assert(typed.avg_content_length == df.getDouble(2))
    assert(typed.total_words == df.getLong(3))
    assert(typed.unique_langs == df.getLong(4))
  }

  test("retrying enrichment recovers transient failures and dead-letters permanent ones") {
    import sources.RetryingEnrichment
    // backoff policy mirrors the reference: 1,2,4,... capped
    assert(RetryingEnrichment.backoffMs(0, 1000, 60000) == 1000)
    assert(RetryingEnrichment.backoffMs(3, 1000, 60000) == 8000)
    assert(RetryingEnrichment.backoffMs(10, 1000, 60000) == 60000)
    val keys = spark.createDataset(Seq(1L, 2L, 3L))
    // fetcher fails twice per key before succeeding, except key 3 which
    // always fails -> dead letter
    val got = RetryingEnrichment.enrichWithRetry[Long](spark, keys, () => {
      val attempts = scala.collection.mutable.Map[Long, Int]()
      k => {
        val a = attempts.updateWith(k)(v => Some(v.getOrElse(0) + 1)).get
        if (k == 3L) throw new RuntimeException("permanent")
        if (a < 3) throw new RuntimeException("transient")
        s"content-$k"
      }
    }, retries = 3).collect().map(e => e.key -> ((e.content, e.error))).toMap
    assert(got(1L) == ((Some("content-1"), None)))
    assert(got(2L) == ((Some("content-2"), None)))
    assert(got(3L)._1.isEmpty && got(3L)._2.contains("permanent"))
  }

  test("native session_window merges at exactly-gap deltas, same rule as the composed form") {
    // two events exactly 30 min apart, a third just past the gap — pins the
    // boundary rule the a12b oracle relies on: split only when diff > gap
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),
      (2L, 7L, "2024-01-01 10:30:00"),        // exactly gap: same session
      (3L, 7L, "2024-01-01 11:00:00.000001")  // 1 µs past gap: new session
    ).toDF("event_id", "user_id", "ts")
      .withColumn("tsc", col("ts").cast("timestamp"))
    val native = ev.groupBy(col("user_id"),
        session_window(col("tsc"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("w.start"))
      .collect().map(_.getLong(2)).toSeq
    assert(native == Seq(2L, 1L))
  }

  test("bounded-heap top-k aggregate equals the window formulation with deterministic ties") {
    // unit: beyond-capacity offers keep the k best, ties toward smaller id
    val h = new graft.plans.TopKAgg.Heap(3)
    Seq((5L, 1L), (9L, 2L), (5L, 0L), (7L, 3L), (9L, 9L), (1L, 4L)).foreach {
      case (v, i) => h.offer(v, i)
    }
    assert(h.toSortedDesc.toSeq == Seq((9L, 2L), (9L, 9L), (7L, 3L)))
    // integration: aggregate == window rank over real data
    val orders = Tables.orders(spark, sfDir)
    val viaAgg = SparkEntry.queries("q9_topk_agg")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice_x100").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_custkey"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("o_totalprice_x100"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_totalprice_x100"), col("o_orderkey"))
      .orderBy(col("o_custkey"), col("rn"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("top-k heap equals sort-based top-k on seeded random streams") {
    val rnd = new scala.util.Random(12345)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(8)
      val xs = Seq.fill(n)((rnd.nextInt(50).toLong, (rnd.nextLong().abs % 1000)))
      val h = new graft.plans.TopKAgg.Heap(k)
      xs.foreach { case (v, i) => h.offer(v, i) }
      val expect = xs.sortBy { case (v, i) => (-v, i) }.take(k)
      assert(h.toSortedDesc.toSeq == expect, s"n=$n k=$k")
    }
  }

  test("bounded range join equals the naive inequality join, including window boundaries") {
    val left = Seq((1L, 10L, 1000L), (2L, 10L, 2000L), (3L, 20L, 1500L))
      .toDF("lid", "k", "lt")
    // right times probe both boundaries of [lt-300, lt]: exactly at the
    // edges, just outside, and across bucket lines
    val right = Seq(
      (100L, 10L, 700L), (101L, 10L, 699L),   // lid 1: at lower edge | outside
      (102L, 10L, 1000L), (103L, 10L, 1001L), // lid 1: at upper edge | outside
      (104L, 10L, 1800L),                     // lid 2 only
      (105L, 20L, 1499L), (106L, 30L, 1500L)  // key match | key miss
    ).toDF("rid", "k", "rt")
    val got = Relational.boundedRangeJoin(left, right, "k", "lt", "rt", -300L, 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, Seq("k"))
      .where(col("rt").between(col("lt") - 300L, col("lt")))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 100L), (1L, 102L), (2L, 104L), (3L, 105L)))
  }

  test("range-join query plans as an equi-join, not a nested loop") {
    val plan = SparkEntry.queries("a14_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a non-equi plan:\n$plan")
  }

  test("approx_count_distinct tracks the exact distinct count within 5% per language") {
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("lang").agg(countDistinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = toks.groupBy("lang").agg(approx_count_distinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, n) =>
      val a = approx(lang)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"lang $lang: approx $a vs exact $n exceeds 5%")
    }
  }

  test("banded embedding near-dup equals the all-pairs result on the planted corpus") {
    // pins banding recall directly: a future miss fails HERE (attributable
    // to candidate generation) instead of as an opaque oracle hash mismatch
    val emb = Dedup.withNearCopies(Tables.embeddings(spark, sfDir))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val banded = asSet(Dedup.embeddingNearDupPairsBanded(emb, 900000L))
    val allPairs = asSet(Dedup.embeddingNearDupPairs(emb, 900000L))
    assert(banded == allPairs)
    assert(banded.nonEmpty) // the planted copies must actually qualify
  }

  test("semantic dedup kills planted near-copies within clusters, keeps the rest") {
    val out = Dedup.semanticDedup(
      Dedup.withNearCopies(Tables.embeddings(spark, sfDir)), 900000L)
      .select(col("vec_id"), col("cell"), col("cent_rank"), col("keep"),
        col("dup_of"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val n = out.length
    assert(n % 2 == 0 && n > 0) // base corpus + one planted copy each
    // every kill names a real dominator: its planted partner (the only
    // cos >= 0.9 structure in the corpus) — and keepers carry the sentinel
    val killed = out.filter(_._4 == 0L)
    assert(killed.nonEmpty)
    assert(killed.forall { case (id, _, _, _, dupOf) =>
      dupOf == id - 1000000L || dupOf == id + 1000000L })
    assert(out.filter(_._4 == 1L).forall(_._5 == -1L))
    // cluster-scoped recall: nearly every planted pair must co-cluster
    // (the documented trade-off allows a boundary pair or two to split)
    assert(killed.length >= (n / 2) * 9 / 10,
      s"only ${killed.length} of ${n / 2} planted pairs were caught")
    // exactly one side of each caught pair dies — never both
    val killedIds = killed.map(_._1).toSet
    assert(killed.forall { case (id, _, _, _, dupOf) => !killedIds(dupOf) })
    // within a cluster, ranks are the dense 1..|c| sequence
    out.groupBy(_._2).foreach { case (cell, members) =>
      assert(members.map(_._3).sorted.toSeq == (1L to members.length).toSeq,
        s"cell $cell ranks are not dense")
    }
  }

  test("dedup clusters form the transitive closure with the min id as canonical") {
    // chain 1-2-3 needs two propagation rounds (3 learns 1 via 2)
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // empty pair list degenerates cleanly
    assert(Dedup.dedupClusters(pairs.where(col("doc_a") < 0)).isEmpty)
  }

  test("large-star/small-star clusters equal propagation, and survive a long chain") {
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val prop = Dedup.dedupClusters(pairs).as[(Long, Long)].collect().toSet
    val star = Dedup.dedupClustersStar(pairs).as[(Long, Long)].collect().toSet
    assert(star == prop)
    // a 60-node path has diameter 59: propagation's default round budget
    // can't close it — it must FAIL LOUDLY (silent exhaustion would report
    // one cluster as many) — while the O(log)-round decomposition converges
    val path = (1L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] { Dedup.dedupClusters(path).collect() }
    val got = Dedup.dedupClustersStar(path).as[(Long, Long)].collect().toSet
    assert(got == (1L to 60L).map(i => (i, 1L)).toSet)
    // empty input degenerates cleanly
    assert(Dedup.dedupClustersStar(pairs.where(col("doc_a") < 0)).isEmpty)
    // a self-pair's node is still emitted as its own canonical (the same
    // contract as the propagation version)
    val selfPair = Seq((5L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    assert(Dedup.dedupClustersStar(selfPair).as[(Long, Long)].collect().toSet ==
      Set((5L, 5L), (7L, 7L), (8L, 7L)))
    assert(Dedup.dedupClusters(selfPair).as[(Long, Long)].collect().toSet ==
      Set((5L, 5L), (7L, 7L), (8L, 7L)))
  }

  test("withNearCopies precondition: base ids stay below the planted-id offset") {
    val maxId = Tables.embeddings(spark, sfDir)
      .agg(max(col("vec_id"))).head().getLong(0)
    assert(maxId < 1000000L,
      s"max base vec_id $maxId collides with the planted-id offset")
  }

  test("all-pairs embedding dedup refuses a low threshold without the explicit opt-in") {
    val emb = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupPairs(emb, 400000L)
    }
    Dedup.embeddingNearDupPairs(emb, 400000L, allowQuadratic = true) // accepted
  }

  test("deterministic ivf ranks by exact cosine; probing every cell equals brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    Similarity.ivfTopKDet(emb, 5, 5).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf.contains(key) && bf(key) == r.getLong(3))
    }
    val top5 = Similarity.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val detAll = Similarity.ivfTopKDet(emb, 5, 5, planes = 4, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(detAll == top5)
  }

  test("ivf candidates rank identically to brute force; probing more cells helps recall") {
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val ivf = Similarity.ivfTopK(emb, 5, 5).collect()
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf.contains(key) && bf(key) == r.getLong(3))
    }
    val top5 = Similarity.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfAll = Similarity.ivfTopK(emb, 5, 5, nCells = 16, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing every cell = exhaustive search = exact top-5
    assert(ivfAll == top5)
  }

  test("decontamination flags planted copies, spares clean and short docs") {
    val train = docsDF(
      1L -> "a b c d e f g h i j",
      2L -> "k l m n o p q r s t")
    val eval = docsDF(
      100L -> "a b c d e f g h i j",              // full copy: overlap 10000
      101L -> "a b c d e z1 z2 z3 z4 z5",         // 3/8 shingles hit: 3750
      102L -> "x y",                              // too short: 0 shingles
      103L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u0")    // disjoint: overlap 0
    val rep = Decontaminate.overlapReport(train, eval, 3, 6000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep == Seq(
      (100L, 8L, 8L, 10000L, 1L),
      (101L, 8L, 3L, 3750L, 0L),
      (102L, 0L, 0L, 0L, 0L),
      (103L, 8L, 0L, 0L, 0L)))
    // the composed split-then-decontaminate shape: clean eval = all but 100
    val clean = Decontaminate.cleanEval(train, eval, 3, 6000L)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(101L, 102L, 103L))
    // threshold is inclusive: at exactly 3750 doc 101 flips to contaminated
    val at3750 = Decontaminate.overlapReport(train, eval, 3, 3750L)
      .where(col("doc_id") === 101L).select("contaminated").as[Long].head()
    assert(at3750 == 1L)
    // attribution: the copy traces to train doc 1 (8 shared trigrams), the
    // partial copy too (3 shared) once the floor admits it; nothing maps to
    // train doc 2
    val pairs = Decontaminate.attributionPairs(train, eval, 3, 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L, 8L), (101L, 1L, 3L)))
  }

  test("removeContaminatedSpans cuts exactly the leaked span, eval untouched") {
    val train = docsDF(
      1L -> "aa bb cc dd ee ff gg hh",  // leaks "aa bb cc dd" into eval 100
      2L -> "zz ww vv")                 // clean (and too short to shingle)
    val eval = docsDF(100L -> "xx aa bb cc dd yy")
    // 3-gram runs of >= 2: t-positions 0,1 match e-positions 1,2 on one
    // diagonal -> cut tokens 0..3, keep the tail
    val got = Decontaminate.removeContaminatedSpans(train, eval,
        n = 3, minRun = 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "ee ff gg hh", 4L),
      (2L, "zz ww vv", 0L)))
    // a stricter minRun leaves the text alone (run of 2 < 3)
    val strict = Decontaminate.removeContaminatedSpans(train, eval,
        n = 3, minRun = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(strict.map(_._3) == Seq(0L, 0L))
    // join-strategy switch changes nothing
    val shuffled = Decontaminate.removeContaminatedSpans(train, eval,
        n = 3, minRun = 2, broadcastEval = false)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(shuffled == got)
  }

  test("decontamination broadcast and shuffle join forms agree") {
    // the broadcastEval switch changes the JOIN STRATEGY only — results
    // must be identical (e2e_corpus relies on the shuffle form)
    val docs = Tables.documents(spark, sfDir)
    val train = docs.where(col("doc_id") % 2 === 0).select("doc_id", "text")
    val eval = docs.where(col("doc_id") % 2 === 1).select("doc_id", "text")
      .unionByName(train.where(col("doc_id") % 20 === 0) // deterministic plant
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    def run(b: Boolean) =
      Decontaminate.overlapReport(train, eval, 8, 5000L, broadcastEval = b)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val bc = run(true)
    assert(bc == run(false))
    assert(bc.exists(_._5 == 1L)) // the planted copies must flag either way
  }

  test("bloom-prefiltered decontamination equals the exact report") {
    // prefiltering the train scan must be result-invariant: no false
    // negatives (Bloom), false positives culled by the exact join
    val docs = Tables.documents(spark, sfDir)
    val train = docs.where(col("doc_id") % 2 === 0).select("doc_id", "text")
    val eval = docs.where(col("doc_id") % 2 === 1).select("doc_id", "text")
      .unionByName(train.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val exact = Decontaminate.overlapReport(train, eval, 8, 5000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // run at a high fpp too: many false positives survive the prefilter,
    // the exact join must still cull every one of them
    for (fpp <- Seq(0.01, 0.4)) {
      val bloomed = Decontaminate.overlapReportBloom(train, eval, 8, 5000L, fpp)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(bloomed == exact, s"fpp=$fpp")
    }
    assert(exact.exists(_._5 == 1L))
  }

  test("bloom might-contain: members always pass, non-members mostly fail") {
    val keys = (0L until 2000L).map(_ * 7L)
    val df = keys.toDF("h")
    val bloom = df.stat.bloomFilter("h", 2000L, 0.01)
    val probe = (0L until 20000L).toDF("h")
      .withColumn("hit", graft.plans.BloomExpr.mightContain(col("h"), bloom))
    val hits = probe.where(col("hit")).select("h").as[Long].collect().toSet
    assert(keys.forall(hits.contains), "bloom returned a false negative")
    // 2000 true members among 20000 probes: at fpp 1% expect ~180 false
    // positives of the 18000 non-members — allow a wide margin
    assert(hits.size - keys.size <= 1000, s"fp count ${hits.size - keys.size}")
  }

  test("quality percentile gate cuts per source, keeps ties at the cut") {
    // quality here is proportional to word count (stopword ratio fixed at
    // 1/2, length fit < 1): wc words of 'the word' pairs → quality =
    // 10000·wc/200. Source A spans 20..100 words, source B 120..200 — one
    // absolute threshold would pass all of B or none of A; the per-source
    // gate cuts each at its own 40th percentile.
    def doc(wcPairs: Int) = Seq.fill(wcPairs)("the word").mkString(" ")
    val rows = (1 to 5).map(i => (i.toLong, doc(i * 10), "A")) ++
      (1 to 5).map(i => (i.toLong + 10L, doc(60 + i * 10), "B"))
    val docs = rows.toDF("doc_id", "text", "source")
    val kept = TextAnalysis.qualityPercentileGate(docs, 60)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // rank ceil(0.4·5)=2 per source → A threshold q(40w)=2000, B q(160w)=8000
    assert(kept.keySet == Set(2L, 3L, 4L, 5L, 12L, 13L, 14L, 15L))
    assert(kept(2L) == 2000L && kept(12L) == 8000L)
    // keepTopPct = 100 keeps everything (threshold clamps to the min rank)
    assert(TextAnalysis.qualityPercentileGate(docs, 100).count() == 10L)
    // a tie AT the cut survives: duplicate the threshold-rank doc of A
    val withTie = docs.unionByName(Seq((6L, doc(20), "A")).toDF("doc_id", "text", "source"))
    val tied = TextAnalysis.qualityPercentileGate(withTie, 60)
      .where(col("source") === "A").select("doc_id").as[Long].collect().toSet
    // 6 docs in A → rank ceil(0.4·6)=3 → threshold 2000 (docs 2 and 6 tie)
    assert(tied == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("corpus health: dup burden, validity, and mean quality per source") {
    val good = "the quick brown fox jumps over the lazy dog " * 5
    val docs = Seq(
      (1L, good, "en", "A"), (2L, good, "en", "A"),      // 2 is a dup of 1
      (3L, "the other text here now", "de", "A"),
      (4L, "", "en", "B"),                               // invalid (empty)
      (5L, good, "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Summaries.corpusHealth(docs).orderBy("source").collect()
    val a = got(0); val b = got(1)
    assert(a.getString(0) == "A" && a.getLong(1) == 3 && a.getLong(2) == 3)
    assert(a.getLong(3) == 1)              // doc 2 is the non-canonical copy
    assert(a.getAs[Long]("n_langs") == 2)
    assert(b.getString(0) == "B" && b.getLong(1) == 2 && b.getLong(2) == 1)
    assert(b.getLong(3) == 1)              // doc 5 dups doc 1 ACROSS sources
    // mean quality: every doc scored, empty doc scores 0 and drags B's mean
    assert(a.getAs[Long]("mean_quality_x10000") >
      b.getAs[Long]("mean_quality_x10000"))
  }

  test("bpe pair counts: frequency-weighted, 1-char words contribute nothing") {
    // 'ab' appears twice (pair ab x2); 'abc' once (pairs ab, bc);
    // 'a' is 1-char (no pairs — and must not trip sequence(0,-1) descent)
    val docs = docsDF(1L -> "ab ab abc a", 2L -> "zz")
    val got = TextAnalysis.bpePairCounts(docs, 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("bc", 1L), ("zz", 1L)))
    // k truncates after the (cnt desc, pair) order — ties break lexically
    val top1 = TextAnalysis.bpePairCounts(docs, 1).as[(String, Long)].collect()
    assert(top1.toSeq == Seq(("ab", 3L)))
  }

  test("bpe trainer: greedy merges with exact counts, stops when exhausted") {
    // vocab: 'abab' x3, 'abc' x2. Round 1: (a,b) count 2*3 + 1*2 = 8 wins;
    // round 2: (ab,ab) 3; round 3: (ab,c) 2; round 4: no pairs left -> stop
    val docs = docsDF(1L -> "abab abab abc", 2L -> "abab abc")
    val merges = TextAnalysis.bpeTrain(docs, 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1L, "a", "b", 8L),
      (2L, "ab", "ab", 3L),
      (3L, "ab", "c", 2L)))
    // greedy left-to-right: 'aaa' merges (a,a) once (the leftover 'a'
    // cannot pair with the merged 'aa'), so round 2 pairs (aa,a)
    val odd = TextAnalysis.bpeTrain(docsDF(1L -> "aaa aaa"), 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(odd == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
  }

  test("bpe segmentation applies trained merges in order; no merges = chars") {
    val docs = docsDF(1L -> "abab abab abc", 2L -> "abab abc")
    val merges = TextAnalysis.bpeTrain(docs, 5)
      .orderBy("merge_no").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    // after (a,b), (ab,ab), (ab,c): both words collapse to one symbol
    val seg = TextAnalysis.bpeSegmentCounts(docs, merges)
      .as[(Long, Long)].collect().toMap
    assert(seg == Map(1L -> 3L, 2L -> 2L))
    // no merges: every char is a symbol
    val raw = TextAnalysis.bpeSegmentCounts(docs, Seq.empty)
      .as[(Long, Long)].collect().toMap
    assert(raw == Map(1L -> 11L, 2L -> 7L))
  }

  test("vocabulary: top-k terms by count, lexicographic ties, no global sort") {
    val docs = docsDF(1L -> "b b b a a c", 2L -> "a d d")
    val got = TextAnalysis.vocabulary(docs, 3).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("d", 2L)))
    // scale shape: per-partition top-k merge, not a full sort
    val plan = TextAnalysis.vocabulary(Tables.documents(spark, sfDir), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("composite quality filter assigns ordered failure reasons") {
    val keepDoc = "the cat sat on the mat and the dog ran to the park in a big " +
      "city with many nice people who like to walk and talk about the " +
      "weather every single day again"
    val docs = docsDF(
      1L -> "a b c",                                  // 3 words
      2L -> ("the of " * 20).trim,                    // 40 words, 2 distinct bigrams
      3L -> keepDoc,                                  // passes every rule
      4L -> (1 to 30).map(i => s"zq$i").mkString(" ")) // 30 words, 0 stopwords
    val got = TextAnalysis.qualityFilter(docs).orderBy("doc_id")
      .select("doc_id", "keep", "reason").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "too_short"),
      (2L, 0L, "repetitive"),   // stopword-rich, so the repetition rule fires
      (3L, 1L, ""),
      (4L, 0L, "low_stopwords")))
  }

  test("repetition ratios: repeats and top-bigram share, short docs at zero") {
    // "a b a b a b": 5 bigrams, 2 distinct → dup 3/5, top ("a b") 3/5
    // "x y z": 2 bigrams, both unique → dup 0, top 1/2
    // "w": no bigrams → all zero
    val docs = docsDF(1L -> "a b a b a b", 2L -> "x y z", 3L -> "w")
    val got = TextAnalysis.repetition(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 6000L, 6000L),
      (2L, 2L, 2L, 0L, 5000L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("novelty: unique-shingle fraction, shared phrases lower it, short docs get -1") {
    // with n=3: doc 1 and doc 2 share the run "a b c d" → shingles
    // "a b c" and "b c d" have df=2; each doc's remaining shingles unique.
    // doc 1 "a b c d e": 3 shingles, 1 unique ("c d e") → 333333
    // doc 2 "z a b c d": 3 shingles, 1 unique ("z a b") → 333333
    // doc 3 "p q r":     1 shingle, unique → 1000000
    // doc 4 "x y":       too short → -1
    val docs = docsDF(
      1L -> "a b c d e", 2L -> "z a b c d", 3L -> "p q r", 4L -> "x y")
    val got = TextAnalysis.novelty(docs, 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 333333L),
      (2L, 3L, 1L, 333333L),
      (3L, 1L, 1L, 1000000L),
      (4L, 0L, 0L, -1L)))
  }

  test("funnel enforces strict step ordering per user") {
    import spark.implicits._
    // u1 converts fully; u2 purchased BEFORE clicking (their post-view
    // click still counts for step 2, but no purchase follows it — no
    // step-3 credit); u3 clicked before viewing (that click doesn't
    // count; the re-click after view does); u4 never viewed
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "view", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      (3L, "click", 50L), (3L, "view", 100L), (3L, "click", 180L),
      (4L, "click", 100L), (4L, "purchase", 200L))
      .toDF("user_id", "event_type", "tsu")
    val got = Relational.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("step_no").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 3L), (3L, "purchase", 1L)))
  }

  test("eventPaths counts per-user ordered trigrams, never crossing users") {
    import spark.implicits._
    // u1: a b c d → paths "a>b>c", "b>c>d"; u2: a b c → "a>b>c";
    // u3 has only 2 events — no trigram, and no path may borrow u1's tail
    val ev = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "c", 3L), (1L, 40L, "d", 4L),
      (2L, 10L, "a", 5L), (2L, 20L, "b", 6L), (2L, 30L, "c", 7L),
      (3L, 10L, "x", 8L), (3L, 20L, "y", 9L))
      .toDF("user_id", "tsu", "event_type", "event_id")
    val got = Relational.eventPaths(ev, n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b > c", 2L), ("b > c > d", 1L)))
  }

  test("volumeAnomalies flags exactly the >2-sigma days with integer arithmetic") {
    import spark.implicits._
    val day = 86400000000L
    // note a single outlier among D days maxes out at z = (D−1)/√D, so
    // D ≥ 6 is the smallest corpus where one spike CAN cross 2σ.
    // "e": five days of 10, then 30 → D=6, S=80, Q=1400; day 5:
    //   (180−80)² = 10000 > 4·(8400−6400) = 8000 → flagged; a 10-day:
    //   (60−80)² = 400 → not.
    // "f": 10,10,10,10,20,20 → S=80, Q=1200; n=20: (120−80)² = 1600 vs
    //   4·(7200−6400) = 3200 → nothing flagged (two spikes share the blame).
    // "g": constant volume → variance 0, never flagged.
    val rows =
      (0 until 5).flatMap(d => Seq.fill(10)(("e", d))) ++ Seq.fill(30)(("e", 5)) ++
      (0 until 4).flatMap(d => Seq.fill(10)(("f", d))) ++
        (4 until 6).flatMap(d => Seq.fill(20)(("f", d))) ++
      (0 until 3).flatMap(d => Seq.fill(7)(("g", d)))
    val ev = rows.zipWithIndex
      .map { case ((t, d), i) => (t, d * day + i) }
      .toDF("event_type", "tsu")
    val got = Relational.volumeAnomalies(ev)
      .orderBy("event_type", "day")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got.filter(_._4).map(r => (r._1, r._2)) == Seq(("e", 5L)))
    assert(got.count(!_._4) == got.size - 1)
  }

  test("retention cohorts count distinct user-weeks against the first-active week") {
    import spark.implicits._
    val wk = 604800000000L
    // u1 active weeks 0,1,3; u2 active weeks 1,1 (dup events, one credit);
    // u3 active week 3 only
    val ev = Seq(
      (1L, 0L * wk + 5L), (1L, 1L * wk + 9L), (1L, 3L * wk),
      (2L, 1L * wk + 1L), (2L, 1L * wk + 2L),
      (3L, 3L * wk + 7L))
      .toDF("user_id", "tsu")
    val got = Relational.retentionCohorts(ev)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L),
      (3L, 0L, 1L)))
  }

  test("resolveRedirects follows chains to the end in log rounds, cycles fail loudly") {
    import spark.implicits._
    // chain 5→4→3→1 (3 is a redirect to 1; 1 is final), plus isolated 9→7
    val r = Seq((5L, 4L), (4L, 3L), (3L, 1L), (9L, 7L))
      .toDF("id", "target")
    val got = graft.operators.ArticleOps.resolveRedirects(r)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 1L, 1L), (4L, 1L, 2L), (5L, 1L, 3L), (9L, 7L, 1L)))
    // a 2-cycle must throw, not return intermediate targets
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("id", "target")
    val e = intercept[IllegalStateException] {
      graft.operators.ArticleOps.resolveRedirects(cyc, maxIters = 4)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("modalityCoverage counts valid text and embedding joins per source") {
    import spark.implicits._
    val docs = docsDF(1L -> "text one", 2L -> "", 3L -> "three")
    val emb = Seq((1L, Array(1.0f), 0), (9L, Array(2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Summaries.modalityCoverage(docs, emb)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // 3 docs: doc 2's empty text is invalid; only doc 1 has a vector
    // (vec 9 matches no doc) → coverage 1/3 = 3333
    assert(got == Seq(("src0", 3L, 2L, 1L, 3333L)))
  }

  test("bpeFertility bills symbols per word, untrained sources pay more") {
    // merges built for "aa"-family words compress doc 1's source; source
    // src9 (planted via custom frame) stays character-level
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa aaaa aaaa", "en", "srcA", 14L),
      (2L, "xyz qrs", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = TextAnalysis.bpeTrain(docs, 3)
      .orderBy("merge_no").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeFertility(docs, merges)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val bySrc = got.map(g => g._1 -> g).toMap
    // srcA's "aaaa" compresses under the trained merges (< 4 syms/word);
    // srcB gets only the tie-break third merge (q,r): xyz = 3 syms,
    // qrs = 2 → 5 symbols over 2 words = 25000
    assert(bySrc("srcA")._5 < 40000L, s"srcA: ${bySrc("srcA")}")
    assert(bySrc("srcB")._5 == 25000L, s"srcB: ${bySrc("srcB")}")
    assert(bySrc("srcA")._2 == 1L && bySrc("srcB")._4 == 2L)
  }

  test("ndcgEval discounts late hits; perfect and empty lists hit the bounds") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("query_id", "neighbor_id")
    // q1: both hits, in order → ndcg 10000; q2: one hit at rank 2 →
    // dcg 630929 / idcg 1630929; q3: no rows in pred at all → 0
    val pred = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 99L, 1L), (2L, 20L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.ndcgEval(truth, pred, k = 2).orderBy("query_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val idcg = 1000000L + 630929L
    assert(got == Seq(
      (1L, idcg, idcg, 10000L),
      (2L, 630929L, idcg, math.floor(10000.0 * 630929L / idcg + 0.5).toLong),
      (3L, 0L, idcg, 0L)))
    // a rank-1-only hit beats a rank-2-only hit (position sensitivity —
    // recall@k alone cannot tell them apart)
    val p1 = Seq((1L, 10L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val p2 = Seq((1L, 10L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val n1 = Similarity.ndcgEval(truth.where(col("query_id") === 1L), p1, 2)
      .select("ndcg_x10000").as[Long].head()
    val n2 = Similarity.ndcgEval(truth.where(col("query_id") === 1L), p2, 2)
      .select("ndcg_x10000").as[Long].head()
    assert(n1 > n2)
  }

  test("semanticOverlap flags every planted paraphrase pair (banded == exact)") {
    val base = Tables.embeddings(spark, sfDir)
    val evalSide = Dedup.withNearCopies(base).where(col("vec_id") >= 1000000L)
    val banded = graft.operators.Decontaminate
      .semanticOverlap(base, evalSide, 900000L)
      .as[(Long, Long, Long)].collect().toSet
    // exact cross-side all-pairs ground truth via the existing unit-vector
    // machinery: every pair the banding returns must be real, and every
    // exact pair must be found (the 100%-recall property the lsh dedup
    // query already pins)
    val tn = Dedup.withUnitVector(base)
      .select(col("vec_id").as("train_id"), col("vn").as("tvn"))
    val en = Dedup.withUnitVector(evalSide)
      .select(col("vec_id").as("eval_id"), col("vn").as("evn"))
    val exact = en.crossJoin(tn)
      .withColumn("cos_x1000000",
        floor(Dedup.dotCol(col("evn"), col("tvn")) * 1000000.0 + 0.5).cast("long"))
      .where(col("cos_x1000000") >= 900000L)
      .select("eval_id", "train_id", "cos_x1000000")
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == exact)
    // each planted copy is flagged against its own source
    val selfPairs = banded.filter { case (e, t, _) => e == t + 1000000L }
    assert(selfPairs.size == base.count())
  }

  test("embeddingStats: per-dim fixed-point moments on a crafted matrix") {
    import spark.implicits._
    // vectors (1.0, -0.5), (3.0, 0.25): dim 0 → n 2, sum 4e6, mean 2e6;
    // dim 1 → sum -250000, mean floor(-125000.0) = -125000
    val emb = Seq(
      (1L, Array(1.0f, -0.5f), 0),
      (2L, Array(3.0f, 0.25f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingStats(emb).orderBy("dim")
      .select("dim", "n", "sum_x1e6", "min_x1e6", "max_x1e6", "mean_x1e6")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 4000000L, 1000000L, 3000000L, 2000000L),
      (1L, 2L, -250000L, -500000L, 250000L, -125000L)))
  }

  test("bm25 ranks lexical overlap, favors shorter docs at equal tf, skips self") {
    // query doc 1: "alpha beta". doc 2 and doc 3 both contain "alpha" once;
    // doc 3 is much longer → length normalization must rank doc 2 first.
    // doc 4 shares nothing → absent. doc 5 has "alpha" twice but is long.
    val docs = docsDF(
      1L -> "alpha beta",
      2L -> "alpha x y",
      3L -> ("alpha " + (1 to 30).map(i => s"w$i").mkString(" ")),
      4L -> "nothing shared here",
      5L -> ("alpha alpha " + (1 to 30).map(i => s"v$i").mkString(" ")))
    val got = Similarity.bm25TopK(docs, Seq(1L), k = 10)
      .orderBy("rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ids = got.map(_._2)
    assert(!ids.contains(1L) && !ids.contains(4L))
    assert(ids.toSet == Set(2L, 3L, 5L))
    val score = got.map(g => g._2 -> g._4).toMap
    assert(score(2L) > score(3L), s"length norm failed: $score")
    // tf saturation + length: twice-alpha in a long doc still beats
    // once-alpha in an equally long doc
    assert(score(5L) > score(3L), s"tf failed: $score")
  }

  test("sentenceStats splits on terminators, scores shape signals") {
    // "One two. Three! Four five six? x" → sentences of 2, 1, 3, 1 words:
    // n=4, mean = 175 (×100), max = 3, one-word frac = 5000 (×10000)
    val docs = docsDF(
      1L -> "One two. Three! Four five six? x",
      2L -> "no terminators at all",
      3L -> "...")
    val got = TextAnalysis.sentenceStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 175L, 3L, 5000L),
      (2L, 1L, 400L, 4L, 0L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("jaccardHistogram buckets pairs by decile, identical pair in bucket 9") {
    // docs 1,2 identical (jx 10000 → decile 9); 1,3 share half-ish; 4 disjoint
    val docs = docsDF(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "a b c d z z",
      4L -> "p q r s t u")
    val got = Dedup.jaccardHistogram(docs, 3).orderBy("decile")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // 1-2: 4 common of 4 → 10000 (decile 9); 1-3 and 2-3: trigram sets
    // {abc,bcd,cde,def} vs {abc,bcd,cdz,dzz}: 2/6 → 3333 (decile 3)
    assert(got == Seq((3L, 2L, 3333L, 3333L), (9L, 1L, 10000L, 10000L)))
    // histogram totals = total candidate pairs
    assert(got.map(_._2).sum == 3L)
  }

  test("bestSurvivors keep the highest-quality member, ties toward smaller id") {
    import spark.implicits._
    // cluster {1,2,3}: doc 2 has more words and more stopwords → higher
    // quality score; cluster {7,8}: identical text → tie → smaller id 7
    val docs = docsDF(
      1L -> "alpha beta",
      2L -> "the alpha of the beta is a gamma in the delta",
      3L -> "alpha gamma",
      7L -> "same words here",
      8L -> "same words here")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "canonical_id")
    val got = Dedup.bestSurvivors(docs, clusters).orderBy("cluster_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._4)) == Seq((1L, 2L, 3L), (7L, 7L, 2L)))
    // the survivor's reported quality equals the quality operator's score
    val q = TextAnalysis.quality(docs).select("doc_id", "quality_x10000")
      .as[(Long, Long)].collect().toMap
    got.foreach(g => assert(g._3 == q(g._2)))
  }

  test("clusterLabels surface rare cluster-specific terms over common filler") {
    import spark.implicits._
    // cluster {1,2}: cluster tf — the 6, invoice 2, payment 2, overdue 1,
    // reminder 1. Corpus of 12 docs all containing 'the': idf(the) = 100
    // → score 600; idf(invoice|payment) = 100·12/2 = 600 → score 1200;
    // idf(overdue|reminder) = 1200 → score 1200. Top-2 by (score DESC,
    // term): invoice, then overdue — the everywhere-filler 'the' loses
    // despite triple the term frequency.
    val docs = docsDF(Seq(
      1L -> "the the invoice payment overdue the",
      2L -> "the the invoice payment reminder the") ++
      (3L to 12L).map(i => i -> s"the filler$i words$i"): _*)
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "canonical_id")
    val got = Dedup.clusterLabels(docs, clusters, k = 2)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, "invoice", 1200L), (1L, 2L, "overdue", 1200L)))
  }

  test("dedupVerdict applies reasons in priority order with auditable signals") {
    // doc 2 = exact copy of 1 (whitespace churn only); doc 3 near-dups 1
    // (high trigram jaccard, different enough to not be exact); doc 4 is a
    // stitched copy of 5's two halves (span_copy through coverage, no
    // single whole-doc jaccard partner above the bar); docs 5, 6 keep
    // halves of 12 tokens carry the >= 12-token verbatim runs; 45 filler
    // tokens keep doc5 big enough that the (4,5) whole-doc trigram jaccard
    // stays under 0.5 (20 shared / 69 union) — span_copy must fire where
    // near-dup can't
    val half1 = (1 to 12).map(i => s"a$i").mkString(" ")
    val half2 = (1 to 12).map(i => s"b$i").mkString(" ")
    val filler = (1 to 45).map(i => s"f$i").mkString(" ")
    val base = "one two three four five six seven eight nine ten"
    val docs = docsDF(
      1L -> base,
      2L -> ("  " + base + " "),
      3L -> (base + " eleven"),
      4L -> (half1 + " " + half2),
      5L -> (half1 + " " + filler + " " + half2),
      6L -> "totally unrelated content with nothing shared at all")
    val got = Dedup.dedupVerdict(docs, ngramN = 3, minJaccardX10000 = 5000,
        spanN = 8, spanMinRun = 5, maxSpanCoverageX10000 = 5000)
      .orderBy("doc_id")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 1L && byId(1L)._3 == "")
    assert(byId(2L)._2 == 0L && byId(2L)._3 == "exact_duplicate" && byId(2L)._4 == 1L)
    assert(byId(3L)._2 == 0L && byId(3L)._3 == "near_duplicate" && byId(3L)._5 == 1L)
    assert(byId(4L)._2 == 0L && byId(4L)._3 == "span_copy",
      s"doc 4: ${byId(4L)}")
    // doc 5 shares the same spans but is longer — under the 50% bar
    assert(byId(5L)._2 == 1L && byId(5L)._3 == "", s"doc 5: ${byId(5L)}")
    assert(byId(6L)._2 == 1L)
  }

  test("snippets pick the densest window, earliest on ties, clamped for short docs") {
    val docs = docsDF(
      // hits at positions 6,7,9 cluster in the tail; window 3 starting at 6
      // ("q q x" with 2 hits) loses to 7 ("q x q" ... ) — compute: tokens
      // f f f f f q x q q f? design: hits at 6,8,9 → best 3-window = [8,9,?]
      1L -> "f1 f2 f3 f4 f5 q f6 q q f7",
      2L -> "q a",           // shorter than the window: single clamped window
      3L -> "z1 z2 z3 z4")   // no hits: earliest window wins
    val got = Similarity.snippets(docs, Seq("q"), windowTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 2L, "q f6 q"),  // windows at 6 and 8 both score 2; earliest
      (2L, 1L, 1L, "q a"),
      (3L, 1L, 0L, "z1 z2 z3")))
  }

  test("the persisted BM25 index returns the direct pipeline's exact ranking") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-spec-").toString
    Similarity.buildBm25Index(docs, dir)
    // the artifact parts exist on disk
    Seq("postings", "doclen", "stats").foreach { part =>
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$dir/$part")), s"missing $part")
    }
    val direct = Similarity.bm25TopK(docs, Seq(0L, 1L, 2L, 3L, 4L), k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val indexed = Similarity.bm25QueryIndex(spark, dir, Seq(0L, 1L, 2L, 3L, 4L), k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(indexed == direct)
  }

  test("the persisted ANN index returns ivfPqTopK's exact top-k (probe-only " +
    "search == train-and-search, byte for byte)") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx-spec-").toString
    Similarity.buildAnnIndex(emb, dir)
    Seq("vectors", "cells", "coarse_centroids", "codes", "pq_centroids")
      .foreach { part =>
        assert(java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$dir/$part")), s"missing $part")
      }
    val direct = Similarity.ivfPqTopK(emb, nQueries = 10, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val indexed = Similarity.annQueryIndex(spark, dir, nQueries = 10, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(indexed == direct)
  }

  test("updateAnnIndex: the coarse tier (cells, sums, centroids) and the " +
    "re-rank vectors equal a full rebuild bit for bit; the PQ codebook " +
    "stays frozen; batch codes are argmin vs the serving codebook") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.where($"vec_id" % 4 =!= 0)
    val batch = emb.where($"vec_id" % 4 === 0)
    def tmpd(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val incrDir = tmpd("graft-annincr-")
    val fullDir = tmpd("graft-annfull-")
    Similarity.buildAnnIndex(base, incrDir)
    val frozenCodebook = spark.read.parquet(s"$incrDir/pq_centroids")
      .collect().map(_.toSeq).toSet
    val baseCodes = spark.read.parquet(s"$incrDir/codes")
      .collect().map(_.toSeq).toSet
    Similarity.updateAnnIndex(spark, incrDir, batch)
    Similarity.buildAnnIndex(emb, fullDir)
    // the coarse tier has no trained state (fixed hyperplanes + mergeable
    // integer sums), so absorb == rebuild exactly; ditto the unit vectors.
    // Segment boundaries are LAYOUT (incr = base + s00001, full = base) —
    // row content and the aggregated sums are what must match
    def annSums(dir: String) = spark.read.parquet(s"$dir/coarse_sums")
      .groupBy($"cell", $"d").agg(sum($"sd").as("sd"), sum($"cnt").as("cnt"))
      .where($"cnt" > 0).collect().map(_.toSeq).toSet
    // seg AND pbucket are layout columns (round-13 bucket layout)
    Seq("cells", "vectors", "coarse_centroids").foreach { p =>
      val got = spark.read.parquet(s"$incrDir/$p").drop("seg").drop("pbucket")
        .collect().map(_.toSeq).toSet
      val want = spark.read.parquet(s"$fullDir/$p").drop("seg").drop("pbucket")
        .collect().map(_.toSeq).toSet
      assert(got == want, s"$p diverged from the full rebuild")
    }
    assert(annSums(incrDir) == annSums(fullDir),
      "aggregated coarse sums diverged from the full rebuild")
    // frozen-quantizer contract: the codebook is untouched by the update,
    // base rows keep their training-time codes, and every new row's code
    // exists in the codebook (argmin can only pick a live centroid)
    assert(spark.read.parquet(s"$incrDir/pq_centroids")
      .collect().map(_.toSeq).toSet == frozenCodebook, "codebook moved")
    val afterCodes = spark.read.parquet(s"$incrDir/codes")
    assert(afterCodes.join(batch.select($"vec_id"), Seq("vec_id"), "left_anti")
      .collect().map(_.toSeq).toSet == baseCodes, "base codes rewritten")
    val codebookKeys = spark.read.parquet(s"$incrDir/pq_centroids")
      .select($"s", $"code")
    assert(afterCodes.join(codebookKeys, Seq("s", "code"), "left_anti")
      .isEmpty, "a new code points outside the serving codebook")
    // and the probe serves: every query answered from the merged artifact
    assert(Similarity.annQueryIndex(spark, incrDir, nQueries = 10, k = 5)
      .select($"query_id").distinct().count() == 10)
  }

  test("the persisted pair-graph artifact returns the direct pipeline's exact pairs") {
    val cfg = SparkEntry.cfg
    val valid = ArticleOps.validated(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"), col("source"))
    val dir = java.nio.file.Files.createTempDirectory("graft-pairs-spec-").toString
    Dedup.buildPairsArtifact(valid, dir, cfg.ngramN, cfg.minJaccardX10000)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/pairs")), "missing pairs part")
    val direct = Dedup.ngramJaccardPairs(valid, cfg.ngramN, cfg.minJaccardX10000)
      .as[(Long, Long, Long)].collect().toSet
    val art = Dedup.pairsFromArtifact(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(art == direct)
  }

  test("rrfFuse sums reciprocal ranks and rewards cross-system agreement") {
    import spark.implicits._
    // q1: system A ranks docs 10,20,30; system B ranks 20,40. doc 20 is
    // the only two-system doc: 100000/62 + 100000/61 = 1612 + 1639 = 3251,
    // beating A's rank-1 doc 10 (100000/61 = 1639)
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 40L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 20L, 1L, 3251L, 2L),
      (1L, 10L, 2L, 1639L, 1L),
      (1L, 40L, 3L, 1612L, 1L),
      (1L, 30L, 4L, 1587L, 1L)))
  }

  test("langMismatchReport counts partition agree/abstain/mismatch completely") {
    val docs = Tables.documents(spark, sfDir)
    val rep = TextAnalysis.langMismatchReport(docs)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // the three buckets partition every group
    rep.foreach { case (src, lang, n, agree, und, mis) =>
      assert(agree + und + mis == n, s"($src, $lang) buckets don't sum")
    }
    assert(rep.map(_._3).sum == docs.count())
    // crafted rows: an en doc in stopword-rich German is a mismatch, one
    // with no stopwords at all is undetermined
    val crafted = docsDF(
      1L -> "the cat of the hat is a cat",  // en-scoring
      2L -> "der hund und die katze ist ein hund", // de-scoring
      3L -> "zzz qqq www")                  // no stopword hits
    val got = TextAnalysis.langMismatchReport(crafted)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("src0", "en", 3L, 1L, 1L, 1L)))
  }

  test("qualityCalibration partitions each source into quartiles covering every doc") {
    val docs = Tables.documents(spark, sfDir)
    val cal = TextAnalysis.qualityCalibration(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // quartiles 1..4 per source, covering all docs exactly once
    assert(cal.map(_._3).sum == docs.count())
    assert(cal.forall(r => r._2 >= 1 && r._2 <= 4))
    val bySource = cal.groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._2).toSet == Set(1L, 2L, 3L, 4L), s"$src quartiles")
      // ntile balance: sizes differ by at most 1
      val sizes = rows.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes ${sizes.toSeq}")
    }
    // dup totals agree with the dedup operator
    val dupTotal = operators.Dedup.exactDuplicates(docs)
      .where(col("n_copies") > 1).count()
    assert(cal.map(_._4).sum == dupTotal)
  }

  test("Misra-Gries summary honors the undercount bound and never overcounts") {
    val docs = Tables.documents(spark, sfDir)
    val k = 32
    val exact = docs.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val got = TextAnalysis.mgHeavyHitters(docs, k)
      .as[(String, Long)].collect()
    assert(got.nonEmpty && got.length <= k)
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(exact(t) - est <= n / (k + 1),
        s"$t undercounted past the bound: $est vs ${exact(t)} (N=$n)")
    }
    // every term more frequent than N/(k+1) must survive
    val mustSurvive = exact.filter(_._2 > n / (k + 1)).keySet
    val survivors = got.map(_._1).toSet
    assert(mustSurvive.subsetOf(survivors),
      s"missing guaranteed hitters: ${mustSurvive.diff(survivors)}")
    // skewed micro corpus: the single heavy term dominates and survives
    val micro = docsDF(
      1L -> (Seq.fill(60)("heavy").mkString(" ") + " x y z"),
      2L -> "p q r s t u v w")
    val m = TextAnalysis.mgHeavyHitters(micro, 4)
      .as[(String, Long)].collect().toMap
    assert(m.contains("heavy") && m("heavy") >= 60L - (71L / 5L))
  }

  test("kCore peels cascading trees away and keeps cycles; caps loudly") {
    import spark.implicits._
    // triangle {1,2,3} with a pendant path 3-4-5: the path peels in
    // cascading rounds (5 first, then 4), the triangle survives at deg 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val got = operators.Graphs.kCore(pairs, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a pure path has no 2-core: empty, and convergence is reached (no throw)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(operators.Graphs.kCore(path, k = 2).isEmpty)
    // the loud cap: a long path with maxIters too small must throw
    val long = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      operators.Graphs.kCore(long, k = 2, maxIters = 2)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("personalized PageRank concentrates mass around the seed's community") {
    import spark.implicits._
    // two 4-node stars (hubs 1 and 10) joined by a single bridge 1-10;
    // seeding at 1 must rank every A-community node above every B leaf
    val starA = Seq((2L, 1L), (3L, 1L), (4L, 1L))
    val starB = Seq((11L, 10L), (12L, 10L), (13L, 10L))
    val all = (starA ++ starB ++ Seq((1L, 10L)))
      .flatMap { case (a, b) => Seq((a, b, 1L), (b, a, 1L)) }
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = operators.Graphs.graphRankPersonalized(all, seeds, iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) > got(10L), s"seed hub must dominate: $got")
    Seq(2L, 3L, 4L).foreach(a =>
      Seq(11L, 12L, 13L).foreach(b =>
        assert(got(a) > got(b), s"A-leaf $a vs B-leaf $b: $got")))
    // and unlike the uniform walk, an unreached-without-teleport node keeps
    // only flowed mass: B leaves still get SOME rank through the bridge
    assert(Seq(11L, 12L, 13L).forall(b => got(b) > 0L))
  }

  test("triangleCounts: cliques count, chains don't, duplicates and orientation ignored") {
    import spark.implicits._
    // K4 on {1,2,3,4} → C(3,2)=3 triangles per node; chain 10-11-12 → none;
    // edges arrive in mixed orientation with a duplicate
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (b, a) // reversed
    val pairs = (k4 ++ Seq((10L, 11L), (11L, 12L), (1L, 2L)))
      .toDF("doc_a", "doc_b")
    val got = operators.Graphs.triangleCounts(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("graphRank on a crafted weighted digraph matches hand-rolled iteration") {
    import spark.implicits._
    // 1 → 2 (w 3), 1 → 3 (w 1), 2 → 3 (w 1), 3 → 1 (w 1): weighted,
    // directed, asymmetric — exercises the wdeg split and damping
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = operators.Graphs.graphRank(edges, iters = 7)
      .as[(Long, Long)].collect().toMap
    // reference: same integer recurrence in plain Scala
    val es = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val wdeg = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank: Map[Long, Long] = wdeg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 7) {
      val in = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.flatMap { case (s, _, w) =>
          rank.get(s).map(r => r * w / wdeg(s)) }.sum
      }
      rank = in.map { case (nd, s) => nd -> (150000L + 85L * s / 100L) }
    }
    assert(got == rank)
    // weighted flow: node 3 collects from everyone, node 2 gets 3/4 of
    // node 1's mass — both outrank the damped-only return path to 1
    assert(got(3L) > got(1L))
  }

  test("textRank matches an independent reference implementation of the recurrence") {
    // hub structure: "h" co-occurs with everything; "x"/"y" only with "h"
    val docs = docsDF(
      1L -> "h x h y h x",
      2L -> "y h x h",
      3L -> "p q p q p")
    val got = TextAnalysis.textRank(docs, vocabCap = 500, iters = 10, k = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // reference: same graph + same fixed-point recurrence in plain Scala
    val toks = Seq(
      Seq("h", "x", "h", "y", "h", "x"),
      Seq("y", "h", "x", "h"),
      Seq("p", "q", "p", "q", "p"))
    val occ = toks.flatMap(ts => ts.zip(ts.tail)).filter { case (a, b) => a != b }
    val w = occ.groupBy { case (a, b) => (Seq(a, b).min, Seq(a, b).max) }
      .view.mapValues(_.size.toLong).toMap
    val edges = w.toSeq.flatMap { case ((x, y), c) => Seq((x, y, c), (y, x, c)) }
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank: Map[String, Long] = wdeg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 10) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, c) => rank(src) * c / wdeg(src) }.sum
      }
      rank = in.map { case (t, s) => t -> (150000L + 85L * s / 100L) }
    }
    val expect = rank.toSeq.sortBy { case (t, r) => (-r, t) }
    assert(got.toSeq == expect)
    // the hub outranks its spokes
    val m = got.toMap
    assert(m("h") > m("x") && m("h") > m("y"))
  }

  test("textRank vocab cap prunes edges at the (count DESC, term) cut") {
    // vocab cap 2 keeps the two most frequent terms only — "p" (5) and
    // "h" (4); all "h x"/"h y"/"p q" adjacencies die with their endpoints,
    // leaving only the h-p edges
    val docs = docsDF(1L -> "h p h p h p p h p x y q")
    val got = TextAnalysis.textRank(docs, vocabCap = 2, iters = 5, k = 10)
      .collect().map(r => r.getString(0)).toSet
    assert(got == Set("h", "p"))
  }

  test("length percentiles: nearest-rank exact on a micro corpus, approx within 5%") {
    // lengths 1, 2, 3, 100 in one source: n=4 →
    // p50 rank (50·4+99)//100 = 2 → 2; p90 rank (90·4+99)//100 = 4 → 100;
    // p99 rank 4 → 100
    val micro = docsDF(1L -> "a", 2L -> "ab", 3L -> "abc", 4L -> ("a" * 100))
    val got = Summaries.lengthPercentiles(micro).orderBy("pct")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("src0", 50L, 2L), ("src0", 90L, 100L), ("src0", 99L, 100L)))
    // on the test corpus: approx sketch within 5% of the exact value
    val docs = Tables.documents(spark, sfDir)
    val exact = Summaries.lengthPercentiles(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = Summaries.approxLengthPercentiles(docs).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val e = exact((r.getString(0), r.getLong(1)))
      val a = r.getLong(2)
      assert(math.abs(a - e).toDouble / math.max(e, 1L) <= 0.05,
        s"approx $a vs exact $e for ${r.getString(0)}/p${r.getLong(1)}")
    }
  }

  test("int8-quantized ANN: estimates near true cosine, recall holds up") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.bruteForceTopKQuantized(emb, 5, 5).collect()
    val qset = quant.map(r => (r.getLong(0), r.getLong(1))).toSet
    // 7-bit codes keep most of the exact top-5
    assert(qset.intersect(exact).size >= (exact.size * 3) / 5)
    // and each returned estimate is within 2% of the true cosine
    val bf = Similarity.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    quant.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getLong(3) - bf(key)) <= 20000,
        s"$key: est ${r.getLong(3)} vs true ${bf(key)}")
    }
  }

  test("shared spans: islands split on gaps, runs below minRun drop, span math holds") {
    // 26 distinct tokens; doc 2 copies tokens 1-10 and 16-24 of doc 1 with a
    // 'zz' wedge between them — two diagonals, which must NOT chain into one
    // run. With n=3: run1 = 8 consecutive shared 3-grams (span 10 tokens),
    // run2 = 7 (span 9). minRun=8 keeps only run1.
    val t = ('a' to 'z').map(c => s"$c$c$c") // aaa bbb ... zzz
    val doc1 = t.mkString(" ")
    val doc2 = (t.slice(0, 10) ++ Seq("zz") ++ t.slice(15, 24)).mkString(" ")
    val docs = docsDF(1L -> doc1, 2L -> doc2)
    val both = Dedup.sharedSpans(docs, 3, 1).collect()
    assert(both.length == 1)
    val r = both.head
    assert((r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
      r.getAs[Long]("shared_pos"), r.getAs[Long]("max_span_tokens")) ==
      (2L, 8L, 15L, 10L))
    // raising minRun drops the shorter island but keeps the longer one
    val strict = Dedup.sharedSpans(docs, 3, 8).collect()
    assert(strict.length == 1 && strict.head.getAs[Long]("n_runs") == 1L &&
      strict.head.getAs[Long]("shared_pos") == 8L)
    // above the longest run: no pair survives
    assert(Dedup.sharedSpans(docs, 3, 9).isEmpty)
  }

  test("shared spans: docFreqCap prunes boilerplate diagonals") {
    // the same 12-token boilerplate appears in every doc — with a cap of 2
    // every boilerplate shingle (doc-frequency 3) is pruned, so only the
    // genuine 2-doc copy (doc 1 tokens reused in doc 2) survives
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = docsDF(
      1L -> s"$boiler $shared",
      2L -> s"$boiler x1 x2 x3 $shared",
      3L -> s"$boiler y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")
    val capped = Dedup.sharedSpans(docs, 3, 5, docFreqCap = Some(2))
      .collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // uncapped, the boilerplate run links every pair
    val open = Dedup.sharedSpans(docs, 3, 5).collect()
    assert(open.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("incremental clustering equals batch; new pairs can merge old clusters") {
    // old graph: {1,2} and {10,11} plus singleton 20 (self-pair);
    // new pairs BRIDGE the two old clusters (2-10) and attach a new node
    // (11-30) — the incremental fold must re-canonicalize the merged
    // component to the global min, not keep the old canonicals
    val oldPairs = Seq((1L, 2L), (10L, 11L), (20L, 20L)).toDF("doc_a", "doc_b")
    val newPairs = Seq((2L, 10L), (11L, 30L)).toDF("doc_a", "doc_b")
    val existing = Dedup.dedupClustersStar(oldPairs)
    val incr = Dedup.dedupClustersIncremental(existing, newPairs)
      .as[(Long, Long)].collect().toSet
    val batch = Dedup.dedupClustersStar(oldPairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toSet
    assert(incr == batch)
    assert(incr == Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L), (30L, 1L),
      (20L, 20L)))
  }

  test("self spans find internal loops; clean docs report nothing") {
    // doc 1 loops a 5-token block: with n=3 the second copy repeats 3
    // consecutive shingles at diag 5; doc 2 has no internal repeats
    val block = "aaa bbb ccc ddd eee"
    val docs = docsDF(1L -> s"$block $block", 2L -> "one two three four five six")
    val got = Dedup.selfSpans(docs, 3, 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
      r.getAs[Long]("rep_pos")) == (1L, 1L, 3L, 3L))
    // above the run length: nothing qualifies
    assert(Dedup.selfSpans(docs, 3, 4).isEmpty)
  }

  test("winnowing: coverage guarantee, compression, and identical-doc pairs") {
    // doc 2 embeds a 12-token verbatim slice of doc 1 (>= w+n-1 = 6 tokens
    // at n=3, w=4) — winnowing GUARANTEES at least one shared fingerprint
    val t = ('a' to 'z').map(c => s"$c$c$c")
    val doc1 = t.mkString(" ")
    val doc2 = (Seq("x1", "x2", "x3") ++ t.slice(8, 20) ++ Seq("y1", "y2")).mkString(" ")
    val pairs = Dedup.winnowingPairs(docsDF(1L -> doc1, 2L -> doc2), 3, 4, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // compression: the winnowed sample is well below the full shingle set
    val fp1 = Dedup.winnowingFingerprints(docsDF(1L -> doc1), 3, 4).count()
    val all1 = Dedup.posShingleTable(docsDF(1L -> doc1), 3).count()
    assert(fp1 < all1 * 3 / 5, s"$fp1 of $all1 shingles kept")
    // identical docs share their entire fingerprint set
    val twin = Dedup.winnowingPairs(docsDF(1L -> doc1, 2L -> doc1), 3, 4, 1L)
      .collect()
    assert(twin.length == 1 && twin.head.getLong(2) == fp1)
  }

  test("span coverage counts distinct covered positions per doc") {
    // doc1/doc2 share two runs (8 and 7 matches at n=3); doc3 copies doc2
    // exactly, so doc2's positions are covered via BOTH partners — the
    // distinct count must not double-bill them
    val t = ('a' to 'z').map(c => s"$c$c$c")
    val doc1 = t.mkString(" ")                                     // 24 positions
    val doc2 = (t.slice(0, 10) ++ Seq("zz") ++ t.slice(15, 24)).mkString(" ") // 18
    val cov = Dedup.spanCoverage(docsDF(1L -> doc1, 2L -> doc2, 3L -> doc2), 3, 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc1: runs cover pos 0..7 and 15..21 → 15 of 24
    assert(cov(1L) == (24L, 15L, math.floor(10000.0 * 15 / 24 + 0.5).toLong))
    // doc2: 15 positions via doc1 + all 18 via doc3 → distinct 18 of 18
    assert(cov(2L) == (18L, 18L, 10000L))
    assert(cov(3L) == (18L, 18L, 10000L))
    // raising minRun above every run length zeroes coverage but keeps rows
    val none = Dedup.spanCoverage(docsDF(1L -> doc1), 3, 1).collect()
    assert(none.length == 1 && none.head.getLong(2) == 0L)
  }

  test("incremental span probe equals batch spans restricted to new docs") {
    val t = ('a' to 'z').map(c => s"$c$c$c")
    val doc1 = t.mkString(" ")
    val doc2 = (t.slice(0, 10) ++ Seq("zz") ++ t.slice(15, 24)).mkString(" ")
    val all = docsDF(1L -> doc1, 2L -> doc2, 3L -> doc2)
    // existing corpus {1, 2} persisted as the span index; {3} arrives new
    val incr = Dedup.sharedSpansIncremental(
        Dedup.spanIndex(all.where(col("doc_id") < 3), 3),
        all.where(col("doc_id") === 3), 3, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val batchNew = Dedup.sharedSpans(all, 3, 1)
      .where(col("doc_b") === 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(incr == batchNew && incr.nonEmpty)
    // the old-old pair (1, 2) must NOT be recomputed by the probe
    assert(!incr.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("span removal cuts the later doc's copied tokens, keeps the first") {
    // same construction as the coverage spec: doc2 copies doc1's tokens
    // 0-9 and 15-23 around its own "zz"; doc3 copies doc2 exactly
    val t = ('a' to 'z').map(c => s"$c$c$c")
    val doc1 = t.mkString(" ")
    val doc2 = (t.slice(0, 10) ++ Seq("zz") ++ t.slice(15, 24)).mkString(" ")
    val rem = Dedup.removeSharedSpans(docsDF(1L -> doc1, 2L -> doc2, 3L -> doc2), 3, 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc1 is the first occurrence everywhere — untouched
    assert(rem(1L) == (doc1, 0L))
    // doc2: runs vs doc1 cut tokens 0..9 (8 shingles + n−1) and 11..19
    // (7 shingles + n−1); only its own "zz" survives. Its matches vs doc3
    // don't cut it — doc2 is the earlier side there.
    assert(rem(2L) == ("zz", 19L))
    // doc3 duplicates doc2 wholesale → loses every token
    assert(rem(3L) == ("", 20L))
  }

  test("cluster-safe split keeps every near-dup pair in one split") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 5000L)
    val clusters = Dedup.dedupClusters(pairs)
    val split = Mixing.withClusterSafeSplit(docs, clusters)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val prs = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(prs.nonEmpty, "corpus should contain organic near-dup pairs")
    prs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles splits")
    }
    // outside the pair graph the assignment equals the plain split
    val clustered = clusters.select("id").as[Long].collect().toSet
    val plain = Mixing.withSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    split.keys.filterNot(clustered).foreach { id =>
      assert(split(id) == plain(id))
    }
  }

  test("pq ANN: ADC shortlist + exact rerank keeps recall; cosines are exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.pqTopK(emb, 10, 5).collect()
    val pqTop = pq.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(pqTop.keySet == exact.keySet)
    // every query returns exactly k ranked neighbors
    assert(pq.length == 50)
    // aggregate recall@5: the ADC shortlist must keep most true neighbors
    val hits = exact.keys.toSeq.map(q => pqTop(q).intersect(exact(q)).size).sum
    println(s"pq recall@5: $hits/50")
    assert(hits >= 30, s"pq shortlist recall collapsed: $hits/50")
    // returned cosines are EXACT (rerank over full vectors), so every
    // returned pair's cosine must match brute force bit for bit
    val truth = Similarity.bruteForceTopK(emb, 10, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    pq.foreach { r =>
      assert(truth((r.getLong(0), r.getLong(1))) == r.getLong(3))
    }
    // a corpus-sized shortlist degenerates to exact brute force
    val full = Similarity.pqTopK(emb, 10, 5, shortlist = 100000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(full == exact)
  }

  test("ann eval: recall and reciprocal rank, zero-hit and missing queries") {
    val truth = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (1L, 7L, 1L), (1L, 8L, 2L), (1L, 9L, 3L),
      (2L, 4L, 1L), (2L, 5L, 2L), (2L, 6L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    // q0: hits 2 and 3 at pred ranks 1 and 3; q1: no overlap at all;
    // q2: absent from pred entirely (the index returned nothing)
    val pred = Seq((0L, 2L, 1L), (0L, 9L, 2L), (0L, 3L, 3L),
      (1L, 4L, 1L), (1L, 5L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.annEval(truth, pred, 3).orderBy("query_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 6667L, 10000L),
      (1L, 0L, 0L, 0L),
      (2L, 0L, 0L, 0L)))
    // a perfect index scores 10000/10000 on every query
    val perfect = Similarity.annEval(truth, truth, 3)
      .select("recall_x10000", "rr_x10000").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(perfect == Seq((10000L, 10000L)))
  }

  test("ivf trained on a sample still ranks candidates by exact cosine") {
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // quantizer quality changes with the sample; candidate cosines must not
    val sampled = Similarity.ivfTopK(emb, 5, 5, trainFraction = 0.5).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf.contains(key) && bf(key) == r.getLong(3))
    }
  }

  test("lshCandidateEval: exact copies land in the top band with full recall") {
    val t = "one two three four five six seven eight nine ten eleven twelve"
    val docs = docsDF(1L -> t, 2L -> t, // J = 1.0 — every band must catch it
      3L -> "totally unrelated words that share no trigram with anything here",
      4L -> "some other filler text that is not a duplicate of any document")
    val got = Dedup.lshCandidateEval(docs, n = 3, k = 16, bands = 4,
        minJaccardX10000 = 3000)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // exactly one true pair (1,2) at J=1.0 → band 10, caught (identical
    // signatures collide in every band)
    assert(got == Seq((10L, 1L, 1L, 1000000L)))
  }

  test("lshCandidateEval: n_caught bounded by n_true, bands within range") {
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.lshCandidateEval(docs, minJaccardX10000 = 3000)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (band, nTrue, nCaught, ppm) =>
      assert(band >= 3 && band <= 10)
      assert(nCaught >= 0 && nCaught <= nTrue)
      assert(ppm == math.floor(1000000.0 * nCaught / nTrue + 0.5).toLong)
    }
  }

  test("contaminationBySource flags the leaking source, leaves clean sources at zero") {
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    def src(s: String, rows: (Long, String)*) =
      rows.toDF("doc_id", "text").withColumn("source", lit(s))
    val train = src("mirror", 1L -> leaked, 2L -> leaked)
      .unionByName(src("clean",
        3L -> "completely different training content with its own vocabulary here today",
        4L -> "another clean document that shares nothing with the evaluation set"))
    val eval = Seq(100L -> leaked).toDF("doc_id", "text")
    val got = Decontaminate.contaminationBySource(train, eval, n = 8,
        minCommon = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val Seq(clean, mirror) = got
    assert(clean == (("clean", 2L, 0L, 0L, 0L, 0L)))
    assert(mirror._1 == "mirror" && mirror._2 == 2L &&
      mirror._3 == 2L && mirror._4 == 1L) // both mirror docs flagged, 1 eval doc
    assert(mirror._5 > 0L && mirror._6 == 1000000L) // all of the source leaked
  }

  test("lengthDrift: exact nearest-rank deciles, -1 for a vanished source") {
    // source "s": lengths 1..10 in v1 → decile d picks rank ⌈d·10/10⌉ = d,
    // so q_old = length d. v2 doubles every doc's text (+1 separator char:
    // 2·len+1). Source "gone" exists only in v1 → v2 side reports -1.
    def mk(src: String, rows: (Long, String)*) =
      rows.toDF("doc_id", "text").withColumn("source", lit(src))
    val v1docs = (1 to 10).map(i => (i.toLong, "x" * i))
    val old = mk("s", v1docs: _*).unionByName(mk("gone", 100L -> "zzz"))
    val nw = mk("s", v1docs.map { case (id, t) => (id, t + " " + t) }: _*)
    val got = Versioning.lengthDrift(old, nw)
      .orderBy("source", "decile")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val gone = got.filter(_._1 == "gone")
    assert(gone.map(_._2) == (1L to 9L) &&
      gone.forall(r => r._3 == 3L && r._4 == -1L && r._5 == -4L))
    val s = got.filter(_._1 == "s")
    assert(s.map(_._2) == (1L to 9L))
    s.foreach { case (_, d, qOld, qNew, shift) =>
      assert(qOld == d)                 // rank d of lengths 1..10
      assert(qNew == 2 * d + 1)         // doubled text + 1 separator
      assert(shift == qNew - qOld)
    }
  }

  test("canaryScan counts exactly the planted sentinel hits per source") {
    val docs = Seq(
      (1L, "clean text", "a"),
      (2L, "has GUID-X inside", "a"),
      (3L, "GUID-X and also GUID-Y", "b"),   // one doc, both canaries
      (4L, "GUID-X again GUID-X twice", "b") // doc counted once per canary
    ).toDF("doc_id", "text", "source")
    val got = Decontaminate.canaryScan(docs, Seq("GUID-X", "GUID-Y"))
      .orderBy("source", "canary")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "GUID-X", 1L), ("b", "GUID-X", 2L),
      ("b", "GUID-Y", 1L)))
  }

  test("ngramDiversity: a templated source scores below a varied one") {
    val varied = (0 until 8).map(i =>
      (i.toLong, s"unique sentence number $i with words w${i}a w${i}b w${i}c w${i}d"))
    val templated = (10 until 18).map(i =>
      (i.toLong, s"the same boilerplate header always repeats here item $i"))
    val docs = varied.toDF("doc_id", "text").withColumn("source", lit("varied"))
      .unionByName(templated.toDF("doc_id", "text")
        .withColumn("source", lit("templated")))
    val got = TextAnalysis.ngramDiversity(docs, n = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the templated source repeats its 3-grams 8×; the varied one never does
    assert(got("templated")._4 < got("varied")._4)
    got.values.foreach { case (_, distinct, total, ppm) =>
      assert(distinct <= total)
      assert(ppm == math.floor(1000000.0 * distinct / math.max(total, 1L) + 0.5).toLong)
    }
  }

  test("tokenGini: degenerate source scores 0, uniform source 1 - 1/k") {
    val docs = Seq(
      (1L, "same same same same same same same same", "degen"),
      (2L, "aa bb cc dd aa bb cc dd", "uniform"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.tokenGini(docs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("degen") == (("degen", 1L, 8L, 0L)))
    // 4 types × 2 each over 8 tokens: 1 − 4·4/64 = 0.75
    assert(got("uniform") == (("uniform", 4L, 8L, 750000L)))
  }

  test("zipfRanks: power-of-two ranks, rank-1 ratio 1e6, coverage cumulative") {
    // counts: alpha 8, beta 4, gamma 2, delta 1 — a perfect Zipf-by-octave
    val text = (Seq.fill(8)("alpha") ++ Seq.fill(4)("beta") ++
      Seq.fill(2)("gamma") ++ Seq("delta")).mkString(" ")
    val got = TextAnalysis.zipfRanks(docsDF(1L -> text), maxExp = 2)
      .orderBy("rank").as[(Long, String, Long, Long, Long)].collect().toSeq
    // coverage over 15 total occurrences: 8/15, 12/15, 15/15
    assert(got == Seq((1L, "alpha", 8L, 1000000L, 533333L),
      (2L, "beta", 4L, 500000L, 800000L),
      (4L, "delta", 1L, 125000L, 1000000L)))
  }

  test("wordpieceVocab counts substring occurrences weighted by word frequency") {
    // corpus: "abab" ×2, "ab" ×1 ⇒ cnt(a)=cnt(ab)=cnt(b)=2·2+1=5,
    // cnt(aba)=cnt(bab)=cnt(ba)=cnt(abab)=2
    val got = TextAnalysis.wordpieceVocab(
        docsDF(1L -> "abab ab", 2L -> "abab"), k = 3, maxPieceLen = 4)
      .as[(String, Long)].collect().toSeq
    // top-3 with the (cnt DESC, term) tie-break
    assert(got == Seq(("a", 5L), ("ab", 5L), ("b", 5L)))
  }

  test("wordpieceSegmentWords: greedy longest match, unknown chars bill 1 each") {
    val vocab = Seq("ab", "abc", "d").toDF("term")
      .withColumn("cnt", lit(1L))
    val words = Seq("abcd", "abe", "zz", "d").toDF("w")
    val got = TextAnalysis.wordpieceSegmentWords(words, vocab, maxPieceLen = 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "abcd" -> ((2L, 0L)), // abc + d (longest-first beats ab+?)
      "abe" -> ((2L, 1L)),  // ab + unknown e
      "zz" -> ((2L, 2L)),   // two unknown chars
      "d" -> ((1L, 0L))))
  }

  test("wordpieceSegmentCounts bills per doc, wordless docs report zeros") {
    val vocab = Seq("ab", "abc", "d").toDF("term")
      .withColumn("cnt", lit(1L))
    val docs = docsDF(1L -> "abcd abe", 2L -> "zz", 3L -> "")
    val got = TextAnalysis.wordpieceSegmentCounts(docs, vocab, maxPieceLen = 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ((4L, 1L)), // abcd = abc+d; abe = ab + unknown e
      2L -> ((2L, 2L)), // two unknown chars
      3L -> ((0L, 0L)))) // no words — still reported
  }

  test("wordpieceFertility bills every word and stays >= 1 piece per word") {
    val docs = Seq((1L, "abab ab cd", "s1"), (2L, "abab zz", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.wordpieceFertility(docs, k = 50, maxPieceLen = 4)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1")._2 == 3L && got("s2")._2 == 2L) // total_words complete
    got.values.foreach { case (_, words, pieces, unk, f, oov) =>
      assert(pieces >= words)           // ≥ 1 piece per word
      assert(unk >= 0L && unk <= pieces)
      assert(f == math.floor(10000.0 * pieces / words).toLong)
      assert(oov == math.floor(1000000.0 * unk / math.max(pieces, 1L)).toLong)
    }
  }

  test("viterbiSegmentWords finds the optimal split greedy strands") {
    // vocab {ab, a, bcd} on "abcd": greedy longest-match commits to "ab"
    // and strands "cd" in unknowns (3 pieces, 2 unknown); the DP finds
    // a + bcd (2 pieces, 0 unknown)
    val terms = Seq("ab", "a", "bcd")
    val words = Seq("abcd", "zz", "a").toDF("w")
    val viterbi = TextAnalysis.viterbiSegmentWords(words, terms)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viterbi == Map(
      "abcd" -> ((2L, 0L)), "zz" -> ((2L, 2L)), "a" -> ((1L, 0L))))
    val vocabDf = terms.toDF("term").withColumn("cnt", lit(1L))
    val greedy = TextAnalysis.wordpieceSegmentWords(words, vocabDf, 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(greedy("abcd") == ((3L, 2L))) // the strict gap the DP closes
  }

  test("viterbi pieces <= greedy pieces for every distinct corpus word") {
    val docs = docsDF(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "the cat and the dog and the fox again")
    val vocabDf = TextAnalysis.wordpieceVocab(docs, k = 25, maxPieceLen = 4)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w") =!= "").distinct()
    val v = TextAnalysis.viterbiSegmentWords(words,
        TextAnalysis.collectVocabTerms(vocabDf))
      .withColumnRenamed("pieces", "vp").withColumnRenamed("unknowns", "vu")
    val g = TextAnalysis.wordpieceSegmentWords(words, vocabDf, 4)
    val joined = v.join(g, Seq("w"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (w, vp, vu, gp, _) =>
      assert(vp <= gp, s"viterbi must not bill more pieces than greedy on $w")
      assert(vp >= 1L && vu >= 0L && vu <= vp)
    }
  }

  test("unigramSegmentCounts bills per doc; wordless docs report zeros") {
    val docs = docsDF(1L -> "abcd abe", 2L -> "zz", 3L -> "")
    val got = TextAnalysis.unigramSegmentCounts(docs,
        Seq("ab", "abc", "d", "a", "be"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // abcd = abc+d (2,0); abe = a+be (2,0) — greedy would take ab + unk e
    assert(got == Map(1L -> ((4L, 0L)), 2L -> ((2L, 2L)), 3L -> ((0L, 0L))))
  }

  test("fuzzyNameMatch: blocked pairs under the edit gate, cross-block never compared") {
    val ents = Seq("red widget", "rad widget", "red widget", "blue bolt",
      "blu bolt", "red gear").toDF("p_name")
    val got = Dedup.fuzzyNameMatch(ents, "p_name", maxDist = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // ("red widget" ×2) matches "rad widget" at distance 1 with entity
    // counts attached; the bolts match; "red gear" is alone in its block;
    // "red widget" vs "red gear" (distance 4 anyway) is never compared
    assert(got == Set(
      ("rad widget", "red widget", 1L, 1L, 2L),
      ("blu bolt", "blue bolt", 1L, 1L, 1L)))
  }

  test("dataQuality audit: row, uniqueness, referential rules in one report") {
    import DataQuality._
    val df = Seq((1L, 10.0, "a"), (2L, -5.0, "a"), (2L, 7.0, null))
      .toDF("id", "amt", "tag")
    val ref = Seq("a", "b").toDF("k")
    val rep = audit("t", df, Seq(
        RowRule("amt_positive", col("amt") > 0),
        RowRule("tag_known", col("tag").isin("a", "b")), // NULL = violation
        UniqueRule("pk_id", Seq("id")),
        RefRule("fk_tag", "tag", ref, "k")))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(rep == Map(
      "amt_positive" -> ((1L, 3L, false)),
      "tag_known" -> ((1L, 3L, false)), // the NULL tag is unverifiable
      "pk_id" -> ((1L, 3L, false)),     // id=2 twice
      "fk_tag" -> ((0L, 3L, true))))    // non-null tags all resolve
  }

  test("gopher rules gate on each signal independently; c4 keeps only " +
    "terminal-punctuation lines on passing pages") {
    import WebCuration._
    val prose = ("the data pipeline reads the table and writes the result " +
      "to the store with care and then checks that every value is correct " +
      "and that every row is present and that nothing else happened here " +
      "so the process can be trusted to have finished well today").trim
    val docs = Seq(
      (1L, prose),                               // 48 words — fails R1 (<50)
      (2L, prose + " finally done now it is"),   // 53 words — passes all
      (3L, ("zzzzzzzzzzzz " * 55).trim), // 55 12-char words: fails R2 (mwl 12)
      (4L, "short words only here now")          // fails R1 and R7
    ).toDF("doc_id", "text")
    val g = gopherQualityReport(docs)
      .select("doc_id", "pass", "r_word_count", "r_mean_word_len")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(g(1L) == ((false, false, true)))
    assert(g(2L) == ((true, true, true)))
    assert(g(3L)._1 == false && g(3L)._3 == false)
    assert(g(4L) == ((false, false, true)))

    val pages = Seq(
      (1L, "A good first sentence here today.\n- a bullet\n" +
        "Another proper closing sentence arrives now!\nShort one.\n" +
        "Is this a real question line?"),
      (2L, "No terminal punctuation at all in this page"),
      (3L, "Fine sentence number one here.\nFine sentence number two here." +
        "\nlorem ipsum strikes { again.")
    ).toDF("doc_id", "text")
    val c = c4Filter(pages)
      .select("doc_id", "n_kept_lines", "n_sentences", "pass", "clean_text")
      .as[(Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    // page 1: 4 sentence marks pass the gate; the bullet line (no terminal
    // punct) and "Short one." (<5 words) are dropped from the clean text
    assert(c(1L)._3 == 4L && c(1L)._4)
    assert(c(1L)._2 == 3L)
    assert(c(1L)._5 == "A good first sentence here today.\n" +
      "Another proper closing sentence arrives now!\n" +
      "Is this a real question line?")
    assert(!c(2L)._4 && c(2L)._2 == 0L && c(2L)._5 == "")
    assert(!c(3L)._4 && c(3L)._5 == "") // lorem + brace kill the page

    // per-source threshold tuning: the 48-word doc that fails R1 under the
    // paper default passes once minWords is lowered; the default-threshold
    // report stays bit-identical to the no-arg call (paper-exact defaults)
    val tuned = gopherQualityReport(docs, CurationThresholds(minWords = 40L))
      .select("doc_id", "pass").as[(Long, Boolean)].collect().toMap
    assert(tuned(1L))
    assert(gopherQualityReport(docs, CurationThresholds()).collect().toSeq ==
      gopherQualityReport(docs).collect().toSeq)
    val cTuned = c4Filter(pages, CurationThresholds(c4MinLineWords = 2))
      .select("doc_id", "n_kept_lines").as[(Long, Long)].collect().toMap
    assert(cTuned(1L) == 4L) // "Short one." (2 words) now survives
  }

  test("gopher repetition half: dup lines/paragraphs, top n-gram mass, " +
    "positional dup-n-gram union — per-rule crafted values") {
    import WebCuration._
    val docs = Seq(
      (1L, "aa bb cc\nxx yy zz\nxx yy zz"),
      (2L, "First paragraph here once.\n\nSecond paragraph body.\n\n" +
        "Second paragraph body."),
      (3L, "a b c d e a b c d e x"),
      (4L, "p q r p q r p q s")
    ).toDF("doc_id", "text")
    val r = gopherRepetitionReport(docs).collect()
      .map(x => x.getLong(0) -> x).toMap

    val d1 = r(1L) // one duplicated 8-char line of three
    assert(d1.getAs[Long]("dup_line_frac_x10000") == 3333L)
    assert(d1.getAs[Long]("dup_line_char_frac_x10000") == 3333L)
    assert(!d1.getAs[Boolean]("r_dup_lines"))
    assert(!d1.getAs[Boolean]("r_dup_line_chars"))
    assert(d1.getAs[Long]("dup_para_frac_x10000") == 0L) // single paragraph
    // top bigram ties at 2 ('xx yy', 'yy zz'); lexicographic min 'xx yy'
    // wins either way: mass 2×4 of 18 token chars
    assert(d1.getAs[Long]("top2_char_frac_x10000") == 4444L)
    assert(!d1.getAs[Boolean]("r_top2"))
    assert(d1.getAs[Long]("dup5_char_frac_x10000") == 0L)

    val d2 = r(2L) // one duplicated 22-char paragraph of three (chars 70)
    assert(d2.getAs[Long]("dup_para_frac_x10000") == 3333L)
    assert(d2.getAs[Long]("dup_para_char_frac_x10000") == 3143L)
    assert(!d2.getAs[Boolean]("r_dup_paras"))
    assert(!d2.getAs[Boolean]("r_dup_para_chars"))

    val d3 = r(3L)
    // 'a b c d e' occurs at positions 0 and 5: the positional UNION covers
    // 10 of 11 single-char tokens (9091), never 2×5 summed occurrences
    assert(d3.getAs[Long]("dup5_char_frac_x10000") == 9091L)
    assert(!d3.getAs[Boolean]("r_dup5"))
    assert(d3.getAs[Long]("dup6_char_frac_x10000") == 0L) // 6-grams all distinct
    assert(d3.getAs[Boolean]("r_dup6"))

    val d4 = r(4L)
    // three trigrams tie at 2 occurrences; codepoint-min 'p q r' wins:
    // mass 2×3 of 9 token chars
    assert(d4.getAs[Long]("top3_char_frac_x10000") == 6667L)
    assert(!d4.getAs[Boolean]("r_top3"))

    // funnel composition: a doc failing ONLY repetition is out of n_gopher
    val rep = ("one two three four five six seven eight nine ten " * 6).trim +
      " the data is of value and that will be with it to have the end."
    val funnelDocs = Seq((1L, "s0", rep)).toDF("doc_id", "source", "text")
    val funnel = curationFunnel(funnelDocs).collect().head
    assert(gopherQualityReport(funnelDocs).collect().head
      .getAs[Boolean]("pass"), "form half should pass")
    assert(!gopherRepetitionReport(funnelDocs).collect().head
      .getAs[Boolean]("pass"), "repetition half should fail")
    assert(funnel.getAs[Long]("n_raw") == 1L && funnel.getAs[Long]("n_gopher") == 0L)
  }

  test("URL canonicalization: case, default ports, tracking params, " +
    "param order, trailing slash, fragment — and URL-level dedup") {
    import WebCuration._
    val urls = Seq(
      (1L, "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
      (2L, "http://ex.com:80/a/b?a=1&b=2"),
      (3L, "http://ex.com:8080/a"),
      (4L, "https://ex.com/path?fbclid=abc&gclid=1&ref=rss"),
      (5L, "http://EX.com/A/B")
    ).toDF("doc_id", "url")
    val canon = urls.select($"doc_id", canonicalizeUrl($"url").as("c"))
      .as[(Long, String)].collect().toMap
    assert(canon(1L) == "https://www.ex.com/a/b?a=1&b=2")
    assert(canon(2L) == "http://ex.com/a/b?a=1&b=2")
    assert(canon(3L) == "http://ex.com:8080/a") // non-default port kept
    assert(canon(4L) == "https://ex.com/path")  // all params were tracking
    assert(canon(5L) == "http://ex.com/A/B")    // path case preserved

    // scheme-less / malformed URLs pass through unchanged — they must NOT
    // all collapse to the constant '://' and merge under urlDedup
    val weird = Seq((6L, "www.a.com/x"), (7L, "mailto:a@b"), (8L, "/rel/p"))
      .toDF("doc_id", "url")
      .select($"doc_id", canonicalizeUrl($"url").as("c"))
      .as[(Long, String)].collect().toMap
    assert(weird(6L) == "www.a.com/x" && weird(7L) == "mailto:a@b" &&
      weird(8L) == "/rel/p")

    // dedup: 10 and 11 canonicalize identically (case + default port +
    // trailing slash + fragment + param order); 12 stands alone
    val dd = urlDedup(Seq(
      (10L, "HTTP://Ex.Com/a/?b=2&a=1#x"),
      (11L, "http://ex.com:80/a?a=1&b=2"),
      (12L, "http://ex.com/other")).toDF("doc_id", "url"))
      .select($"doc_id", $"canonical_id", $"n_copies")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(dd(10L) == (10L, 2L) && dd(11L) == (10L, 2L))
    assert(dd(12L) == (12L, 1L))
  }

  test("updateBm25Index equals the full rebuild at the served surface; " +
    "a term crossing the df cap on update evicts with its TRUE merged df") {
    import graft.operators.Similarity
    def tmpd(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // base: 6 docs share 'hot' (df 6 <= cap 8, postings kept); the batch
    // adds 4 more -> merged df 10 > 8, so the SERVED index must EVICT it
    // exactly as a full rebuild would, while its true count survives in
    // the aggregated termdf
    val base = (0L until 6L).map(i => (i, s"hot base$i keep"))
      .toDF("doc_id", "text")
    val batch = (6L until 10L).map(i => (i, s"hot fresh$i keep"))
      .toDF("doc_id", "text")
    val incrDir = tmpd("bm25-incr")
    val fullDir = tmpd("bm25-full")
    Similarity.buildBm25Index(base, incrDir, maxDf = 8)
    assert(Bm25Views.servedPostings(spark, incrDir)
      .where($"t" === "hot").count() == 6, "base index must carry 'hot'")
    Similarity.updateBm25Index(spark, incrDir, batch)
    Similarity.buildBm25Index(base.unionByName(batch), fullDir, maxDf = 8)
    // segment boundaries are LAYOUT (incr = base + s00001, full = base);
    // the SERVED views — cap-evicted postings, live doclen, aggregated
    // termdf and stats — are what must match the rebuild
    Bm25Views.assertServedEqual(spark, incrDir, fullDir)
    assert(Bm25Views.servedPostings(spark, incrDir)
      .where($"t" === "hot").count() == 0, "'hot' must evict at df 10 > 8")
    assert(Bm25Views.termdfAgg(spark, incrDir).where($"t" === "hot")
      .select($"df").as[Long].head() == 10L, "true df must survive eviction")
  }

  test("imagePHash/phashPairs: identical bitmaps pair at Hamming 0 across " +
    "containers (PNG vs JPEG); an unrelated bitmap does not pair; the " +
    "fingerprint reads real body bytes (truncated payloads drop)") {
    import graft.operators.Multimodal
    val w = 20; val h = 12
    def bmp(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f(i % w, i / w).toByte)
    val gradient = bmp((x, y) => (x * 11 + y * 5) % 256)
    val noise = bmp((x, y) => (x * 97 + y * 89 + (x * y) % 13 * 71) % 256)
    val media = Seq(
      Schemas.MediaRecord(1L, "image",
        Multimodal.pngPayload(w, h, gradient), "image/png", 0L),
      Schemas.MediaRecord(2L, "image",
        Multimodal.jpegPayload(w, h, gradient), "image/jpeg", 0L),
      Schemas.MediaRecord(3L, "image",
        Multimodal.pngPayload(w, h, noise), "image/png", 0L),
      // truncated: header claims w*h pixels the payload doesn't carry
      Schemas.MediaRecord(4L, "image",
        Multimodal.pngPayload(w, h, gradient.take(5)), "image/png", 0L)
    ).toDS()
    val bands = Multimodal.imagePHash(spark, media)
    assert(bands.select($"media_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "truncated payload must drop, parseable ones stay")
    val bySrc = bands.collect().map(r =>
      r.getAs[Long]("media_id") ->
        (r.getAs[Long]("b0"), r.getAs[Long]("b1"),
          r.getAs[Long]("b2"), r.getAs[Long]("b3"))).toMap
    assert(bySrc(1L) == bySrc(2L),
      "same bitmap must hash identically through PNG and JPEG containers")
    assert(bySrc(1L) != bySrc(3L), "unrelated bitmaps must differ")
    val pairs = Multimodal.phashPairs(bands, maxHamming = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)), s"exact dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image paired: $pairs")
    // the multi-index volume knob: an exact dup shares all 4 bands, so it
    // survives the strictest candidate gate
    assert(Multimodal.phashPairs(bands, maxHamming = 6, minBandMatches = 4)
      .as[(Long, Long, Long)].collect().toSet.contains((1L, 2L, 0L)))
  }

  test("phashPairsIncremental equals the batch pairs restricted to " +
    "new-member pairs; base-base pairs never re-probe") {
    import graft.operators.Multimodal
    val bands = Multimodal.imagePHash(spark,
      Multimodal.phashImageTable(spark, Tables.documents(spark, sfDir)))
      .localCheckpoint()
    val base = bands.where($"media_id" % 4 =!= 3)
    val fresh = bands.where($"media_id" % 4 === 3)
    val incr = Multimodal.phashPairsIncremental(base, fresh)
      .as[(Long, Long, Long)].collect().toSet
    val batch = Multimodal.phashPairs(bands)
      .as[(Long, Long, Long)].collect().toSet
    val wantNew = batch.filter(p => p._1 % 4 == 3 || p._2 % 4 == 3)
    assert(incr == wantNew && incr.nonEmpty)
    assert(incr.forall(p => p._1 % 4 == 3 || p._2 % 4 == 3))
    // the multi-index lever (minBandMatches = 2, the 10^5..10^8-image
    // default per minBandMatchesFor) preserves recall on the planted
    // Hamming <= 6 families: every true pair shares >= 2 bands, so the
    // k=2 candidate gate returns the identical pair set — batch and
    // incremental both
    assert(Multimodal.phashPairs(bands, maxHamming = 6, minBandMatches = 2)
      .as[(Long, Long, Long)].collect().toSet == batch,
      "k=2 candidate gate lost a true pair (batch)")
    assert(Multimodal.phashPairsIncremental(base, fresh, minBandMatches = 2)
      .as[(Long, Long, Long)].collect().toSet == incr,
      "k=2 candidate gate lost a true pair (incremental)")
    // exact-fingerprint pre-collapse (the sf10-syn scale path): star
    // clustering over rep-pairs ∪ member-edges assigns every image the
    // same canonical as clustering over the full pair graph — identical
    // fingerprints are Hamming-0 pairs, cross-group near-dups are
    // represented by their reps' pair
    val fullClusters = graft.operators.Dedup
      .dedupClustersStar(Multimodal.phashPairs(bands), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val collapsedClusters = graft.operators.Dedup
      .dedupClustersStar(Multimodal.phashCollapsedEdges(bands),
        "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(collapsedClusters == fullClusters,
      "pre-collapsed edges changed the cluster assignment")
  }

  test("removeFromAnnIndex: coarse tier equals a survivor rebuild bit for " +
    "bit; surviving codes/vectors keep their rows; the codebook is frozen; " +
    "cells emptied by the delete vanish") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    def tmpd(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val delDir = tmpd("graft-anndel-")
    val survDir = tmpd("graft-annsurv-")
    Similarity.buildAnnIndex(emb, delDir)
    val gone = emb.where($"vec_id" % 7 === 3 && $"vec_id" >= 10)
      .select($"vec_id")
    val goneIds = gone.as[Long].collect().toSet
    val preCodes = spark.read.parquet(s"$delDir/codes").drop("seg")
      .collect().map(_.toSeq).toSet
    val preBook = spark.read.parquet(s"$delDir/pq_centroids")
      .collect().map(_.toSeq).toSet
    Similarity.removeFromAnnIndex(spark, delDir, gone)
    Similarity.buildAnnIndex(emb.join(gone, Seq("vec_id"), "left_anti"), survDir)
    // the delete is a tombstone tier — equality holds at the LIVE surface
    // the probe reads (segment union minus tombstones; sums aggregated)
    def live(dir: String, c: String) = {
      val df = spark.read.parquet(s"$dir/$c").drop("seg").drop("pbucket")
      if (new java.io.File(s"$dir/deleted").exists())
        df.join(spark.read.parquet(s"$dir/deleted").drop("seg")
          .select($"vec_id").distinct(), Seq("vec_id"), "left_anti")
      else df
    }
    def annSumsAgg(dir: String) = spark.read.parquet(s"$dir/coarse_sums")
      .groupBy($"cell", $"d").agg(sum($"sd").as("sd"), sum($"cnt").as("cnt"))
      .where($"cnt" > 0).collect().map(_.toSeq).toSet
    Seq("cells", "vectors").foreach { p =>
      val got = live(delDir, p).collect().map(_.toSeq).toSet
      val want = live(survDir, p).collect().map(_.toSeq).toSet
      assert(got == want, s"$p diverged from the survivor rebuild")
    }
    assert(annSumsAgg(delDir) == annSumsAgg(survDir),
      "aggregated coarse sums diverged from the survivor rebuild")
    assert(spark.read.parquet(s"$delDir/coarse_centroids")
      .collect().map(_.toSeq).toSet ==
      spark.read.parquet(s"$survDir/coarse_centroids")
        .collect().map(_.toSeq).toSet,
      "coarse centroids diverged from the survivor rebuild")
    // codes: exactly the pre-delete rows minus the deleted ids (frozen
    // training — a survivor rebuild would re-train, so compare pre-delete)
    val postCodes = live(delDir, "codes").collect().map(_.toSeq).toSet
    assert(postCodes == preCodes.filterNot(r =>
      goneIds(r.head.asInstanceOf[Long])))
    assert(spark.read.parquet(s"$delDir/pq_centroids")
      .collect().map(_.toSeq).toSet == preBook, "codebook moved on delete")
    // no residue of deleted ids anywhere the probe reads
    assert(live(delDir, "cells")
      .where($"vec_id".isin(goneIds.toSeq: _*)).isEmpty)
  }

  test("removeFromBm25Index equals the survivor rebuild when nothing is " +
    "evicted; an already-evicted term stays evicted and its termdf keeps " +
    "the documented upper bound") {
    import graft.operators.Similarity
    def tmpd(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // exactly ONE ubiquitous term ('hot', df 10) so the eviction case is
    // isolated; every other term is per-doc unique
    val docs = (0L until 10L)
      .map(i => (i, s"hot shared$i word$i")).toDF("doc_id", "text")
    val gone = Seq(1L, 4L, 7L).toDF("doc_id")
    val survivors = docs.where(!$"doc_id".isin(1L, 4L, 7L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // CASE 1: cap never binds -> delete == survivor rebuild at the whole
    // served surface (tombstone-masked postings/doclen, aggregated
    // termdf carrying the exact decrements, aggregated stats)
    val d1 = tmpd("bm25del-a"); val r1 = tmpd("bm25del-b")
    Similarity.buildBm25Index(docs, d1, maxDf = 100)
    Similarity.removeFromBm25Index(spark, d1, gone)
    Similarity.buildBm25Index(survivors, r1, maxDf = 100)
    Bm25Views.assertServedEqual(spark, d1, r1)
    // CASE 2: 'hot' (df 10) evicted at cap 8; deleting 3 docs drops its
    // TRUE df to 7 <= 8, but the evicted postings are unrecoverable
    // index-side — it must STAY evicted, aggregated termdf keeping 10
    // (upper bound); a survivor rebuild would re-admit it (the documented
    // rebuild-cadence asymmetry)
    val d2 = tmpd("bm25del-c")
    Similarity.buildBm25Index(docs, d2, maxDf = 8)
    Similarity.removeFromBm25Index(spark, d2, gone)
    assert(Bm25Views.servedPostings(spark, d2)
      .where($"t" === "hot").isEmpty, "'hot' must stay evicted")
    assert(Bm25Views.termdfAgg(spark, d2).where($"t" === "hot")
      .select($"df").as[Long].head() == 10L,
      "evicted term's termdf must keep the pre-delete upper bound")
    // non-evicted terms are still exactly the survivor rebuild
    val r2 = tmpd("bm25del-d")
    Similarity.buildBm25Index(survivors, r2, maxDf = 8)
    assert(rows(Bm25Views.liveDoclen(spark, d2)) ==
      rows(Bm25Views.liveDoclen(spark, r2)))
    assert(rows(Bm25Views.servedPostings(spark, d2)) ==
      rows(Bm25Views.servedPostings(spark, r2))
        .filterNot(_(1) == "hot"))
  }

  test("wiki-link edge extraction: piped labels resolve to the target, " +
    "non-Doc and malformed targets drop, self-links drop") {
    val docs = Seq(
      (1L, "See [[Doc-2|the second]] and [[Doc-3]] here"),
      (2L, "[[Category:Stuff]] then [[Doc-1]] and [[Doc-2]] self"),
      (3L, "[[Doc-x]] broken [[Doc-04]] ok [[notalink]] [[Doc-1|a|b]]"),
      (4L, "no links at all")
    ).toDF("doc_id", "text")
    val got = graft.operators.ArticleOps.wikiLinkEdges(docs, col("text"))
      .as[(Long, Long)].collect().toSet
    // doc 2's [[Doc-2]] is a self-link (dropped); [[Category:...]] is not a
    // Doc target; [[Doc-x]] unparsable; [[Doc-1|a|b]]'s first pipe wins the
    // target split, so it still resolves to Doc-1
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 1L), (3L, 4L), (3L, 1L)))
  }

  test("URL filter: domain verdict wins over keyword, keyword is " +
    "case-insensitive over path+query only, ports strip from the domain, " +
    "malformed URLs never match a blocklist") {
    import WebCuration._
    val blocked = Seq("bad.net").toDF("domain")
    val got = urlFilter(Seq(
        (1L, "http://x.bad.net/clean?id=1"),          // domain
        (2L, "http://sub.bad.NET:8080/page"),          // domain, port+case
        (3L, "http://ok.org/go?q=CASINO-night"),       // keyword, case
        (4L, "http://x.bad.net/win?q=casino"),         // both -> domain wins
        (5L, "http://casino.ok.org/clean?id=5"),       // keyword in HOST only: clean
        (6L, "not a url at all casino"),               // malformed: no scheme
        (7L, "http://fine.com/a?id=7")                 // clean
      ).toDF("doc_id", "url"), blocked, Seq("casino"))
      .select($"doc_id", $"domain", coalesce($"block_reason", lit("-")))
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) == ("bad.net", "domain"))
    assert(got(2L) == ("bad.net", "domain"))
    assert(got(3L) == ("ok.org", "keyword"))
    assert(got(4L) == ("bad.net", "domain"))
    assert(got(5L) == ("ok.org", "-"), "host text must not trip the PATH keyword gate")
    assert(got(6L) == ("", "-"), "malformed URL must not match any blocklist")
    assert(got(7L) == ("fine.com", "-"))
  }

  test("template line strip: per-source df bar (inclusive), every " +
    "occurrence removed, all-boiler doc kept empty, other source spared") {
    import WebCuration._
    val boiler = "nav home about contact terms"
    // srcA: 10 docs, the 20% bar = exactly 2 docs — d1 + d2 carry the
    // header, so df sits ON the boundary and must strip (>=, not >)
    val a = Seq(
      (1L, "srcA", s"$boiler alpha beta gamma delta epsilon"),
      (2L, "srcA", s"$boiler $boiler") // all boilerplate, twice in-doc
    ) ++ (3L to 10L).map(i =>
      (i, "srcA", s"u${i}a u${i}b u${i}c u${i}d u${i}e"))
    // srcB: 6 docs, the SAME header in only one (df 1 < 2) — survives
    val b = Seq((11L, "srcB", s"$boiler bee one two three four")) ++
      (12L to 16L).map(i => (i, "srcB", s"v${i}a v${i}b v${i}c v${i}d v${i}e"))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    val r = templateLineStrip(docs, wordsPerLine = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 16, "every doc survives, stripped or not")
    assert(r(1L).getAs[Long]("n_lines") == 2L &&
      r(1L).getAs[Long]("n_boiler") == 1L &&
      r(1L).getAs[String]("kept_text") == "alpha beta gamma delta epsilon")
    // in-doc repeats: BOTH copies go, the doc is kept as an empty row
    assert(r(2L).getAs[Long]("n_boiler") == 2L &&
      r(2L).getAs[String]("kept_text") == "")
    assert(r(3L).getAs[Long]("n_boiler") == 0L &&
      r(3L).getAs[String]("kept_text") == "u3a u3b u3c u3d u3e")
    // per-source scoping: srcB keeps the very line srcA stripped
    assert(r(11L).getAs[Long]("n_boiler") == 0L &&
      r(11L).getAs[String]("kept_text") ==
        s"$boiler bee one two three four")
    // raising the doc floor above the boundary spares srcA too
    val strict = templateLineStrip(docs, wordsPerLine = 5, minDfDocs = 3L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(strict(1L).getAs[Long]("n_boiler") == 0L)
    // a NULL text yields ZERO lines (size(null) = -1 must not descend
    // sequence(0,-1) into two phantom null lines) and the doc survives
    val withNull = docs.union(Seq((99L, "srcA", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text"))
    val n = templateLineStrip(withNull, wordsPerLine = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(n(99L).getAs[Long]("n_lines") == 0L &&
      n(99L).getAs[String]("kept_text") == "")
    assert(graft.operators.Dedup.lineTable(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"), 5)
      .count() == 0L, "lineTable drops NULL-text docs, no phantom rows")
    // the degenerate pct that voids the strip-set size bound is rejected
    intercept[IllegalArgumentException] {
      templateLineStrip(docs, wordsPerLine = 5, minDfPct = 0)
    }
  }

  test("template strip set applies FROZEN: base-trained lines strip from " +
    "incoming docs; lines frequent only among incoming survive") {
    import WebCuration._
    val boiler = "nav home about contact terms"
    val promo = "new promo banner sale now"
    val base = (Seq(
      (1L, "srcA", s"$boiler a1a a1b a1c a1d a1e"),
      (2L, "srcA", s"$boiler a2a a2b a2c a2d a2e")) ++
      (3L to 10L).map(i => (i, "srcA", s"b${i}a b${i}b b${i}c b${i}d b${i}e")))
      .toDF("doc_id", "source", "text")
    // every incoming doc carries the promo line — frequent in the BATCH,
    // absent from the base snapshot, so the frozen set must not know it
    val incoming = Seq(
      (11L, "srcA", s"$boiler i1a i1b i1c i1d i1e"),
      (12L, "srcA", s"$promo i2a i2b i2c i2d i2e"),
      (13L, "srcA", s"$promo i3a i3b i3c i3d i3e")
    ).toDF("doc_id", "source", "text")
    val set = templateStripSet(base, wordsPerLine = 5)
    // the set is exactly srcA's boiler line (df 2 of 10 docs = the bar)
    assert(set.count() == 1L && set.collect().head.getAs[Long]("df") == 2L)
    val r = templateApplyStrip(incoming, set, wordsPerLine = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(11L).getAs[Long]("n_boiler") == 1L &&
      r(11L).getAs[String]("kept_text") == "i1a i1b i1c i1d i1e")
    assert(r(12L).getAs[Long]("n_boiler") == 0L &&
      r(12L).getAs[String]("kept_text") == s"$promo i2a i2b i2c i2d i2e")
    assert(r(13L).getAs[Long]("n_boiler") == 0L)
    // composing build+apply over ONE corpus is exactly templateLineStrip
    val direct = templateLineStrip(base, wordsPerLine = 5)
      .orderBy("doc_id").collect().toSeq
    val composed = templateApplyStrip(base, set, wordsPerLine = 5)
      .orderBy("doc_id").collect().toSeq
    assert(direct == composed)
  }

  test("soft dedup weights: mean shingle df and harmonic weight") {
    import graft.operators.Dedup.softDedupWeights
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"), (4L, "q")
    ).toDF("doc_id", "text")
    val r = softDedupWeights(docs, n = 2).collect()
      .map(x => x.getLong(0) -> x).toMap
    // df: "a b"=2, "b c"=2, "x y"=1, "y z"=1
    assert(r(1L).getAs[Long]("n_shingles") == 2L)
    assert(r(1L).getAs[Long]("mean_df_x100") == 200L)
    assert(r(1L).getAs[Long]("weight_x10000") == 5000L) // appears twice → ½
    assert(r(2L).getAs[Long]("weight_x10000") == 5000L)
    assert(r(3L).getAs[Long]("mean_df_x100") == 100L)
    assert(r(3L).getAs[Long]("weight_x10000") == 10000L) // unique → 1.0
    assert(r(4L).getAs[Long]("n_shingles") == 0L)
    assert(r(4L).getAs[Long]("weight_x10000") == 10000L) // shingle-less spine row
  }

  test("rollingMean floors negative rolling sums (DuckDB // semantics, " +
    "not Spark DIV truncation)") {
    import java.sql.Timestamp
    // one user, two events: values -1.0 then -0.5 ⇒ rolling sums ×100 are
    // -100 (n=1) and -150 (n=2); floor(-150/2) = -75 either way, but
    // floor(-151/3)... use values making sum/n non-integral and negative:
    // -1.01 then -0.5 ⇒ sums -101, -151; -151/2: floor = -76, trunc = -75
    val ev = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-01 00:00:00"), -1.01),
      (2L, 7L, Timestamp.valueOf("2024-01-01 00:01:00"), -0.50))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Relational.rollingMean(ev, nPrev = 4)
      .orderBy("event_id")
      .select("event_id", "roll_sum_x100", "roll_n", "roll_mean_x100")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, -101L, 1L, -101L), (2L, -151L, 2L, -76L)))
  }

  test("dataQuality audit: empty table reads zero violations (pass), " +
    "empty rule list refuses loudly") {
    import DataQuality._
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    val rep = audit("t", empty, Seq(
        RowRule("tag_set", col("tag").isNotNull),
        UniqueRule("pk_id", Seq("id"))))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // sum() over zero rows is NULL — the coalesce must turn that into
    // 0 violations / pass=true, never a NULL verdict
    assert(rep == Map(
      "tag_set" -> ((0L, 0L, true)),
      "pk_id" -> ((0L, 0L, true))))
    intercept[IllegalArgumentException] {
      audit("t", empty, Seq.empty)
    }
  }

  test("bitextMine pairs the planted translations under the margin rule") {
    val docs = Seq((0L, "x", "en"), (1L, "x", "en"), (2L, "x", "de"),
      (3L, "x", "de")).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", lit(1L))
    def vec(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0f, 0f)
    val emb = Seq(
      (0L, vec(1, 0), 0), (1L, vec(0, 1), 0),       // en
      (2L, vec(1, 0), 0), (3L, vec(0.7, 0.7), 0))   // de: exact + diagonal
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.bitextMine(docs, emb, "en", "de", k = 1,
        minMarginX1000000 = 1000000L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc0 pairs its exact copy doc2 (cos 1.0); doc1 pairs the diagonal
    // doc3 (cos ≈ .7071); with k=1 both margins are exactly 2c/(c+c) = 1.0
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == ((0L, 2L, 1000000L, 1000000L)))
    assert(got(1L)._2 == 3L && got(1L)._4 == 1000000L)
    assert(got(1L)._3 > 700000L && got(1L)._3 < 710000L)
  }

  test("bitextMineAnn recovers the exact miner's planted translations " +
    "(ANN candidates keep recall on true pairs)") {
    // 8 planted en→de translation pairs (identical embeddings — same
    // coarse cell by construction, so the probe must surface them) plus
    // de-only noise vectors the exact miner never pairs
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val pairs = (0L until 8L).map(i => (i, vec()))
    val noise = (100L until 120L).map(i => (i, vec()))
    val docs = (pairs.map { case (i, _) => (i, "x", "en") } ++
        pairs.map { case (i, _) => (i + 50, "x", "de") } ++
        noise.map { case (i, _) => (i, "x", "de") })
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", lit(1L))
    val emb = (pairs.map { case (i, v) => (i, v, 0) } ++
        pairs.map { case (i, v) => (i + 50, v, 0) } ++
        noise.map { case (i, v) => (i, v, 0) })
      .toDF("vec_id", "embedding", "label")
    val exact = Similarity.bitextMine(docs, emb, "en", "de", k = 4,
        minMarginX1000000 = 1000000L)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.bitextMineAnn(docs, emb, "en", "de", k = 4,
        minMarginX1000000 = 1000000L)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    val planted = (0L until 8L).map(i => (i, i + 50)).toSet
    // the exact miner finds every planted pair (identical vectors: cos 1.0
    // dominates); the ANN form must not lose them — identical vectors land
    // in the identical coarse cell, so the rank-1 probe always covers them
    assert((planted -- exact).isEmpty, s"exact missed ${planted -- exact}")
    assert((planted -- ann).isEmpty, s"ANN candidates lost ${planted -- ann}")
  }

  test("principalComponent finds the planted dominant axis with high EVR") {
    // axis 0 carries variance ~100x axis 1's; axes 2..7 are constant-zero
    val emb = (1L to 20L).map { i =>
      (i, Array.tabulate(8) { d =>
        if (d == 0) i.toFloat / 20
        else if (d == 1) 0.01f * (i % 3) else 0f
      }, 0)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.principalComponent(emb, iters = 8)
      .orderBy("d").as[(Long, Long, Long)].collect()
    assert(got.length == 8)
    assert(math.abs(got(0)._2) == 10000L) // axis 0 is the component
    got.drop(1).foreach(r =>
      assert(math.abs(r._2) < 2000L, s"axis ${r._1} should be minor"))
    assert(got(0)._3 > 900000L, s"EVR ${got(0)._3} should be >90%")
    assert(got.map(_._3).distinct.length == 1) // evr is a corpus scalar
  }

  test("fuzzy clusters: transitive closure picks the lexicographic canonical") {
    // red~rad, rad~rod, red~rod all within distance 2 in the widget block
    // ⇒ one cluster, canonical = "rad widget" (lexicographic min)
    val ents = Seq("red widget", "rad widget", "rod widget", "blue bolt")
      .toDF("p_name")
    val pairs = Dedup.fuzzyNameMatch(ents, "p_name", maxDist = 2)
    val got = Dedup.dedupClusters(pairs, "name_a", "name_b")
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "red widget" -> "rad widget", "rad widget" -> "rad widget",
      "rod widget" -> "rad widget")) // the lone bolt never enters a pair
  }

  test("dataQuality profile: nulls and exact distincts in one pass") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (2L, None))
      .toDF("id", "tag")
    val got = DataQuality.profile("t", df, Seq("id", "tag"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      "id" -> ((0L, 2L, 3L)),
      "tag" -> ((1L, 1L, 3L)))) // countDistinct skips the NULL
  }

  test("whitenReport kills the planted component's variance, keeps the rest") {
    val emb = (1L to 20L).map { i =>
      (i, Array.tabulate(8) { d =>
        if (d == 0) i.toFloat / 20
        else if (d == 1) 0.01f * (i % 3) else 0f
      }, 0)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.whitenReport(emb, iters = 8)
      .orderBy("d").as[(Long, Long, Long, Long)].collect()
    assert(got(0)._4 < 10000L,          // axis 0: <1% variance survives
      s"component axis retained ${got(0)._4} ppm")
    assert(got(1)._4 > 900000L,         // axis 1 is orthogonal — untouched
      s"minor axis retained ${got(1)._4} ppm")
    got.drop(2).foreach(r => assert(r._2 == 0L && r._3 == 0L)) // dead dims
  }

  test("assortativity: a path graph is perfectly disassortative (r = -1)") {
    // path 1–2–3: every edge joins a degree-1 leaf to the degree-2 middle,
    // so endpoint degrees are perfectly anti-correlated
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val got = Graphs.assortativity(edges).as[(Long, Long)].head()
    assert(got == ((4L, -10000L)))
  }

  test("ragPassages: overlapping windows with a shrinking tail") {
    // 5 sentences, w=3 stride=2 ⇒ starts at 0, 2, 4:
    // p0 = sents 0-2, p1 = sents 2-4 (overlap: sentence 2 intact in both),
    // p2 = sent 4 alone (the shrinking tail)
    val docs = docsDF(1L -> "a b. c d. e f. g h. i j")
    val got = TextAnalysis.ragPassages(docs, w = 3, stride = 2)
      .orderBy("passage_idx")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 3L, 6L), (1L, 3L, 6L), (2L, 1L, 2L)))
    assert(got.map(_._5).distinct.length == 3) // three distinct passages
  }

  test("labelDiversity: identical pair ~ 1e6, orthogonal pair 0, singleton -1") {
    val dim = 8
    def vec(hot: Int*): Array[Float] = {
      val a = Array.fill(dim)(0.0f); hot.foreach(i => a(i) = 1.0f); a
    }
    val emb = Seq(
      (1L, vec(0), 0), (2L, vec(0), 0),   // identical pair
      (3L, vec(1), 1), (4L, vec(2), 1),   // orthogonal pair
      (5L, vec(3), 2))                    // singleton
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelDiversity(emb)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L)._1 == 2L && got(0L)._2 > 999000L && got(0L)._2 <= 1000000L)
    assert(got(1L) == ((2L, 0L)))
    assert(got(2L) == ((1L, -1L)))
  }

  test("datasetCard legs equal their standalone operators, long format complete") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog sat too", "s1"),
      (2L, "a completely different set of words here now", "s1"),
      (3L, "same same same same same same", "s2"),
      (4L, "one two three four five six seven eight", "s2"))
      .toDF("doc_id", "text", "source")
    val card = Summaries.datasetCard(docs, ngramN = 3)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(card.size == 12) // 6 metrics × 2 sources
    assert(card(("s1", "n_docs")) == 2L && card(("s2", "n_docs")) == 2L)
    assert(card(("s1", "ws_tokens")) == 19L && card(("s2", "ws_tokens")) == 14L)
    // each derived leg must equal its standalone operator bit for bit
    val gini = TextAnalysis.tokenGini(docs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val div = TextAnalysis.ngramDiversity(docs, 3)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val lor = Mixing.lorenzDeciles(docs, "ws").where(col("decile") === 1L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._6).toMap
    Seq("s1", "s2").foreach { s =>
      assert(card((s, "gini_ppm")) == gini(s))
      assert(card((s, "ngram_diversity_ppm")) == div(s))
      assert(card((s, "top_decile_share_ppm")) == lor(s))
    }
  }

  test("containmentPairs: a strict prefix scores 10000 while Jaccard reads the fraction") {
    val full = (1 to 10).map(i => s"w$i").mkString(" ")   // 8 shingles
    val prefix = (1 to 5).map(i => s"w$i").mkString(" ")  // 3 shingles, all shared
    val got = Dedup.containmentPairs(
        docsDF(1L -> full, 2L -> prefix), n = 3, minContainX10000 = 5000)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 10000L,
      math.floor(10000.0 * 3 / 8 + 0.5).toLong, 2L)))
    // symmetric near-dups (equal sizes) report contained_doc = -1
    val sym = Dedup.containmentPairs(
        docsDF(3L -> full, 4L -> full), n = 3, minContainX10000 = 5000)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(sym == Seq((3L, 4L, 10000L, 10000L, -1L)))
  }

  test("blocklistScrubJoin is row-identical to the literal-array scrub") {
    val docs = Seq(
      (1L, "clean words only here", "s1"),
      (2L, "one bad apple bad", "s1"),
      (3L, "bad worse bad worse bad worse", "s2"),
      (4L, "", "s2")).toDF("doc_id", "text", "source")
    val terms = Seq("bad", "worse")
    val literal = TextAnalysis.blocklistScrub(docs, terms)
      .as[(Long, String, Long, String, String)].collect().toSeq.sortBy(_._1)
    val joined = TextAnalysis.blocklistScrubJoin(docs, terms.toDF("term"))
      .as[(Long, String, Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(joined == literal)
    assert(literal.map(_._5) == Seq("keep", "flag", "drop", "keep"))
  }

  test("lengthOutliers flags the glitch doc; median/MAD unmoved by it") {
    val rows = (1L to 8L).map(i =>
      i -> (1 to 10).map(j => s"w${i}_$j").mkString(" ")) ++ Seq(
      9L -> (1 to 13).map(j => s"m$j").mkString(" "),  // mild: dev 3, kept
      10L -> (1 to 200).map(j => s"g$j").mkString(" ")) // glitch: flagged
    val got = TextAnalysis.lengthOutliers(docsDF(rows: _*), k = 4)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    // med 10 (rank ceil(10/2)=5), MAD 0 -> floor 1, threshold 4: only doc 10
    assert(got == Seq((10L, "src0", 200L, 10L, 0L, 190L)))
  }

  test("canonicalizationLadder: each level reveals exactly its variant class") {
    val docs = docsDF(
      1L -> "Hello world foo",
      2L -> "Hello  world foo",   // whitespace variant of 1
      3L -> "hello world foo",    // case variant of 1
      4L -> "Hello world foo!!!", // punctuation variant of 1
      5L -> "completely different")
    val got = Dedup.canonicalizationLadder(docs)
      .orderBy("level")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._5)) == Seq(
      (1L, "raw", 0L), (2L, "whitespace", 1L), (3L, "unicode", 1L),
      (4L, "casefold", 2L), (5L, "alnum", 3L)))
    assert(got.forall(_._3 == 5L))
    assert(got.map(_._6) == got.map(_._6).sorted) // the ladder is monotone
  }

  test("canonicalizeUrl is idempotent on arbitrary generated URLs (property)") {
    // a dedup key must be a fixpoint: canon(canon(u)) == canon(u), or two
    // passes of the same pipeline would disagree on identity
    import org.scalacheck.Gen
    def forAllSampled[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
      Iterator.continually(gen.sample).flatten.take(n).foreach(body)
    val url = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp", "")
      host <- Gen.oneOf("Ex.COM", "a.b.ORG", "x.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/a", "/A/b/", "/a//", "/p.q")
      qs <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x", "?a=1&fbclid=z&b=2",
        "?ref=rss")
      frag <- Gen.oneOf("", "#x", "#sec/2")
    } yield if (scheme.isEmpty) host + path + qs + frag
      else s"$scheme://$host$port$path$qs$frag"
    forAllSampled(Gen.listOfN(40, url), 5) { urls =>
      val rows = urls.distinct.toDF("url")
        .select(WebCuration.canonicalizeUrl($"url").as("c1"))
        .select($"c1", WebCuration.canonicalizeUrl($"c1").as("c2"))
        .as[(String, String)].collect()
      rows.foreach { case (c1, c2) =>
        assert(c1 == c2, s"canonicalization not a fixpoint: '$c1' -> '$c2'")
      }
    }
  }

  test("viterbi optimality holds on random vocabularies and words (property)") {
    import org.scalacheck.Gen
    def forAllSampled[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
      Iterator.continually(gen.sample).flatten.take(n).foreach(body)
    // tiny alphabet makes piece overlap (and greedy traps) likely
    val piece = Gen.choose(1, 4).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val scenario = for {
      vocab <- Gen.listOfN(8, piece).map(_.distinct)
      words <- Gen.listOfN(10, Gen.choose(1, 9).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield (vocab, words.distinct)
    forAllSampled(scenario, 5) { case (vocab, wordList) =>
      val words = wordList.toDF("w")
      val v = TextAnalysis.viterbiSegmentWords(words, vocab)
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val vocabDf = vocab.toDF("term").withColumn("cnt", lit(1L))
      val g = TextAnalysis.wordpieceSegmentWords(words, vocabDf, 4)
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      wordList.foreach { w =>
        val (vp, vu) = v(w); val (gp, _) = g(w)
        assert(vp <= gp, s"viterbi billed more pieces than greedy on '$w' (vocab $vocab)")
        assert(vp >= 1 && vu >= 0 && vu <= vp && vp <= w.length)
        // a segmentation into vp pieces with vu unknowns covers the word:
        // known pieces are 1..4 chars, unknowns exactly 1 — bounds check
        assert(vp - vu <= w.length && (vp - vu) * 4 + vu >= w.length)
      }
    }
  }

  test("canonicalizationLadder is monotone on arbitrary messy corpora (property)") {
    import org.scalacheck.Gen
    def forAllSampled[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
      Iterator.continually(gen.sample).flatten.take(n).foreach(body)
    // chars spanning every ladder level: curly quotes, NBSP, zero-width,
    // em-dash, whitespace, case pairs, punctuation
    val junk = Gen.oneOf('\u201C', '\u2019', '\u00A0', '\u200B', '\u2014',
      ' ', '\t', 'A', 'a', 'b', 'B', '!', '5')
    val corpus = Gen.listOfN(8, Gen.listOfN(12, junk).map(_.mkString))
    forAllSampled(corpus, 5) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.canonicalizationLadder(docsDF(rows: _*))
        .orderBy("level")
        .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
      assert(got.size == 5 && got.forall(_._3 == 8L))
      // each level is a function of the previous form ⇒ dups only grow
      assert(got.map(_._5) == got.map(_._5).sorted,
        s"ladder must be monotone, got $got for $texts")
    }
  }

  test("incremental containment equals the batch run restricted to new-member pairs") {
    val mk = (i: Int) => (10 to 10 + 8).map(j => s"w${i}_$j").mkString(" ")
    val existing = docsDF(1L -> mk(1), 2L -> mk(2), 3L -> mk(1))
    // new batch: a copy of doc 1's text (hits the index) and two mutual dups
    val newDocs = docsDF(10L -> mk(1), 11L -> mk(9), 12L -> mk(9))
    val batch = Dedup.containmentPairs(
        existing.unionByName(newDocs), n = 3, minContainX10000 = 5000)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .filter(p => p._1 >= 10L || p._2 >= 10L).sorted
    val index = Dedup.shingleTable(existing, 3)
      .select(col("doc_id"), graft.functions.TextFunctions.charPolyHash(col("sh")).as("h"))
    val incr = Dedup.containmentPairsIncremental(index, newDocs,
        n = 3, minContainX10000 = 5000)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(incr == batch, s"incr $incr != batch-restricted $batch")
    assert(incr.nonEmpty) // both cross-index and new-new pairs exist
    assert(incr.exists(p => p._1 < 10L), "must include an index-probe pair")
    assert(incr.exists(p => p._1 >= 10L && p._2 >= 10L),
      "must include a new-new pair")
  }

  test("clusterSilhouette is bounded, covers every vector, deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val got = Dedup.clusterSilhouette(emb, planes = 6, dim = 64)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // every vector lands in exactly one refined cluster
    assert(got.map(_._2).sum == n)
    // silhouette is a mean of per-vector values in [-1, 1] (×1e6)
    assert(got.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
    // deterministic k-means → bit-identical re-run (no random init)
    val again = Dedup.clusterSilhouette(emb, planes = 6, dim = 64)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(again == got)
  }

  test("clusterSilhouette survives the one-cluster degenerate case with 0s") {
    // two near-identical vectors: every plane gives both the same sign →
    // one cell, one cluster after the Lloyd round → b undefined → s = 0
    val emb = Seq(
      (1L, Array.fill(4)(1.0f), 0),
      (2L, Array.fill(4)(1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.clusterSilhouette(emb, planes = 2, dim = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sum == 2L)
    assert(got.forall(_._3 == 0L), s"degenerate clustering must yield 0s: $got")
  }

  test("kAnonymity flags classes under k and partitions the corpus exactly") {
    val docs = Seq(
      (1L, "en", "s1", 120L), (2L, "en", "s1", 130L), (3L, "en", "s1", 140L),
      (4L, "de", "s1", 150L),                       // singleton class
      (5L, "en", "s2", 700L), (6L, "en", "s2", 720L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val got = TextAnalysis.kAnonymity(docs, k = 3L, bucketWidth = 100L)
      .as[(String, String, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(
      ("s1", "de", 1L, 1L, 1L),   // 1 < k → at risk
      ("s1", "en", 1L, 3L, 0L),   // exactly k → safe
      ("s2", "en", 7L, 2L, 1L)))
    assert(got.map(_._4).sum == docs.count()) // classes partition the corpus
  }

  test("readability bills the exact Flesch rational and drops wordless docs") {
    val docs = Seq(
      (1L, "aa bb. cc!", "en", "s1", 10L),
      (2L, "   ", "en", "s2", 3L)   // no words → undefined → excluded
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.readability(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // W=3 ("aa","bb.","cc!"), S=2 ("." and "!"), Syl=1 ("aa")
    // floor((206835·2·3 − 1015·9 − 84600·1·2) / 6) = floor(1062675/6)
    assert(got == Seq(("s1", 1L, 177112L, 177112L, 177112L)))
  }

  test("labelPropagation coalesces two disjoint triangles onto their min labels") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val got = Graphs.labelPropagation(edges, iters = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L)))
  }

  test("ivfPqTopK with every cell probed equals plain pqTopK") {
    val emb = Tables.embeddings(spark, sfDir)
    val pq = Similarity.pqTopK(emb, 5, 5)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // planes=2 → 4 coarse cells; nProbe=4 probes them all → the coarse
    // tier prunes nothing and the composition must reduce to PQ exactly
    val ivfpq = Similarity.ivfPqTopK(emb, 5, 5, planes = 2, nProbe = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(ivfpq == pq)
    // the pruning configuration still returns full result sets per query
    val pruned = Similarity.ivfPqTopK(emb, 5, 5, planes = 4, nProbe = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(pruned.map(_._1).distinct.size == 5)
  }

  test("audioChunks tiles the recording exactly with sample-accurate byte offsets") {
    import graft.Schemas.MediaRecord
    val body = new Array[Byte](1030) // 515 frames at block align 2
    val media = spark.createDataset(Seq(
      MediaRecord(7L, "audio", Multimodal.wavPayload(body), "audio/wav", 0L),
      MediaRecord(8L, "image", Multimodal.pngPayload(8, 8, body), "image/png", 0L)))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val got = Multimodal.audioChunks(spark, media, chunkFrames = 256L)
      .orderBy("media_id", "chunk_no")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (7L, 0L, 0L, 256L, 44L),
      (7L, 1L, 256L, 256L, 556L),
      (7L, 2L, 512L, 3L, 1068L)))  // last partial window keeps its true count
    assert(got.map(_._4).sum == 515L) // windows tile: no overlap, no gap
  }

  test("Q21 sole-fault: one per-order agg answers EXISTS + NOT-EXISTS exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q21").toString
    // order 1 (F): supp1 at fault, supp2 clean        -> supp1 counts once
    // order 2 (F): both at fault                      -> NOT EXISTS fails
    // order 3 (F): single-supplier order              -> EXISTS fails
    // order 4 (O): not finished                       -> status filter
    // order 5 (F): supp2 at fault TWICE + supp3 clean -> supp2 counts twice
    Seq((1L, 1L, "R"), (1L, 2L, "N"),
        (2L, 1L, "R"), (2L, 2L, "R"),
        (3L, 1L, "R"),
        (4L, 1L, "R"), (4L, 2L, "N"),
        (5L, 2L, "R"), (5L, 2L, "R"), (5L, 3L, "N"))
      .toDF("l_orderkey", "l_suppkey", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"), (5L, "F"))
      .toDF("o_orderkey", "o_orderstatus").write.parquet(s"$dir/orders.parquet")
    Seq((1L, "SuppA"), (2L, "SuppB"), (3L, "SuppC"))
      .toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    val got = Relational.soleFaultSuppliers(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("SuppB" -> 2L, "SuppA" -> 1L)) // numwait desc, name asc
  }

  test("Q20 dominant-share: rational share compare + pattern + nation prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q20").toString
    // part 1 (red): supp1 ships 10 of 12 over 3 suppliers -> 10*3 > 2*12 ✓
    // part 2 (blue): supp4 is sole supplier -> sq*1 > 2*sq is false AND the
    //   pattern excludes it; part 3 (red): supp6 dominates but sits in a
    //   nation outside the filter
    Seq((1L, 1L, 10.0), (1L, 2L, 1.0), (1L, 3L, 1.0),
        (2L, 4L, 100.0),
        (3L, 6L, 10.0), (3L, 7L, 1.0), (3L, 8L, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "red widget"), (2L, "blue bolt"), (3L, "red gear"))
      .toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    Seq((1L, "SuppA", 3L), (2L, "SuppB", 3L), (3L, "SuppC", 7L),
        (4L, "SuppD", 3L), (6L, "SuppF", 9L), (7L, "SuppG", 9L),
        (8L, "SuppH", 9L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((3L, "NATION_3"), (7L, "NATION_7"), (9L, "NATION_9"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$dir/nation.parquet")
    val got = Relational.dominantShareSuppliers(spark, dir)
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "SuppA", "NATION_3")))
  }
}
