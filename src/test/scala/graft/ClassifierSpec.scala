package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Trainable-classifier operators: closed-form least-squares (Cramer) and
  * the decision stump. The oracle gate replays training bit for bit; these
  * pin the learning semantics on crafted data. */
class ClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // sfDir inherited from SparkSpec (sf0.001)

  test("least-squares recovers a linearly separable rule exactly") {
    // y = 1 iff x1 >= 5, x2 pure noise; margin is wide so the regression
    // threshold at 1/2 classifies perfectly
    val feats = (0L until 40L).map { i =>
      val x1 = if (i % 2 == 0) 8L else 2L
      (i, if (i % 4 < 2) "a" else "b", x1, i % 3, if (x1 >= 5L) 1L else 0L)
    }.toDF("doc_id", "source", "x1", "x2", "y")
    val model = Classifier.leastSquaresFit(feats)
    val det = model.select(col("det")).as[Long].head()
    assert(det != 0L, "Gram matrix degenerate on separated data")
    val scored = Classifier.leastSquaresScore(feats, model)
    assert(scored.agg(sum(col("correct"))).as[Long].head() == 40L)
    // margin2 is symmetric around the decision boundary's sign
    assert(scored.where(col("predicted") === 1L).count() == 20L)
  }

  test("least-squares on the corpus beats the majority-class baseline") {
    val feats = Classifier.shapeFeatures(Tables.documents(spark, sfDir))
    val n = feats.count()
    val nPos = feats.agg(sum(col("y"))).as[Long].head()
    val majority = math.max(nPos, n - nPos)
    val scored = Classifier.leastSquaresScore(feats,
      Classifier.leastSquaresFit(feats))
    val correct = scored.agg(sum(col("correct"))).as[Long].head()
    assert(correct > majority,
      s"trained accuracy $correct/$n does not beat majority $majority")
    // per-source rollup conserves totals
    val eval = Classifier.accuracyBySource(scored)
    assert(eval.agg(sum(col("n_correct"))).as[Long].head() == correct)
    assert(eval.agg(sum(col("n"))).as[Long].head() == n)
  }

  test("hashed-ngram NB beats the majority-class baseline on the corpus") {
    // note: the lsq trainer's 2 shape features ARE the teacher's own
    // sufficient statistics, so lsq is near-ceiling on this corpus by
    // construction; the NB sees only vocabulary and must clear majority —
    // the honest bar for a feature family disjoint from the teacher's
    val docs = Tables.documents(spark, sfDir)
    val feats = Classifier.hashedNgramFeatures(docs)
    val labels = feats.select(col("doc_id"), col("y")).distinct()
    val n = labels.count()
    val nPos = labels.agg(sum(col("y"))).as[Long].head()
    val majority = math.max(nPos, n - nPos)
    val scored = Classifier.hashedNBScore(feats, Classifier.hashedNBFit(feats))
    assert(scored.count() == n, "every doc must score exactly once")
    val correct = scored.agg(sum(col("correct"))).as[Long].head()
    assert(correct > majority,
      s"NB accuracy $correct/$n does not beat majority $majority")
  }

  test("hashed-ngram NB on separable planted vocabulary is perfect; " +
    "unseen buckets at scoring take the default weight, not a null") {
    // class 1 docs speak only 'good'-vocabulary, class 0 only 'bad' — with
    // the quality teacher overridden by construction (long stopword-free
    // texts score low: craft labels via the text itself instead)
    val docs = (0L until 30L).map { i =>
      val y = i % 2
      val words = if (y == 1L) "the data works well with care and the table holds"
        else "zz yy xx ww vv uu tt ss rr qq"
      (i, "s0", words + s" tail$i")
    }.toDF("doc_id", "source", "text")
    val feats = Classifier.hashedNgramFeatures(docs, buckets = 256,
      labelX10000 = 2000L)
    // the teacher labels the stopword-rich class 1 and the junk class 0
    // (quality = length-fit x stopword-fit); verify separation holds
    val model = Classifier.hashedNBFit(feats, buckets = 256)
    val scored = Classifier.hashedNBScore(feats, model)
    assert(scored.agg(sum(col("correct"))).as[Long].head() == 30L)
    // a doc of ONLY unseen vocabulary must still score (default weight)
    val unseen = Classifier.hashedNgramFeatures(
      Seq((99L, "s0", "never seen tokens entirely fresh")).toDF(
        "doc_id", "source", "text"), buckets = 256)
      .select(col("doc_id"), col("source"), col("y"), col("b"))
    val u = Classifier.hashedNBScore(unseen, model).collect()
    assert(u.length == 1 && !u(0).isNullAt(3), "unseen-vocab doc must score")
  }

  test("hashed NB scoring plan: the weight table joins via BROADCAST hash " +
    "join — the corpus side never shuffles on the bucket key") {
    val feats = Classifier.hashedNgramFeatures(Tables.documents(spark, sfDir))
    val plan = Classifier.hashedNBScore(feats, Classifier.hashedNBFit(feats))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled for the model join:\n$plan")
  }

  test("stump finds the argmax threshold, brute-force checked") {
    val labeled = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 0L),
      (6L, 1L), (7L, 1L), (8L, 1L), (9L, 1L), (3L, 0L))
      .toDF("f", "y")
    val rows = labeled.as[(Long, Long)].collect()
    def correctAt(t: Long) =
      rows.count { case (f, y) => (if (f >= t) 1L else 0L) == y }
    val candidates = rows.map(_._1).distinct :+ (rows.map(_._1).max + 1)
    val bestBrute = candidates.map(t => (correctAt(t), -t)).max
    val (t, nc, n) = Classifier.stumpFit(labeled).as[(Long, Long, Long)].head()
    assert(n == 10L)
    assert(nc == bestBrute._1 && t == -bestBrute._2,
      s"stump ($t, $nc) != brute-force (${-bestBrute._2}, ${bestBrute._1})")
  }

  test("stump sentinel: all-negative labels pick the past-the-max threshold") {
    val labeled = Seq((1L, 0L), (2L, 0L), (5L, 0L)).toDF("f", "y")
    val (t, nc, n) = Classifier.stumpFit(labeled).as[(Long, Long, Long)].head()
    assert((t, nc, n) == (6L, 3L, 3L)) // predict-nothing is the only perfect rule
  }

  test("shape features bound the Gram entries (overflow headroom)") {
    val feats = Classifier.shapeFeatures(Tables.documents(spark, sfDir))
    val (m1, m2) = feats.agg(max(col("x1")), max(col("x2")))
      .as[(Long, Long)].head()
    assert(m1 <= 25L && m2 <= 25L)
    // labels are 0/1 only
    assert(feats.where(!col("y").isin(0L, 1L)).isEmpty)
  }
}
