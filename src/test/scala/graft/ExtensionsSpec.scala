package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered by `graft.plans.GraftExtensions`
  * (`spark.sql.extensions`): every injected function must be callable from
  * plain SQL and agree with its Column-API twin. */
class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("graft_dot and graft_hash are callable from SQL and match the Column API") {
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .head().getDouble(0)
    assert(dot == 32.0)
    val h = spark.sql("SELECT graft_hash('alpha beta')").head().getLong(0)
    val (hCol, chCol) = {
      import org.apache.spark.sql.functions._
      val r = spark.range(1).select(
        graft.plans.ArrayExpressions.charPolyHash(lit("alpha beta")),
        graft.plans.ArrayExpressions.contentHash(lit("alpha beta"))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(h == hCol)
    val ch = spark.sql("SELECT graft_content_hash('alpha beta')").head().getLong(0)
    assert(ch == chCol && ch / 1000000009L == h)
  }

  test("GraftExtensions.register installs the SQL surface imperatively, idempotently") {
    // the Verify-owned session proves the plain-session path end-to-end
    // (sql_minhash_pairs); here: registering over an already-extended
    // session must overwrite cleanly, and the functions must still work
    graft.plans.GraftExtensions.register(spark)
    graft.plans.GraftExtensions.register(spark)
    val h = spark.sql("SELECT graft_hash('alpha beta')").head().getLong(0)
    assert(h > 0L)
    val sig = spark.sql("SELECT graft_minhash(id, 4) FROM range(10)")
      .head().getSeq[Long](0)
    assert(sig.length == 4 && sig.forall(_ >= 0L))
  }

  test("graft_bloom_might_contain from SQL probes a serialized filter") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bloom = (0L until 100L).map(_ * 3L).toDF("h")
      .stat.bloomFilter("h", 100L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hex = bos.toByteArray.map(b => f"$b%02X").mkString
    val got = spark.sql(
      s"SELECT id, graft_bloom_might_contain(X'$hex', id * 3) AS hit " +
        "FROM range(100)").where(col("hit")).count()
    assert(got == 100L, "members must always pass")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_bloom_might_contain(encode(string(id), 'utf-8'), id) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("binary literal"))
  }

  test("graft_plane_buckets from SQL equals the Column API and rejects non-literal shape args") {
    import org.apache.spark.sql.functions._
    val sqlBks = spark.sql(
      "SELECT graft_plane_buckets(array(0.5D, -0.25D, 1.0D, 0.125D), 4, 2, 4)")
      .head().getSeq[Long](0)
    val colBks = spark.range(1)
      .select(graft.plans.ArrayExpressions.planeBuckets(
        array(lit(0.5), lit(-0.25), lit(1.0), lit(0.125)), 4, 2, 4))
      .head().getSeq[Long](0)
    assert(sqlBks == colBks && sqlBks.length == 2)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_plane_buckets(array(1.0D), id + 1, 2, 4) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("graft_bpe_count from SQL segments with literal merge pairs") {
    val n = spark.sql(
      "SELECT graft_bpe_count(array('aaa', 'abab'), 'a', 'a', 'a', 'b')")
      .head().getLong(0)
    // aaa → [aa, a] = 2; abab → [ab, ab] = 2
    assert(n == 4L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bpe_count(array('x'), 'a')").head()
    }
    assert(err.getMessage.contains("pairs"))
  }

  test("graft_simhash and graft_minhash aggregates run from SQL") {
    import spark.implicits._
    Seq((1L, 5L, 3L), (1L, 9L, 1L)).toDF("id", "h", "cnt")
      .createOrReplaceTempView("ext_toks")
    val sim = spark.sql(
      "SELECT graft_simhash(h, cnt) FROM ext_toks GROUP BY id").head().getLong(0)
    assert(sim >= 0L)
    val mh = spark.sql(
      "SELECT graft_minhash(h, 4) FROM ext_toks GROUP BY id")
      .head().getSeq[Long](0)
    assert(mh.length == 4)
  }

  test("graft_topk, graft_cms, graft_mg aggregates run from SQL") {
    import spark.implicits._
    Seq((1L, 10L, 100L), (1L, 30L, 101L), (1L, 20L, 102L))
      .toDF("g", "v", "id").createOrReplaceTempView("ext_vals")
    // top-2 by value: (30, 101) then (20, 102)
    val top = spark.sql(
      "SELECT graft_topk(v, id, 2) FROM ext_vals GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getLong(0), r.getLong(1))) == Seq((30L, 101L), (20L, 102L)))
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("ext_terms")
    val cms = spark.sql("SELECT graft_cms(t, 2, 16) FROM ext_terms")
      .head().getSeq[Long](0)
    assert(cms.length == 32 && cms.sum == 6L) // 3 occurrences × 2 rows
    val mg = spark.sql("SELECT graft_mg(t, 4) FROM ext_terms")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 2L, "b" -> 1L))
  }

  test("sql_minhash_pairs is re-invocable in one session with identical results") {
    // regression: UNCACHE alone leaves the temp view registered, so the
    // second invocation's CACHE TABLE AS threw TempTableAlreadyExists
    // until the query dropped the views first — the interactive-user path
    val fn = SparkEntry.queries("sql_minhash_pairs")
    val first = fn(spark, sfDir).collect().toSeq
    val second = fn(spark, sfDir).collect().toSeq
    assert(first.nonEmpty && first == second)
  }
}
