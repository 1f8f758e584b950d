package graft

import org.apache.spark.sql.{Column, SparkSession}

/** Dev-only harnesses (test sourceset — not part of the library surface).
  * Run via `tools/run.sh` (whose classpath includes test-classes) or
  * `sbt "Test/runMain graft.DebugMain <query>"`. */
object DevTools {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def query(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    SparkEntry.queries.getOrElse(name, throw new IllegalArgumentException(
      s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
}

/** Times one or more queries and reports exchange reuse; DEBUG_PLAN=1 dumps
  * the executed plan. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    args.foreach { q =>
      val df = DevTools.query(q)(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan.toString
      println(f"===== $q%s $sec%.2fs reusedExchanges=${p.split("\n").count(_.contains("ReusedExchange"))}")
      if (sys.env.contains("DEBUG_PLAN")) println(p)
    }
    spark.stop()
  }
}

/** Times queries with the SAME window Bench uses — fn invocation included,
  * so operators that run actions inside the builder (iterative trainers,
  * in-query artifact writes) are fully counted. DebugMain, by contrast,
  * times only the returned plan's execution (its warm-repeat A/B use). */
object TimeFull {
  def main(args: Array[String]): Unit = {
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      val fn = DevTools.query(q)
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      println(f"===== $q%s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

/** Synthetic scale-up replica for SCALING MEASUREMENTS ONLY (never for
  * correctness — oracles run on the driver's own sf dirs). Writes an
  * N-copy replica of the sf0.1 `documents`/`embeddings` tables:
  *
  *  - copy 0 is verbatim; copy k>0 suffixes every token with `qk<k>` and
  *    offsets doc_id by k·10⁷, so the replica's near-dup/shingle/vocab
  *    structure stays WITHIN each copy (cross-copy Jaccard 0, vocabulary
  *    grows with the corpus — what genuinely new data does; 10 verbatim
  *    copies would instead make every pair query quadratic in copies);
  *  - embeddings rotate components by k (near-orthogonal to the original
  *    for this synthetic distribution), so cosine-pair structure also
  *    stays within-copy.
  *
  * Usage: `tools/run.sh graft.ScaleUp [outDir] [copies]` then point
  * `SPARK_GRAFT_SF_DIR` at outDir for DebugMain timing runs. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val src = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // same aliasing guard as repTable below: ids must sit below the copy
    // offset or copies would collide into one id space
    def assertBelow(df: org.apache.spark.sql.DataFrame, idCol: String,
                    offset: Long, name: String): Unit = {
      val m = df.select(max(col(idCol)).cast("long")).head().getLong(0)
      require(m < offset,
        s"$name: max $idCol $m >= offset $offset — copies would alias")
    }
    assertBelow(docs, "doc_id", 10000000L, "documents")
    val docReps = (0 until copies).map { k =>
      if (k == 0) docs
      else {
        val t = regexp_replace(col("text"), "(\\S+)", s"$$1qk$k")
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }
    }.reduce(_ unionByName _)
    docReps.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    assertBelow(emb, "vec_id", 10000000L, "embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // the (rotate, negate-on-wrap) scheme has period 2·dim: copy k and
    // copy k + 2·dim would get BIT-IDENTICAL vectors (cosine +1), silently
    // reintroducing the cross-copy near-dup aliasing the negation exists
    // to prevent — refuse rather than corrupt the scaling measurements
    require(copies <= 2 * dim,
      s"copies $copies > ${2 * dim} (2·dim): rotation twins repeat past " +
        "one negation cycle and copies would alias as exact near-dups")
    val embReps = (0 until copies).map { k =>
      if (k == 0) emb
      else {
        // rotation index wraps past dim (copies can exceed the 64-dim
        // space); wrapped generations negate all components so a
        // rotation-twin pair (k1 ≡ k2 mod dim) has cosine −1, never a
        // spurious cross-copy near-dup — valid for ONE wrap only (the
        // require above)
        val r = k % dim
        val rot =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r))
        val e = if ((k / dim) % 2 == 1) transform(rot, x => -x) else rot
        emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          e.as("embedding"), col("label"))
      }
    }.reduce(_ unionByName _)
    embReps.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    // the relational/event tables replicate with KEY OFFSETS (copy k adds
    // k·10⁸ to every join key), so join/group structure stays within each
    // copy — the relational scaling rows (q-family, dq_audit, er_fuzzy,
    // a23) then measure genuine 10× input growth, not a verbatim ride-
    // along. part names suffix their LAST token per copy so the ER
    // blocking vocabulary grows with the data (verbatim names would
    // quadratically inflate each block's comparator). region/nation stay
    // verbatim (bounded dims; nationkey references remain valid).
    val off = 100000000L
    def offCols(df: org.apache.spark.sql.DataFrame, k: Int,
                keys: Seq[String], extra: Map[String, Column] = Map.empty) =
      df.select(df.columns.toSeq.map { c =>
        extra.getOrElse(c,
          if (keys.contains(c)) (col(c) + lit(k * off)).as(c) else col(c))
          .as(c)
      }: _*)
    def repTable(name: String, keys: Seq[String],
                 extraOf: Int => Map[String, Column] = _ => Map.empty): Unit = {
      val t = graft.Tables.load(spark, src, name)
      // replicating a base dir whose keys reach the offset (e.g. sf1)
      // would silently alias keys ACROSS copies, corrupting the join/group
      // structure the scaling rows measure — fail loudly instead
      val maxKey = t.select(keys.map(k => max(col(k)).cast("long"))
          .reduce((a, b) => greatest(a, b)))
        .head().getLong(0)
      require(maxKey < off,
        s"$name: max key $maxKey >= offset $off — copies would alias; " +
          "raise `off` above the base dir's key range")
      (0 until copies).map { k =>
        if (k == 0) t else offCols(t, k, keys, extraOf(k))
      }.reduce(_ unionByName _)
        .repartition(16).write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    repTable("orders", Seq("o_orderkey", "o_custkey"))
    repTable("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    repTable("customer", Seq("c_custkey"))
    repTable("supplier", Seq("s_suppkey"))
    repTable("part", Seq("p_partkey"),
      k => Map("p_name" -> concat(col("p_name"), lit(s"qk$k"))))
    repTable("events", Seq("event_id", "user_id"))
    Seq("region", "nation").foreach { n =>
      graft.Tables.load(spark, src, n)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    println(s"wrote ${copies}x replica to $out: " +
      s"${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vectors")
    spark.stop()
  }
}

/** Per-fold cost A/B: tiered fold (2 small deltas) vs full bottom-level
  * fold on the SAME index state — the direct evidence that tier-fold cost
  * tracks the TIER, not the index. Builds base = 7/8 of the corpus plus
  * two 1/16 delta segments, twice, then times compactBm25IndexTier vs
  * compactBm25Index. Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh
  * graft.FoldCost [scratchDir]. */
object FoldCost {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val root = args.headOption.getOrElse("/tmp/graft-foldcost")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def mkIndex(dir: String): Unit = {
      // non-evicting cap: with eviction, the base would shrink below the
      // deltas (batch segments store uncapped) and the layout comparison
      // would invert — the A/B wants base >> deltas, the LSM steady state
      Similarity.buildBm25Index(docs.where(col("doc_id") % 8 =!= 0), dir,
        maxDf = 10000000L)
      Similarity.updateBm25Index(spark, dir,
        docs.where(col("doc_id") % 16 === 0))
      Similarity.updateBm25Index(spark, dir,
        docs.where(col("doc_id") % 16 === 8))
    }
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"===== $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    mkIndex(s"$root/tier")
    mkIndex(s"$root/full")
    def indexBytes(dir: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    def snapshotFiles(dir: String): Map[String, Long] = {
      val out = Map.newBuilder[String, Long]
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      while (it.hasNext) {
        val st = it.next(); out += st.getPath.toString -> st.getLen
      }
      out.result()
    }
    def foldWriteBytes(dir: String)(body: => Unit): Long = {
      val pre = snapshotFiles(dir)
      body
      snapshotFiles(dir).filterNot { case (p, _) => pre.contains(p) }
        .values.sum
    }
    val preBytes = indexBytes(s"$root/tier")
    var tierW = 0L; var fullW = 0L
    timed("tier_fold_2_deltas") {
      tierW = foldWriteBytes(s"$root/tier") {
        require(Similarity.compactBm25IndexTier(spark, s"$root/tier", 2))
      }
    }
    timed("full_fold") {
      fullW = foldWriteBytes(s"$root/full") {
        Similarity.compactBm25Index(spark, s"$root/full")
      }
    }
    println(s"===== index_bytes $preBytes tier_fold_wrote $tierW " +
      s"full_fold_wrote $fullW")
    // served equality across both fold shapes, same corpus
    Bm25Views.assertServedEqual(spark, s"$root/tier", s"$root/full")
    println("===== served_equal true")
    spark.stop()
  }
}

/** Bucket-count scaling evidence for the parameterized postings layout:
  * builds the SAME corpus's BM25 index at two bucket counts, then times a
  * ONE-ID takedown against each and reports the bytes its df-decrement
  * read actually scanned (stage input bytes). The claim under test: the
  * takedown read tracks BUCKET size (index/B), not index size — so at
  * 100× the index, raising B holds the per-takedown read flat. Usage:
  * SPARK_GRAFT_SF_DIR=... tools/run.sh graft.BucketProbeCost
  * [scratchDir] [bucketsA] [bucketsB]. */
object BucketProbeCost {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = args.headOption.getOrElse("/tmp/graft-bucketcost")
    val bA = if (args.length > 1) args(1).toInt else 32
    val bB = if (args.length > 2) args(2).toInt else 256
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val victim = docs.select(max(col("doc_id"))).head().getLong(0)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          bytesRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
      })
    Seq(bA, bB).foreach { b =>
      val dir = s"$root/b$b"
      // non-evicting cap: the A/B isolates the POSTINGS read term, which
      // eviction would shrink below the doclen/footer floor
      Similarity.buildBm25Index(docs, dir, maxDf = 10000000L, buckets = b)
      val idxBytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(dir)).getLength
      // listener events are async — settle (the LsmMaintenanceSpec pattern)
      def settle(): Unit = {
        var last = -1L; var attempts = 0
        while (bytesRead.get() != last && attempts < 50) {
          last = bytesRead.get(); Thread.sleep(100); attempts += 1
        }
      }
      settle()
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      Similarity.removeFromBm25Index(spark, dir,
        Seq(victim).toDF("doc_id"))
      val secs = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"===== buckets $b index_bytes $idxBytes " +
        f"takedown_read_bytes ${bytesRead.get()} secs $secs%.2f")
    }
    spark.stop()
  }
}

/** Build-vs-maintain split for the `stream_*_autocompact` cells: the
  * bench cell builds the corpus-sized base index IN-QUERY, so its scale
  * slope conflates the O(corpus) build floor with the O(batch) + O(tier)
  * maintenance the LSM policy actually claims. This A/B times them apart
  * over a PRE-BUILT base fixture: `build` = the one-off base index
  * build; `maintain` = draining the delta quarter as a 3-micro-batch
  * stream with in-loop tier folds (autoCompactSegments = 2) — the
  * steady-state cost a long-lived pipeline pays per batch. Run at two
  * scale replicas, the maintain slope alone is the policy's claim.
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh graft.AutoCompactAB
  * [scratchDir]. */
object AutoCompactAB {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val root = args.headOption.getOrElse("/tmp/graft-acab")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // ---- BM25 leg (the stream_bm25_autocompact shape, split) ----
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val bmBuild = timed {
      Similarity.buildBm25Index(docs.where(col("doc_id") % 4 =!= 0),
        s"$root/bm25/index", maxDf = 1000) // the bench cell's cap
    }
    docs.where(col("doc_id") % 4 === 0)
      .repartition(3).write.mode("overwrite").parquet(s"$root/bm25/src")
    val docSchema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    val bmMaintain = timed {
      graft.streaming.Streams.streamingBm25Update(spark,
          graft.streaming.Streams.fileSource(spark, s"$root/bm25/src",
            docSchema, maxFilesPerTrigger = 1),
          s"$root/bm25/index", s"$root/bm25/ck", autoCompactSegments = 2)
        .awaitTermination()
    }
    // ---- ANN leg (the stream_ann_autocompact shape, split) ----
    val emb = Tables.embeddings(spark, sfDir)
    val annBuild = timed {
      Similarity.buildAnnIndex(emb.where(col("vec_id") % 4 =!= 0),
        s"$root/ann/index")
    }
    emb.where(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
      .repartition(3).write.mode("overwrite").parquet(s"$root/ann/src")
    val embSchema = new org.apache.spark.sql.types.StructType()
      .add("vec_id", org.apache.spark.sql.types.LongType)
      .add("embedding", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val annMaintain = timed {
      graft.streaming.Streams.streamingAnnUpdate(spark,
          graft.streaming.Streams.fileSource(spark, s"$root/ann/src",
            embSchema, maxFilesPerTrigger = 1),
          s"$root/ann/index", s"$root/ann/ck", autoCompactSegments = 2)
        .awaitTermination()
    }
    println(f"===== bm25 build $bmBuild%.2fs maintain $bmMaintain%.2fs")
    println(f"===== ann  build $annBuild%.2fs maintain $annMaintain%.2fs")
    spark.stop()
  }
}

/** Candidate-volume decomposition for the pHash multi-index lever:
  * images, true pairs (Hamming ≤ 6), and pair counts at each
  * minBandMatches — the measurement behind `minBandMatchesFor`. */
object PhashStats {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = DevTools.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bands = operators.Multimodal.imagePHash(spark,
      operators.Multimodal.phashImageTable(spark, docs)).localCheckpoint()
    println(s"images=${bands.count()}")
    println(s"distinct_fingerprints=${bands.select("b0","b1","b2","b3").distinct().count()}")
    Seq(1, 2, 3).foreach { k =>
      val t0 = System.nanoTime()
      val n = operators.Multimodal.phashPairs(bands, 6L, k).count()
      println(f"k=$k pairs=$n time=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}

/** Driver-contract smoke: `SparkEntry.entry` must return >0 rows at
  * sf0.001 (the same check the driver runs). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = DevTools.session(4)
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}

/** Prints the formatted plan of each named query at sf0.01. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = DevTools.session(4)
    args.foreach { q =>
      println(s"===== $q =====")
      DevTools.query(q)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
