package graft

import org.apache.spark.sql.SparkSession

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
