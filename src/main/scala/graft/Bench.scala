package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The same line is also written to
  * SPARK_GRAFT_BENCH_OUT (default `bench_out.json` in the CWD) so the
  * driver's parse can't be broken by sbt/log noise on stdout.
  * If SPARK_GRAFT_BENCH_SF2 names a second existing scale dir (default
  * sf0.01), the suite is re-run there and recorded under `sf2`/`queries2` —
  * two scale points make per-query scaling slopes visible. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runSuite(dir: String): (Map[String, Double], List[String]) = {
      // warmup: touch every table once so per-query timings measure the
      // operators, not file-listing / reader / codegen session init
      Tables.names.foreach { n =>
        try Tables.load(spark, dir, n).count() catch { case _: Throwable => () }
      }
      var failed = List.empty[String]
      val results = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // toRdd forces the full physical plan (projections, sorts) — a bare
        // count() would let Catalyst prune the very operators being measured
        try fn(spark, dir).queryExecution.toRdd.count()
        catch { case _: Throwable => failed ::= name }
        name -> (System.nanoTime() - t0) / 1e9
      }
      (results, failed)
    }

    def qJson(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

    val (results, failed) = runSuite(sfDir)
    val fj = failed.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    val sf2 = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF2", "/root/testdata/sf0.01")
    val sf2Part =
      if (sf2 != sfDir && Files.isDirectory(Paths.get(sf2))) {
        val (r2, _) = runSuite(sf2)
        s""","sf2":"$sf2","total2":${r2.values.sum},"queries2":${qJson(r2)}"""
      } else ""

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${qJson(results)},"failed":$fj,"sf":"$sfDir"$sf2Part}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: $e") }
    println(line)
    spark.stop()
  }
}
