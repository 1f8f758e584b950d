package graft
import org.apache.spark.sql.SparkSession
// temporary debug harness, not part of the library surface
object DebugMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
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
