package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for test suites (one JVM for the forked test run;
  * getOrCreate dedupes across suites). */
trait SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the whole test suite runs with the library's SessionExtensions
      // installed — ExtensionsSpec exercises the SQL-registered functions
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
