package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (spark_guide: one per suite,
  * lazy). local[4] keeps test wall-time low; parallelism-sensitive paths are
  * exercised explicitly in ScalingBench.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // the SQL-surface registration under test in GraftExtensionsSpec —
      // shared here so the spec exercises the same injection path a
      // production `spark.sql.extensions=graft.GraftExtensions` config uses
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
