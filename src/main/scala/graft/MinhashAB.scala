package graft

import org.apache.spark.sql.SparkSession

/** Focused interleaved A/B for the MinHash sketch-cache trade (round-5
  * advice follow-up): times `minHashNearDuplicates` over the sf0.1
  * documents table with `cacheSketch` off vs on, alternating within the
  * same JVM/window so host noise hits both variants equally. Evidence for
  * the `cacheSketch = false` default (see Dedup.scala). */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def run(cache: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.functions.Dedup.minHashNearDuplicates(docs, 0.5, cacheSketch = cache)
        .foreach(_ => ())
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run(cache = false); run(cache = true) // warmup both plans
    val (off, on) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until rounds).foreach { _ => off += run(false); on += run(true) }
    val (o, c) = (off.result(), on.result())
    println(f"MINHASH_AB nocache_min=${o.min}%.3f cache_min=${c.min}%.3f " +
      f"nocache=${o.map(x => f"$x%.3f").mkString(",")} cache=${c.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
