package graft

import org.apache.spark.sql.SparkSession

/** Focused interleaved A/B for the CC small-graph fast path (round 5):
  * times the full d_cc_components composition (ngram-Jaccard pairs →
  * closure) with the driver union-find gate engaged vs the distributed
  * min-label loop forced (`smallGraphEdges = 0`), alternating in one warm
  * JVM so host noise hits both variants equally. */
object CcAB {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def run(gate: Long): Double = {
      val t0 = System.nanoTime()
      graft.functions.Dedup.connectedComponents(
        graft.functions.Dedup.ngramJaccardPairs(docs, 3, 0.5), gate)
        .foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    run(graft.functions.Dedup.SmallGraphEdges); run(0L) // warmup both
    val (fast, loop) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until rounds).foreach { _ =>
      fast += run(graft.functions.Dedup.SmallGraphEdges); loop += run(0L)
    }
    val (f, l) = (fast.result(), loop.result())
    println(f"CC_AB fast_min=${f.min}%.3f loop_min=${l.min}%.3f " +
      f"fast=${f.map(x => f"$x%.3f").mkString(",")} loop=${l.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
