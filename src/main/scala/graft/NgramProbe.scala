package graft

import graft.functions.{Dedup, ShingleHashExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (r07): decomposes `ngramJaccardPairs` wall time into its
  * three sweeps + pair synthesis, each run twice (cold JIT vs warm), to find
  * where `d_cc_components` actually spends its time. Not part of the driver
  * contract. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("graft-ngram-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"NGRAMPROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val inv = docs.select(col("doc_id"), explode(ShingleHashExpr(col("text"), 3)).as("g"))
    (1 to 2).foreach { i =>
      t(s"inv_count_$i") { println("  n=" + inv.count()) }
    }
    val hot = inv.groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") > 100).select(col("g"))
    (1 to 2).foreach { i => t(s"hot_agg_$i") { noop(hot) } }
    val ids = col("ids")
    val buckets = inv.join(broadcast(hot), Seq("g"), "left_anti")
      .groupBy(col("g")).agg(collect_list(col("doc_id")).as("ids"))
      .where(size(ids) > 1)
    (1 to 2).foreach { i => t(s"buckets_$i") { noop(buckets) } }
    val bucketPairs = flatten(transform(ids, (x, j) =>
      transform(slice(ids, j + lit(2), size(ids) - j - lit(1)),
        y => struct(least(x, y).as("a"), greatest(x, y).as("b")))))
    val ic = buckets
      .select(explode(bucketPairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("ic"))
    (1 to 2).foreach { i => t(s"ic_$i") { println("  nc=" + ic.count()) } }
    // explode-only (no pair aggregation): isolates the HOF pair synthesis
    val exploded = buckets.select(explode(bucketPairs).as("p"))
    (1 to 2).foreach { i => t(s"explode_only_$i") { noop(exploded) } }
    val stats = inv
      .join(broadcast(hot.withColumn("ih", lit(true))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_all"),
        collect_list(when(col("ih"), col("g"))).as("hg"))
    (1 to 2).foreach { i => t(s"stats_$i") { noop(stats) } }
    (1 to 3).foreach { i =>
      t(s"full_pairs_$i") { noop(Dedup.ngramJaccardPairs(docs, 3, 0.5)) }
    }
    (1 to 2).foreach { i =>
      t(s"full_cc_$i") { noop(Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs, 3, 0.5))) }
    }
    // executed (AQE-final) plan via listener: the noop write's OWN
    // QueryExecution carries the finalized adaptive plan with runtime
    // ReusedExchange nodes, which neither a pre-execution explain nor a
    // foreach-path QueryExecution shows
    @volatile var lastPlan: String = ""
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        lastPlan = qe.executedPlan.toString
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val pf = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    noop(pf)
    Thread.sleep(1500)
    val ep = lastPlan
    println("NGRAMPROBE executed_reused=" +
      "ReusedExchange".r.findAllIn(ep).length +
      " executed_scans=" + "Scan parquet".r.findAllIn(ep).length)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/ngram_executed.txt"), ep)
    spark.stop()
  }
}
