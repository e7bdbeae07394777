package graft

import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: breaks `d_cc_components` wall time into pair
  * generation vs CC-loop rounds (the r04 ≤8 s drill). Not part of the
  * driver contract. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("graft-cc-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CCPROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val pairs = t("pairs_gen") {
      val p = Dedup.ngramJaccardPairs(docs, 3, 0.5).persist()
      p.count(); p
    }
    val edges = t("edges") {
      val e = Dedup.ccEdges(pairs).persist()
      println(s"CCPROBE n_edges ${e.count()}"); e
    }
    t("seed+loop") {
      var labels = Dedup.ccSeed(edges).localCheckpoint(false)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 50) {
        val next = t(s"round_$rounds") {
          val n = Dedup.ccRound(labels, edges).localCheckpoint(false)
          changed = n.where(col("chg")).count(); n
        }
        labels = next.select(col("v"), col("label"))
        rounds += 1
      }
      println(s"CCPROBE rounds $rounds")
    }
    spark.stop()
  }
}
