package graft

import graft.core.Extract
import graft.model.RawDoc
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (r07): where does the chunked-path bench entry spend its
  * time — direct (single-chunk) branch, multi-chunk branch, the good()
  * filter, or the parquet write? Not part of the driver contract. */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("graft-chunk-probe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Bench.ensureBenchCorpus(spark, 20000)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CHUNKPROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def raw = spark.read.schema(graft.model.Schemas.rawDocs)
      .parquet(Bench.BenchRawPath).as[RawDoc]
    println("CHUNKPROBE n_big=" + raw.filter(size(col("spans")) > 8192).count()
      + " n_all=" + raw.count())
    (1 to 3).foreach { i =>
      t(s"chunked_noop_$i") {
        Extract.runChunked(raw).write.mode(SaveMode.Overwrite).format("noop").save()
      }
    }
    (1 to 2).foreach { i =>
      t(s"chunked_good_write_$i") {
        Extract.good(Extract.runChunked(raw))
          .write.mode(SaveMode.Overwrite).parquet("/tmp/graft_chunkprobe_out.parquet")
      }
    }
    (1 to 2).foreach { i =>
      t(s"expr_good_write_$i") {
        val rawDf = spark.read.schema(graft.model.Schemas.rawDocs).parquet(Bench.BenchRawPath)
        Extract.runExpr(rawDf).write.mode(SaveMode.Overwrite).parquet("/tmp/graft_chunkprobe_out2.parquet")
      }
    }
    (1 to 2).foreach { i =>
      t(s"typed_good_write_$i") {
        Extract.good(Extract.run(raw)).write.mode(SaveMode.Overwrite).parquet("/tmp/graft_chunkprobe_out3.parquet")
      }
    }
    spark.stop()
  }
}
