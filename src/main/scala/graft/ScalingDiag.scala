package graft

import graft.core.Extract
import graft.model.RawDoc
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Diagnostic: split the extraction job into scan+extract (count) vs full
  * scan+extract+write, at both parallelism levels, to locate the scaling
  * bottleneck. Not part of the driver contract.
  */
object ScalingDiag {
  def main(args: Array[String]): Unit = {
    def sess(cores: Int) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    Seq(8, 32, 8, 32).foreach { cores =>
      val s = sess(cores)
      import s.implicits._
      def raw = s.read.schema(graft.model.Schemas.rawDocs).parquet(Bench.BenchRawPath).as[RawDoc]
      val scanOnly = t { raw.foreach(_ => ()) }
      val extractCount = t { Extract.good(Extract.run(raw)).foreach(_ => ()) }
      val full = t { Extract.good(Extract.run(raw)).write.mode(SaveMode.Overwrite)
        .parquet("/dev/shm/graft_diag_out.parquet") }
      println(f"DIAG cores=$cores%2d scan=$scanOnly%6.2f extract=$extractCount%6.2f full=$full%6.2f")
      s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession(); System.gc()
    }
  }
}
