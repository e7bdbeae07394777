package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Scaling-efficiency evidence for the north rule (≥0.8 from N→4N
  * parallelism). The sandbox has no multi-node cluster, so — per the driver
  * instruction — the same job runs at two parallelism levels (local[8] vs
  * local[32]) on the same input; this main measures both, computes
  * efficiency = (T8/T32)/4, and appends the measured rows to BASELINE.md.
  *
  * Run: `sbt -batch "runMain graft.ScalingBench [nDocs]"`.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(50000L)
    val runsPerLevel = 3

    // generate once at full parallelism
    val gen = session(32)
    Bench.ensureBenchCorpus(gen, nDocs)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    def measure(cores: Int): (Double, Long) = {
      val s = session(cores)
      try {
        // warmup once, then median of runsPerLevel
        Bench.extractionJob(s, chunked = false)
        val times = (1 to runsPerLevel).map(_ => Bench.extractionJob(s, chunked = false))
        val med = times.map(_._1).sorted.apply(runsPerLevel / 2)
        (med, times.head._2)
      } finally {
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }

    val (t8, docs) = measure(8)
    val (t32, _) = measure(32)
    val eff = (t8 / t32) / 4.0
    val tp8 = docs / t8
    val tp32 = docs / t32
    val ts = java.time.Instant.now().toString
    val row =
      f"""
         |## Measured scaling run ($ts, $docs docs, median of $runsPerLevel)
         |
         || Metric | Value |
         ||---|---|
         || docs/sec @ local[8] | $tp8%.1f (T=$t8%.2fs) |
         || docs/sec @ local[32] | $tp32%.1f (T=$t32%.2fs) |
         || scaling efficiency (T8/T32)/4 | $eff%.3f (gate ≥ 0.8) |
         |""".stripMargin
    Files.write(Paths.get("/root/repo/BASELINE.md"), row.getBytes,
      StandardOpenOption.APPEND, StandardOpenOption.CREATE)
    println(f"""{"docs":$docs,"t8_sec":$t8%.3f,"t32_sec":$t32%.3f,"docs_per_sec_8":$tp8%.1f,"docs_per_sec_32":$tp32%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}
