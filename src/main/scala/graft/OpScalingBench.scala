package graft

import graft.functions.{Dedup, Packing, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence for the round-3 PIPELINE operators (the
  * extraction job has its own gate discharge in BASELINE.md — this probe
  * covers the new shuffle-centric ops: sequence packing, unigram-LM scoring,
  * benchmark decontamination, line dedup). Same pinned-JVM protocol as
  * `ScalingBench`/`bench/scaling.sh`: `gen <mult>` replicates the sf0.1
  * documents table `mult` times (shifted doc_ids) into tmpfs; `measure
  * <cores> <rounds>` runs each op `rounds` times in THIS JVM (pinned by the
  * wrapper via taskset + -XX:ActiveProcessorCount) and prints one
  * GRAFT_OP_TIMES JSON line. `bench/op_scaling.sh` interleaves the levels
  * and appends min-of-rounds rows to BASELINE.md.
  */
object OpScalingBench {

  private val BigPath = "/dev/shm/graft_opscale_docs.parquet"

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

  private def gen(s: SparkSession, mult: Int): Unit = {
    val base = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val big = (0 until mult).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    big.repartition(64).write.mode(SaveMode.Overwrite).parquet(BigPath)
    println(s"GEN ${s.read.parquet(BigPath).count()} docs at $BigPath")
  }

  /** The measured jobs. The fixed-size benchmark side (items only from the
    * first replica) mirrors reality: eval suites don't grow with the corpus. */
  private def jobs(s: SparkSession): Seq[(String, () => Unit)] = {
    def docs: DataFrame = s.read.parquet(BigPath)
    def noop(df: DataFrame): Unit =
      df.write.mode(SaveMode.Overwrite).format("noop").save()
    val bench = docs
      .where(col("doc_id") < 1000000L && col("doc_id") % 50 === 0)
      .select(array_join(
        slice(split(TextAnalysis.normalized(col("text")), " "), 1, 30), " ").as("text"))
    Seq(
      "t_pack" -> (() => noop(Packing.packSequences(docs, 2048))),
      "t_unigram_nll" -> (() => noop(TextAnalysis.unigramLogProb(docs))),
      "d_contamination" -> (() => noop(Dedup.contaminationReport(docs, bench, 13))),
      // replication makes every text df == mult: with the cap below it, the
      // whole corpus drops — the maximally shuffle-heavy path (full explode,
      // full df agg, full anti-join, full regroup)
      "d_drop_lines" -> (() => noop(Dedup.dropRepeatedLines(docs, 10))))
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val s = session(32)
      try gen(s, args(1).toInt) finally s.stop()
    case "measure" =>
      val cores = args(1).toInt
      val rounds = args(2).toInt
      val s = session(cores)
      try {
        val js = jobs(s)
        js.foreach { case (_, f) => f() } // JIT/codegen warmup, one pass
        // fleet start barrier (same contract as ScalingBench): all K JVMs
        // finish warmup before ANY timed round, so compared rounds contend
        sys.env.get("SPARK_GRAFT_BARRIER").foreach { spec =>
          val Array(dir, kStr) = spec.split(':')
          val d = new java.io.File(dir); d.mkdirs()
          new java.io.File(d, s"ready-${ProcessHandle.current().pid()}").createNewFile()
          val deadline = System.nanoTime() + 10L * 60 * 1000000000L
          def ready = Option(d.listFiles())
            .map(_.count(_.getName.startsWith("ready-"))).getOrElse(0)
          while (ready < kStr.toInt) {
            if (System.nanoTime() > deadline) sys.error("fleet barrier timed out")
            Thread.sleep(100)
          }
        }
        // suite rounds with epoch marks so the fleet harness can verify the
        // rounds it compares actually ran concurrently across JVMs
        val roundRows = (1 to rounds).map { _ =>
          val start = System.currentTimeMillis() / 1000.0
          val ops = js.map { case (name, f) =>
            val t0 = System.nanoTime()
            f()
            name -> (System.nanoTime() - t0) / 1e9
          }
          (start, System.currentTimeMillis() / 1000.0, ops)
        }
        val payload = roundRows.map { case (a, b, ops) =>
          val o = ops.map { case (n, t) => s""""$n":${f"$t%.3f"}""" }.mkString(",")
          f"""{"start":$a%.1f,"end":$b%.1f,"ops":{$o}}"""
        }.mkString(",")
        println(s"""GRAFT_OP_TIMES {"cores":$cores,"rounds":[$payload]}""")
      } finally s.stop()
  }
}
