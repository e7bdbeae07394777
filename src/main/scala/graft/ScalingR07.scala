package graft

import graft.functions.Dedup
import graft.model.RawDoc
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Two-parallelism scaling probe for the ROUND-7-restructured operators
  * (`ngramJaccardPairs` / `connectedComponents` candidate path, and the
  * single-chunk-bypass `runChunked`): same pinned-JVM protocol as
  * `OpScalingBench` (`gen <mult>` then `measure <cores> <rounds>`, wrapper
  * pins via taskset + SPARK_GRAFT_PROCS, min-of-rounds per level). The
  * documents replication is TOKEN-SUFFIXED (the `tools_make_scaled.py`
  * scheme) so replicas stay mutually unrelated and the candidate-pair
  * structure scales linearly instead of exploding shingle document
  * frequencies; the chunked input is the bench corpus copied to tmpfs.
  * Diagnostic only — not part of the driver contract. */
object ScalingR07 {

  private val DocsPath = "/dev/shm/graft_r07_docs.parquet"
  private val RawPath = "/dev/shm/graft_r07_raw.parquet"

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

  private def gen(s: SparkSession, mult: Int, rawMult: Int): Unit = {
    val base = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val big = (0 until mult).map { r =>
      base.select(
        (col("doc_id") + lit(r.toLong * 1000000L)).as("doc_id"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), " "), t => concat(t, lit(s"_r$r")))))
          .as("text"))
    }.reduce(_ unionByName _)
    big.repartition(64).write.mode(SaveMode.Overwrite).parquet(DocsPath)
    println(s"GEN docs=${s.read.parquet(DocsPath).count()} at $DocsPath")
    Bench.ensureBenchCorpus(s, 20000)
    // Extraction has no cross-doc interaction, so id-suffixed replicas give a
    // linear-work corpus for the chunked-path probe without touching the
    // bench fixture itself.
    val rawBase = s.read.schema(graft.model.Schemas.rawDocs).parquet(Bench.BenchRawPath)
    val rawBig = (0 until rawMult).map { r =>
      rawBase.withColumn("doc_id", concat(col("doc_id"), lit(s"_r$r")))
    }.reduce(_ unionByName _)
    rawBig.repartition(64).write.mode(SaveMode.Overwrite).parquet(RawPath)
    println(s"GEN raw=${s.read.parquet(RawPath).count()} at $RawPath")
  }

  private def jobs(s: SparkSession): Seq[(String, () => Unit)] = {
    import s.implicits._
    def docs: DataFrame = s.read.parquet(DocsPath)
    def noop(df: DataFrame): Unit =
      df.write.mode(SaveMode.Overwrite).format("noop").save()
    Seq(
      "d_ngram_pairs" -> (() => noop(Dedup.ngramJaccardPairs(docs, 3, 0.5))),
      "d_cc_components" -> (() =>
        noop(Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs, 3, 0.5)))),
      "extract_chunked" -> (() =>
        noop(graft.core.Extract.runChunked(
          s.read.schema(graft.model.Schemas.rawDocs).parquet(RawPath).as[RawDoc]).toDF()))
    )
  }

  def main(args: Array[String]): Unit = {
    args.toList match {
      case "gen" :: mult :: rest =>
        val rawMult = rest.headOption.map(_.toInt).getOrElse(mult.toInt)
        val s = session(8); gen(s, mult.toInt, rawMult); s.stop()
      case "measure" :: cores :: rounds :: Nil =>
        val s = session(cores.toInt)
        val js = jobs(s)
        js.foreach(_._2()) // warmup
        val mins = (0 until rounds.toInt).foldLeft(Map.empty[String, Double]) { (acc, _) =>
          js.foldLeft(acc) { case (a, (name, f)) =>
            val t0 = System.nanoTime(); f(); val t = (System.nanoTime() - t0) / 1e9
            a.updated(name, math.min(a.getOrElse(name, Double.MaxValue), t))
          }
        }
        val ops = mins.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
        println(s"""GRAFT_R07_SCALING {"cores":${cores.toInt},"ops":$ops}""")
        s.stop()
      // fleet contract (mirrors OpScalingBench.measure): warmup, then wait at
      // the SPARK_GRAFT_BARRIER start barrier so all K JVMs contend during
      // every timed round, then suite rounds with epoch marks for the
      // wrapper's overlap verification.
      case "fleetmeasure" :: cores :: rounds :: Nil =>
        val s = session(cores.toInt)
        try {
          val js = jobs(s)
          js.foreach(_._2()) // warmup
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
          val roundRows = (1 to rounds.toInt).map { _ =>
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
          println(s"""GRAFT_R07_TIMES {"cores":${cores.toInt},"rounds":[$payload]}""")
        } finally s.stop()
      case other => sys.error(s"usage: gen <mult> | measure <cores> <rounds>; got $other")
    }
  }
}
