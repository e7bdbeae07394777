package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-7 plan snapshot tool: dumps `.explain("formatted")` for named
  * SparkEntry queries (args: outDir suffix, then query names; default = the
  * round-7 optimization targets) to `plans/r07/<query>_<suffix>.txt`.
  * Diagnostic only — not part of the driver contract.
  *
  * `d_cc_components` is EAGER (the CC gate runs at query-construction time),
  * so its dump is the lazy pair-generation plan (`cc_pairs_input`) plus the
  * returned frame's plan; the interesting shuffle structure lives in the
  * former.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d_ngram_jaccard", "extract_chunked", "d_minhash", "d_simhash",
        "d_embed_neardup_lsh", "d_cc_components", "t_fingerprint", "s_ann_ivf",
        "d_contamination", "t_pack", "t_quality_top")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.ensure(spark)
    Bench.ensureBenchCorpus(spark, 20000)
    val dir = Paths.get("plans/r07")
    Files.createDirectories(dir)
    def dump(name: String, plan: String): Unit = {
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"PLANDUMP wrote ${name}_$suffix.txt")
    }
    def fmt(df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    names.foreach {
      case "extract_chunked" =>
        import spark.implicits._
        val raw = spark.read.schema(graft.model.Schemas.rawDocs)
          .parquet(Bench.BenchRawPath).as[graft.model.RawDoc]
        dump("extract_chunked", fmt(graft.core.Extract.runChunked(raw).toDF()))
      case "d_cc_components" =>
        // the lazy pair+edge input plan (what the CC gate actually executes)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val pairs = graft.functions.Dedup.ngramJaccardPairs(docs, 3, 0.5)
        dump("d_cc_components", "-- ccEdges(pairs) input plan (the eager CC gate's first action):\n" +
          fmt(graft.functions.Dedup.ccEdges(pairs)))
      case name =>
        SparkEntry.queries.get(name) match {
          case Some(fn) => dump(name, fmt(fn(spark, sfDir)))
          case None => println(s"PLANDUMP unknown query $name")
        }
    }
    spark.stop()
  }
}
