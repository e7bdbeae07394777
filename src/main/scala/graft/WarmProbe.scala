package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Diagnostic main (r07): runs each headline bench query 3× in ONE warm JVM
  * (noop sink, same construction as Bench) and prints min/last times — the
  * steady-state compute floor per query, separating real work from the
  * one-shot plan-compile/codegen/JIT overhead the driver bench pays. Not
  * part of the driver contract. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "x1_extract_spans", "q_all_text", "q_count_by_kind", "q_doc_stats",
      "q_heading_paths", "q_depth", "q_siblings", "t_fingerprint", "t_quality",
      "d_minhash", "d_simhash", "d_cc_components", "d_contamination",
      "t_pack", "t_quality_top", "s_ann_top1", "s_ann_ivf",
      "r_q1", "r_top_customers")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.ensure(spark)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode(SaveMode.Overwrite).format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"WARMPROBE $name min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
