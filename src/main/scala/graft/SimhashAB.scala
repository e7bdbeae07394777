package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused warm-JVM interleaved A/B for the round-6 SimHash banding rework:
  * the shipped capped bucket-aggregation (in-row Hamming verify, star edges
  * past `maxBandBucket`) vs the pre-r06 band self-join, alternated within
  * one JVM/window so host noise hits both arms equally. The join form lives
  * ONLY here, as the baseline arm — production code has no uncapped path.
  */
object SimhashAB {

  /** The pre-r06 form: band on 16-bit chunks, self-join, verify Hamming on
    * the joined-back signatures. O(k²) candidates on a hot bucket — the
    * scale defect the rework removes; at quiet sf0.1 it measures the
    * CONSTANT-factor cost of the aggregation form instead. */
  private def legacyJoinForm(documents: DataFrame, maxHamming: Int): DataFrame = {
    val numChunks = maxHamming + 1
    val starts = (0 to numChunks).map(i => i * 64 / numChunks)
    val chunks = (0 until numChunks).map { i =>
      val width = starts(i + 1) - starts(i)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftright(col("sig"), starts(i)).bitwiseAND(lit(mask))
    }
    val sigs = documents.select(col("doc_id"), graft.functions.Dedup.simHash(col("text")).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("band_idx", "chunk")))
    val a = banded.select(col("band_idx"), col("chunk"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("chunk"), col("doc_id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "chunk")).where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    def capped(): Double = time(graft.functions.Dedup.simHashNearDuplicates(docs, 3))
    def legacy(): Double = time(legacyJoinForm(docs, 3))
    // parity first: identical pair sets on this corpus (no hot bucket at
    // sf0.1, so the capped form must reproduce the join form exactly)
    val pc = graft.functions.Dedup.simHashNearDuplicates(docs, 3)
      .selectExpr("bit_xor(xxhash64(a, b, hamming))").head.getLong(0)
    val pl = legacyJoinForm(docs, 3)
      .selectExpr("bit_xor(xxhash64(a, b, hamming))").head.getLong(0)
    require(pc == pl, s"parity violated: capped=$pc legacy=$pl")
    capped(); legacy() // warm both plans
    val (cb, lb) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until rounds).foreach { _ => cb += capped(); lb += legacy() }
    val (c, l) = (cb.result(), lb.result())
    println(f"SIMHASH_AB capped_min=${c.min}%.3f legacy_min=${l.min}%.3f " +
      f"capped=${c.map(x => f"$x%.3f").mkString(",")} legacy=${l.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
