package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warm-JVM alternated A/B for the exact-substring dedup rewrite: the
  * shipped interval-merged removal path vs the naive removal-START-list
  * form it replaced (kept INLINE here as the legacy arm, per the
  * established A/B discipline — noise-immune comparisons need both arms in
  * one JVM, alternated per rep, min-of-N).
  *
  * The corpus is PLANTED for the regime the merge targets: half the docs
  * carry a shared `blockTokens`-token boilerplate block (a licence header /
  * syndicated passage), so every non-canonical carrier holds ~blockTokens
  * removal starts that merge to ONE coverage interval. The naive arm's
  * per-token filter is O(tokens × starts) per doc; the merged arm's is
  * O(tokens × blocks). Parity of output is asserted before timing.
  *
  * Usage: runMain graft.SubstrAB [nDocs=20000] [blockTokens=400] [rounds=3]
  */
object SubstrAB {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val blockTokens = if (args.length > 1) args(1).toInt else 400
    val rounds = if (args.length > 2) args(2).toInt else 3
    val W = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // carriers (even ids) = shared block + 40 unique tokens; the rest fully
    // unique. Deterministic, no Date/random.
    val block = (1 to blockTokens).map(i => s"blk$i").mkString(" ")
    val docs = spark.range(nDocs.toLong).selectExpr("id AS doc_id",
      s"""CASE WHEN id % 2 = 0
         |  THEN concat('$block', ' ', array_join(transform(sequence(1, 40),
         |    i -> concat('u', id, '_', i)), ' '))
         |  ELSE array_join(transform(sequence(1, 120),
         |    i -> concat('v', id, '_', i)), ' ') END AS text""".stripMargin)
      .persist()
    docs.count()

    // legacy arm: identical windows/canon passes, but removal starts are
    // collected raw per doc and the token filter scans every start
    def legacy(documents: DataFrame): DataFrame = {
      val scorable = col("text").isNotNull && length(trim(col("text"))) > 0
      val toks = documents.where(scorable)
        .withColumn("t", split(trim(col("text")), "[ \t\n\f\r]+"))
      def windows(df: DataFrame): DataFrame = df
        .where(size(col("t")) >= W)
        .select(col("doc_id"), posexplode_outer(
          transform(sequence(lit(0), size(col("t")) - W),
            p => md5(concat_ws(" ", slice(col("t"), p + 1, lit(W)))))
        ).as(Seq("pos", "key")))
        .where(col("pos").isNotNull)
      val canon = windows(toks).groupBy("key")
        .agg(count(lit(1)).as("n"), min(struct(col("doc_id"), col("pos"))).as("c"))
        .where(col("n") > 1).select(col("key"), col("c"))
      val removalStarts = windows(toks).join(canon, Seq("key"))
        .where(struct(col("doc_id"), col("pos")) =!= col("c"))
        .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("rpos"))
      toks.join(removalStarts, Seq("doc_id"), "left")
        .withColumn("kept", when(col("rpos").isNull, col("t")).otherwise(
          filter(col("t"), (_, i) => !exists(col("rpos"), p => p <= i && i < p + W))))
        .where(size(col("kept")) > 0)
        .withColumn("text", concat_ws(" ", col("kept")))
        .drop("t", "rpos", "kept")
        .unionByName(documents.where(!scorable))
    }

    // parity before timing
    val a = graft.functions.Dedup.dropDuplicatedSubstrings(docs, W)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = legacy(docs).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    require(a == b, s"arm outputs differ: merged=${a.size} legacy=${b.size}")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.foreach(_ => ()); (System.nanoTime() - t0) / 1e9
    }
    def merged() = time(graft.functions.Dedup.dropDuplicatedSubstrings(docs, W))
    def naive() = time(legacy(docs))
    merged(); naive() // warmup both plans
    val (m, n) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until rounds).foreach { _ => m += merged(); n += naive() }
    val (mm, nn) = (m.result(), n.result())
    println(f"SUBSTR_AB docs=$nDocs block=$blockTokens merged_min=${mm.min}%.3f " +
      f"legacy_min=${nn.min}%.3f merged=${mm.map(x => f"$x%.3f").mkString(",")} " +
      f"legacy=${nn.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
