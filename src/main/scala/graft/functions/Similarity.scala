package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The dot product is a `zip_with`+`aggregate` HOF (codegen, no UDF);
  *    the query side is broadcast so the big side never shuffles.
  *  - [[lshTopK]]: random-hyperplane LSH — signatures are per-row HOFs;
  *    the search joins only within matching buckets (multiprobe over bands),
  *    so the candidate set is a tiny fraction of the corpus. This is the
  *    100 TB path: bucket join instead of cross product.
  */
object Similarity {

  /** aggregate-HOF dot product of two float arrays (cast to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / greatest(normA * normB, lit(1e-12))

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both have (vec_id, embedding); queries is expected small → broadcast.
    * Ties break on neighbor id (deterministic). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      l2Norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      l2Norm(col("embedding")).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane signature: `bits` pseudo-random hyperplanes, each
    * derived deterministically from (seed, dim index) via a hash-based ±1
    * projection; the sign of the projection gives one bit. Per-row HOF.
    */
  def rhpSignature(embedding: Column, bits: Int): Column =
    array((0 until bits).map { plane =>
      val proj = aggregate(
        zip_with(embedding, sequence(lit(0), size(embedding) - 1),
          // pseudo-random ±1 weight per (plane, dim): parity of xxhash64
          (x, i) => x.cast("double") *
            when(xxhash64(lit(plane), i).bitwiseAND(lit(1L)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** LSH-bucketed ANN: join queries to corpus rows sharing at least one
    * signature band, score only those candidates, keep top-k. Recall rises
    * with `numBands` (multiprobe); cost stays ~bucket-sized. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 16, numBands: Int = 4): DataFrame = {
    val rowsPerBand = bits / numBands
    def banded(df: DataFrame, idCol: String): DataFrame = {
      val bandKeys = (0 until numBands).map { b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(j =>
          element_at(col("sig"), b * rowsPerBand + j + 1))): _*)
      }
      df.select(col("vec_id").as(idCol), col("embedding"),
          rhpSignature(col("embedding"), bits).as("sig"))
        .select(col(idCol), col("embedding"),
          posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
    }
    val q = banded(queries, "query_id")
      .withColumnRenamed("embedding", "qv")
    val c = banded(corpus, "neighbor_id")
      .withColumnRenamed("embedding", "cv")
    val cand = q.join(c, Seq("band_idx", "band_key"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("cosine",
      cosine(col("qv"), col("cv"), l2Norm(col("qv")), l2Norm(col("cv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
