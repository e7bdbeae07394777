package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-order operators for training-data preparation: sequence packing
  * and top-fraction quality filtering. Both need a total order over the
  * corpus — the one thing a naive Spark plan gets wrong at scale, because
  * an un-partitioned window (`row_number() OVER (ORDER BY ...)`) collapses
  * the whole corpus into ONE task.
  *
  * The scale pattern used by both (classic parallel prefix-sum, two levels):
  * split the total order into ORDER-ALIGNED buckets (every row in bucket b
  * sorts before every row in bucket b+1), run the fine-grained window
  * partitioned by bucket (fully parallel, one shuffle), aggregate one row
  * per bucket (a few hundred rows), prefix-scan THAT tiny table on a single
  * partition (trivial), and broadcast-join the bucket offsets back. The only
  * single-partition work is over the bucket aggregate, never the corpus.
  */
object Packing {

  /** GPT-style concat-and-cut sequence packing: documents are laid out in a
    * deterministic global order and the concatenated token stream is cut
    * into fixed `seqLen`-token training sequences. Returns per document its
    * token count, its start offset in the stream, and the first/last
    * sequence ids its tokens land in.
    *
    * The order key is `md5(doc_id)` — engine-portable (same trick as the
    * stratified-sampling predicate), reshuffle/retry-stable, and an
    * effectively random permutation, which is exactly what a training run
    * wants. Its first two hex chars give 256 order-aligned buckets for the
    * prefix-sum pattern above. Offsets use integer arithmetic end to end
    * (`div`, not `/`): at 100 TB the stream offset exceeds 2^53 and a
    * double-typed division would silently lose tokens.
    */
  def packSequences(documents: DataFrame, seqLen: Int): DataFrame =
    packByCount(documents.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")), seqLen)

  /** Packing for INTERLEAVED text+media documents — the extraction engine's
    * own output shape `(doc_id, spans)`: each image span occupies a fixed
    * `imageTokens` slot in the training stream (the standard interleaved-
    * pretraining accounting: a vision encoder emits a constant patch-token
    * budget per image), text spans their whitespace token count. The span
    * walk is one per-row HOF `aggregate` — no explode, no shuffle — feeding
    * the same two-level prefix-sum as [[packSequences]]. */
  def packInterleaved(docs: DataFrame, seqLen: Int, imageTokens: Int = 64): DataFrame = {
    require(imageTokens >= 0, s"imageTokens must be >= 0, got $imageTokens")
    val spanTokens = aggregate(col("spans"), lit(0L), (acc, s) =>
      acc + when(s.getField("kind") === "image", lit(imageTokens.toLong))
        .otherwise(TextAnalysis.tokenCount(s.getField("text")).cast("long")))
    packByCount(docs.select(col("doc_id"), spanTokens.as("n_tokens")), seqLen)
  }

  /** The shared two-level concat-and-cut core over `(doc_id, n_tokens)`. */
  private def packByCount(counted: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val keyed = counted.select(
      col("doc_id"),
      col("n_tokens"),
      md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .withColumn("bucket", substring(col("k"), 1, 2))
      // explicit (vacuously true) null-gate: the broadcast join infers
      // isnotnull(bucket) on the probe side only, which would de-canonicalize
      // the two consumers of this subtree and defeat exchange reuse — with it
      // both branches share ONE corpus scan + shuffle (verified in PLANS.md)
      .where(col("bucket").isNotNull)
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = keyed.withColumn("loc",
      coalesce(sum(col("n_tokens")).over(inBucket), lit(0L)))
    // bucket totals from the POST-window output (last row's loc + n_tokens),
    // not from a second pass over `keyed`: aggregating the raw side again
    // would re-scan the corpus parquet — text column included — twice, while
    // this branch re-reads only the fine window's shuffle (40-byte rows) via
    // exchange reuse. coarse level: 256 rows — the un-partitioned window
    // below is deliberate.
    val bucketTotals = local.groupBy(col("bucket"))
      .agg(max(col("loc") + col("n_tokens")).as("btot"))
    val coarse = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boff", coalesce(sum(col("btot")).over(coarse), lit(0L)))
      .select(col("bucket"), col("boff"))
    local.join(broadcast(offsets), Seq("bucket"))
      .withColumn("tok_start", col("boff") + col("loc"))
      // empty docs (0 tokens) occupy no stream space: pin seq_end = seq_start
      .withColumn("seq_start", expr(s"tok_start div ${seqLen.toLong}"))
      .withColumn("seq_end",
        expr(s"(tok_start + greatest(n_tokens, 1L) - 1L) div ${seqLen.toLong}"))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        col("seq_start"), col("seq_end"))
  }

  /** Keep the best `keepFrac` of the corpus by [[TextAnalysis.qualityScore]],
    * ties broken by doc_id — the standard quality-pruning pass, made exact
    * and deterministic (a value-threshold filter is neither: the threshold
    * is a float quantile and ties straddle it).
    *
    * Global rank without a global window: quality lives in [0, 1], so
    * `floor(quality * 100)` gives ~101 order-aligned buckets; rank =
    * (rows in strictly-better buckets, from the tiny prefix aggregate)
    * + row_number within the bucket. Identical to
    * `row_number() OVER (ORDER BY quality DESC, doc_id)` — the bucket id is
    * monotone in quality, and ties can't cross a bucket boundary.
    * Skew note: quality is a smooth composite score, so bucket occupancy is
    * spread; a pathological corpus concentrating one bucket degrades to the
    * skew of ONE window partition, not a single-task global sort.
    */
  def qualityTopFraction(documents: DataFrame, keepFrac: Double): DataFrame = {
    require(keepFrac >= 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in [0, 1], got $keepFrac")
    val q = documents.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("bucket", floor(col("quality") * 100).cast("int"))
      // null-text docs have null quality: by contract they are excluded from
      // BOTH the ranking and the denominator (an unscorable doc is not part
      // of "the corpus" being pruned — mirrored in the t_quality_top
      // oracle). The filter doubles as the canonicalizing null-gate that
      // lets the counts branch reuse the window's shuffle (see
      // packSequences).
      .where(col("bucket").isNotNull)
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("quality").desc, col("doc_id"))
    val local = q.withColumn("rn", row_number().over(inBucket).cast("long"))
    // bucket counts = max(rn) from the post-window output (single corpus
    // scan; the totals branch reuses the window's exchange, as in packSequences)
    val bucketCounts = local.groupBy(col("bucket")).agg(max(col("rn")).as("bcnt"))
    val coarse = Window.orderBy(col("bucket").desc).rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = bucketCounts
      .withColumn("boff", coalesce(sum(col("bcnt")).over(coarse), lit(0L)))
      .withColumn("total", sum(col("bcnt")).over(all))
      .select(col("bucket"), col("boff"), col("total"))
    local.join(broadcast(offsets), Seq("bucket"))
      .where(col("boff") + col("rn") <= floor(col("total") * keepFrac))
      .select(col("doc_id"), col("quality"))
  }
}
