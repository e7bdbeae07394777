package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level corpus balancing — the crawl-pipeline operator family that
  * runs on PROVENANCE rather than content: a handful of mega-domains
  * (link farms, mirror networks, viral boilerplate hosts) otherwise dominate
  * the corpus mix before any text-level filter sees a byte. Per-domain
  * aggregate stats are `t_source_stats` (SparkEntry); domain-stratified
  * sampling is [[TextAnalysis.sampleStratified]] over the domain column;
  * this file adds the frequency CAP, the one that needs real distributed
  * machinery.
  */
object Domains {

  /** Keep at most `cap` documents per domain, chosen by a deterministic
    * md5-hash priority over `keyCol` — a stable uniform sample of each
    * over-cap domain (the C4-style mega-domain defense). Hash priority, not
    * arrival order: membership is a pure function of the key, so it is
    * stable under retries, resume, and re-partitioning, exactly like
    * [[TextAnalysis.sampleStratified]]'s split. The priority hash is SALTED
    * with a stage tag: unsalted, the cap keeps precisely the LOW-md5 docs
    * of each domain, and any later stage that selects by the same hash of
    * the same key (the stratified sampler's keep predicate) is then fully
    * correlated with the cap instead of independent of it — observed as a
    * 0.4-fraction sample keeping 16/16 cap survivors. Docs with a NULL domain are
    * never capped (unattributable provenance passes through — the same
    * unscorable-rows-pass contract as the dedup drops).
    *
    * Scale design (the point — a viral domain can hold 10^9 docs):
    *  1. Per-domain counts: one partial/final aggregate over the narrow
    *     domain column. The over-cap set is the Zipf HEAD — small — and
    *     broadcasts.
    *  2. Docs of under-cap domains pass through a broadcast LEFT ANTI join:
    *     the corpus bulk is never shuffled at all.
    *  3. Over-cap docs ship ONLY (key, domain, priority) through ONE
    *     range-partition shuffle on (domain, priority, key), so a
    *     mega-domain SPANS partitions instead of landing in one hot window
    *     partition — the same exact-rank-over-ranges machinery as
    *     [[Packing.qualityTopFraction]]'s concentrated route. Local ranks
    *     within (partition, domain) plus per-(partition, domain) coarse
    *     offsets (a ≤ partitions × hot-domains aggregate, broadcast)
    *     reconstruct the exact global per-domain rank.
    *  4. The kept keys semi-join back to the full rows (≤ cap × hot-domains
    *     keys; AQE broadcasts when small).
    */
  def domainFrequencyCap(df: DataFrame, domainCol: String, cap: Long,
                         keyCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val domain = col(domainCol)
    // the Zipf head, materialized EAGERLY (tiny, but not driver-small at
    // 10^12 docs — checkpoint blocks, not a collect): lazy, this aggregate
    // is a whole-corpus scan that would re-execute under EVERY consumer
    // below (both join builds and the rank branch — the executed plan
    // showed 3 copies before this)
    val hot = df.groupBy(domain.as("d")).agg(count(lit(1)).as("n"))
      .where(col("n") > cap).select(col("d")).localCheckpoint(true)
    val cold = df.join(broadcast(hot), domain === col("d"), "left_anti")
    val hotDocs = df.join(broadcast(hot), domain === col("d"), "left_semi")
    // narrow projection through the only corpus-sized shuffle
    val pri = hotDocs.select(col(keyCol).as("k_key"), domain.as("k_dom"),
      md5(concat(col(keyCol).cast("string"), lit(":domain-cap"))).as("k_pri"))
    // rank within (pid, domain): bounded by the RANGE partition size, never
    // by the domain size. Persisted because the kept-key plan consumes it
    // twice (rank rows + coarse offsets) and column pruning de-canonicalizes
    // the two subtrees past exchange reuse — same disease the d_minhash
    // banding rework fixed; unpersisted before return (the kept keys are
    // materialized eagerly below, so the cache cannot outlive the call)
    val local = pri.repartitionByRange(col("k_dom"), col("k_pri"), col("k_key"))
      .withColumn("pid", spark_partition_id())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pid"), col("k_dom"))
          .orderBy(col("k_pri"), col("k_key"))).cast("long"))
      .persist()
    val coarse = Window.partitionBy(col("k_dom")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid"), col("k_dom")).agg(count(lit(1)).as("pcnt"))
      .withColumn("poff", coalesce(sum(col("pcnt")).over(coarse), lit(0L)))
      .select(col("pid"), col("k_dom"), col("poff"))
    // ≤ cap × hot-domains keys, eager (frees `local` and breaks the
    // duplicated rank subtree out of the final union's plan)
    val keptKeys = local.join(broadcast(offsets), Seq("pid", "k_dom"))
      .where(col("poff") + col("rn") <= cap)
      .select(col("k_key")).localCheckpoint(true)
    local.unpersist(false)
    val keptHot = hotDocs.join(keptKeys, col(keyCol) === col("k_key"), "left_semi")
    cold.unionByName(keptHot)
  }
}
