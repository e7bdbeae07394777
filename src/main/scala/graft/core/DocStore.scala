package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The storage seam (SURVEY.md §7): every table the engine PERSISTS —
  * extraction output, quarantine, per-batch lineage rows, pipeline stage
  * tables — goes through this one format-parameterized indirection, so the
  * storage format is a configuration fact, not something the operators
  * know.
  *
  * Locally the format is `parquet`. On a cluster with the Iceberg runtime
  * on the classpath, `DocStore("iceberg")` routes the SAME calls through
  * Iceberg's DataSource V2 provider for path-based tables (catalog tables
  * would swap `save`/`load` for `writeTo`/`table` — one method behind the
  * same seam), and the engine's lineage rows then ride alongside Iceberg's
  * own snapshot commits. Without the runtime, any non-parquet format fails
  * at DSv2 provider RESOLUTION ("Failed to find data source") — i.e. the
  * seam delegates cleanly rather than hard-coding parquet anywhere past
  * this file (asserted by the seam spec).
  *
  * Deliberately NOT behind this seam: reading the raw INPUT corpus.
  * [[Lineage.inputBatches]] batches by parquet file listing — an Iceberg
  * input would batch by snapshot/file-scan-task instead, which is a
  * different (richer) contract than a format string, documented there.
  */
final case class DocStore(format: String = "parquet") {
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format(format).mode(mode).save(path)
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)
}
