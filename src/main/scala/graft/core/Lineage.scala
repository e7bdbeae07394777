package graft.core

import graft.model.RawDoc
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-batch lineage row (FIXTURES.md §2 `_lineage`): committed together with
  * each batch's output, it is both the job's metrics sink and its resume
  * checkpoint (SURVEY.md §4.3.2). With Iceberg this rides snapshots; on the
  * local Parquet stand-in it is a directory-per-batch + commit marker —
  * same logic, storage seam.
  */
final case class LineageRow(
    batch_id: Int,
    input_fingerprint: String,
    doc_count: Long,
    span_count: Long,
    error_count: Long,
    wall_ms: Long,
    committed_at: String)

/** Checkpoint-resumable batched extraction driver.
  *
  * The input's parquet files are deterministically ordered and grouped into
  * batches; each batch is extracted and written under
  * `out/docs/batch=<id>/` + `out/quarantine/batch=<id>/`, then a lineage row
  * is committed under `out/_lineage/batch=<id>/`. The lineage write is the
  * commit point: on restart, batches with a lineage row (matching
  * fingerprint) are skipped, partially-written batches are overwritten.
  * A killed job therefore resumes to byte-identical output.
  */
object Lineage {

  def inputBatches(spark: SparkSession, rawPath: String, numBatches: Int): Seq[(Int, Seq[String])] = {
    val fs = FileSystem.get(new java.net.URI(rawPath), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(rawPath)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    val n = math.max(1, math.min(numBatches, files.size))
    files.zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1)
      .map { case (b, fl) => (b, fl.map(_._1)) }
  }

  /** Batch identity for the resume check. Hashes, per input file, the path
    * PLUS length and modification time, PLUS the extraction mode: a file
    * rewritten in place (same name, new bytes) or a re-run under a different
    * mode must NOT be skipped as committed — path-only hashing would
    * silently keep stale output in both cases. */
  def fingerprint(spark: SparkSession, files: Seq[String], mode: String): String = {
    val fs = FileSystem.get(new java.net.URI(files.head),
      spark.sparkContext.hadoopConfiguration)
    val sig = files.sorted.map { p =>
      val st = fs.getFileStatus(new Path(p))
      s"$p|${st.getLen}|${st.getModificationTime}"
    }.mkString("\n") + s"\nmode=$mode"
    java.lang.Long.toHexString(graft.corpus.SyntheticCorpus.fnv1a64(sig))
  }

  def committedBatches(spark: SparkSession, outPath: String,
                       store: DocStore = DocStore()): Map[Int, LineageRow] = {
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(outPath), spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$outPath/_lineage")
    if (!fs.exists(dir)) Map.empty
    else try {
      store.read(spark, s"$outPath/_lineage").as[LineageRow]
        .collect().map(r => r.batch_id -> r).toMap
    } catch {
      // _lineage exists but holds no readable rows (job killed inside the
      // very first lineage write, leaving only _temporary): nothing is
      // committed — resume from scratch, overwriting partial output, rather
      // than crashing the restart
      case _: org.apache.spark.sql.AnalysisException => Map.empty
    }
  }

  /** Run (or resume) the batched extraction job. Returns the lineage rows of
    * every batch that is committed when the call finishes. `mode` selects
    * the extraction path: `expr` (fused expression, default), `auto`
    * (3-tier skew routing), `chunked` (typed mega-doc path), `typed`
    * (mapPartitions).
    */
  def runBatched(spark: SparkSession, rawPath: String, outPath: String,
                 numBatches: Int = 8, mode: String = "expr",
                 store: DocStore = DocStore()): Seq[LineageRow] = {
    import spark.implicits._
    require(Set("expr", "auto", "typed", "chunked")(mode), s"unknown mode $mode")
    // captured before the per-batch `functions._` wildcard import, which
    // would make a bare `mode` reference ambiguous with functions.mode
    val extractMode = mode
    val batches = inputBatches(spark, rawPath, numBatches)
    val done = committedBatches(spark, outPath, store)
    // a previously-committed batch id beyond the current grouping means the
    // output still holds data this run will never overwrite — resuming would
    // leave duplicate documents behind; demand an explicit clean start
    val stale = done.keys.filter(_ >= batches.size)
    require(stale.isEmpty,
      s"output has committed batches ${stale.toSeq.sorted.mkString(",")} beyond " +
        s"the current numBatches=${batches.size} grouping; wipe $outPath " +
        "(Main: --no-resume) before shrinking the batch count")
    // footer-only probe: read with the n_spans-bearing schema when the input
    // carries the materialized count, so auto mode's tier filters can prune
    // row groups (a fixed rawDocs schema would project the column away and
    // silently fall back to post-scan size(spans) filters)
    val hasN = batches.headOption.exists { case (_, files) =>
      spark.read.parquet(files.head).schema.fieldNames.contains("n_spans")
    }
    val readSchema = if (hasN && mode == "auto") graft.model.Schemas.rawDocsWithN
                     else graft.model.Schemas.rawDocs
    val rows = batches.map { case (batchId, files) =>
      val fp = fingerprint(spark, files, extractMode)
      done.get(batchId) match {
        case Some(row) if row.input_fingerprint == fp => row // resume: skip
        case _ =>
          val t0 = System.nanoTime()
          import org.apache.spark.sql.functions._
          val rawDf = spark.read.schema(readSchema).parquet(files: _*)
          val extracted = (extractMode match {
            case "chunked" => Extract.runChunked(rawDf.select("doc_id", "spans", "meta").as[RawDoc]).toDF()
            case "typed"   => Extract.run(rawDf.select("doc_id", "spans", "meta").as[RawDoc]).toDF()
            case "auto"    => Extract.runAuto(rawDf)
            case _         => Extract.runExpr(rawDf)
          }).persist()
          try {
            val good = extracted.where(col("error").isNull).select("doc_id", "spans")
            val bad = extracted.where(col("error").isNotNull).select("doc_id", "error")
            store.write(good, s"$outPath/docs/batch=$batchId")
            store.write(bad, s"$outPath/quarantine/batch=$batchId")
            val stats = good
              .agg(count(lit(1)), coalesce(sum(size(col("spans"))), lit(0L))).head()
            val (docs, spans) = (stats.getLong(0), stats.getLong(1))
            val errs = bad.count()
            val row = LineageRow(batchId, fp, docs, spans, errs,
              (System.nanoTime() - t0) / 1000000,
              java.time.Instant.now().toString)
            // commit point: lineage row written last
            store.write(Seq(row).toDS().toDF(), s"$outPath/_lineage/batch=$batchId")
            row
          } finally extracted.unpersist()
      }
    }
    rows
  }
}
