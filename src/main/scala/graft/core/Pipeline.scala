package graft.core

import graft.functions.{Dedup, Packing}
import graft.queries.SpanQueries
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage lineage row for the composed training-data pipeline — the same
  * commit-marker-last discipline as the per-batch extraction lineage
  * ([[Lineage]]): a stage's row is written only after its output parquet is
  * fully committed, and carries the fingerprint of the stage's INPUT files +
  * parameters, so a restarted pipeline skips exactly the stages whose inputs
  * (and upstream decisions) are unchanged.
  */
final case class StageLineage(
    stage: String,
    input_fingerprint: String,
    rows_in: Long,
    rows_out: Long,
    wall_ms: Long,
    committed_at: String)

/** The end-to-end training-data pipeline a user of this library actually
  * runs (`spark-submit --class graft.Main ... --pipeline`):
  *
  * {{{
  * raw docs ──extract──▶ spans ──allText──▶ (doc_id, text)
  *   ─▶ s1_exact     dropExactDuplicates        (hash keeper semi-join)
  *   ─▶ s2_neardup   dropNearDuplicates         (MinHash-LSH + CC closure)
  *   ─▶ s3_decontam  dropContaminated           (13-gram + short-item routes;
  *                                               skipped when no --benchmark)
  *   ─▶ s3g_gopher   gopherRules keep-gate       (optional, --gopher)
  *   ─▶ s4_quality   qualityTopFraction         (exact distributed rank)
  *   ─▶ s5_pack      packSequences              (two-level prefix sum)
  * }}}
  *
  * Every stage materializes its output under `out/<stage>/` and commits a
  * [[StageLineage]] row under `out/_pipeline/stage=<name>/` LAST. Resume is
  * per stage: a stage whose input-file fingerprint (path+len+mtime of every
  * upstream parquet part + the stage's parameters) matches its committed row
  * is skipped; any upstream rerun changes downstream fingerprints, so the
  * chain re-derives exactly what is stale. The extraction stage additionally
  * resumes per BATCH via [[Lineage.runBatched]] — a kill inside extraction
  * loses at most one batch of work.
  *
  * Stage boundaries are intentionally materialization points: at 100 TB a
  * fused single-plan pipeline would recompute extraction into every consumer
  * and make mid-job failure a full restart; per-stage parquet is the
  * classic checkpoint/cost trade the north rule's "resumable from
  * checkpoint" demands, and each stage's internal plan stays the
  * shuffle-disciplined shape audited in PLANS.md.
  */
object Pipeline {

  final case class Config(
      rawPath: String,
      outPath: String,
      benchmarkPath: Option[String] = None,
      mode: String = "expr",
      batches: Int = 64,
      threshold: Double = 0.5,
      ngram: Int = 3,
      contaminationNgram: Int = 13,
      gopher: Boolean = false,
      // the one corpus-LANGUAGE-dependent Gopher rule: a corpus whose token
      // distribution legitimately lacks the English stoplist (multilingual,
      // code, synthetic) sets this to 0 rather than dropping everything
      gopherMinStopHits: Int = 2,
      keepFrac: Double = 0.8,
      seqLen: Int = 2048)

  /** Fingerprint of a stage's input: every parquet part file (path, length,
    * mtime) under the input dirs, recursively, plus the parameter string —
    * the [[Lineage.fingerprint]] identity extended to directory trees. */
  def stageFingerprint(spark: SparkSession, inputDirs: Seq[String], params: String): String = {
    val sigs = inputDirs.flatMap { dir =>
      val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      val p = new Path(dir)
      if (!fs.exists(p)) Seq(s"$dir|absent")
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet"))
            buf += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
        }
        buf.sorted
      }
    }
    java.lang.Long.toHexString(graft.corpus.SyntheticCorpus.fnv1a64(
      sigs.mkString("\n") + s"\nparams=$params"))
  }

  private def committedStage(spark: SparkSession, outPath: String, stage: String): Option[StageLineage] = {
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(outPath), spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$outPath/_pipeline/stage=$stage")
    if (!fs.exists(dir)) None
    // ANY unreadable lineage row — empty dir (AnalysisException), torn
    // parquet footer (SparkException/IOException at collect) — means the
    // commit never completed: re-derive the stage. The row is one tiny
    // record and re-deriving is always safe, so NonFatal, not a narrow catch.
    else try spark.read.parquet(dir.toString).as[StageLineage].collect().headOption
    catch { case scala.util.control.NonFatal(_) => None } // torn write → rerun
  }

  /** Run one resumable stage: skip if committed with a matching input
    * fingerprint, else evaluate `body` over the input, write `out/<name>`,
    * and commit the lineage row last. The in/out counts are column-pruned
    * parquet scans of already-materialized stage tables — metrics, not a
    * recompute of the stage plan. */
  private def runStage(spark: SparkSession, cfg: Config, name: String,
                       inputDirs: Seq[String], params: String)
                      (body: DataFrame => DataFrame): StageLineage = {
    import spark.implicits._
    val fp = stageFingerprint(spark, inputDirs, params)
    // a committed lineage row only licenses a skip if the stage's OUTPUT is
    // also still on disk — a pruned/partially-restored output tree with a
    // surviving lineage row must re-derive, not crash the downstream read
    val outExists = {
      val fs = FileSystem.get(new java.net.URI(cfg.outPath),
        spark.sparkContext.hadoopConfiguration)
      fs.exists(new Path(s"${cfg.outPath}/$name"))
    }
    committedStage(spark, cfg.outPath, name) match {
      case Some(row) if row.input_fingerprint == fp && outExists => row // resume: skip
      case _ =>
        val t0 = System.nanoTime()
        val in = spark.read.parquet(inputDirs.head)
        val out = body(in)
        out.write.mode(SaveMode.Overwrite).parquet(s"${cfg.outPath}/$name")
        val written = spark.read.parquet(s"${cfg.outPath}/$name")
        val row = StageLineage(name, fp, in.count(), written.count(),
          (System.nanoTime() - t0) / 1000000, java.time.Instant.now().toString)
        // commit point: lineage row written last
        Seq(row).toDS().coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"${cfg.outPath}/_pipeline/stage=$name")
        row
    }
  }

  /** Run (or resume) the full pipeline. Returns the stage lineage rows in
    * execution order. `failAfter` is a test-only failpoint: the run throws
    * immediately AFTER the named stage commits, simulating a mid-pipeline
    * kill with a torn downstream. */
  def run(spark: SparkSession, cfg: Config,
          failAfter: Option[String] = None): Seq[StageLineage] = {
    val rows = scala.collection.mutable.ArrayBuffer[StageLineage]()
    def checkpoint(name: String): Unit =
      if (failAfter.contains(name))
        throw new RuntimeException(s"pipeline failpoint after stage $name")

    // ---- extract (per-batch resume inside runBatched) ----
    // The summary row reports metrics only; its fingerprint field is a
    // sentinel — extract's resume identity lives PER BATCH inside
    // runBatched's own lineage, and recomputing a recursive whole-input
    // fingerprint here would be a second full listing of the raw corpus
    // (millions of object-store LIST calls at scale) that no resume
    // decision ever reads.
    val t0 = System.nanoTime()
    val batchRows = Lineage.runBatched(spark, cfg.rawPath, s"${cfg.outPath}/extract",
      numBatches = cfg.batches, mode = cfg.mode)
    rows += StageLineage("extract", "per-batch (extract/_lineage)",
      batchRows.map(r => r.doc_count + r.error_count).sum,
      batchRows.map(_.doc_count).sum,
      (System.nanoTime() - t0) / 1000000, java.time.Instant.now().toString)
    checkpoint("extract")

    val extractedDocs = s"${cfg.outPath}/extract/docs"

    rows += runStage(spark, cfg, "s1_exact", Seq(extractedDocs), "") { in =>
      Dedup.dropExactDuplicates(
        SpanQueries.allText(in.select(col("doc_id"), col("spans"))))
    }
    checkpoint("s1_exact")

    rows += runStage(spark, cfg, "s2_neardup", Seq(s"${cfg.outPath}/s1_exact"),
      s"threshold=${cfg.threshold},ngram=${cfg.ngram}") { in =>
      Dedup.dropNearDuplicates(in, cfg.threshold, cfg.ngram)
    }
    checkpoint("s2_neardup")

    var current = s"${cfg.outPath}/s2_neardup"
    cfg.benchmarkPath.foreach { bench =>
      rows += runStage(spark, cfg, "s3_decontam", Seq(current, bench),
        s"ngram=${cfg.contaminationNgram}") { in =>
        Dedup.dropContaminated(in, spark.read.parquet(bench), cfg.contaminationNgram)
      }
      current = s"${cfg.outPath}/s3_decontam"
      checkpoint("s3_decontam")
    }

    if (cfg.gopher) {
      // a purely row-local gate: filter with the keep PREDICATE — one scan,
      // zero shuffle (the report-form self-join would scan twice and
      // exchange both sides for nothing; s4's join below genuinely needs a
      // join because ranking is global)
      rows += runStage(spark, cfg, "s3g_gopher", Seq(current),
        s"minStopHits=${cfg.gopherMinStopHits}") { in =>
        in.where(graft.functions.TextAnalysis
          .gopherKeep(minStopHits = cfg.gopherMinStopHits))
      }
      current = s"${cfg.outPath}/s3g_gopher"
      checkpoint("s3g_gopher")
    }

    rows += runStage(spark, cfg, "s4_quality", Seq(current),
      s"keepFrac=${cfg.keepFrac}") { in =>
      in.join(Packing.qualityTopFraction(in, cfg.keepFrac).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    }
    checkpoint("s4_quality")

    rows += runStage(spark, cfg, "s5_pack", Seq(s"${cfg.outPath}/s4_quality"),
      s"seqLen=${cfg.seqLen}") { in =>
      Packing.packSequences(in, cfg.seqLen)
    }
    rows.toSeq
  }
}
