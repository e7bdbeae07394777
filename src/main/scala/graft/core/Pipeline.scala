package graft.core

import graft.functions.{Dedup, Domains, Packing}
import graft.queries.SpanQueries
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   ─▶ s1b_lines    dropRepeatedLines          (optional, --drop-lines:
  *                                               line boilerplate BEFORE
  *                                               near-dedup — nav/footer
  *                                               lines otherwise glue
  *                                               unrelated pages into
  *                                               near-dup clusters)
  *   ─▶ s2_neardup   dropNearDuplicates         (MinHash-LSH + CC closure)
  *   ─▶ s2b_substr   dropDuplicatedSubstrings   (optional, --drop-substr:
  *                                               exact-substring dedup AFTER
  *                                               doc-level near-dedup, the
  *                                               RefinedWeb order — stripping
  *                                               shared spans first would
  *                                               make near-dup docs look
  *                                               dissimilar and defeat the
  *                                               whole-doc drop)
  *   ─▶ s2p_paras    dropDuplicateParagraphs    (optional, --drop-paras:
  *                                               keep-first paragraph dedup
  *                                               — same post-near-dedup
  *                                               placement and rationale as
  *                                               s2b_substr)
  *   ─▶ s3_decontam  dropContaminated           (13-gram + short-item routes;
  *                                               skipped when no --benchmark)
  *   ─▶ s3g_gopher   gopherRules keep-gate       (optional, --gopher)
  *   ─▶ s4_quality   qualityTopFraction         (exact distributed rank)
  *   ─▶ s4d_domain   domainFrequencyCap         (optional, --domain-cap N:
  *                                               mega-domain balancing —
  *                                               at most N docs per
  *                                               provenance domain, stable
  *                                               hash-priority selection)
  *   ─▶ s4r_redact   redactPii                  (optional, --redact: scrub
  *                                               AFTER quality — the score
  *                                               must see the original text,
  *                                               and redacting dropped docs
  *                                               would be wasted work)
  *   ─▶ s4s_sample   sampleStratified           (optional, --sample/-default:
  *                                               final corpus rebalance,
  *                                               deterministic hash split)
  *   ─▶ s4m_mix      tokenBudgetMix             (optional, --mix/--mix-budget:
  *                                               token-share mixture over
  *                                               provenance domains — the
  *                                               LAST filter, it defines the
  *                                               final mix and drops
  *                                               untargeted domains)
  *   ─▶ s4c_chunk    chunkTokens                (optional, --chunk-size
  *                                               [--chunk-stride]: split
  *                                               long docs into overlapping
  *                                               context windows LAST
  *                                               before packing — every
  *                                               upstream gate scores whole
  *                                               documents, and the mixer's
  *                                               token masses must not
  *                                               count overlap twice)
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
      seqLen: Int = 2048,
      dropLines: Boolean = false,
      lineMaxDocFreq: Int = 3,
      // exact-substring dedup (stage off by default): window in tokens; 50
      // is the published Lee-et-al. setting — short-doc corpora (this
      // repo's fixtures) want a smaller window or the stage is a no-op
      substrDedup: Boolean = false,
      substrWindow: Int = 50,
      // keep-first paragraph dedup (stage off by default)
      paraDedup: Boolean = false,
      redact: Boolean = false,
      // mega-domain frequency cap (None = stage off): at most N docs per
      // provenance domain enter the training mix
      domainCap: Option[Long] = None,
      // per-language keep fractions (cap the dominant stratum, keep the
      // tail whole); the stage runs iff a fraction map is given or the
      // default is < 1.0
      sampleFractions: Map[String, Double] = Map.empty,
      sampleDefault: Double = 1.0,
      // token-budget domain mixer (stage on iff budget AND targets given):
      // target token share per provenance domain + total token budget
      mixTargets: Map[String, Double] = Map.empty,
      mixBudget: Option[Long] = None,
      // context-window chunking (None = stage off): split docs longer than
      // chunkSize tokens into overlapping windows just before packing
      chunkSize: Option[Int] = None,
      chunkStride: Option[Int] = None,
      // storage seam: the format every stage table and lineage row is
      // written/read with (DocStore) — parquet locally, iceberg where its
      // runtime exists
      format: String = "parquet") {
    def sampling: Boolean = sampleFractions.nonEmpty || sampleDefault < 1.0
    def store: DocStore = DocStore(format)
  }

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

  private def committedStage(spark: SparkSession, outPath: String, stage: String,
                             store: DocStore): Option[StageLineage] = {
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(outPath), spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$outPath/_pipeline/stage=$stage")
    if (!fs.exists(dir)) None
    // ANY unreadable lineage row — empty dir (AnalysisException), torn
    // parquet footer (SparkException/IOException at collect) — means the
    // commit never completed: re-derive the stage. The row is one tiny
    // record and re-deriving is always safe, so NonFatal, not a narrow catch.
    else try store.read(spark, dir.toString).as[StageLineage].collect().headOption
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
    val store = cfg.store
    committedStage(spark, cfg.outPath, name, store) match {
      case Some(row) if row.input_fingerprint == fp && outExists => row // resume: skip
      case _ =>
        val t0 = System.nanoTime()
        val in = store.read(spark, inputDirs.head)
        val out = body(in)
        store.write(out, s"${cfg.outPath}/$name")
        val written = store.read(spark, s"${cfg.outPath}/$name")
        val row = StageLineage(name, fp, in.count(), written.count(),
          (System.nanoTime() - t0) / 1000000, java.time.Instant.now().toString)
        // commit point: lineage row written last
        store.write(Seq(row).toDS().coalesce(1).toDF(),
          s"${cfg.outPath}/_pipeline/stage=$name")
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
      numBatches = cfg.batches, mode = cfg.mode, store = cfg.store)
    rows += StageLineage("extract", "per-batch (extract/_lineage)",
      batchRows.map(r => r.doc_count + r.error_count).sum,
      batchRows.map(_.doc_count).sum,
      (System.nanoTime() - t0) / 1000000, java.time.Instant.now().toString)
    checkpoint("extract")

    var current = s"${cfg.outPath}/extract/docs"

    rows += runStage(spark, cfg, "s1_exact", Seq(current), "") { in =>
      Dedup.dropExactDuplicates(
        SpanQueries.allText(in.select(col("doc_id"), col("spans"))))
    }
    current = s"${cfg.outPath}/s1_exact"
    checkpoint("s1_exact")

    if (cfg.dropLines) {
      // line-level boilerplate BEFORE near-dedup: repeated nav/footer lines
      // otherwise dominate the shingle sets of unrelated pages and glue
      // them into spurious near-dup clusters (the CCNet/RefinedWeb order)
      rows += runStage(spark, cfg, "s1b_lines", Seq(current),
        s"maxDocFreq=${cfg.lineMaxDocFreq}") { in =>
        Dedup.dropRepeatedLines(in, cfg.lineMaxDocFreq)
      }
      current = s"${cfg.outPath}/s1b_lines"
      checkpoint("s1b_lines")
    }

    rows += runStage(spark, cfg, "s2_neardup", Seq(current),
      s"threshold=${cfg.threshold},ngram=${cfg.ngram}") { in =>
      Dedup.dropNearDuplicates(in, cfg.threshold, cfg.ngram)
    }
    current = s"${cfg.outPath}/s2_neardup"
    checkpoint("s2_neardup")

    if (cfg.substrDedup) {
      // AFTER doc-level near-dedup (the RefinedWeb order): near-dedup drops
      // whole documents by their shared content — stripping duplicated
      // spans first would erase exactly that signal and leave both
      // near-dup docs alive with holes. On the survivors, this removes the
      // sub-document duplication (licence blocks, quoted chunks) no
      // doc-granularity pass can see.
      rows += runStage(spark, cfg, "s2b_substr", Seq(current),
        s"window=${cfg.substrWindow}") { in =>
        Dedup.dropDuplicatedSubstrings(in, cfg.substrWindow)
      }
      current = s"${cfg.outPath}/s2b_substr"
      checkpoint("s2b_substr")
    }

    if (cfg.paraDedup) {
      // keep-first content dedup at paragraph granularity — after
      // near-dedup for the same reason as s2b_substr (stripping duplicated
      // paragraphs first would hide the whole-doc near-dup signal)
      rows += runStage(spark, cfg, "s2p_paras", Seq(current), "") { in =>
        Dedup.dropDuplicateParagraphs(in)
      }
      current = s"${cfg.outPath}/s2p_paras"
      checkpoint("s2p_paras")
    }

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
    current = s"${cfg.outPath}/s4_quality"
    checkpoint("s4_quality")

    cfg.domainCap.foreach { cap =>
      // mega-domain balancing AFTER quality: cap what actually enters the
      // training mix, not docs the quality gate was about to drop anyway.
      // Domain is provenance, not content — here the corpus's doc-id family
      // prefix (a crawl pipeline reads its crawl-metadata host column the
      // same way); under-cap domains never shuffle (broadcast anti-join),
      // over-cap domains rank across range partitions.
      rows += runStage(spark, cfg, "s4d_domain", Seq(current), s"cap=$cap") { in =>
        Domains.domainFrequencyCap(
          in.withColumn("graft_domain",
            regexp_extract(col("doc_id"), "^doc-([a-z]+)-", 1)),
          "graft_domain", cap).drop("graft_domain")
      }
      current = s"${cfg.outPath}/s4d_domain"
      checkpoint("s4d_domain")
    }

    if (cfg.redact) {
      // AFTER quality: the score must see the original text (redaction tags
      // would perturb punctuation/stopword signals), and scrubbing docs the
      // quality gate is about to drop would be wasted compute. Pure
      // per-row codegen regexp chain — one scan, zero shuffle.
      rows += runStage(spark, cfg, "s4r_redact", Seq(current), "") { in =>
        in.withColumn("text", graft.functions.TextAnalysis.redactPii(col("text")))
      }
      current = s"${cfg.outPath}/s4r_redact"
      checkpoint("s4r_redact")
    }

    if (cfg.sampling) {
      // final corpus rebalance: deterministic md5-hash split per language
      // stratum — stable under retries/resume (a doc is in or out forever),
      // evaluated as a scan predicate (no shuffle, no state)
      val params = "fractions=" + cfg.sampleFractions.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(";") +
        s",default=${cfg.sampleDefault}"
      rows += runStage(spark, cfg, "s4s_sample", Seq(current), params) { in =>
        graft.functions.TextAnalysis.sampleStratified(
          in.withColumn("lang", graft.functions.TextAnalysis.langGuess(col("text"))),
          "lang", cfg.sampleFractions, defaultFraction = cfg.sampleDefault)
          .drop("lang")
      }
      current = s"${cfg.outPath}/s4s_sample"
      checkpoint("s4s_sample")
    }

    cfg.mixBudget.filter(_ => cfg.mixTargets.nonEmpty).foreach { budget =>
      // the LAST filter stage: the mixer defines the final training mix
      // (untargeted domains drop), so every upstream gate must already have
      // run — its per-domain token masses are measured on exactly the docs
      // that would otherwise be packed. Domain is the same provenance key
      // as s4d_domain (a crawl pipeline reads its host column the same way).
      val params = "targets=" + cfg.mixTargets.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(";") + s",budget=$budget"
      rows += runStage(spark, cfg, "s4m_mix", Seq(current), params) { in =>
        Domains.tokenBudgetMix(
          in.withColumn("graft_domain",
            regexp_extract(col("doc_id"), "^doc-([a-z]+)-", 1)),
          "graft_domain", cfg.mixTargets, budget).drop("graft_domain")
      }
      current = s"${cfg.outPath}/s4m_mix"
      checkpoint("s4m_mix")
    }

    cfg.chunkSize.foreach { size =>
      // LAST transform before packing: upstream gates score whole docs and
      // the mixer's token masses must not count window overlap twice.
      // Chunk ids extend the doc id ("<doc_id>#<chunk_idx>") so provenance
      // prefixes keep parsing and packing keys stay unique per row.
      val stride = cfg.chunkStride.getOrElse(size)
      rows += runStage(spark, cfg, "s4c_chunk", Seq(current),
        s"size=$size,stride=$stride") { in =>
        Packing.chunkTokens(in, size, stride)
          .select(concat(col("doc_id"), lit("#"), col("chunk_idx")).as("doc_id"),
            col("text"))
      }
      current = s"${cfg.outPath}/s4c_chunk"
      checkpoint("s4c_chunk")
    }

    rows += runStage(spark, cfg, "s5_pack", Seq(current),
      s"seqLen=${cfg.seqLen}") { in =>
      Packing.packSequences(in, cfg.seqLen)
    }
    rows.toSeq
  }
}
