package graft.core

import graft.model._
import graft.oracle.{ExtractionError, Extractor}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Row produced by the one-pass distributed extraction: either a good
  * document (`error == null`) or a quarantined one (`spans` empty,
  * `error` set). One output type keeps the job single-pass; callers split
  * with cheap filters (or a partitioned write) downstream.
  */
final case class Extracted(doc_id: String, spans: Seq[Span], error: String)

/** Distributed extraction core (SURVEY.md §7.1 step 4): `Dataset[RawDoc] →
  * Dataset[Extracted]` via `mapPartitions`, invoking the same per-document
  * routine as the oracle (`graft.oracle.Extractor`). `mapPartitions` (not a
  * UDF) amortizes setup and keeps the per-doc state machines in plain Scala —
  * the Spark analog of `ParseFromStream` (`WordDocumentTreeParser.cs:40-76`).
  *
  * Error tolerance: a poison document quarantines its row, never fails the
  * task (a single bad doc must not kill a 10^12-row job) — the corpus-scale
  * form of the reference's per-part try/catch-skip
  * (`WordDocumentTreeParser.cs:166-169`).
  */
object Extract {

  final class Metrics(spark: SparkSession) extends Serializable {
    val docs: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs")
    val spansIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.spansIn")
    val spansOut: LongAccumulator = spark.sparkContext.longAccumulator("graft.spansOut")
    val errors: LongAccumulator = spark.sparkContext.longAccumulator("graft.errors")
  }

  /** Zero-shuffle default path: narrow mapPartitions over the scan.
    * `annotate = true` switches to the A4 metadata-annotation rendering. */
  def run(raw: Dataset[RawDoc], metrics: Option[Metrics] = None,
          annotate: Boolean = false): Dataset[Extracted] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.mapPartitions { it =>
      it.map { rd =>
        metrics.foreach { m => m.docs.add(1); m.spansIn.add(rd.spans.length) }
        try {
          val d = if (annotate) Extractor.extractAnnotated(rd) else Extractor.extract(rd)
          metrics.foreach(_.spansOut.add(d.spans.length))
          Extracted(d.doc_id, d.spans, null)
        } catch {
          // ONE quarantine format across every path ("<Class>: <message>",
          // what ExtractSpansExpr and runChunked emit) — mode choice must
          // not change output bytes for identical inputs
          case e: Exception =>
            metrics.foreach(_.errors.add(1))
            Extracted(rd.doc_id, Nil, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  def good(ds: Dataset[Extracted]): Dataset[Doc] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.error == null).map(e => Doc(e.doc_id, e.spans))
  }

  def quarantined(ds: Dataset[Extracted]): Dataset[Quarantined] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.error != null).map(e => Quarantined(e.doc_id, e.error))
  }

  /** Catalyst-native fast path: the fused `extract_spans` expression
    * (see [[graft.functions.ExtractSpansExpr]]) — same semantic core, no
    * typed-encoder round trip. Input: the raw DataFrame (doc_id, spans[,
    * meta]); output columns (doc_id, spans, error) with error != null marking
    * quarantined rows. Prefer this for pure-throughput extraction jobs; the
    * typed mapPartitions path remains for metric accumulation.
    */
  def runExpr(raw: org.apache.spark.sql.DataFrame, annotate: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val metaCol = if (raw.columns.contains("meta")) col("meta")
                  else org.apache.spark.sql.functions.lit(null)
        .cast(org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
    raw.select(col("doc_id"),
        graft.functions.ExtractSpansExpr(col("spans"), metaCol, annotate).as("x"))
      .select(col("doc_id"), col("x.spans").as("spans"), col("x.error").as("error"))
  }

  /** Adaptive skew routing (SURVEY.md §4.3.1, VERDICT r01 #3), three tiers by
    * `size(spans)`:
    *
    *  - **small** (≤ spreadThreshold, ~99.9% of a web corpus): the
    *    zero-shuffle fused expression — scan locality preserved, no exchange;
    *  - **medium** (≤ hugeThreshold): still the fused expression, but
    *    round-robin repartitioned first so each outlier document lands on its
    *    own task instead of straggling whatever scan partition it sits in.
    *    One tiny shuffle of only the outlier rows. Measured: chunking docs of
    *    this size costs ~10x more than parsing them (three typed-encoder
    *    round trips + two shuffles of every span), so per-DOC spreading, not
    *    intra-doc chunking, is the right lever here;
    *  - **huge** (> hugeThreshold, the 10^6-span pathology): [[runChunked]] —
    *    intra-document parallelism is now worth its two shuffles because a
    *    single doc exceeds a sensible task.
    *
    * The routes are filtered subtrees of the same scan, unioned. When the
    * raw table carries a materialized `n_spans` column (the corpus writers
    * produce it — [[graft.model.Schemas.rawDocsWithN]]) the tier filters are
    * plain attribute predicates that push down to parquet row-group
    * statistics, so the medium/huge subtrees read only the row groups that
    * contain outlier documents instead of re-scanning the table per tier;
    * the `size(spans)` fallback (for inputs without the column) still
    * evaluates correctly, it just cannot prune row groups.
    *
    * Output matches [[runExpr]]/[[runChunked]]: (doc_id, spans, error) with
    * quarantined rows carrying spans = null/empty and the error message.
    */
  def runAuto(raw: org.apache.spark.sql.DataFrame,
              spreadThreshold: Int = 8192,
              hugeThreshold: Int = 262144): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, size}
    val spark = raw.sparkSession
    import spark.implicits._
    val hasN = raw.columns.contains("n_spans")
    val n = if (hasN) col("n_spans") else size(col("spans"))
    val rawCols = Seq(col("doc_id"), col("spans")) ++
      (if (raw.columns.contains("meta")) Seq(col("meta")) else Nil)
    // a NULL n (nullable n_spans in a foreign table, or size(spans) of a
    // NULL spans row in the fallback) must not vanish: it fails every tier
    // comparison, so route it to the fused tier — ExtractSpansExpr
    // quarantines a null spans array explicitly ("null spans"). IsNull ORs
    // into the pushed filter; the coalesce alternative would kill pushdown.
    val smallPred = n <= spreadThreshold || n.isNull
    val small = runExpr(raw.where(smallPred).select(rawCols: _*))
    val medium = runExpr(
      raw.where(n > spreadThreshold && n <= hugeThreshold).select(rawCols: _*)
        .repartition(spark.sparkContext.defaultParallelism))
    // the typed chunked path needs the RawDoc encoder's full column set —
    // a meta-less input (which runExpr accepts as-is) gets a typed NULL map
    val hugeCols = Seq(col("doc_id"), col("spans")) :+
      (if (raw.columns.contains("meta")) col("meta")
       else org.apache.spark.sql.functions.lit(null)
         .cast(org.apache.spark.sql.types.MapType(
           org.apache.spark.sql.types.StringType,
           org.apache.spark.sql.types.StringType)).as("meta"))
    val huge = runChunked(
      raw.where(n > hugeThreshold).select(hugeCols: _*).as[RawDoc],
      maxSpansPerChunk = spreadThreshold.max(1024))
      .toDF()
    small.unionByName(medium).unionByName(huge)
  }

  /** Skew-handling path for mega-documents (SURVEY.md §4.3.1): split
    * oversized docs into chunks at top-level element boundaries, hash-
    * repartition `(doc_id, chunk_id)` so one 10^6-span document no longer
    * pins a single task, extract chunks independently (no parser state
    * crosses a top-level boundary; the per-doc context is replicated into
    * each chunk), then regroup + reindex. Exactly one shuffle pair; small
    * docs ride along as single chunks. Use when the corpus has a heavy tail;
    * the default path stays zero-shuffle.
    */
  def runChunked(raw: Dataset[RawDoc], maxSpansPerChunk: Int = 8192,
                 metrics: Option[Metrics] = None): Dataset[Extracted] = {
    val spark = raw.sparkSession
    import spark.implicits._
    // r07: single-chunk documents (≤ maxSpansPerChunk spans — the 99.9 % of
    // any real corpus; [[Chunker.split]] yields exactly one chunk iff
    // `spans.length <= maxSpans`, since `indexed` is length-preserving) pay
    // NEITHER shuffle: they ride the zero-shuffle [[run]] path, whose output
    // is byte-identical to chunk-then-regroup for a single chunk (same
    // `walk` over the offset-sorted body, same `reindex` densification, same
    // quarantine format — the cross-mode output-equality gate in
    // SparkExtractSpec holds this). Formerly every row — payload included —
    // crossed both exchanges just to reassemble into itself. The routing
    // predicate is a scan-level column filter; null-spans rows route to the
    // multi-chunk path so their failure semantics are unchanged.
    val single = org.apache.spark.sql.functions.col("spans").isNotNull &&
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("spans")) <= maxSpansPerChunk
    val direct = run(raw.filter(single), metrics)
    val multiRaw = raw.filter(!single)
    val chunks = multiRaw.flatMap { rd =>
      metrics.foreach { m => m.docs.add(1); m.spansIn.add(rd.spans.length) }
      Chunker.split(rd, maxSpansPerChunk)
    }
    // shuffle 1: spread chunks evenly — hash-partition on (doc_id, chunk_id)
    // so a mega-document's chunks land on different tasks
    val extracted = chunks
      .repartition(org.apache.spark.sql.functions.col("doc_id"),
                   org.apache.spark.sql.functions.col("chunk_id"))
      .map { ch =>
        try {
          val ctx = Extractor.buildCtx(ch.ctxSpans ++ ch.spans, ch.meta)
          ChunkOut(ch.doc_id, ch.chunk_id, Extractor.walk(ch.spans.sortBy(_.offset), ctx), null)
        } catch {
          case e: Exception => ChunkOut(ch.doc_id, ch.chunk_id, Nil,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    // shuffle 2 (the regroup): reassemble documents in chunk order
    val multi = extracted.groupByKey(_.doc_id).mapGroups { (docId, it) =>
      val parts = it.toSeq.sortBy(_.chunk_id)
      parts.collectFirst { case c if c.error != null => c.error } match {
        case Some(err) =>
          metrics.foreach(_.errors.add(1))
          Extracted(docId, Nil, err)
        case None =>
          val spans = parts.flatMap(_.spans).zipWithIndex.map { case (s, i) => s.copy(offset = i) }
          metrics.foreach(_.spansOut.add(spans.length))
          Extracted(docId, spans, null)
      }
    }
    direct.union(multi)
  }
}

final case class RawChunk(doc_id: String, chunk_id: Int, spans: Seq[RawSpan],
                          ctxSpans: Seq[RawSpan], meta: Map[String, String])
final case class ChunkOut(doc_id: String, chunk_id: Int, spans: Seq[Span], error: String)

/** Splits a raw document's span stream at top-level element boundaries
  * (nesting depth 0 — never inside a tbl/sdt), so chunks extract
  * independently. Context spans (`style_def`, `rel`) are replicated into
  * every chunk: the heading classifier and hyperlink resolution are
  * whole-document lookups (`ParsingContext.cs:20-55`).
  */
object Chunker {
  def split(doc: RawDoc, maxSpans: Int): Seq[RawChunk] = {
    val body = graft.oracle.Extractor.indexed(doc.spans).sortBy(_.offset)
    val meta = Option(doc.meta).getOrElse(Map.empty[String, String])
    if (body.length <= maxSpans)
      return Seq(RawChunk(doc.doc_id, 0, body, Nil, meta))
    val ctxSpans = body.filter(s => s.kind == Kinds.StyleDef || s.kind == Kinds.Rel)
    val chunks = Seq.newBuilder[RawChunk]
    var cur = Seq.newBuilder[RawSpan]
    var curN = 0
    var depth = 0
    var chunkId = 0
    body.foreach { s =>
      // chunk boundary allowed only before a depth-0 span
      if (depth == 0 && curN >= maxSpans) {
        chunks += RawChunk(doc.doc_id, chunkId, cur.result(), ctxSpans, meta)
        chunkId += 1; cur = Seq.newBuilder[RawSpan]; curN = 0
      }
      s.kind match {
        case Kinds.Tbl | Kinds.Sdt => depth += 1
        case Kinds.TblEnd | Kinds.SdtEnd => depth = math.max(0, depth - 1)
        case _ =>
      }
      cur += s; curN += 1
    }
    val last = cur.result()
    if (last.nonEmpty || chunkId == 0) chunks += RawChunk(doc.doc_id, chunkId, last, ctxSpans, meta)
    chunks.result()
  }
}
