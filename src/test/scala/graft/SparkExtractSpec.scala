package graft

import graft.core.{Chunker, Extract}
import graft.corpus.SyntheticCorpus
import graft.model.{Doc, RawDoc}
import graft.oracle.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end distributed extraction vs the sequential oracle: span-sequence
  * equality (kind, text, media_ref, order) per document — the north-rule
  * gate — plus chunker round-trips and quarantine behavior.
  */
class SparkExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def corpus(n: Int): Seq[RawDoc] =
    (0L until n.toLong).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i)))

  private def oracleOf(docs: Seq[RawDoc]): Map[String, Doc] =
    docs.flatMap(d => try Some(Extractor.extract(d)) catch { case _: Exception => None })
      .map(d => d.doc_id -> d).toMap

  test("distributed extraction == oracle on a 500-doc mixed corpus") {
    import spark.implicits._
    val raw = corpus(500)
    val expected = oracleOf(raw)
    val got = Extract.good(Extract.run(raw.toDS().repartition(7))).collect()
    assert(got.length == expected.size)
    got.foreach { d =>
      assert(expected(d.doc_id).spans == d.spans, s"mismatch for ${d.doc_id}")
    }
  }

  test("chunked extraction == oracle (incl. mega + poison docs)") {
    import spark.implicits._
    // indices around the mega (997) and poison (1009) strides
    val raw = (990L to 1015L).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i)))
    val expected = oracleOf(raw)
    val got = Extract.good(Extract.runChunked(raw.toDS(), maxSpansPerChunk = 512)).collect()
    assert(got.length == expected.size)
    got.foreach { d =>
      assert(expected(d.doc_id).spans == d.spans, s"mismatch for ${d.doc_id}")
    }
  }

  test("poison docs quarantine with an error, never fail the job") {
    import spark.implicits._
    val raw = Seq(SyntheticCorpus.rawDoc("doc-poison-000001009"),
      SyntheticCorpus.rawDoc("doc-runs-000000001"))
    val ex = Extract.run(raw.toDS())
    val q = Extract.quarantined(ex).collect()
    assert(q.map(_.doc_id).toSeq == Seq("doc-poison-000001009"))
    assert(q.head.error.nonEmpty)
    assert(Extract.good(ex).count() == 1)
  }

  test("chunker splits only at depth-0 boundaries and loses nothing") {
    val mega = SyntheticCorpus.rawDoc("doc-mega-000000997")
    val chunks = Chunker.split(mega, 512)
    assert(chunks.length > 1)
    assert(chunks.flatMap(_.spans).map(_.offset) == mega.spans.sortBy(_.offset).map(_.offset))
    // no chunk starts inside a table: each chunk's open/close deltas balance
    chunks.foreach { ch =>
      var depth = 0
      ch.spans.foreach { s =>
        s.kind match {
          case "tbl" | "sdt" => depth += 1
          case "tbl_end" | "sdt_end" => depth -= 1
          case _ =>
        }
        assert(depth >= 0, s"chunk ${ch.chunk_id} dips below depth 0")
      }
      assert(depth == 0, s"chunk ${ch.chunk_id} leaves depth $depth open")
    }
  }

  test("fused extract_spans expression == oracle (incl. quarantine surface)") {
    import spark.implicits._
    val raw = corpus(400) ++ Seq(SyntheticCorpus.rawDoc("doc-poison-000001009"),
      SyntheticCorpus.rawDoc("doc-mega-000000997"))
    val expected = oracleOf(raw)
    val out = Extract.runExpr(raw.toDS().toDF()).collect()
    assert(out.length == raw.length)
    out.foreach { r =>
      val id = r.getString(0)
      if (r.isNullAt(1)) {
        assert(!expected.contains(id), s"$id quarantined but oracle extracted it")
        assert(r.getString(2) != null && r.getString(2).nonEmpty)
      } else {
        val spans = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => graft.model.Span(x.getString(0), x.getString(1), x.getString(2), x.getInt(3)))
        assert(expected(id).spans == spans, s"mismatch for $id")
        assert(r.isNullAt(2))
      }
    }
  }

  test("annotated fused expression == sequential annotated oracle") {
    import spark.implicits._
    val raw = corpus(150)
    val expected = raw.flatMap(d =>
      try Some(Extractor.extractAnnotated(d)) catch { case _: Exception => None })
      .map(d => d.doc_id -> d).toMap
    val out = Extract.runExpr(raw.toDS().toDF(), annotate = true).collect()
    out.filter(!_.isNullAt(1)).foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => graft.model.Span(x.getString(0), x.getString(1), x.getString(2), x.getInt(3)))
      assert(expected(r.getString(0)).spans == spans, r.getString(0))
    }
  }

  test("chunker invariance: any chunk size yields the unchunked output") {
    val docs = Seq(SyntheticCorpus.rawDoc("doc-mega-000000997"),
      SyntheticCorpus.rawDoc("doc-tables-000000005"),
      SyntheticCorpus.rawDoc("doc-sdt-000000014"))
    docs.foreach { d =>
      val whole = Extractor.extract(d)
      Seq(8, 64, 513, 4096).foreach { maxSpans =>
        val chunks = Chunker.split(d, maxSpans)
        val spans = chunks.flatMap { ch =>
          val ctx = Extractor.buildCtx(ch.ctxSpans ++ ch.spans, ch.meta)
          Extractor.walk(ch.spans.sortBy(_.offset), ctx)
        }.zipWithIndex.map { case (s, i) => s.copy(offset = i) }
        assert(spans == whole.spans, s"${d.doc_id} maxSpans=$maxSpans")
      }
    }
  }

  test("runAuto routes the heavy tail through chunking and matches the oracle") {
    import spark.implicits._
    val raw = corpus(200) ++ Seq(SyntheticCorpus.rawDoc("doc-mega-000000997"),
      SyntheticCorpus.rawDoc("doc-poison-000001009"))
    val expected = oracleOf(raw)
    // thresholds force all three tiers: most docs fused, the mega doc either
    // spread or chunked depending on its size draw
    val out = Extract.runAuto(raw.toDS().toDF(),
      spreadThreshold = 512, hugeThreshold = 6000).collect()
    assert(out.length == raw.length)
    val good = out.filter(r => !r.isNullAt(1) && r.getSeq[org.apache.spark.sql.Row](1).nonEmpty)
    assert(good.length == expected.size)
    good.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => graft.model.Span(x.getString(0), x.getString(1), x.getString(2), x.getInt(3)))
      assert(expected(r.getString(0)).spans == spans, r.getString(0))
    }
  }

  test("x5 registration evaluates extract_spans exactly once (no filter re-eval)") {
    Fixtures.ensure(spark)
    val plan = SparkEntry.queries("x5_extract_expr_spans")(spark, "")
      .queryExecution.executedPlan.toString
    val evals = "extract_spans\\(".r.findAllIn(plan).length
    assert(evals == 1, s"extract_spans appears $evals times:\n${plan.take(2000)}")
  }

  test("x6 auto-routing plan: one extract_spans per fused tier, no inferred-filter re-eval") {
    Fixtures.ensure(spark)
    val plan = SparkEntry.queries("x6_extract_auto")(spark, "")
      .queryExecution.executedPlan.toString
    val evals = "extract_spans\\(".r.findAllIn(plan).length
    assert(evals == 2, s"extract_spans appears $evals times (want 2: small + medium tier):\n${plan.take(3000)}")
  }

  test("x6 auto-routing tier filters push down to parquet row-group stats via n_spans") {
    Fixtures.ensure(spark)
    val raw = spark.read.schema(graft.model.Schemas.rawDocsWithN).parquet(Fixtures.RawPath)
    val plan = graft.core.Extract.runAuto(raw, spreadThreshold = 1024, hugeThreshold = 6000)
      .queryExecution.executedPlan.toString
    // all three tier scans must carry an n_spans predicate in PushedFilters —
    // a size(spans) fallback filter would evaluate post-scan and re-read the
    // whole table per tier
    val pushed = "PushedFilters: \\[[^\\]]*n_spans[^\\]]*\\]".r.findAllIn(plan).length
    assert(pushed >= 3, s"want n_spans in PushedFilters of all 3 tier scans, got $pushed:\n${plan.take(4000)}")
  }

  test("chunker fuzz: random nested structures chunk-invariant at random sizes") {
    import graft.model.{Kinds, RawSpan}
    val r = new java.util.Random(777)
    def randBody(depthBudget: Int, spans: scala.collection.mutable.ArrayBuffer[RawSpan]): Unit = {
      val n = 1 + r.nextInt(6)
      (0 until n).foreach { _ =>
        r.nextInt(if (depthBudget > 0) 4 else 2) match {
          case 0 => spans += RawSpan(Kinds.P, s"run:w${r.nextInt(100)}", null, spans.length)
          case 1 => spans += RawSpan(Kinds.P,
            s"@style=Heading${1 + r.nextInt(9)}|run:h${r.nextInt(100)}", null, spans.length)
          case 2 => // table with 1-2 rows x 1-2 cells, possibly nested content
            spans += RawSpan(Kinds.Tbl, "", null, spans.length)
            (0 until 1 + r.nextInt(2)).foreach { _ =>
              spans += RawSpan(Kinds.Tr, "", null, spans.length)
              (0 until 1 + r.nextInt(2)).foreach { _ =>
                spans += RawSpan(Kinds.Tc, "", null, spans.length)
                spans += RawSpan(Kinds.P, s"run:c${r.nextInt(100)}", null, spans.length)
                spans += RawSpan(Kinds.TcEnd, "", null, spans.length)
              }
              spans += RawSpan(Kinds.TrEnd, "", null, spans.length)
            }
            spans += RawSpan(Kinds.TblEnd, "", null, spans.length)
          case 3 => // sdt, possibly nesting more structure
            spans += RawSpan(Kinds.Sdt, s"@type=richtext;@id=${r.nextInt(100)}", null, spans.length)
            randBody(depthBudget - 1, spans)
            spans += RawSpan(Kinds.SdtEnd, "", null, spans.length)
        }
      }
    }
    (0 until 60).foreach { docIdx =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[RawSpan]
      randBody(3, buf)
      val doc = graft.model.RawDoc(s"fuzz-$docIdx", buf.toIndexedSeq, Map("title" -> "T"))
      val whole = Extractor.extract(doc)
      Seq(1 + r.nextInt(4), 8 + r.nextInt(20)).foreach { maxSpans =>
        val chunks = Chunker.split(doc, maxSpans)
        val spans = chunks.flatMap { ch =>
          val ctx = Extractor.buildCtx(ch.ctxSpans ++ ch.spans, ch.meta)
          Extractor.walk(ch.spans.sortBy(_.offset), ctx)
        }.zipWithIndex.map { case (s, i) => s.copy(offset = i) }
        assert(spans == whole.spans, s"fuzz-$docIdx maxSpans=$maxSpans")
      }
    }
  }

  test("runAuto: meta-less input works; null-spans rows quarantine instead of vanishing") {
    import org.apache.spark.sql.functions._
    val raw = Fixtures.raw(spark).select(col("doc_id"), col("spans")).limit(20)
    val nullRow = raw.limit(1).select(lit("null-doc").as("doc_id"),
      lit(null).cast(raw.schema("spans").dataType).as("spans"))
    val out = Extract.runAuto(raw.unionByName(nullRow))
    assert(out.count() == 21) // nothing vanished
    val q = out.where(col("doc_id") === "null-doc").collect()
    assert(q.length == 1 && q.head.getAs[String]("error") == "null spans")
  }

  test("extraction is deterministic and idempotent across partitionings") {
    import spark.implicits._
    val raw = corpus(120)
    val a = Extract.good(Extract.run(raw.toDS().repartition(2))).collect().sortBy(_.doc_id)
    val b = Extract.good(Extract.run(raw.toDS().repartition(11))).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("output invariants: dense offsets, vocabulary kinds, media_ref discipline") {
    import spark.implicits._
    val raw = corpus(200)
    Extract.good(Extract.run(raw.toDS())).collect().foreach { d =>
      assert(d.spans.map(_.offset) == d.spans.indices)
      d.spans.foreach { s =>
        assert(graft.model.Kinds.OutputKinds.contains(s.kind), s"${d.doc_id}: ${s.kind}")
        if (s.kind == "paragraph" || s.kind.startsWith("heading"))
          assert(s.media_ref == null)
      }
    }
  }
}
