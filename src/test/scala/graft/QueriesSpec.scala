package graft

import graft.corpus.SyntheticCorpus
import graft.core.Extract
import graft.model.{Doc, Span}
import graft.oracle.{Extractor, HeadingStack}
import graft.queries.{Mutators, SpanQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Span-query algebra vs the pure-Scala semantics (HeadingStack / direct
  * computation on the oracle output), plus the mutators and the flagship
  * entry contract.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val docsSeq: Seq[Doc] =
    (0L until 60L).map(i => SyntheticCorpus.rawDoc(SyntheticCorpus.docIdFor(i)))
      .flatMap(d => try Some(Extractor.extract(d)) catch { case _: Exception => None })

  private lazy val docsDf = {
    import spark.implicits._
    docsSeq.toDS().toDF()
  }

  test("entry returns non-empty extraction output") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("allText matches the reference exclusion semantics per doc") {
    val got = SpanQueries.allText(docsDf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    docsSeq.foreach { d =>
      val exp = d.spans
        .filter(s => s.kind != "table" && s.kind != "image" && s.text.nonEmpty)
        .map(_.text).mkString("\n")
      assert(got(d.doc_id) == exp, d.doc_id)
    }
  }

  test("countByKind equals direct counting") {
    val got = SpanQueries.countByKind(docsDf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = docsSeq.flatMap(_.spans).groupBy(_.kind).view.mapValues(_.size.toLong).toMap
    assert(got == exp)
  }

  test("section query slices exactly like HeadingStack.section") {
    val got = SpanQueries.section(docsDf, "shopping").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(3))).toMap
    val exp = docsSeq
      .map(d => d.doc_id -> HeadingStack.section(d.spans, "shopping").map(_.offset))
      .filter(_._2.nonEmpty).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, offs) => assert(got(id) == offs, id) }
  }

  test("headingPaths matches HeadingStack breadcrumbs for heading spans' sections") {
    val got = SpanQueries.headingPaths(docsDf).collect()
      .map(r => (r.getString(0), r.getInt(3)) -> r.getString(4)).toMap
    docsSeq.foreach { d =>
      HeadingStack.place(d.spans).foreach { p =>
        val lvl = HeadingStack.headingLevelOf(p.span.kind)
        // query semantics: path includes the span itself when it is a heading
        val exp = if (lvl > 0) (p.headingPath :+ p.span.text).mkString(" > ")
                  else p.headingPath.mkString(" > ")
        assert(got((d.doc_id, p.span.offset)) == exp, s"${d.doc_id}@${p.span.offset}")
      }
    }
  }

  test("concatDocs doubles spans with shifted offsets") {
    val out = SpanQueries.concatDocs(docsDf, docsDf).collect()
    val byId = docsSeq.map(d => d.doc_id -> d).toMap
    out.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
      val orig = byId(r.getString(0)).spans
      assert(spans.length == orig.length * 2)
      assert(spans.map(_.getInt(3)) == (orig.map(_.offset) ++ orig.map(_.offset + orig.length)))
    }
  }

  test("compare returns equal=true for identical inputs, detects a mutation") {
    val same = SpanQueries.compare(docsDf, docsDf).collect()
    assert(same.forall(_.getBoolean(1)))
    val mutated = Mutators.setCellText(docsDf, 0, 0, "XXX")
    val diff = SpanQueries.compare(docsDf, mutated).collect()
    val changedDocs = docsSeq.filter(_.spans.exists(s => s.kind == "table_cell" && s.media_ref == "0,0"))
    assert(diff.count(!_.getBoolean(1)) == changedDocs.size)
  }

  test("removeContentControls drops containers and re-densifies offsets") {
    val out = Mutators.removeContentControls(docsDf).collect()
    out.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
      assert(spans.forall(_.getString(0) != "content_control"))
      assert(spans.map(_.getInt(3)) == spans.indices)
    }
  }

  test("moveSectionToEnd keeps the span multiset and re-densifies") {
    val out = Mutators.moveSectionToEnd(docsDf, "shopping").collect()
    val byId = docsSeq.map(d => d.doc_id -> d).toMap
    out.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
      val orig = byId(r.getString(0)).spans
      assert(spans.length == orig.length)
      assert(spans.map(x => (x.getString(0), x.getString(1))).sorted ==
        orig.map(s => (s.kind, s.text)).sorted)
      assert(spans.map(_.getInt(3)) == spans.indices)
      if (orig.exists(s => s.kind == "heading1" && s.text.toLowerCase.contains("shopping"))) {
        // section moved: last span should belong to the shopping section
        assert(spans.exists(_.getString(1).toLowerCase.contains("shopping")))
      }
    }
  }

  test("SpanTree renders the recovered hierarchy with H-labels and indent") {
    import graft.model.Span
    val spans = Seq(
      Span("heading1", "Intro", null, 0), Span("paragraph", "p1", null, 1),
      Span("heading2", "Sub", null, 2), Span("paragraph", "x" * 100, null, 3))
    val r = graft.queries.SpanTree.render(spans).split("\n")
    assert(r(0) == "  [H1] Intro")
    assert(r(1) == "    [paragraph] p1")
    assert(r(2) == "    [H2] Sub")
    assert(r(3).startsWith("      [paragraph] " + "x" * 77) && r(3).endsWith("..."))
  }

  test("KindCountAggregator matches groupBy count per doc") {
    import spark.implicits._
    val ds = docsSeq.take(20).flatMap(_.spans).toDS()
    val agg = ds.select(graft.functions.KindCountAggregator.toColumn).head()
    val exp = docsSeq.take(20).flatMap(_.spans).groupBy(_.kind).view.mapValues(_.size.toLong).toMap
    assert(agg == exp)
  }

  test("annotated extraction renders DocProperty + ContentControl markers") {
    import spark.implicits._
    val raw = Seq(graft.model.RawDoc("a", Seq(
      graft.model.RawSpan("p", "run:T |fldBegin|instr:DOCPROPERTY Title|fldSep|run:x|fldEnd", null, 0),
      graft.model.RawSpan("p", "run:A |sdtrun:plaintext,9,t:VAL", null, 1)),
      Map("title" -> "Doc Title")))
    val out = Extract.good(Extract.run(raw.toDS(), annotate = true)).collect().head
    assert(out.spans.map(_.text) == Seq("T [DocProperty:Core/Title=\"Doc Title\"]", "A [ContentControl:plaintext t=\"VAL\"]"))
  }
}
