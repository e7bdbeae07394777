package graft

import graft.model.Span
import graft.oracle.HeadingStack
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the heading-stack tree builder (X2,
  * `WordDocumentTreeParser.cs:414-444`) — SURVEY.md §5.2 item 2.
  * (Seeded random generation; the scalatest/scalacheck bridge artifact is not
  * in the offline cache, so properties run over 300 deterministic samples.)
  */
class HeadingStackSpec extends AnyFunSuite {

  private def randomDocs: Seq[Seq[Int]] = {
    val r = new java.util.Random(4242)
    (0 until 300).map(_ => Seq.fill(2 + r.nextInt(80))(r.nextInt(10)))
  }

  private def spans(levels: Seq[Int]): Seq[Span] =
    levels.zipWithIndex.map { case (l, i) =>
      if (l == 0) Span("paragraph", s"p$i", null, i)
      else Span(s"heading$l", s"h$l-$i", null, i)
    }

  test("every parent is an earlier heading of strictly shallower level") {
    randomDocs.foreach { levels =>
      val placed = HeadingStack.place(spans(levels))
      val byOffset = placed.map(p => p.span.offset -> p).toMap
      placed.foreach { p =>
        if (p.parentOffset >= 0) {
          val parent = byOffset(p.parentOffset).span
          val pl = HeadingStack.headingLevelOf(parent.kind)
          assert(pl >= 1 && parent.offset < p.span.offset)
          val selfLvl = HeadingStack.headingLevelOf(p.span.kind)
          if (selfLvl > 0) assert(pl < selfLvl, s"levels=$levels span=${p.span}")
        }
      }
    }
  }

  test("orphan jump: H1 -> H3 parents H3 at H1; later H2 also parents at H1") {
    val placed = HeadingStack.place(spans(Seq(1, 3, 2)))
    assert(placed(1).parentOffset == 0)
    assert(placed(2).parentOffset == 0)
  }

  test("non-heading attaches to most recent heading; preamble attaches to root") {
    randomDocs.foreach { levels =>
      val placed = HeadingStack.place(spans(levels))
      var lastHeading = -1
      placed.zip(levels).foreach { case (p, l) =>
        if (l == 0) assert(p.parentOffset == lastHeading, s"levels=$levels span=${p.span}")
        else lastHeading = p.span.offset
      }
    }
  }

  test("depth = heading-path length + 1 for every span") {
    randomDocs.foreach { levels =>
      HeadingStack.place(spans(levels)).foreach { p =>
        assert(p.depth == p.headingPath.length + 1, s"levels=$levels span=${p.span}")
      }
    }
  }

  test("a shallower heading closes all deeper sections") {
    val placed = HeadingStack.place(spans(Seq(1, 2, 3, 1, 0)))
    assert(placed(4).parentOffset == 3)
    assert(placed(4).headingPath == Seq("h1-3"))
  }

  test("SpanNavExpr agrees with HeadingStack + direct simulation on 300 random docs") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = randomDocs.zipWithIndex.map { case (levels, i) =>
      graft.model.Doc(s"r$i", spans(levels))
    }
    val nav = graft.queries.SpanQueries.spanNav(docs.toDS().toDF()).collect()
      .map(r => (r.getString(0), r.getInt(3)) ->
        (r.getString(4), r.getInt(5), r.getInt(6), r.getString(7), r.getString(8))).toMap
    docs.foreach { d =>
      val placed = HeadingStack.place(d.spans)
      var lastHeading = -1
      d.spans.zipWithIndex.foreach { case (s, i) =>
        val lvl = HeadingStack.headingLevelOf(s.kind)
        val (path, depth, sectionOff, prev, next) = nav((d.doc_id, s.offset))
        val p = placed(i)
        val expPath = if (lvl > 0) (p.headingPath :+ s.text).mkString(" > ")
                      else p.headingPath.mkString(" > ")
        assert(path == expPath, s"${d.doc_id}@${s.offset} path")
        assert(depth == p.depth, s"${d.doc_id}@${s.offset} depth")
        if (lvl > 0) lastHeading = s.offset
        assert(sectionOff == lastHeading, s"${d.doc_id}@${s.offset} section")
        val expPrev = if (lvl == 0 && i > 0) d.spans(i - 1).text else null
        val expNext = if (i + 1 < d.spans.length &&
          HeadingStack.headingLevelOf(d.spans(i + 1).kind) == 0) d.spans(i + 1).text else null
        assert(prev == expPrev, s"${d.doc_id}@${s.offset} prev")
        assert(next == expNext, s"${d.doc_id}@${s.offset} next")
      }
    }
  }

  test("section slicing: subtree runs until same-or-shallower heading") {
    val s = spans(Seq(1, 0, 2, 0, 2, 1, 0))
    val sec = HeadingStack.section(s, "h2-2")
    assert(sec.map(_.offset) == Seq(2, 3))
    val sec1 = HeadingStack.section(s, "h1-0")
    assert(sec1.map(_.offset) == Seq(0, 1, 2, 3, 4))
  }
}
