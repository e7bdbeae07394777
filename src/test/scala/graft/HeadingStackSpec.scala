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

  test("section slicing: subtree runs until same-or-shallower heading") {
    val s = spans(Seq(1, 0, 2, 0, 2, 1, 0))
    val sec = HeadingStack.section(s, "h2-2")
    assert(sec.map(_.offset) == Seq(2, 3))
    val sec1 = HeadingStack.section(s, "h1-0")
    assert(sec1.map(_.offset) == Seq(0, 1, 2, 3, 4))
  }
}
