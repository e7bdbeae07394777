package graft.queries

import graft.model.Span
import graft.oracle.HeadingStack

/** Debug renderers mirroring the reference's `ToTreeString` pretty printer
  * (`DocumentNode.cs:208-221`): indent ×2 per depth, `H{level}` labels,
  * 80-char text preview. Never in the data path (F12, SURVEY.md §2.6).
  */
object SpanTree {

  private def preview(text: String): String =
    if (text == null) "" else if (text.length <= 80) text else text.substring(0, 77) + "..."

  private def label(kind: String): String = {
    val lvl = HeadingStack.headingLevelOf(kind)
    if (lvl > 0) s"H$lvl" else kind
  }

  /** Render a document's span sequence as the recovered tree (heading-stack
    * ancestry), one line per span. */
  def render(spans: Seq[Span]): String = {
    val placed = HeadingStack.place(spans)
    placed.map { p =>
      val indent = "  " * p.depth
      s"$indent[${label(p.span.kind)}] ${preview(p.span.text)}"
    }.mkString("\n")
  }
}
