package graft.oracle

import graft.model.{Kinds, Span}

/** The reference's heading-stack tree builder (`WordDocumentTreeParser.cs:
  * 414-444`), rebuilt as a pure O(1)-state fold over the extracted span
  * stream. The tree is never materialized at corpus scale — heading levels +
  * pre-order offsets fully determine the hierarchy (SURVEY.md §1.2), so this
  * fold recovers, per span:
  *   - `parentOffset`: offset of the parent node (-1 = document root)
  *   - `depth`: ancestor count (root children = 1)
  *   - `sectionOffset`: offset of the nearest enclosing heading (-1 = preamble)
  *   - `headingPath`: breadcrumb of enclosing heading texts
  *
  * Stack semantics: heading level n parents at the nearest non-null
  * `stack[n-1 .. 0]` slot (orphan jumps attach upward), then occupies
  * `stack[n]` and clears deeper slots; non-headings attach to the current
  * deepest heading. Levels clamp to 9 (`:416`).
  */
object HeadingStack {

  final case class Placed(
      span: Span, parentOffset: Int, depth: Int, sectionOffset: Int, headingPath: Seq[String])

  def headingLevelOf(kind: String): Int =
    if (kind.startsWith("heading") && kind.length == 8 && kind.charAt(7).isDigit)
      kind.charAt(7) - '0'
    else 0

  def place(spans: Seq[Span]): Seq[Placed] = {
    // stack(l) = offset+text of the open heading at level l (1..9); 0 = root
    val stackOffset = Array.fill(10)(-1)
    val stackText = Array.fill(10)("")
    var currentLevel = 0
    stackOffset(0) = -1
    spans.map { s =>
      val lvl = headingLevelOf(s.kind)
      if (lvl > 0) {
        val l = math.min(lvl, 9)
        // parent = nearest occupied slot strictly above this level
        var p = l - 1
        while (p > 0 && stackOffset(p) < 0) p -= 1
        val parentOffset = if (p == 0) -1 else stackOffset(p)
        val path = (1 to p).collect { case i if stackOffset(i) >= 0 => stackText(i) }
        stackOffset(l) = s.offset
        stackText(l) = s.text
        var q = l + 1
        while (q <= 9) { stackOffset(q) = -1; stackText(q) = ""; q += 1 }
        currentLevel = l
        Placed(s, parentOffset, depth = pathDepth(stackOffset, l), sectionOffset = parentOffset,
          headingPath = path)
      } else {
        val parentOffset = if (currentLevel == 0) -1 else stackOffset(currentLevel)
        val path = (1 to currentLevel).collect { case i if stackOffset(i) >= 0 => stackText(i) }
        Placed(s, parentOffset, depth = pathDepth(stackOffset, currentLevel) + 1,
          sectionOffset = parentOffset, headingPath = path)
      }
    }
  }

  /** depth of the node sitting AT stack level `l` = number of occupied slots 1..l. */
  private def pathDepth(stackOffset: Array[Int], l: Int): Int =
    (1 to l).count(i => stackOffset(i) >= 0)

  /** All spans belonging to the section opened by the first heading whose
    * text contains `needle` (case-insensitive) — `GetSection`
    * (`TreeNavigationExtensions.cs:147-150`): the heading itself plus every
    * subsequent span until a heading of the same or shallower level.
    */
  def section(spans: Seq[Span], needle: String): Seq[Span] = {
    val lower = needle.toLowerCase(java.util.Locale.ROOT)
    val start = spans.indexWhere(s =>
      headingLevelOf(s.kind) > 0 && s.text.toLowerCase(java.util.Locale.ROOT).contains(lower))
    if (start < 0) Nil
    else {
      val lvl = headingLevelOf(spans(start).kind)
      val rest = spans.drop(start + 1).takeWhile { s =>
        val l = headingLevelOf(s.kind); l == 0 || l > lvl
      }
      spans(start) +: rest
    }
  }
}
