package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Zero-shuffle tree navigation: `span_nav(spans)` computes, per span and
  * fully inside the row, every derived field of the reference's tree
  * navigation surface (`TreeNavigationExtensions.cs:55-115`):
  *
  *  - `heading_path`: breadcrumb of governing heading texts, including the
  *    span itself when it is a heading (`GetHeadingPath`, `:55-83`)
  *  - `depth`: ancestor count — headings count themselves, non-headings sit
  *    one below the innermost open heading (`GetDepth`)
  *  - `section_off`: offset of the nearest heading at-or-before the span
  *    (a heading is its own section head)
  *  - `prev_text` / `next_text`: siblings in document order within the
  *    governing section (`GetPreviousSibling`/`GetNextSibling`, `:88-115`)
  *
  * Why an expression (VERDICT r01 #1): each document's spans already sit in
  * ONE row, and the whole computation is a 9-slot heading stack
  * (`WordDocumentTreeParser.cs:414-444` — `BuildTree`'s `stack[maxLevel+1]`).
  * The explode + `Window.partitionBy(doc_id)` formulation this replaces
  * shuffled every span of the corpus by doc_id — at 10^12 documents that is
  * a full-corpus exchange for O(1)-state-per-row work. This form is
  * embarrassingly parallel: scan → project → (optional) explode, no Exchange
  * anywhere in the plan.
  *
  * The per-level validity rule mirrors the windowed-SQL oracle exactly: a
  * level-l heading governs only if it appeared after every shallower
  * governing heading — maintained here by clearing deeper slots on push.
  *
  * Strings pass through as `UTF8String` (cloned once off the possibly-reused
  * input buffer); only `heading_path` materializes a new string.
  */
case class SpanNavExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(SpanNavExpr.navStruct, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val spansData = child.eval(input)
    if (spansData == null) return null
    val arr = spansData.asInstanceOf[ArrayData]
    val n = arr.numElements()

    val kinds = new Array[UTF8String](n)
    val texts = new Array[UTF8String](n)
    val medias = new Array[UTF8String](n)
    val offsets = new Array[Int](n)
    val levels = new Array[Int](n)
    var sorted = true
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      val k = r.getUTF8String(0)
      kinds(i) = if (k == null) null else k.clone()
      val t = if (r.isNullAt(1)) null else r.getUTF8String(1)
      texts(i) = if (t == null) null else t.clone()
      val m = if (r.isNullAt(2)) null else r.getUTF8String(2)
      medias(i) = if (m == null) null else m.clone()
      offsets(i) = r.getInt(3)
      levels(i) = SpanNavExpr.headingLevelOf(kinds(i))
      if (i > 0 && offsets(i) < offsets(i - 1)) sorted = false
      i += 1
    }
    if (!sorted) SpanNavExpr.sortByOffset(kinds, texts, medias, offsets, levels)

    // the reference's 9-slot heading stack (`BuildTree`, :414-444)
    val stackText = new Array[UTF8String](10)
    val stackOcc = new Array[Boolean](10)
    var lastHeadingOff = -1
    val sb = new java.lang.StringBuilder
    val rows = new Array[Any](n)
    i = 0
    while (i < n) {
      val l = levels(i)
      if (l > 0) {
        stackText(l) = texts(i)
        stackOcc(l) = true
        var q = l + 1
        while (q <= 9) { stackOcc(q) = false; stackText(q) = null; q += 1 }
        lastHeadingOff = offsets(i)
      }
      // heading_path = occupied slots shallow->deep (incl. self for headings)
      sb.setLength(0)
      var depth = 0
      var p = 1
      while (p <= 9) {
        if (stackOcc(p)) {
          if (depth > 0) sb.append(" > ")
          if (stackText(p) != null) sb.append(stackText(p).toString)
          depth += 1
        }
        p += 1
      }
      val sectionOff = if (l > 0) offsets(i) else lastHeadingOff
      val prev = if (l == 0 && i > 0) texts(i - 1) else null
      val next = if (i + 1 < n && levels(i + 1) == 0) texts(i + 1) else null
      rows(i) = InternalRow(
        kinds(i), texts(i), medias(i), offsets(i),
        UTF8String.fromString(sb.toString),
        if (l > 0) depth else depth + 1,
        sectionOff, prev, next)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def prettyName: String = "span_nav"
  override protected def withNewChildInternal(newChild: Expression): SpanNavExpr =
    copy(child = newChild)
}

object SpanNavExpr {

  val navStruct: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false),
    StructField("heading_path", StringType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("section_off", IntegerType, nullable = false),
    StructField("prev_text", StringType, nullable = true),
    StructField("next_text", StringType, nullable = true)))

  private val headingKinds: Array[UTF8String] =
    (1 to 9).map(l => UTF8String.fromString(s"heading$l")).toArray

  /** output-kind heading level: `heading3` → 3, else 0 (kinds cap at 9). */
  def headingLevelOf(kind: UTF8String): Int = {
    if (kind == null || kind.numBytes != 8) return 0
    var l = 0
    while (l < 9) {
      if (headingKinds(l).equals(kind)) return l + 1
      l += 1
    }
    0
  }

  /** in-place sort of the parallel span arrays by offset (rarely needed —
    * extracted spans are stored re-densified 0..n-1). */
  private[functions] def sortByOffset(kinds: Array[UTF8String], texts: Array[UTF8String],
      medias: Array[UTF8String], offsets: Array[Int], levels: Array[Int]): Unit = {
    val idx = offsets.indices.toArray.sortBy(i => offsets(i))
    def permute[T](a: Array[T]): Unit = {
      val copy = a.clone()
      var i = 0
      while (i < a.length) { a(i) = copy(idx(i)); i += 1 }
    }
    permute(kinds); permute(texts); permute(medias)
    val offCopy = offsets.clone(); val lvlCopy = levels.clone()
    var i = 0
    while (i < offsets.length) { offsets(i) = offCopy(idx(i)); levels(i) = lvlCopy(idx(i)); i += 1 }
  }

  /** Column API: `span_nav(spansCol)`. */
  def apply(spans: Column): Column =
    ColumnBridge.column(SpanNavExpr(ColumnBridge.expression(spans)))
}
