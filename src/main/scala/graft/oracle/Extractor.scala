package graft.oracle

import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Extraction failed for one document; the distributed job quarantines the
  * row instead of failing the task (per-part error tolerance in the
  * reference, e.g. `WordDocumentTreeParser.cs:166-169,357-360,412-415`).
  */
final case class ExtractionError(message: String) extends RuntimeException(message)

/** Pure-Scala, single-document extraction core — the line-for-line semantic
  * mirror of the reference's body walk. This is both the test oracle and the
  * routine invoked per row by the distributed `mapPartitions` core
  * (SURVEY.md §7.1 steps 3-4).
  *
  * Semantics rebuilt from `/root/reference`:
  *  - element dispatch: paragraph/table/sdt processed, package parts and body
  *    noise dropped (`WordDocumentTreeParser.cs:449-455,620-624,81-409`)
  *  - run fold: tab→"\t", break/cr→" ", then trim (`DocumentNode.cs:67-69`,
  *    `WordDocumentTreeParser.cs:463`); empty paragraphs kept (:466-468)
  *  - complex-field state machine with DOCPROPERTY resolution
  *    (`WordDocumentTreeParser.cs:527-629,644-762`)
  *  - 3-tier heading classifier (`WordDocumentTreeParser.cs:857-889`)
  *  - table geometry: gridSpan advances the column index, vMerge
  *    Restart/Continue kept, ragged rows → ColumnCount = max
  *    (`Parsing/Extractors/TableExtractor.cs:31-114`)
  *  - image label "[Image: name]" + embed rel id (`ImageExtractor.cs:64,103`)
  *  - SDT type cascade incl. checkbox-by-descendant and DocProperty-by-XPath
  *    fallbacks; single-paragraph SDT collapses to its paragraph; container
  *    value = space-join of non-blank child texts
  *    (`WordDocumentTreeParser.cs:910-1226`)
  */
object Extractor {

  private val HeadingStyle = "(?i)heading([0-9]+)".r
  private val KnownSdtTypes = Set(
    "richtext", "plaintext", "picture", "date", "dropdown", "combobox",
    "group", "bibliography", "citation", "equation", "checkbox",
    "docproperty", "repeatingsection")

  /** Per-document parsing context: the analog of `ParsingContext`'s style and
    * hyperlink-relationship caches (`Parsing/ParsingContext.cs:20-55`) —
    * built once per document, same-row lookups only (never a shuffle join).
    */
  final case class Ctx(
      styles: Map[String, (Option[Int], Option[String])], // styleId -> (outline, basedOn)
      rels: Map[String, String],                          // relId -> url
      meta: Map[String, String],                          // lowercased property name -> value
      annotate: Boolean = false)                          // A4 metadata-annotation mode

  def extract(doc: RawDoc): Doc = {
    val body = sortedBody(indexed(doc.spans))
    val ctx = buildCtx(body, Option(doc.meta).getOrElse(Map.empty))
    Doc(doc.doc_id, reindex(walk(body, ctx)))
  }

  /** `walk`/`parseTable`/`parseSdt` index into the body by position — a
    * linked Seq (List) would make that O(n^2) (measured: 105 ms JUST to index
    * a 9.4k-span mega doc). Normalize once. */
  private[graft] def indexed(spans: Seq[RawSpan]): Seq[RawSpan] =
    spans match {
      case _: scala.collection.IndexedSeq[_] => spans
      case s => scala.collection.immutable.ArraySeq.unsafeWrapArray(s.toArray)
    }

  /** Sort by offset only when needed (raw tables are usually already in
    * document order; the copy is pure overhead on the hot path). */
  private[graft] def sortedBody(spans: Seq[RawSpan]): Seq[RawSpan] = {
    var prev = Int.MinValue
    val it = spans.iterator
    while (it.hasNext) {
      val o = it.next().offset
      if (o < prev) return spans.sortBy(_.offset)
      prev = o
    }
    spans
  }

  /** `GetAllTextWithMetadata` extraction mode (A4, `DocumentNode.cs:75-163`,
    * `DocumentPropertyExtensions.cs:60-79`): identical walk, but resolved
    * DOCPROPERTY fields render as `[DocProperty:NAME="value"]` and inline
    * SDT runs as `[ContentControl:type id=ID]text`. */
  def extractAnnotated(doc: RawDoc): Doc = {
    val body = sortedBody(indexed(doc.spans))
    val ctx = buildCtx(body, Option(doc.meta).getOrElse(Map.empty)).copy(annotate = true)
    Doc(doc.doc_id, reindex(walk(body, ctx)))
  }

  /** Walk an (already offset-sorted) body span sequence under a prebuilt
    * context; emits output spans WITHOUT re-densified offsets. Exposed so the
    * mega-document chunker can walk chunks independently (chunk boundaries
    * sit at top-level element boundaries, so no parser state crosses them)
    * and concatenate (SURVEY.md §4.3.1).
    */
  private[graft] def walk(body: Seq[RawSpan], ctx: Ctx): Seq[Span] = {
    val out = ArrayBuffer.empty[Span]
    var i = 0
    val n = body.length
    while (i < n) {
      val s = body(i)
      s.kind match {
        case Kinds.P =>
          out += paragraphSpan(s, ctx); i += 1
        case Kinds.Drawing =>
          out += imageSpan(s); i += 1
        case Kinds.Tbl =>
          val (spans, _, next) = parseTable(body, i, ctx)
          out ++= spans; i = next
        case Kinds.Sdt =>
          val (spans, _, next) = parseSdt(body, i, ctx)
          out ++= spans; i = next
        case Kinds.StyleDef | Kinds.Rel =>
          i += 1 // context parts, consumed by buildCtx
        case k if Kinds.Boilerplate.contains(k) || Kinds.Dropped.contains(k) =>
          i += 1 // stripped
        case Kinds.TblEnd | Kinds.TrEnd | Kinds.TcEnd | Kinds.Tr | Kinds.Tc =>
          throw ExtractionError(s"unexpected '${s.kind}' at offset ${s.offset} outside a table")
        case Kinds.SdtEnd =>
          throw ExtractionError(s"unexpected 'sdt_end' at offset ${s.offset}")
        case _ =>
          i += 1 // unknown elements dropped, mirroring dispatch default
      }
    }
    out.toSeq
  }

  private def reindex(spans: Seq[Span]): Seq[Span] =
    spans.zipWithIndex.map { case (s, idx) => s.copy(offset = idx) }

  private[graft] def buildCtx(body: Seq[RawSpan], meta: Map[String, String]): Ctx = {
    val styles = body.iterator.filter(_.kind == Kinds.StyleDef).map { s =>
      val a = Grammar.parseAttrs(s.text)
      val id = a.getOrElse("id", "")
      id.toLowerCase -> (a.get("outline").flatMap(safeInt), a.get("basedOn"))
    }.toMap
    val rels = body.iterator.filter(_.kind == Kinds.Rel).map { s =>
      val a = Grammar.parseAttrs(s.text)
      a.getOrElse("id", "") -> a.getOrElse("url", "")
    }.toMap
    Ctx(styles, rels, meta.map { case (k, v) => k.toLowerCase -> v })
  }

  private def safeInt(s: String): Option[Int] =
    try Some(s.trim.toInt) catch { case _: NumberFormatException => None }

  // --------------------------------------------------------------------- p

  /** Fold a paragraph's token stream into (text, kind, media_ref). Hot path:
    * scans the raw payload by index and appends character RANGES to the
    * builder — no per-token substring allocation (the extraction job is
    * allocation-bound at full parallelism, see BASELINE.md). */
  private[graft] def paragraphSpan(s: RawSpan, ctx: Ctx): Span = {
    val payload = if (s.text == null) "" else s.text
    // attrs segment (starts with '@') is rare — parse it alone, fold the rest
    var tokensFrom = 0
    var attrs: Map[String, String] = Map.empty
    if (payload.startsWith("@")) {
      val firstSep = payload.indexOf('|')
      val seg = if (firstSep < 0) payload else payload.substring(0, firstSep)
      attrs = Grammar.parseAttrs(seg)
      tokensFrom = if (firstSep < 0) payload.length else firstSep + 1
    }
    val text = foldPayload(payload, tokensFrom, ctx)
    val level = headingLevel(attrs, ctx)
    if (level > 0) Span(Kinds.heading(level), text, null, -1)
    else attrs.get("numId") match {
      case Some(numId) =>
        val ilvl = attrs.getOrElse("ilvl", "0")
        Span(Kinds.ListItem, text, s"$numId:$ilvl", -1)
      case None =>
        Span(Kinds.Paragraph, text, null, -1)
    }
  }

  /** 3-tier heading classifier (`WordDocumentTreeParser.cs:857-889`):
    * style-name prefix → style-table outline (following basedOn) → direct
    * outline attr. Levels clamp to 1..9 (`:416`).
    */
  private[graft] def headingLevel(attrs: Map[String, String], ctx: Ctx): Int = {
    val styleId = attrs.getOrElse("style", "")
    styleId match {
      case HeadingStyle(lvl) =>
        val v = try lvl.toInt catch { case _: NumberFormatException => 0 }
        if (v >= 1) return math.min(v, 9)
      case _ =>
    }
    // style-table fallback: outline level on the style or an ancestor via basedOn
    var cur = styleId.toLowerCase
    var hops = 0
    while (cur.nonEmpty && hops < 10) {
      ctx.styles.get(cur) match {
        case Some((Some(outline), _)) =>
          val lvl = outline + 1
          if (lvl >= 1) return math.min(lvl, 9) else return 0
        case Some((None, Some(basedOn))) => cur = basedOn.toLowerCase; hops += 1
        case _ => cur = ""
      }
    }
    attrs.get("outline").flatMap(safeInt) match {
      case Some(o) if o >= 0 => math.min(o + 1, 9)
      case _ => 0
    }
  }

  /** The run fold + complex-field finite-state machine
    * (`WordDocumentTreeParser.cs:527-629`). States: outside / in-field-code /
    * in-field-result. DOCPROPERTY fields emit ONE run whose text is the
    * resolved property value (resolution wins over the collected result,
    * `:555-577`); other fields pass their buffered result runs through
    * (`:579-582`). Unterminated fields discard their buffered content.
    * tab→"\t", br/cr→" " (`DocumentNode.cs:67-69`); final trim (`:463`).
    *
    * Implementation note: scans `payload` from `from` by index and appends
    * CHARACTER RANGES — no per-token substring allocation (hot path).
    */
  private[graft] def foldPayload(payload: String, from: Int, ctx: Ctx): String = {
    val sb = new java.lang.StringBuilder
    var state = 0 // 0=outside 1=field code 2=field result
    val instr = new java.lang.StringBuilder
    val result = new java.lang.StringBuilder
    @inline def sink: java.lang.StringBuilder = if (state == 2) result else sb
    @inline def is(tok: String, s: Int, e: Int, kw: String): Boolean =
      e - s == kw.length && tok.regionMatches(s, kw, 0, kw.length)
    @inline def starts(tok: String, s: Int, e: Int, kw: String): Boolean =
      e - s >= kw.length && tok.regionMatches(s, kw, 0, kw.length)

    val len = payload.length
    var s = from
    while (s < len) {
      {
        var e = payload.indexOf('|', s)
        if (e < 0) e = len
        if (e > s) { // empty segments skipped
          if (is(payload, s, e, "fldBegin")) {
            state = 1; instr.setLength(0); result.setLength(0)
          } else if (is(payload, s, e, "fldSep")) {
            if (state == 1) state = 2
          } else if (is(payload, s, e, "fldEnd")) {
            if (state != 0) {
              parseDocProperty(instr.toString) match {
                case Some(name) =>
                  ctx.meta.get(name.toLowerCase) match {
                    case Some(value) =>
                      // annotated rendering: DocumentPropertyField.ToMetadataString
                      // (`DocumentPropertyField.cs:31-32`)
                      if (ctx.annotate) sb.append("[DocProperty:").append(name)
                        .append("=\"").append(value).append("\"]")
                      else sb.append(value)
                    case None => sb.append(result)
                  }
                case None => sb.append(result)
              }
              state = 0
            }
          } else if (starts(payload, s, e, "instr:")) {
            if (state == 1) {
              if (instr.length > 0) instr.append(' ')
              instr.append(payload, s + 6, e)
            }
          } else if (state == 1) {
            // runs inside the field code region are ignored (only instrText counts)
          } else if (starts(payload, s, e, "run:")) {
            sink.append(payload, s + 4, e)
          } else if (is(payload, s, e, "tab")) {
            sink.append('\t')
          } else if (is(payload, s, e, "cr") || starts(payload, s, e, "br:")) {
            sink.append(' ')
          } else if (starts(payload, s, e, "link:")) {
            // link:<relId>:<display text> — display text inlined; URL stays in
            // the rel map (metadata-only in the reference, :837-852)
            var c = payload.indexOf(':', s + 5)
            if (c < 0 || c >= e) c = s + 4 // no second colon: whole rest
            sink.append(payload, c + 1, e)
          } else if (starts(payload, s, e, "sdtrun:")) {
            // sdtrun:<type>,<id>,<tag>:<text> — inline SDT run text inlined
            // (:984-1026); annotated mode prefixes the control descriptor
            // (`DocumentNode.cs:145-153`)
            val c0 = payload.indexOf(':', s + 7)
            val c = if (c0 < 0 || c0 >= e) -1 else c0
            if (ctx.annotate) {
              val descEnd = if (c >= 0) c else e
              val desc = payload.substring(s + 7, descEnd)
              val parts = desc.split(',')
              val ty = if (parts.length > 0) parts(0) else ""
              val id = if (parts.length > 1) parts(1) else ""
              sink.append("[ContentControl:").append(ty).append(" id=").append(id).append(']')
            }
            if (c >= 0) sink.append(payload, c + 1, e)
          } else if (is(payload, s, e, "bookmark") || is(payload, s, e, "prooferr")) {
            // skipped (:620-624)
          } else {
            throw ExtractionError(s"unknown paragraph token '${payload.substring(s, e)}'")
          }
        }
        s = e + 1
      }
    }
    sb.toString.strip()
  }

  /** Token-sequence form (corpus/test convenience); delegates to the
    * index-scanning fold for single semantics. */
  private[graft] def foldRuns(tokens: Seq[String], ctx: Ctx): String =
    foldPayload(tokens.mkString("|"), 0, ctx)

  /** DOCPROPERTY field-code parse (`WordDocumentTreeParser.cs:644-675`):
    * whitespace-split; quoted property names re-joined; `\*` switch and its
    * argument (MERGEFORMAT) skipped. Returns the property name, or None when
    * the field is not a DOCPROPERTY field.
    */
  private[graft] def parseDocProperty(code: String): Option[String] = {
    val parts = code.trim.split("[ \t]+").filter(_.nonEmpty)
    if (parts.isEmpty || !parts(0).equalsIgnoreCase("DOCPROPERTY")) return None
    var i = 1
    val name = new StringBuilder
    var done = false
    while (i < parts.length && !done) {
      val p = parts(i)
      if (p == "\\*") { i += 2 } // skip switch + argument
      else if (name.isEmpty) {
        if (p.startsWith("\"")) {
          var cur = p.substring(1)
          var closed = cur.endsWith("\"") && cur.length >= 1
          if (closed) { name ++= cur.dropRight(1); done = true; i += 1 }
          else {
            name ++= cur; i += 1
            while (i < parts.length && !closed) {
              val q = parts(i)
              if (q.endsWith("\"")) { name += ' '; name ++= q.dropRight(1); closed = true }
              else { name += ' '; name ++= q }
              i += 1
            }
            done = true
          }
        } else { name ++= p; done = true; i += 1 }
      } else i += 1
    }
    if (name.isEmpty) None else Some(name.toString)
  }

  // --------------------------------------------------------------- drawing

  private[graft] def imageSpan(s: RawSpan): Span = {
    val a = Grammar.parseAttrs(s.text)
    val name = a.getOrElse("name", "")
    Span(Kinds.Image, s"[Image: $name]", s.media_ref, -1)
  }

  // ------------------------------------------------------------------ tbl

  /** Parse a table starting at `start` (body(start).kind == tbl). Returns
    * (emitted spans, table text label, index just past tbl_end).
    * Emission order = pre-order flatten of the reference's table node:
    * `table` span, then per cell a `table_cell` span followed by that cell's
    * non-paragraph content spans (nested tables, images).
    */
  private[graft] def parseTable(body: Seq[RawSpan], start: Int, ctx: Ctx): (Seq[Span], String, Int) = {
    var i = start + 1
    val n = body.length
    // rows: each row = Seq[(colIndex, cellText, cellChildSpans)]
    val rows = ArrayBuffer.empty[ArrayBuffer[(Int, String, Seq[Span])]]
    var maxCols = 0
    var closed = false
    while (i < n && !closed) {
      body(i).kind match {
        case Kinds.TblEnd => closed = true; i += 1
        case Kinds.Tr =>
          i += 1
          val cells = ArrayBuffer.empty[(Int, String, Seq[Span])]
          var colIndex = 0
          var rowClosed = false
          while (i < n && !rowClosed) {
            body(i).kind match {
              case Kinds.TrEnd => rowClosed = true; i += 1
              case Kinds.Tc =>
                val attrs = Grammar.parseAttrs(body(i).text)
                val gridSpan = attrs.get("gridSpan").flatMap(safeInt).getOrElse(1).max(1)
                i += 1
                val texts = ArrayBuffer.empty[String]
                val childSpans = ArrayBuffer.empty[Span]
                var cellClosed = false
                while (i < n && !cellClosed) {
                  body(i).kind match {
                    case Kinds.TcEnd => cellClosed = true; i += 1
                    case Kinds.P =>
                      val sp = paragraphSpan(body(i), ctx)
                      texts += sp.text; i += 1
                    case Kinds.Drawing =>
                      val sp = imageSpan(body(i))
                      texts += sp.text; childSpans += sp; i += 1
                    case Kinds.Tbl =>
                      val (spans, label, next) = parseTable(body, i, ctx)
                      texts += label; childSpans ++= spans; i = next
                    case k if Kinds.Dropped.contains(k) => i += 1
                    case k =>
                      throw ExtractionError(s"unexpected '$k' inside table cell at offset ${body(i).offset}")
                  }
                }
                if (!cellClosed) throw ExtractionError("unclosed table cell")
                // cell text = space-join of non-empty content texts (TableCell.cs:26)
                cells += ((colIndex, texts.filter(_.nonEmpty).mkString(" "), childSpans.toSeq))
                colIndex += gridSpan
              case k =>
                throw ExtractionError(s"unexpected '$k' inside table row at offset ${body(i).offset}")
            }
          }
          if (!rowClosed) throw ExtractionError("unclosed table row")
          maxCols = math.max(maxCols, colIndex)
          rows += cells
        case k =>
          throw ExtractionError(s"unexpected '$k' inside table at offset ${body(i).offset}")
      }
    }
    if (!closed) throw ExtractionError("unclosed table")
    val r = rows.length
    val label = s"[Table: ${r}x$maxCols]"
    val out = ArrayBuffer.empty[Span]
    out += Span(Kinds.Table, label, s"${r}x$maxCols", -1)
    rows.iterator.zipWithIndex.foreach { case (cells, rIdx) =>
      cells.foreach { case (c, cellText, childSpans) =>
        out += Span(Kinds.TableCell, cellText, s"$rIdx,$c", -1)
        out ++= childSpans
      }
    }
    (out.toSeq, label, i)
  }

  // ------------------------------------------------------------------ sdt

  /** Parse an SDT block. Returns (emitted spans, text contribution, next
    * index). Single-paragraph SDTs collapse to their paragraph span
    * (`WordDocumentTreeParser.cs:925-942`); containers emit a
    * `content_control` span whose text is the space-join of non-blank child
    * texts (`:969-975`), followed by the flattened child spans.
    */
  private[graft] def parseSdt(body: Seq[RawSpan], start: Int, ctx: Ctx): (Seq[Span], String, Int) = {
    val attrs = Grammar.parseAttrs(body(start).text)
    var i = start + 1
    val n = body.length
    val childSpanGroups = ArrayBuffer.empty[Seq[Span]]
    val childTexts = ArrayBuffer.empty[String]
    var closed = false
    while (i < n && !closed) {
      body(i).kind match {
        case Kinds.SdtEnd => closed = true; i += 1
        case Kinds.P =>
          val sp = paragraphSpan(body(i), ctx)
          childSpanGroups += Seq(sp); childTexts += sp.text; i += 1
        case Kinds.Drawing =>
          val sp = imageSpan(body(i))
          childSpanGroups += Seq(sp); childTexts += sp.text; i += 1
        case Kinds.Tbl =>
          val (spans, label, next) = parseTable(body, i, ctx)
          childSpanGroups += spans; childTexts += label; i = next
        case Kinds.Sdt =>
          val (spans, value, next) = parseSdt(body, i, ctx)
          childSpanGroups += spans; childTexts += value; i = next
        case k if Kinds.Dropped.contains(k) => i += 1
        case k =>
          throw ExtractionError(s"unexpected '$k' inside sdt at offset ${body(i).offset}")
      }
    }
    if (!closed) throw ExtractionError("unclosed sdt")

    // type cascade (`:1178-1225`): explicit recognized type, else
    // checkbox-by-@checked (descendant-scan analog), else DocProperty-by-XPath,
    // else unknown.
    val sdtType = attrs.get("type").map(_.toLowerCase).filter(KnownSdtTypes.contains)
      .orElse(if (attrs.contains("checked")) Some("checkbox") else None)
      .orElse(if (attrs.get("xpath").exists(_.nonEmpty)) Some("docproperty") else None)
      .getOrElse("unknown")

    val isSingleParagraph = childSpanGroups.length == 1 &&
      childSpanGroups.head.length == 1 && {
        val k = childSpanGroups.head.head.kind
        k == Kinds.Paragraph || k == Kinds.ListItem || k.startsWith("heading")
      }
    if (isSingleParagraph) {
      val sp = childSpanGroups.head.head
      (Seq(sp), sp.text, i)
    } else {
      val value = childTexts.filter(_.strip().nonEmpty).mkString(" ")
      val ident = Seq(attrs.get("id"), attrs.get("tag"), attrs.get("alias"))
        .flatten.find(_.nonEmpty).getOrElse("")
      val head = Span(Kinds.ContentControl, value, s"$sdtType:$ident", -1)
      (head +: childSpanGroups.flatten.toSeq, value, i)
    }
  }
}
