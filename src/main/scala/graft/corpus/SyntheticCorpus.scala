package graft.corpus

import graft.model._
import graft.model.Grammar.{renderAttrs, renderParagraph}
import java.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic corpus (FIXTURES.md). Any document regenerates
  * identically on any executor at any scale: the RNG is seeded per doc_id via
  * FNV-1a64 over `corpusSeed ++ doc_id` (corpusSeed = 42), so generation is a
  * pure function of the id — fixtures are code, never stored (drift-proof).
  *
  * Families cover every semantic branch of the reference parser (citations in
  * FIXTURES.md §4). `doc_id = "doc-<family>-<index%09d>"` names the scenario
  * on failure.
  */
object SyntheticCorpus {

  val CorpusSeed = "graft-42:"

  /** Regular families in rotation. `mega` is injected every 997th doc and
    * `poison` every 1009th (co-prime strides → stable mix at any scale).
    */
  val Families: Vector[String] = Vector(
    "headings", "runs", "fields", "hyperlinks", "sdt",
    "tables", "images", "lists", "boilerplate", "properties")

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def familyFor(index: Long): String =
    if (index > 0 && index % 997 == 0) "mega"
    else if (index > 0 && index % 1009 == 0) "poison"
    else Families((index % Families.size).toInt)

  def docIdFor(index: Long): String = f"doc-${familyFor(index)}-$index%09d"

  private val Words = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "spark", "span", "table", "heading", "corpus")

  private def sentence(r: Random, n: Int): String =
    (0 until n).map(_ => Words(r.nextInt(Words.length))).mkString(" ")

  /** Raw-span assembly buffer with auto-offsets and boilerplate noise. */
  private final class B(r: Random) {
    val spans = ArrayBuffer.empty[RawSpan]
    def add(kind: String, text: String, media: String = null): Unit = {
      spans += RawSpan(kind, text, media, spans.length)
    }
    def p(tokens: Seq[String], attrs: Seq[(String, String)] = Nil): Unit =
      add(Kinds.P, renderParagraph(attrs, tokens))
    def run(text: String): String = s"run:$text"
    def maybeNoise(): Unit = if (r.nextInt(4) == 0) {
      val k = r.nextInt(3) match {
        case 0 => "bookmark"; case 1 => "prooferr"; case 2 => "sectPr"
      }
      add(k, "")
    }
  }

  /** Generate one raw document as a pure function of its id. */
  def rawDoc(docId: String): RawDoc = {
    val family = docId.split('-')(1)
    val r = new Random(fnv1a64(CorpusSeed + docId))
    val b = new B(r)
    // every doc opens with package-part boilerplate that extraction must strip
    b.add("header", s"Header ${sentence(r, 2)}")
    b.add("footer", s"Footer ${sentence(r, 2)}")
    if (r.nextBoolean()) b.add("settings", "@zoom=100")
    var meta: Map[String, String] = Map(
      "title" -> s"Title ${sentence(r, 2)}",
      "author" -> Words(r.nextInt(Words.length)),
      "company" -> "Graft Inc")
    family match {
      case "headings" => genHeadings(b, r)
      case "runs" => genRuns(b, r)
      case "fields" => meta = meta ++ genFields(b, r)
      case "hyperlinks" => genHyperlinks(b, r)
      case "sdt" => genSdt(b, r)
      case "tables" => genTables(b, r)
      case "images" => genImages(b, r)
      case "lists" => genLists(b, r)
      case "boilerplate" => genBoilerplate(b, r)
      case "properties" => meta = meta ++ genProperties(b, r)
      case "mega" => genMega(b, r)
      case "poison" => genPoison(b, r)
      case other => genRuns(b, r)
    }
    b.add("footnote", sentence(r, 3)) // trailing boilerplate
    RawDoc(docId, b.spans.toIndexedSeq, meta)
  }

  // ------------------------------------------------------------- families

  /** levels 1-9, orphan jumps, all three classifier tiers incl. the tier-1
    * fall-through and the style-id gate
    * (`WordDocumentTreeParser.cs:414-444,857-889`). */
  private def genHeadings(b: B, r: Random): Unit = {
    // style table: own-outline style (tier 2a -> level 2), a style whose
    // basedOn NAME is "Heading3" (tier 2b single hop -> level 3), and a plain
    // style that satisfies the style-id gate so the direct outline attr
    // (tier 3) can fire
    b.add(Kinds.StyleDef, renderAttrs(Seq("id" -> "SectionTitle", "outline" -> "1")))
    b.add(Kinds.StyleDef, renderAttrs(Seq("id" -> "Sub", "basedOn" -> "Heading3")))
    b.add(Kinds.StyleDef, renderAttrs(Seq("id" -> "Plain", "basedOn" -> "Normal")))
    val levels = {
      val base = Seq(1, 2, 3, 1, 3, 2, 9) // orphan jump H1->H3, backtrack
      base ++ (0 until r.nextInt(5)).map(_ => 1 + r.nextInt(9))
    }
    levels.foreach { lvl =>
      val mode = r.nextInt(4)
      val (attrs, tokens) = mode match {
        case 0 => (Seq("style" -> s"Heading$lvl"), Seq(b.run(s"H$lvl ${sentence(r, 3)}")))
        case 1 => (Seq("style" -> s"heading$lvl"), Seq(b.run(s"h$lvl ${sentence(r, 2)}"))) // case-insensitive
        case 2 if lvl == 2 => (Seq("style" -> "SectionTitle"), Seq(b.run(sentence(r, 3)))) // style outline 1 -> level 2
        case 2 if lvl == 3 => (Seq("style" -> "Sub"), Seq(b.run(sentence(r, 3)))) // basedOn NAME hop -> level 3
        // tier 3: direct outline attr, gated on having SOME style id (:860-861)
        case _ => (Seq("style" -> "Plain", "outline" -> (lvl - 1).toString), Seq(b.run(s"O$lvl ${sentence(r, 2)}")))
      }
      b.p(tokens, attrs)
      (0 until r.nextInt(3)).foreach(_ => b.p(Seq(b.run(sentence(r, 4 + r.nextInt(6))))))
      b.maybeNoise()
    }
    // tier-1 fall-through: "Heading12" does NOT parse (only 1..9); the style
    // lookup misses; the direct outline attr decides -> heading5
    b.p(Seq(b.run("big level")), Seq("style" -> "Heading12", "outline" -> "4"))
    // no style id at all -> never a heading, even with an outline attr
    b.p(Seq(b.run("outline but unstyled")), Seq("outline" -> "2"))
    // vocabulary cap: outline 11 would be level 12; span kinds cap at heading9
    b.p(Seq(b.run("deep heading")), Seq("style" -> "Plain", "outline" -> "11"))
  }

  /** tabs, breaks, CR, empty paragraphs, trim (`:767-797,463-468`). */
  private def genRuns(b: B, r: Random): Unit = {
    b.p(Seq(b.run("  leading"), "tab", b.run("after tab  ")))
    b.p(Seq(b.run("page"), "br:Page", b.run("break")))
    b.p(Seq(b.run("col"), "br:Column", b.run("break"), "br:TextWrapping", b.run("wrap")))
    b.p(Seq(b.run("line one"), "cr", b.run("line two")))
    b.p(Nil) // empty paragraph kept (Text="")
    b.p(Seq(b.run("   ")))
    (0 until 2 + r.nextInt(6)).foreach { _ =>
      val toks = ArrayBuffer[String](b.run(sentence(r, 3 + r.nextInt(8))))
      if (r.nextBoolean()) { toks += "tab"; toks += b.run(sentence(r, 2)) }
      if (r.nextInt(3) == 0) { toks += "br:Page"; toks += b.run(sentence(r, 2)) }
      b.p(toks.toSeq)
      b.maybeNoise()
    }
  }

  /** DOCPROPERTY core/extended/custom, quoted names, MERGEFORMAT, fallback
    * to buffered result, non-DOCPROPERTY fields, unterminated fields
    * (`:527-629,644-762`). */
  private def genFields(b: B, r: Random): Map[String, String] = {
    val custom = Map("projectcode" -> s"PX-${100 + r.nextInt(900)}", "reviewer" -> Words(r.nextInt(Words.length)))
    b.p(Seq(b.run("Title is "), "fldBegin", "instr:DOCPROPERTY Title \\* MERGEFORMAT",
      "fldSep", b.run("stale cached title"), "fldEnd", b.run(".")))
    b.p(Seq("fldBegin", "instr:DOCPROPERTY projectcode", "fldSep", b.run("old"), "fldEnd"))
    b.p(Seq(b.run("Quoted: "), "fldBegin", "instr:DOCPROPERTY \"Project Code\"", "fldSep",
      b.run("fallback value"), "fldEnd")) // unresolvable ("project code" not in meta) -> buffered result
    b.p(Seq(b.run("Page "), "fldBegin", "instr:PAGE \\* MERGEFORMAT", "fldSep", b.run("7"), "fldEnd"))
    b.p(Seq(b.run("no result "), "fldBegin", "instr:DOCPROPERTY company", "fldEnd"))
    b.p(Seq(b.run("lost "), "fldBegin", "instr:DOCPROPERTY Title", "fldSep", b.run("never emitted")))
    // result runs collected in the CODE region (no fldSep): plain runs after
    // the instr token buffer into the field result (`:598-605`)
    b.p(Seq(b.run("Page "), "fldBegin", "instr:PAGE", b.run("7"), "fldEnd"))
    // a plain run BEFORE the first instr token emits normally (code still null)
    b.p(Seq("fldBegin", b.run("pre-code "), "instr:DOCPROPERTY reviewer", "fldSep", b.run("old name"), "fldEnd"))
    // field code split across several instrText runs: direct concatenation (`:592-596`)
    b.p(Seq(b.run("Split "), "fldBegin", "instr:DOCPROP", "instr:ERTY Title", "fldSep", b.run("x"), "fldEnd"))
    // unresolvable DOCPROPERTY falls back to result runs buffered in the code region
    b.p(Seq(b.run("Fallback "), "fldBegin", "instr:DOCPROPERTY missing", b.run("code-region result"), "fldEnd"))
    (0 until r.nextInt(4)).foreach(_ => b.p(Seq(b.run(sentence(r, 5)))))
    custom
  }

  /** hyperlink runs, URL rel lookup (`:802-852`, ParsingContext.cs:37-49). */
  private def genHyperlinks(b: B, r: Random): Unit = {
    val nLinks = 1 + r.nextInt(4)
    (0 until nLinks).foreach { i =>
      b.add(Kinds.Rel, renderAttrs(Seq("id" -> s"rId${10 + i}", "url" -> s"https://example.org/${Words(r.nextInt(Words.length))}")))
    }
    (0 until nLinks).foreach { i =>
      b.p(Seq(b.run("see "), s"link:rId${10 + i}:${sentence(r, 2)}", b.run(" for details")))
      if (r.nextBoolean()) b.p(Seq(b.run(sentence(r, 6))))
    }
    b.p(Seq(s"link:rIdMissing:dangling link")) // rel not present: text still inlined
  }

  /** all SDT shapes: explicit types, checkbox-by-@checked, xpath fallback,
    * single-paragraph collapse vs container, nesting, inline sdtrun
    * (`:910-1226`). */
  private def genSdt(b: B, r: Random): Unit = {
    val types = Seq("richtext", "plaintext", "picture", "date", "dropdown", "combobox",
      "group", "bibliography", "citation", "equation", "repeatingsection")
    // single-paragraph collapse
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> types(r.nextInt(types.size)), "id" -> "1001", "tag" -> "t1")))
    b.p(Seq(b.run(s"collapsed ${sentence(r, 3)}")))
    b.add(Kinds.SdtEnd, "")
    // container with several children
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "richtext", "id" -> "1002", "alias" -> "Body")))
    b.p(Seq(b.run(sentence(r, 3))))
    b.p(Nil)
    b.p(Seq(b.run(sentence(r, 2))))
    b.add(Kinds.SdtEnd, "")
    // checkbox detected by @checked with no recognized type (descendant-scan analog, :1203)
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "mystery", "id" -> "1003", "checked" -> (if (r.nextBoolean()) "1" else "0"))))
    b.p(Seq(b.run("done")))
    b.p(Seq(b.run("pending")))
    b.add(Kinds.SdtEnd, "")
    // DocProperty-by-XPath fallback (:1209)
    b.add(Kinds.Sdt, renderAttrs(Seq("id" -> "1004", "xpath" -> "/ns:coreProperties[1]/ns:title[1]")))
    b.p(Seq(b.run("bound title")))
    b.p(Seq(b.run("second")))
    b.add(Kinds.SdtEnd, "")
    // date with format
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "date", "tag" -> "when", "dateFmt" -> "yyyy-MM-dd")))
    b.p(Seq(b.run("2024-01-15")))
    b.p(Seq(b.run("(signed)")))
    b.add(Kinds.SdtEnd, "")
    // nested sdt inside container: the nested block is DROPPED entirely
    // (reference maps non-Paragraph/Table children to null, :955-962), and
    // with one remaining paragraph + zero tables the outer collapses to it
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "group", "id" -> "1006")))
    b.p(Seq(b.run("outer")))
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "plaintext", "id" -> "1007")))
    b.p(Seq(b.run("inner value")))
    b.p(Seq(b.run("inner second")))
    b.add(Kinds.SdtEnd, "")
    b.add(Kinds.SdtEnd, "")
    // repeating-section types (`ContentControlType.cs:16-17`): container form
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "repeatingsectionitem", "id" -> "1008")))
    b.p(Seq(b.run(s"row ${sentence(r, 2)}")))
    b.p(Seq(b.run(s"row ${sentence(r, 2)}")))
    b.add(Kinds.SdtEnd, "")
    // building-block gallery (`ContentControlType.cs:18`): single-para collapse
    b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "buildingblockgallery", "tag" -> "bb1")))
    b.p(Seq(b.run(s"gallery ${sentence(r, 2)}")))
    b.add(Kinds.SdtEnd, "")
    // inline sdtrun inside a plain paragraph (tag identifier)
    b.p(Seq(b.run("Before "), s"sdtrun:plaintext,2001,name:${Words(r.nextInt(Words.length))}", b.run(" after")))
    // inline sdtrun with an alias (identifier precedence alias > tag > id)
    b.p(Seq(b.run("Aka "), s"sdtrun:richtext,2002,t2,Friendly:${sentence(r, 2)}"))
    // inline sdtrun with no identifiers at all -> "unnamed" in annotated mode
    b.p(Seq(s"sdtrun:plaintext,,,:anon value", b.run(" tail")))
  }

  /** gridSpan, vMerge, header rows, ragged rows, nested tables, multi-para
    * cells, image-in-cell (`TableExtractor.cs:31-114`). */
  private def genTables(b: B, r: Random): Unit = {
    b.p(Seq(b.run("Before table")))
    // main table 3 rows, ragged + gridSpan + vMerge
    b.add(Kinds.Tbl, "")
    b.add(Kinds.Tr, renderAttrs(Seq("header" -> "1")))
    b.add(Kinds.Tc, renderAttrs(Seq("gridSpan" -> "2")))
    b.p(Seq(b.run("Wide header")))
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.Tc, "")
    b.p(Seq(b.run("Col C")))
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.Tr, "")
    b.add(Kinds.Tc, renderAttrs(Seq("vMerge" -> "Restart")))
    b.p(Seq(b.run("merge top")))
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.Tc, "")
    b.p(Seq(b.run("cell b1")))
    b.p(Seq(b.run("cell b2"))) // multi-paragraph cell
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.Tc, "")
    // nested table 2 deep
    b.add(Kinds.Tbl, "")
    b.add(Kinds.Tr, "")
    b.add(Kinds.Tc, ""); b.p(Seq(b.run("n00"))); b.add(Kinds.TcEnd, "")
    b.add(Kinds.Tc, ""); b.p(Seq(b.run("n01"))); b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.Tr, "")
    b.add(Kinds.Tc, "")
    b.add(Kinds.Tbl, "")
    b.add(Kinds.Tr, "")
    b.add(Kinds.Tc, ""); b.p(Seq(b.run("deep"))); b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.TblEnd, "")
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.TblEnd, "")
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.Tr, "")
    b.add(Kinds.Tc, renderAttrs(Seq("vMerge" -> "Continue")))
    b.add(Kinds.TcEnd, "") // empty continued cell
    b.add(Kinds.Tc, "")
    b.p(Seq(b.run("tail"), "tab", b.run("cell")))
    b.add(Kinds.TcEnd, "")
    b.add(Kinds.TrEnd, "")
    b.add(Kinds.TblEnd, "")
    b.p(Seq(b.run("After table")))
    // random rectangular table
    val rows = 2 + r.nextInt(4); val cols = 2 + r.nextInt(3)
    b.add(Kinds.Tbl, "")
    (0 until rows).foreach { _ =>
      b.add(Kinds.Tr, "")
      (0 until cols).foreach { _ =>
        b.add(Kinds.Tc, "")
        b.p(Seq(b.run(sentence(r, 1 + r.nextInt(3)))))
        b.add(Kinds.TcEnd, "")
      }
      b.add(Kinds.TrEnd, "")
    }
    b.add(Kinds.TblEnd, "")
  }

  /** inline + anchored drawings, wrap types, EMU dims (`ImageExtractor.cs:
    * 44-169`). Media bytes live in the side table (see [[mediaFor]]). */
  private def genImages(b: B, r: Random): Unit = {
    val wraps = Seq("Square", "Tight", "Through", "TopAndBottom", "BehindText")
    val n = 1 + r.nextInt(5)
    (0 until n).foreach { i =>
      val inline = r.nextBoolean()
      val attrs = ArrayBuffer(
        "name" -> s"figure-$i.png",
        "inline" -> (if (inline) "1" else "0"),
        "cx" -> (914400L * (1 + r.nextInt(5))).toString,
        "cy" -> (914400L * (1 + r.nextInt(4))).toString)
      if (!inline) attrs += ("wrap" -> wraps(r.nextInt(wraps.size)))
      if (r.nextBoolean()) attrs += ("alt" -> sentence(r, 3))
      b.p(Seq(b.run(s"Figure $i: ${sentence(r, 3)}")))
      b.add(Kinds.Drawing, renderAttrs(attrs.toSeq), s"rId${100 + i}")
    }
    b.p(Seq(b.run(sentence(r, 5))))
  }

  /** numbering ids/levels; list-item classification (`:478-485,894`). */
  private def genLists(b: B, r: Random): Unit = {
    b.p(Seq(b.run("Shopping")), Seq("style" -> "Heading1"))
    val numId = 1 + r.nextInt(3)
    (0 until 3 + r.nextInt(5)).foreach { i =>
      val ilvl = r.nextInt(3)
      b.p(Seq(b.run(s"item ${sentence(r, 2)}")), Seq("numId" -> numId.toString, "ilvl" -> ilvl.toString))
    }
    // numbered heading: heading classification wins over list (:460-518 order)
    b.p(Seq(b.run("numbered heading")), Seq("style" -> "Heading2", "numId" -> "9", "ilvl" -> "0"))
    b.p(Seq(b.run(sentence(r, 4))))
  }

  /** package parts present and fully stripped; body noise dropped
    * (`:81-409,449-455,620-624`). */
  private def genBoilerplate(b: B, r: Random): Unit = {
    b.add("theme", "@name=Office")
    b.add("fonts", "@major=Calibri Light;@minor=Calibri")
    b.add("numbering_def", "@numId=1;@fmt=decimal")
    b.add("endnote", sentence(r, 4))
    b.add("glossary", sentence(r, 3))
    b.add("sectPr", "@pgSz=12240x15840")
    b.add("bookmark", "@name=_GoBack")
    b.add("prooferr", "@type=spellStart")
    b.p(Seq(b.run("only real content 1")))
    b.add("header", "another header")
    b.p(Seq(b.run("only real content 2")))
    b.add("footer", "another footer")
  }

  /** meta map: core/extended/custom props, case-insensitive access
    * (`WordDocument.cs:103-148`). */
  private def genProperties(b: B, r: Random): Map[String, String] = {
    val custom = Map(
      "department" -> Words(r.nextInt(Words.length)),
      "version" -> s"v${1 + r.nextInt(9)}.${r.nextInt(10)}",
      "project code" -> s"PC-${r.nextInt(1000)}")
    b.p(Seq(b.run("By "), "fldBegin", "instr:DOCPROPERTY Author", "fldEnd"))
    b.p(Seq(b.run("Dept "), "fldBegin", "instr:DOCPROPERTY DEPARTMENT", "fldEnd")) // case-insensitive
    b.p(Seq(b.run("Code "), "fldBegin", "instr:DOCPROPERTY \"Project Code\"", "fldEnd"))
    b.p(Seq(b.run(sentence(r, 6))))
    custom
  }

  /** skew driver: a doc with thousands of spans incl. a big table
    * (SURVEY.md §4.3.1). Sizes draw from the RNG (p99 tail). */
  private def genMega(b: B, r: Random): Unit = {
    val paras = 2000 + r.nextInt(3000)
    (0 until paras).foreach { i =>
      if (i % 200 == 0) b.p(Seq(b.run(s"Section $i")), Seq("style" -> s"Heading${1 + (i / 200) % 3}"))
      else b.p(Seq(b.run(sentence(r, 3 + r.nextInt(10)))))
    }
    val rows = 100 + r.nextInt(100)
    b.add(Kinds.Tbl, "")
    (0 until rows).foreach { _ =>
      b.add(Kinds.Tr, "")
      (0 until 10).foreach { _ =>
        b.add(Kinds.Tc, ""); b.p(Seq(b.run(sentence(r, 2)))); b.add(Kinds.TcEnd, "")
      }
      b.add(Kinds.TrEnd, "")
    }
    b.add(Kinds.TblEnd, "")
  }

  /** malformed structure → extraction must quarantine, never fail the job. */
  private def genPoison(b: B, r: Random): Unit = {
    b.p(Seq(b.run("looks fine")))
    r.nextInt(3) match {
      case 0 => b.add(Kinds.Tbl, ""); b.add(Kinds.Tr, ""); b.add(Kinds.Tc, ""); b.p(Seq(b.run("never closed")))
      case 1 => b.add(Kinds.TcEnd, "") // stray close
      case 2 => b.add(Kinds.Sdt, renderAttrs(Seq("type" -> "richtext"))); b.p(Seq(b.run("unclosed sdt")))
    }
  }

  // ---------------------------------------------------------------- media

  /** EMU per pixel at 96 dpi (914400 EMU/inch / 96). The generator and the
    * decode oracle share this one constant: payload pixel dims are
    * `max(1, emu / 9525)`, so DuckDB can predict what a REAL decoder must
    * find in the bytes from the `width_emu`/`height_emu` columns alone. */
  val EmuPerPx = 9525L
  /** Audio payloads are 8 kHz 8-bit mono PCM; sample count is `width_px * 10`
    * (same EMU-derived dim the image family uses) so duration is likewise
    * oracle-predictable. */
  val AudioSampleRate = 8000
  val AudioSamplesPerPx = 10

  /** Deterministic pixel pattern — linear gradients offset by the row seed.
    * Linear in x/y so PNG's byte-delta filters compress it (noise would not),
    * seed-dependent so two media rows never share a payload. */
  @inline def pixelAt(seed: Long, x: Int, y: Int): Int = {
    val r = (x + (seed & 0xff)).toInt & 0xff
    val g = (y + ((seed >>> 8) & 0xff)).toInt & 0xff
    val b = (x + y + ((seed >>> 16) & 0xff)).toInt & 0xff
    (r << 16) | (g << 8) | b
  }

  /** Real PNG payload: BufferedImage + the JDK's ImageIO PNG encoder (pure
    * `java.desktop`, headless, deterministic — no timestamp chunks). */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelAt(seed, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  @inline def audioSampleAt(seed: Long, i: Int): Byte =
    (((seed >>> (i % 8)) + i * 7) & 0xff).toByte

  /** Deterministic 16-bit signed sample for the wide-PCM wav family, per
    * frame `i` and channel `ch`. */
  @inline def audioSample16At(seed: Long, i: Int, ch: Int): Short =
    ((((seed >>> ((i + ch) % 11)) + i * 131L + ch * 7919L) & 0xffffL) - 32768L).toShort

  /** Frame count of a video payload — a pure function of the EMU-derived
    * pixel dims (3..12), so an independent engine (the DuckDB oracle)
    * predicts it from the media table's columns alone, the same trick the
    * image family uses for decoded dims. */
  @inline def videoFrameCount(w: Int, h: Int): Int = 3 + (w + h) % 10

  /** Per-frame pattern seed (golden-ratio mix keeps frames distinct). */
  @inline def frameSeed(seed: Long, frame: Int): Long =
    seed ^ (0x9E3779B97F4A7C15L * (frame + 1))

  /** One video frame as an INDEXED-color image (`TYPE_BYTE_INDEXED`, the
    * default 256-color palette): GIF's palette model round-trips it
    * LOSSLESSLY, so pixels decoded back out of the container equal this
    * image's pixels exactly — the property the frame-checksum parity spec
    * rests on (a true-color frame would be quantized by the GIF writer and
    * no longer generator-predictable). */
  def gifFrame(seed: Long, w: Int, h: Int, frame: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val fs = frameSeed(seed, frame)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelAt(fs, x, y)); x += 1 }
      y += 1
    }
    img
  }

  /** Real multi-frame animated GIF via the JDK's ImageIO GIF sequence
    * writer (`prepareWriteSequence`/`writeToSequence`, `java.desktop`) — the
    * container's "video" analog: genuinely multi-frame, genuinely decoded
    * frame by frame on the read side. Real video containers (MP4/H.264)
    * need an external demuxer the JDK does not ship; that honesty note
    * lives with the decoder ([[graft.multimodal.Multimodal.sampleFrames]]). */
  def gifBytes(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < nFrames) {
        writer.writeToSequence(new javax.imageio.IIOImage(gifFrame(seed, w, h, i), null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Real RIFF/WAVE payload: canonical 44-byte header + 8-bit mono PCM,
    * parseable by `javax.sound.sampled.AudioSystem` (also `java.desktop`). */
  def wavBytes(seed: Long, nSamples: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(AudioSampleRate).putInt(AudioSampleRate) // byteRate = rate * 1 * 1
      .putShort(1).putShort(8) // blockAlign, bits
    buf.put("data".getBytes("US-ASCII")).putInt(nSamples)
    var i = 0
    while (i < nSamples) { buf.put(audioSampleAt(seed, i)); i += 1 }
    buf.array()
  }

  /** Real RIFF/WAVE payload, 16-bit signed little-endian PCM, mono or
    * stereo — the overwhelmingly common real-world WAV shape (8-bit mono is
    * the toy case). Same canonical 44-byte header, so the decode oracle
    * reads format facts (bits, channels) straight out of the container
    * header bytes like a real parser. */
  def wavBytes16(seed: Long, nFrames: Int, channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels must be 1|2, got $channels")
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(AudioSampleRate).putInt(AudioSampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) { buf.putShort(audioSample16At(seed, i, c)); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** Deterministic media side-table rows for a document's drawing spans.
    * Payloads are REAL decodable parts — tiny PNGs (dims = EMU extents at
    * 96 dpi, mirroring OOXML's out-of-row media parts,
    * `ImageExtractor.cs:61-81`) for ~4/5 of rows, RIFF/WAVE PCM clips for the
    * rest — so the decode stage ([[graft.multimodal.Multimodal]]) exercises
    * actual `ImageIO`/`AudioSystem` codecs and its output is predictable from
    * the EMU columns by an independent engine. */
  def mediaFor(doc: RawDoc): Seq[MediaRow] =
    doc.spans.filter(s => s.kind == Kinds.Drawing && s.media_ref != null).map { s =>
      val a = Grammar.parseAttrs(s.text)
      val seed = fnv1a64(CorpusSeed + doc.doc_id + ":" + s.media_ref)
      val cx = a.get("cx").map(_.toLong).getOrElse(0L)
      val cy = a.get("cy").map(_.toLong).getOrElse(0L)
      val w = math.max(1L, cx / EmuPerPx).toInt
      val h = math.max(1L, cy / EmuPerPx).toInt
      val name = a.getOrElse("name", "")
      java.lang.Long.remainderUnsigned(seed, 5) match {
        case 0 =>
          // audio family: 8-bit mono / 16-bit mono / 16-bit stereo, all at
          // AudioSampleRate with w*AudioSamplesPerPx FRAMES — duration stays
          // EMU-predictable while bits/channels vary (those the oracle reads
          // from the RIFF header bytes, like a real parser)
          val nFrames = w * AudioSamplesPerPx
          val bytes = java.lang.Long.remainderUnsigned(seed >>> 8, 3) match {
            case 0 => wavBytes(seed, nFrames)
            case 1 => wavBytes16(seed, nFrames, 1)
            case _ => wavBytes16(seed, nFrames, 2)
          }
          MediaRow(doc.doc_id, s.media_ref, "audio/wav", cx, cy,
            name.stripSuffix(".png") + ".wav", a.getOrElse("alt", ""), bytes)
        case 1 =>
          // video family: a real multi-frame animated GIF with a
          // dims-predictable frame count (videoFrameCount)
          MediaRow(doc.doc_id, s.media_ref, "video/gif", cx, cy,
            name.stripSuffix(".png") + ".gif", a.getOrElse("alt", ""),
            gifBytes(seed, w, h, videoFrameCount(w, h)))
        case _ =>
          MediaRow(doc.doc_id, s.media_ref, "image/png", cx, cy,
            name, a.getOrElse("alt", ""), pngBytes(seed, w, h))
      }
    }
}
