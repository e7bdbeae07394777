package graft

import graft.model._
import graft.oracle.{ExtractionError, Extractor}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed goldens for the per-document extraction semantics — these
  * assert the SEMANTICS (independently of the shared oracle/core code path),
  * mirroring the reference behaviors cited in SURVEY.md §2.7.
  */
class ExtractorSpec extends AnyFunSuite {

  private def doc(spans: (String, String, String)*): RawDoc =
    RawDoc("d1", spans.zipWithIndex.map { case ((k, t, m), i) => RawSpan(k, t, m, i) }, Map.empty)

  private def docMeta(meta: Map[String, String], spans: (String, String, String)*): RawDoc =
    RawDoc("d1", spans.zipWithIndex.map { case ((k, t, m), i) => RawSpan(k, t, m, i) }, meta)

  private def kinds(d: Doc): Seq[String] = d.spans.map(_.kind)
  private def texts(d: Doc): Seq[String] = d.spans.map(_.text)

  // ---- run fold (F1/F2, DocumentNode.cs:67-69, WordDocumentTreeParser.cs:463)

  test("run concat: tab -> \\t, break/cr -> space, final trim") {
    val d = Extractor.extract(doc(
      ("p", "run:  a|tab|run:b|br:Page|run:c|cr|run:d  ", null)))
    assert(texts(d) == Seq("a\tb c d"))
  }

  test("empty paragraphs kept with empty text (:466-468)") {
    val d = Extractor.extract(doc(("p", "", null), ("p", "run:   ", null), ("p", "run:x", null)))
    assert(texts(d) == Seq("", "", "x"))
    assert(kinds(d) == Seq("paragraph", "paragraph", "paragraph"))
  }

  test("offsets re-densified 0..n-1 after stripping") {
    val d = Extractor.extract(doc(
      ("header", "junk", null), ("p", "run:a", null), ("sectPr", "", null), ("p", "run:b", null)))
    assert(d.spans.map(_.offset) == Seq(0, 1))
  }

  // ---- field state machine (X4, :527-629)

  test("DOCPROPERTY resolves from meta, overriding cached result (:555-577)") {
    val d = Extractor.extract(docMeta(Map("title" -> "Real Title"),
      ("p", "run:T=|fldBegin|instr:DOCPROPERTY Title \\* MERGEFORMAT|fldSep|run:Old|fldEnd", null)))
    assert(texts(d) == Seq("T=Real Title"))
  }

  test("unresolvable DOCPROPERTY falls back to buffered result") {
    val d = Extractor.extract(doc(
      ("p", "fldBegin|instr:DOCPROPERTY Missing|fldSep|run:cached|fldEnd", null)))
    assert(texts(d) == Seq("cached"))
  }

  test("DOCPROPERTY detection is a prefix test; name is parts(1) verbatim (:630-675)") {
    // prefix match, not whole-token: 'DOCPROPERTYx foo' IS a property field
    assert(Extractor.parseDocProperty("DOCPROPERTYx foo") == Some("foo"))
    // no switch-skipping before the name: parts(1) wins even if it is '\*'
    assert(Extractor.parseDocProperty("DOCPROPERTY \\* MERGEFORMAT Title") == Some("\\*"))
    // fewer than 2 parts -> the empty property name (resolves to nothing)
    assert(Extractor.parseDocProperty("DOCPROPERTY") == Some(""))
    assert(Extractor.parseDocProperty("PAGE") == None)
    assert(Extractor.parseDocProperty("docproperty Author") == Some("Author"))
  }

  test("style-table lookup is case-sensitive (ParsingContext Dictionary semantics)") {
    val d = Extractor.extract(doc(
      ("style_def", "@id=SectionTitle;@outline=1", null),
      ("p", "@style=SectionTitle|run:A", null),
      ("p", "@style=sectiontitle|run:B", null))) // case mismatch -> lookup miss
    assert(kinds(d) == Seq("heading2", "paragraph"))
  }

  test("quoted property name joined across spaces (:644-675)") {
    val d = Extractor.extract(docMeta(Map("project code" -> "PC-7"),
      ("p", "fldBegin|instr:DOCPROPERTY \"Project Code\"|fldSep|run:x|fldEnd", null)))
    assert(texts(d) == Seq("PC-7"))
  }

  test("non-DOCPROPERTY field passes buffered result through (:579-582)") {
    val d = Extractor.extract(doc(
      ("p", "run:Page |fldBegin|instr:PAGE|fldSep|run:7|fldEnd", null)))
    assert(texts(d) == Seq("Page 7"))
  }

  test("field without separator emits resolved or nothing") {
    val d = Extractor.extract(docMeta(Map("company" -> "ACME"),
      ("p", "run:c=|fldBegin|instr:DOCPROPERTY company|fldEnd", null)))
    assert(texts(d) == Seq("c=ACME"))
  }

  test("unterminated field discards buffered content") {
    val d = Extractor.extract(doc(
      ("p", "run:keep|fldBegin|instr:DOCPROPERTY Title|fldSep|run:lost", null)))
    assert(texts(d) == Seq("keep"))
  }

  test("plain run BEFORE the field code emits normally; after it, buffers (:596-605)") {
    val d = Extractor.extract(doc(
      ("p", "fldBegin|run:pre|instr:PAGE|fldSep|run:9|fldEnd", null)))
    assert(texts(d) == Seq("pre9"))
  }

  test("result runs in the code region (no fldSep) still buffer (:598-605)") {
    // ADVICE r01 example: 'fldBegin|instr:PAGE|run:7|fldEnd' must yield '7'
    val d = Extractor.extract(doc(
      ("p", "fldBegin|instr:PAGE|run:7|fldEnd", null)))
    assert(texts(d) == Seq("7"))
  }

  test("unresolvable DOCPROPERTY falls back to code-region result runs") {
    val d = Extractor.extract(doc(
      ("p", "fldBegin|instr:DOCPROPERTY missing|run:fallback|fldEnd", null)))
    assert(texts(d) == Seq("fallback"))
  }

  test("field code split across instr tokens concatenates directly (:592-596)") {
    val d = Extractor.extract(docMeta(Map("title" -> "T1"),
      ("p", "fldBegin|instr:DOCPROP|instr:ERTY Title|fldSep|run:x|fldEnd", null)))
    assert(texts(d) == Seq("T1"))
  }

  test("hyperlink and inline-SDT runs bypass field buffering (:614-619)") {
    val d = Extractor.extract(doc(
      ("rel", "@id=r1;@url=https://x", null),
      ("p", "fldBegin|instr:PAGE|link:r1:LINKED|run:5|fldEnd", null)))
    // the hyperlink text goes straight to the output; only '5' is the result
    assert(texts(d) == Seq("LINKED5"))
  }

  // ---- heading classifier (P11, :857-889)

  test("heading by style prefix, case-insensitive; out-of-range names fall through") {
    val d = Extractor.extract(doc(
      ("p", "@style=Heading3|run:A", null),
      ("p", "@style=heading2|run:B", null),
      // 'Heading12' does NOT parse (tier 1 accepts only 1..9); no style-table
      // entry, no outline attr -> paragraph (:862-867)
      ("p", "@style=Heading12|run:C", null),
      // ...but with a direct outline attr, tier 3 decides
      ("p", "@style=Heading12;@outline=4|run:D", null)))
    assert(kinds(d) == Seq("heading3", "heading2", "paragraph", "heading5"))
  }

  test("heading via style table: own outline wins; basedOn is a single NAME hop") {
    val d = Extractor.extract(doc(
      ("style_def", "@id=Title1;@outline=0", null),
      // basedOn hop parses the basedOn style NAME 'Heading<k>' (:875-881);
      // a basedOn chain to a style with an outline is NOT followed
      ("style_def", "@id=Sub;@basedOn=Heading3", null),
      ("style_def", "@id=Chained;@basedOn=Title1", null),
      ("p", "@style=Title1|run:A", null),
      ("p", "@style=Sub|run:B", null),
      ("p", "@style=Chained|run:C", null),
      ("p", "@style=NoSuch|run:D", null)))
    assert(kinds(d) == Seq("heading1", "heading3", "paragraph", "paragraph"))
  }

  test("direct outline attr requires a style id (:860-861); outline 11 caps at 9") {
    val d = Extractor.extract(doc(
      ("p", "@outline=1|run:A", null), // no style id -> never a heading
      ("p", "@style=Any;@outline=1|run:B", null),
      ("p", "@style=Any;@outline=11|run:C", null)))
    assert(kinds(d) == Seq("paragraph", "heading2", "heading9"))
  }

  test("list item classification with numId:ilvl media_ref; heading wins over list") {
    val d = Extractor.extract(doc(
      ("p", "@numId=5;@ilvl=2|run:item", null),
      ("p", "@numId=5|run:item2", null),
      ("p", "@style=Heading1;@numId=5|run:numbered heading", null)))
    assert(kinds(d) == Seq("list_item", "list_item", "heading1"))
    assert(d.spans(0).media_ref == "5:2")
    assert(d.spans(1).media_ref == "5:0")
    assert(d.spans(2).media_ref == null)
  }

  // ---- hyperlinks + inline sdt

  test("hyperlink display text inlined; sdtrun text inlined") {
    val d = Extractor.extract(doc(
      ("rel", "@id=rId7;@url=https://x.example", null),
      ("p", "run:see |link:rId7:the docs|run: now", null),
      ("p", "run:A |sdtrun:plaintext,9,tag:VAL|run: B", null)))
    assert(texts(d) == Seq("see the docs now", "A VAL B"))
  }

  // ---- tables (X5, TableExtractor.cs:31-114)

  test("table label, grid coords, gridSpan advance, vMerge kept, ragged ColumnCount=max") {
    val d = Extractor.extract(doc(
      ("tbl", "", null),
      ("tr", "@header=1", null),
      ("tc", "@gridSpan=2", null), ("p", "run:wide", null), ("tc_end", "", null),
      ("tc", "", null), ("p", "run:c", null), ("tc_end", "", null),
      ("tr_end", "", null),
      ("tr", "", null),
      ("tc", "@vMerge=Restart", null), ("p", "run:m", null), ("tc_end", "", null),
      ("tc", "", null), ("p", "run:x", null), ("p", "run:y", null), ("tc_end", "", null),
      ("tr_end", "", null),
      ("tbl_end", "", null)))
    assert(d.spans.head.kind == "table")
    assert(d.spans.head.text == "[Table: 2x3]")
    assert(d.spans.head.media_ref == "2x3")
    val cells = d.spans.filter(_.kind == "table_cell")
    assert(cells.map(_.media_ref) == Seq("0,0", "0,2", "1,0", "1,1"))
    assert(cells.map(_.text) == Seq("wide", "c", "m", "x y"))
  }

  test("nested table emits its own spans inside the cell sequence") {
    val d = Extractor.extract(doc(
      ("tbl", "", null),
      ("tr", "", null),
      ("tc", "", null),
      ("tbl", "", null),
      ("tr", "", null),
      ("tc", "", null), ("p", "run:deep", null), ("tc_end", "", null),
      ("tr_end", "", null),
      ("tbl_end", "", null),
      ("tc_end", "", null),
      ("tr_end", "", null),
      ("tbl_end", "", null)))
    assert(kinds(d) == Seq("table", "table_cell", "table", "table_cell"))
    // outer cell text carries the nested table's label
    assert(d.spans(1).text == "[Table: 1x1]")
    assert(d.spans(3).text == "deep")
  }

  test("unclosed table structures throw (quarantine path)") {
    assertThrows[ExtractionError](Extractor.extract(doc(("tbl", "", null), ("tr", "", null))))
    assertThrows[ExtractionError](Extractor.extract(doc(("tc_end", "", null))))
    assertThrows[ExtractionError](Extractor.extract(doc(("sdt", "@type=richtext", null), ("p", "run:x", null))))
  }

  // ---- images (X6)

  test("image span label + embed rel id (ImageExtractor.cs:64,103)") {
    val d = Extractor.extract(doc(
      ("drawing", "@name=pic.png;@inline=1;@cx=914400;@cy=914400", "rId42")))
    assert(d.spans == Seq(Span("image", "[Image: pic.png]", "rId42", 0)))
  }

  // ---- SDT (X7, :910-1226)

  test("single-paragraph SDT collapses to its paragraph (:925-942)") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=richtext;@id=1;@tag=t", null),
      ("p", "run:inner", null),
      ("sdt_end", "", null)))
    assert(d.spans.map(s => (s.kind, s.text)) == Seq(("paragraph", "inner")))
  }

  test("container SDT: value = space-join of non-blank child texts; children flattened after (:969-975)") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=richtext;@id=2;@alias=Body", null),
      ("p", "run:a", null), ("p", "", null), ("p", "run:b", null),
      ("sdt_end", "", null)))
    assert(d.spans.map(s => (s.kind, s.text)) ==
      Seq(("content_control", "a b"), ("paragraph", "a"), ("paragraph", ""), ("paragraph", "b")))
    assert(d.spans.head.media_ref == "richtext:2")
  }

  test("type cascade: unknown+checked -> checkbox; property-namespace xpath -> docproperty (:1203-1216)") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=mystery;@id=3;@checked=1", null),
      ("p", "run:x", null), ("p", "run:y", null),
      ("sdt_end", "", null),
      ("sdt", "@id=4;@xpath=/ns:coreProperties[1]/ns:title[1]", null),
      ("p", "run:u", null), ("p", "run:v", null),
      ("sdt_end", "", null),
      // an xpath outside the property namespaces is NOT a DocumentProperty
      ("sdt", "@id=5;@xpath=/ns:other[1]", null),
      ("p", "run:w", null), ("p", "run:z", null),
      ("sdt_end", "", null)))
    assert(d.spans.filter(_.kind == "content_control").map(_.media_ref) ==
      Seq("checkbox:3", "docproperty:4", "unknown:5"))
  }

  test("explicit repeating-section / building-block types recognized (ContentControlType.cs:16-18)") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=repeatingsectionitem;@id=8", null),
      ("p", "run:r1", null), ("p", "run:r2", null),
      ("sdt_end", "", null),
      ("sdt", "@type=buildingblockgallery;@id=9", null),
      ("p", "run:g1", null), ("p", "run:g2", null),
      ("sdt_end", "", null)))
    assert(d.spans.filter(_.kind == "content_control").map(_.media_ref) ==
      Seq("repeatingsectionitem:8", "buildingblockgallery:9"))
  }

  test("nested SDT blocks are dropped; remaining single paragraph collapses (:921-962)") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=group;@id=5", null),
      ("p", "run:outer", null),
      ("sdt", "@type=plaintext;@id=6", null),
      ("p", "run:i1", null), ("p", "run:i2", null),
      ("sdt_end", "", null),
      ("sdt_end", "", null)))
    // the nested SDT maps to null in the child dispatch; the outer block then
    // has exactly one paragraph and zero tables -> collapses to it
    assert(d.spans.map(s => (s.kind, s.text)) == Seq(("paragraph", "outer")))
  }

  test("nested SDT dropped from a true container's value and spans") {
    val d = Extractor.extract(doc(
      ("sdt", "@type=group;@id=5", null),
      ("p", "run:a", null),
      ("sdt", "@type=plaintext;@id=6", null),
      ("p", "run:i1", null), ("p", "run:i2", null),
      ("sdt_end", "", null),
      ("p", "run:b", null),
      ("sdt_end", "", null)))
    assert(d.spans.head.kind == "content_control")
    assert(d.spans.head.text == "a b")
    assert(kinds(d) == Seq("content_control", "paragraph", "paragraph"))
  }

  // ---- boilerplate strip (P12/S3)

  test("package parts and body noise fully stripped") {
    val d = Extractor.extract(doc(
      ("header", "h", null), ("footer", "f", null), ("settings", "", null),
      ("theme", "", null), ("fonts", "", null), ("numbering_def", "", null),
      ("footnote", "n", null), ("endnote", "e", null), ("glossary", "g", null),
      ("sectPr", "", null), ("bookmark", "", null), ("prooferr", "", null),
      ("p", "run:real", null)))
    assert(d.spans.map(_.text) == Seq("real"))
  }

  test("output kinds stay inside the ContentType vocabulary") {
    val d = Extractor.extract(graft.corpus.SyntheticCorpus.rawDoc("doc-sdt-000000004"))
    assert(d.spans.forall(s => Kinds.OutputKinds.contains(s.kind)))
  }

  // ---- annotated mode (A4, DocumentNode.cs:74-163, DocumentPropertyField.cs:31-32)

  test("annotated DOCPROPERTY renders [DocProperty:Type/Name=\"value\"], resolved or buffered") {
    val d = Extractor.extractAnnotated(docMeta(Map("title" -> "Real"),
      ("p", "fldBegin|instr:DOCPROPERTY Title|fldSep|run:Old|fldEnd", null),
      ("p", "fldBegin|instr:DOCPROPERTY dept|fldSep|run:Sales|fldEnd", null),
      ("p", "fldBegin|instr:DOCPROPERTY company|fldSep|run:ACME|fldEnd", null)))
    assert(texts(d) == Seq(
      "[DocProperty:Core/Title=\"Real\"]",
      "[DocProperty:Custom/dept=\"Sales\"]",          // unresolved -> buffered result
      "[DocProperty:Extended/company=\"ACME\"]"))
  }

  test("annotated inline SDT run: text inside the bracket, identifier alias > tag > id > unnamed") {
    val d = Extractor.extractAnnotated(doc(
      ("p", "run:A |sdtrun:plaintext,9,tg:VAL|run: B", null),
      ("p", "sdtrun:richtext,9,tg,Friendly:X", null),
      ("p", "sdtrun:plaintext,7,,:Y", null),
      ("p", "sdtrun:date,,,:Z", null)))
    assert(texts(d) == Seq(
      "A [ContentControl:plaintext tg=\"VAL\"] B",
      "[ContentControl:richtext Friendly=\"X\"]",
      "[ContentControl:plaintext 7=\"Y\"]",
      "[ContentControl:date unnamed=\"Z\"]"))
  }

  test("annotated container and collapsed SDT render brackets with the PLAIN value") {
    val d = Extractor.extractAnnotated(docMeta(Map("title" -> "Real"),
      ("sdt", "@type=richtext;@id=2;@alias=Body", null),
      ("p", "run:a", null), ("p", "run:b", null),
      ("sdt_end", "", null),
      // collapsed single-paragraph SDT carries the CC props -> bracket form,
      // with the paragraph's PLAIN text (fields resolve to plain values)
      ("sdt", "@type=plaintext;@id=3;@tag=t3", null),
      ("p", "run:v=|fldBegin|instr:DOCPROPERTY Title|fldEnd", null),
      ("sdt_end", "", null),
      // data-bound DocumentProperty container -> [DocProperty:name="..."]
      ("sdt", "@id=4;@xpath=/ns:coreProperties[1]/ns:title[1]", null),
      ("p", "run:u", null), ("p", "run:v", null),
      ("sdt_end", "", null)))
    assert(texts(d) == Seq(
      "[ContentControl:richtext Body=\"a b\"]", "a", "b",
      "[ContentControl:plaintext t3=\"v=Real\"]",
      "[DocProperty:title=\"u v\"]", "u", "v"))
  }

  test("propertyTypeName mirrors DocumentPropertyHelpers sets") {
    assert(Extractor.propertyTypeName("Title") == "Core")
    assert(Extractor.propertyTypeName("COMPANY") == "Extended")
    assert(Extractor.propertyTypeName("projectcode") == "Custom")
    assert(Extractor.xpathPropertyName("/ns:coreProperties[1]/ns:title[1]") == "title")
    assert(Extractor.xpathPropertyName("plain") == "plain")
  }
}
