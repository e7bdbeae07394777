package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's mutator surface (SURVEY.md §2.8) re-expressed as pure
  * column transforms over the immutable docs table — every mutation produces
  * a NEW table (no in-place trees): `transform`/`filter` HOFs, zero shuffle,
  * whole-stage codegen.
  */
object Mutators {

  private def span(kind: Column, text: Column, mediaRef: Column, offset: Column): Column =
    struct(kind.as("kind"), text.as("text"), mediaRef.as("media_ref"), offset.as("offset"))

  /** `SetContentControlValueByTag` (`ContentControlExtensions.cs:97-122`):
    * replace the value of the FIRST content control (document order) whose
    * identifier (the part after `type:` in media_ref) equals `ident` — the
    * reference resolves the target via `FindAll(...).FirstOrDefault()`
    * (`:40-47`), so later same-identifier controls are untouched. Per-row
    * HOFs: find the first matching offset, rewrite only that span. */
  def setContentControlValue(docs: DataFrame, ident: String, value: String): DataFrame = {
    def isMatch(s: Column): Column =
      s.getField("kind") === "content_control" &&
        substring_index(s.getField("media_ref"), ":", -1) === ident
    docs
      .select(col("doc_id"), col("spans"),
        array_min(transform(filter(col("spans"), isMatch(_)),
          s => s.getField("offset"))).as("m_off"))
      .select(col("doc_id"), transform(col("spans"), s =>
        when(isMatch(s) && s.getField("offset") === col("m_off"),
          span(s.getField("kind"), lit(value), s.getField("media_ref"), s.getField("offset")))
        .otherwise(s)).as("spans"))
  }

  /** `RemoveContentControlAll` keep-text semantics
    * (`ContentControlExtensions.cs:187-289`): drop the container spans, keep
    * their child content; offsets re-densified (transform with index). */
  def removeContentControls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      reindex(filter(col("spans"), s => s.getField("kind") =!= "content_control")).as("spans"))

  /** Re-densify offsets 0..n-1 after a structural filter. */
  def reindex(spans: Column): Column =
    transform(spans, (s, i) =>
      span(s.getField("kind"), s.getField("text"), s.getField("media_ref"), i))

  /** `ChangeStyleBulk` incl. Heading↔Paragraph retype
    * (`StyleExtensions.cs:69-153`): retype every span of `fromKind` to
    * `toKind` (e.g. demote heading2 → paragraph). */
  def changeKind(docs: DataFrame, fromKind: String, toKind: String): DataFrame =
    docs.select(col("doc_id"), transform(col("spans"), s =>
      when(s.getField("kind") === fromKind,
        span(lit(toKind), s.getField("text"),
          // paragraph/heading spans carry no media_ref
          when(lit(toKind) === "paragraph" || lit(toKind).rlike("^heading[1-9]$"),
            lit(null).cast("string")).otherwise(s.getField("media_ref")),
          s.getField("offset")))
      .otherwise(s)).as("spans"))

  /** `SetCellText` (`TableExtensions.cs:197-222`): set the text of the cell
    * at grid coordinate (r,c) in every table of the document. */
  def setCellText(docs: DataFrame, r: Int, c: Int, value: String): DataFrame =
    docs.select(col("doc_id"), transform(col("spans"), s =>
      when(s.getField("kind") === "table_cell" && s.getField("media_ref") === s"$r,$c",
        span(s.getField("kind"), lit(value), s.getField("media_ref"), s.getField("offset")))
      .otherwise(s)).as("spans"))

  /** `SetProperty` / `RemoveProperty` / `doc[name]` routing
    * (`WordDocument.cs:72-222`) over the raw table's meta map. */
  def setProperty(raw: DataFrame, name: String, value: String): DataFrame =
    raw.withColumn("meta",
      map_concat(
        // meta is nullable: map_filter(null) and map_concat(null, ...) both
        // null-propagate, which would silently DROP the set on such rows
        map_filter(coalesce(col("meta"), typedLit(Map.empty[String, String])),
          (k, _) => k =!= name.toLowerCase(java.util.Locale.ROOT)),
        map(lit(name.toLowerCase(java.util.Locale.ROOT)), lit(value))))

  def removeProperty(raw: DataFrame, name: String): DataFrame =
    raw.withColumn("meta", map_filter(col("meta"), (k, _) => k =!= name.toLowerCase(java.util.Locale.ROOT)))

  /** `RemoveDocumentPropertyField(s)` (`DocumentPropertyExtensions.cs:
    * 87-134`) over ANNOTATED spans: the reference nulls the run's
    * `DocumentPropertyField`, keeping the run text (= the resolved value) —
    * here the `[DocProperty:Type/Name="value"]` rendering collapses to its
    * value. `propertyName = None` removes all fields; `Some(name)` matches
    * case-insensitively (`:98-99`). Block-level data-bound controls (the
    * `[DocProperty:name="..."]` form without the Type/ segment) are NOT
    * touched — the reference mutator only clears run-level fields. */
  def removeDocumentPropertyFields(annotated: DataFrame,
                                   propertyName: Option[String] = None): DataFrame = {
    val namePart = propertyName match {
      case Some(n) => "(?i)" + java.util.regex.Pattern.quote(n)
      case None => ".+?"
    }
    val pattern = "\\[DocProperty:(?:Core|Extended|Custom)/" + namePart + "=\"([^\"]*)\"\\]"
    annotated.select(col("doc_id"), transform(col("spans"), s =>
      span(s.getField("kind"), regexp_replace(s.getField("text"), lit(pattern), lit("$1")),
        s.getField("media_ref"), s.getField("offset"))).as("spans"))
  }

  /** `ExtractSection` + `InsertNodesAfter` (J5, demo-only in the reference,
    * `DocumentConcatenationDemo.cs:218-240`): splice the section titled by
    * `needle` to the END of the document (extract + append), offsets
    * re-densified. Docs without the section pass through unchanged. */
  def moveSectionToEnd(docs: DataFrame, needle: String): DataFrame = {
    // boundary semantics shared with SpanQueries.section — one source of truth
    val withBounds = SpanQueries.withSectionBounds(docs, needle)
    withBounds.select(col("doc_id"),
      when(col("start_off").isNull, col("spans")).otherwise(
        reindex(concat(
          filter(col("spans"), s => s.getField("offset") < col("start_off") ||
            s.getField("offset") >= col("end_off")),
          filter(col("spans"), s => s.getField("offset") >= col("start_off") &&
            s.getField("offset") < col("end_off"))))).as("spans"))
  }
}
