package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class style-predicate API (P8/P9) — the reference's
  * `FindByStyle`/`FindByStyles`/`HasStyle`/`HasAnyStyle`
  * (`StyleExtensions.cs:29-57,193-216`), over the RAW table where paragraph
  * style ids live (run formatting is outside the extraction invariant, so
  * style queries address the pre-extraction surface). All comparisons are
  * case-insensitive, matching the reference's `OrdinalIgnoreCase`.
  */
object Styles {

  /** Style id of a raw `p` payload ('' when unstyled) — `GetStyle`
    * (`StyleExtensions.cs:193-194`). */
  def rawStyleOf(text: Column): Column =
    regexp_extract(text, "@style=([^;|]+)", 1)

  /** `HasStyle` (`StyleExtensions.cs:199-205`): case-insensitive equality. */
  def hasStyle(text: Column, styleId: String): Column =
    lower(rawStyleOf(text)) === styleId.toLowerCase(java.util.Locale.ROOT)

  /** `HasAnyStyle` (`StyleExtensions.cs:207-216`). */
  def hasAnyStyle(text: Column, styleIds: Seq[String]): Column =
    lower(rawStyleOf(text)).isin(styleIds.map(_.toLowerCase(java.util.Locale.ROOT)): _*)

  /** `FindByStyle` (`StyleExtensions.cs:29-42`): all styled paragraphs whose
    * style id equals `styleId` (case-insensitive). */
  def findByStyle(raw: DataFrame, styleId: String): DataFrame =
    findByStyles(raw, Seq(styleId))

  /** `FindByStyles` (`StyleExtensions.cs:44-57`): paragraphs matching ANY of
    * the given style ids. Explode → codegen'd filter; the style set is a
    * plan-time literal list so no join/broadcast is needed. */
  def findByStyles(raw: DataFrame, styleIds: Seq[String]): DataFrame =
    raw.select(col("doc_id"), explode(col("spans")).as("sp"))
      .where(col("sp.kind") === "p")
      .select(col("doc_id"), col("sp.offset").as("offset"),
        rawStyleOf(col("sp.text")).as("style"))
      .where(lower(col("style")).isin(styleIds.map(_.toLowerCase(java.util.Locale.ROOT)): _*))
}
