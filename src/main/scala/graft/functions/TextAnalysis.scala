package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, lang, source, n_chars)` table. All are pure
  * Catalyst column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen at 100 TB and push down through the parquet scan.
  */
object TextAnalysis {

  /** Whitespace-collapse + lowercase normalization (shared by fingerprint +
    * dedup; deterministic and engine-portable). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized text — exact-dup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: word-piece regex split — counts runs of
    * letters, digits, and single punctuation marks the way byte-pair
    * tokenizers fragment text (upper bound of the true BPE length). */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])")))

  private val enStop = Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "was")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "sich")
  private val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  private val esStop = Seq("el", "los", "y", "es", "en", "un", "una", "por", "con", "para")

  private def tokens(text: Column): Column = split(normalized(text), " ")

  private def stopHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  /** N-gram/stopword-heuristic language ID over {en, de, fr, es}: argmax of
    * per-language stopword hits, `und` (unknown) when no list scores.
    * Tie-break by fixed language order (deterministic).
    */
  def langGuess(text: Column): Column = {
    val en = stopHits(text, enStop); val de = stopHits(text, deStop)
    val fr = stopHits(text, frStop); val es = stopHits(text, esStop)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("und"))
      .when(en === m, lit("en")).when(de === m, lit("de"))
      .when(fr === m, lit("fr")).otherwise(lit("es"))
  }

  /** Quality score in [0,1]: blend of alphabetic ratio, stopword ratio and a
    * length prior — the standard cheap pre-filters of web-corpus pipelines.
    * Integer-count arithmetic + one final round → bit-identical across
    * engines.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = (length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(len, lit(1.0)))
    val nTok = tokenCount(text).cast("double")
    val stop = stopHits(text, enStop).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(len / lit(500.0), lit(1.0))
    round(alpha * 0.4 + least(stop * lit(3.0), lit(1.0)) * 0.3 + lenScore * 0.3, 6)
  }

  /** Character n-gram shingles (distinct) of the normalized text — the
    * MinHash/Jaccard dedup input. Pure HOF: sequence + substr, no UDF. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = normalized(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles (distinct) — token-level Jaccard input. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(normalized(text), " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }
}
