package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting.
  *
  * Everything is a pure `Column` expression over built-in (codegen'd)
  * functions — no UDFs — so whole-stage codegen spans survive and the
  * work distributes with the scan at 100 TB. Determinism notes: ratios
  * are int/int divisions (exact inputs, one IEEE division ⇒ bit-stable
  * across engines); no floating accumulation anywhere.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (split keeps trailing empty
    * strings; the filter makes Spark and DuckDB agree).
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate: letter runs, digit runs, and single
    * non-space symbols — the shape of a GPT-style pre-tokenizer, as a
    * cheap upper bound on subword count.
    */
  val bpeishPattern = "(\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s])"
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeishPattern), lit(1)))

  /** Characters remaining after deleting everything matching `keepClass`
    * complement — i.e. count of chars in the class.
    */
  private def classCount(c: Column, clazz: String): Column =
    length(regexp_replace(c, s"[^$clazz]", ""))

  def alphaRatio(c: Column): Column =
    classCount(c, "A-Za-z") / length(c)
  def digitRatio(c: Column): Column =
    classCount(c, "0-9") / length(c)
  def punctRatio(c: Column): Column =
    classCount(c, """.,;:!?'"\-""") / length(c)

  /** Occurrences (not distinct) of any of `words` among the tokens. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t)))

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small and public-knowledge.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("的", "是", "不", "了", "我"))

  /** Stopword-count language ID. Ties break toward the
    * lexicographically-greatest language code (struct comparison in
    * `greatest` is (score, lang) lexicographic), which the oracle SQL
    * mirrors with an ordered CASE chain.
    */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scored = langStopwords.map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("score"), lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  /** English-stopword ratio — a standard quality-filter feature. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(lower(c))
    stopwordHits(toks, langStopwords.head._2) / size(toks)
  }

  /** Composite quality score in [0,1]: alphabetic density + stopword
    * presence + digit sparsity (Gopher/C4-style heuristics, simplified).
    * Pure products/sums of already-exact doubles — deterministic.
    */
  def qualityScore(c: Column): Column =
    alphaRatio(c) * 0.5 +
      least(stopwordRatio(c) * 5.0, lit(1.0)) * 0.3 +
      (lit(1.0) - digitRatio(c)) * 0.2

  /** Content fingerprint: md5 of case-folded, whitespace-collapsed text.
    * Stable across engines (md5 is md5 everywhere) — the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))
}
