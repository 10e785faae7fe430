package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID heuristics, document fingerprinting. All
  * codegen'd built-ins — designed to run inline in the parquet scan
  * stage over a 100 TB `documents` table (no UDF, no shuffle).
  */
object TextFns {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count estimate: word-piece regex split (letters /
    * digits / other runs), the standard pre-tokenizer shape.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0))

  /** Distinct-token / total-token ratio (type-token ratio). */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\.,;:!\\?'\"()\\[\\]{}-]", "")))
      .cast("double") / length(text).cast("double")

  /** Ratio of tokens in the stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / size(toks).cast("double")
  }

  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")
  }

  /** Composite quality score in [0,1]-ish: rewards sane length, token
    * diversity and stopword presence — the usual pre-filter features for
    * corpus curation (heuristic; weights are explicit and documented).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    least(length(text).cast("double") / lit(500.0), lit(1.0)) * lit(0.4) +
      typeTokenRatio(text) * lit(0.3) +
      least(stopwordRatio(text, stopwords) * lit(5.0), lit(1.0)) * lit(0.3)

  /** Marker-word hit counts for one language. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  val EnMarkers = Seq("the", "and", "of", "to", "a", "in", "is")
  val EsMarkers = Seq("el", "la", "de", "los", "las", "que", "y")
  val DeMarkers = Seq("der", "die", "das", "und", "ist", "nicht")
  val FrMarkers = Seq("le", "la", "les", "des", "et", "est")

  /** N-gram/marker language-ID heuristic: argmax of marker-hit counts,
    * 'und' (undetermined) when all zero. Deterministic tiebreak by the
    * fixed language order en > es > de > fr.
    */
  def langId(text: Column): Column = {
    val en = markerHits(text, EnMarkers)
    val es = markerHits(text, EsMarkers)
    val de = markerHits(text, DeMarkers)
    val fr = markerHits(text, FrMarkers)
    val mx = greatest(en, es, de, fr)
    when(mx === 0, lit("und"))
      .when(en === mx, lit("en"))
      .when(es === mx, lit("es"))
      .when(de === mx, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Deterministic rolling document fingerprint over tokens:
    * acc = (acc * 131 + (ascii(first) + ascii(last) + len)) mod 1e9+7.
    * Pure integer arithmetic → reproducible across engines (the DuckDB
    * oracle computes the identical fold with list_reduce).
    */
  def fingerprint(text: Column): Column = {
    val toks = tokens(text)
    val tokVal = (t: Column) => ascii(t) + ascii(substring(t, -1, 1)) + length(t)
    aggregate(toks, lit(0L), (acc, t) => (acc * 131 + tokVal(t).cast("long")) % 1000000007L)
  }
}
