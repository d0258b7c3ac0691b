package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline — all
  * built from codegen'd `org.apache.spark.sql.functions` (no UDFs), so they
  * stay inside whole-stage codegen and scale to 100 TB document tables.
  */
object TextFunctions {

  /** Tokenize on single spaces (matching DuckDB string_split for oracle
    * parity), dropping empty tokens. Since r20 the codegen'd
    * [[TokensNonEmpty]] kernel — value-identical to
    * `filter(split(text, " "), t => t =!= "")`, whose interpreted
    * higher-order `filter` dominated the scan-fused text passes. */
  def tokens(text: Column): Column =
    ShingleExprs.tokensNonEmpty(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** The ONE DuckDB twin of [[tokenCount]] — interpolated by every oracle
    * that counts whitespace tokens (text_token_stats, token_percentiles),
    * so the tokenization rule cannot drift between oracles. */
  def tokenCountSql(textCol: String): String =
    s"len(list_filter(string_split($textCol, ' '), t -> t <> ''))"

  /** Word n-gram shingles: join of each n-length sliding window. */
  def wordShingles(text: Column, n: Int): Column =
    shinglesOfTokens(split(text, " "), n)

  /** The token-array form of [[wordShingles]] — the one shared sliding-
    * window builder (callers pick the token source: raw split, or the
    * empty-filtered [[tokens]]). Since r20 this is the codegen'd
    * [[ShinglesOfTokenArray]] kernel; the prior declarative form —
    * `when(count >= 1, transform(sequence(1, count), i =>
    * array_join(slice(toks, i, n), " "))).otherwise(empty)` (with the
    * sequence guarded: sequence(1, k) for k < 1 DESCENDS, not empties) —
    * is value-identical but ran as interpreted higher-order functions,
    * which the r20 profile measured at ~1.2 s per corpus pass at sf0.1. */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    ShingleExprs.shinglesOfTokenArray(toks, n)

  /** Count of characters matching a regex character class. */
  def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  def punctRatio(text: Column): Column =
    charClassCount(text, "[.,!?;:]") / greatest(length(text), lit(1))

  def upperRatio(text: Column): Column =
    charClassCount(text, "[A-Z]") / greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    charClassCount(text, "[0-9]") / greatest(length(text), lit(1))

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be")

  /** Fraction of tokens that are stopwords — a fluency proxy. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = tokens(text)
    array_intersect_keepdup_count(toks, stopwords).cast("int") / greatest(size(toks), lit(1))
  }

  /** Count tokens ∈ vocabulary, keeping duplicates (array_intersect dedups,
    * which would undercount repeated stopwords). Codegen'd kernel since
    * r20 (was an interpreted higher-order filter). */
  private def array_intersect_keepdup_count(toks: Column, vocab: Seq[String]): Column =
    ShingleExprs.countTokensIn(toks, vocab)

  /** Composite quality score in [0,1]: length sweet-spot, punctuation
    * presence, stopword fluency, low digit noise. Heuristic mirror of the
    * standard pretraining-corpus quality filters. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text) / lit(500.0), lit(1.0))
    val fluency = least(stopwordRatio(text) * 4, lit(1.0))
    val noise = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 5)
    // floor-form rounding: native round() diverges cross-engine at
    // shortest-repr ties (see StableRound)
    StableRound.stableRound((lenScore + fluency + noise) / 3, 6)
  }

  /** The ONE DuckDB twin of [[qualityScore]], as an expression over a SQL
    * text column — interpolated by every oracle that filters or surfaces a
    * quality score (text_quality, corpus_clean, corpus_ingest_stream), so
    * a formula change cannot update one oracle and silently leave another
    * computing a different truth. Identical IEEE operation order to the
    * Spark side: least/greatest composites over the raw ratios, one
    * floor-form rounding at the end. */
  def qualityScoreSql(textCol: String): String = {
    val sw = englishStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""FLOOR((LEAST(LENGTH($textCol) / 500.0, 1.0)
       |                + LEAST(CAST(len(list_filter(list_filter(string_split($textCol, ' '), x -> x <> ''),
       |                         x -> list_contains($sw, x))) AS DOUBLE)
       |                      / GREATEST(len(list_filter(string_split($textCol, ' '), x -> x <> '')), 1) * 4, 1.0)
       |                + GREATEST(0.0, 1.0 - CAST(LENGTH($textCol) - LENGTH(regexp_replace($textCol, '[0-9]', '', 'g')) AS DOUBLE)
       |                      / GREATEST(LENGTH($textCol), 1) * 5)) / 3 * 1e6 + 0.5) / 1e6""".stripMargin
  }

  /** Per-language stopword lexicons for the n-gram/lexicon language-ID
    * heuristic. Deliberately small: language ID at corpus scale is a
    * scoring pass, not a model. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "que"))

  def langScore(text: Column, lexicon: Seq[String]): Column =
    ShingleExprs.countTokensIn(tokens(lower(text)), lexicon)

  /** Predicted language: highest lexicon hit-count; CJK codepoint presence
    * short-circuits to zh; all-zero scores → "und". Ties resolve in
    * lexicon declaration order (deterministic). */
  def langId(text: Column): Column = {
    val scores = langLexicons.map { case (lang, lex) => (lang, langScore(text, lex)) }
    val maxScore = greatest(scores.map(_._2): _*)
    val best = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    when(charClassCount(text, "[\\u4e00-\\u9fff]") > 0, lit("zh")).otherwise(best)
  }
}
