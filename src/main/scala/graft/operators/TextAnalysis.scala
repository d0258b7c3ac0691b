package graft.operators

import graft.functions.{Fingerprint, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table: token statistics,
  * quality scoring, language ID, and content fingerprinting. All
  * expression-level (no shuffles) — they run inside the scan's
  * whole-stage-codegen stage and cost one pass regardless of corpus size.
  */
object TextAnalysis {

  /** Token / character statistics per document. The token array is
    * materialized once per row (explicit projection boundary) — inlining it
    * into every stat would re-split the text per statistic. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), length(col("text")).cast("long").as("chars"),
      TF.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        graft.functions.StableRound.stableRound(col("chars").cast("double") /
          greatest(size(col("toks")), lit(1)), 6).as("avg_token_len"))
      .orderBy(col("doc_id"))

  val tokenStatsOracle: String =
    """SELECT doc_id, LENGTH(text) AS chars,
      |       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
      |       len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_distinct_tokens,
      |       FLOOR(CAST(LENGTH(text) AS DOUBLE) /
      |             GREATEST(len(list_filter(string_split(text, ' '), t -> t <> '')), 1) * 1e6 + 0.5) / 1e6 AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length/punct/stopword/digit components + composite. */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.StableRound.stableRound(TF.punctRatio(col("text")), 6).as("punct_ratio"),
      graft.functions.StableRound.stableRound(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      graft.functions.StableRound.stableRound(TF.digitRatio(col("text")), 6).as("digit_ratio"),
      TF.qualityScore(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))

  val qualityOracle: String = {
    val sw = TF.englishStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
       |         GREATEST(LENGTH(text), 1) AS len1
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, text, len1,
       |         CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / len1 AS punct_ratio,
       |         CAST(len(list_filter(toks, x -> list_contains($sw, x))) AS DOUBLE)
       |           / GREATEST(len(toks), 1) AS stopword_ratio,
       |         CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / len1 AS digit_ratio
       |  FROM t
       |)
       |SELECT doc_id, FLOOR(punct_ratio * 1e6 + 0.5) / 1e6 AS punct_ratio,
       |       FLOOR(stopword_ratio * 1e6 + 0.5) / 1e6 AS stopword_ratio,
       |       FLOOR(digit_ratio * 1e6 + 0.5) / 1e6 AS digit_ratio,
       |       FLOOR((LEAST(LENGTH(text) / 500.0, 1.0)
       |              + LEAST(stopword_ratio * 4, 1.0)
       |              + GREATEST(0.0, 1.0 - digit_ratio * 5)) / 3 * 1e6 + 0.5) / 1e6 AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Language ID (lexicon heuristic) — see TextFunctions.langId. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
      TF.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** DuckDB twin of the langId scoring: per-language lexicon hit-counts,
    * earlier-declared language wins score ties, CJK short-circuit. */
  val langIdOracle: String = {
    def lex(lang: String): String =
      TF.langLexicons.find(_._1 == lang).get._2.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, lang AS labeled_lang, text,
       |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, labeled_lang, text,
       |         len(list_filter(toks, x -> list_contains(${lex("en")}, x))) AS sc_en,
       |         len(list_filter(toks, x -> list_contains(${lex("fr")}, x))) AS sc_fr,
       |         len(list_filter(toks, x -> list_contains(${lex("de")}, x))) AS sc_de,
       |         len(list_filter(toks, x -> list_contains(${lex("es")}, x))) AS sc_es
       |  FROM t
       |)
       |SELECT doc_id, labeled_lang,
       |       CASE WHEN LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
       |            WHEN GREATEST(sc_en, sc_fr, sc_de, sc_es) = 0 THEN 'und'
       |            WHEN sc_en = GREATEST(sc_en, sc_fr, sc_de, sc_es) THEN 'en'
       |            WHEN sc_fr = GREATEST(sc_en, sc_fr, sc_de, sc_es) THEN 'fr'
       |            WHEN sc_de = GREATEST(sc_en, sc_fr, sc_de, sc_es) THEN 'de'
       |            ELSE 'es' END AS predicted_lang
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Rolling-hash content fingerprint (custom codegen'd Expression). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      Fingerprint.docFingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** DuckDB twin of [[graft.functions.Fingerprint]]: the same
    * h = (h·31 + byte) mod 1e9+7 left fold over the UTF-8 BYTES, built from
    * the hex dump of the encoded text (two hex chars per byte) and
    * list_reduce. Seeded with a prepended 0 so empty text folds to 0, like
    * the expression's empty loop. */
  val fingerprintOracle: String =
    """SELECT doc_id,
      |       list_reduce(
      |         list_prepend(CAST(0 AS BIGINT),
      |           [CAST('0x' || substr(hex(encode(text)), 2*x - 1, 2) AS BIGINT)
      |            FOR x IN range(1, CAST(octet_length(encode(text)) AS INTEGER) + 1)]),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  def tokenStatsFromDir(spark: SparkSession, dir: String): DataFrame =
    tokenStats(Tables.documents(spark, dir))
  def qualityFromDir(spark: SparkSession, dir: String): DataFrame =
    quality(Tables.documents(spark, dir))
  def langIdFromDir(spark: SparkSession, dir: String): DataFrame =
    langId(Tables.documents(spark, dir))
  def fingerprintsFromDir(spark: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(spark, dir))
}
