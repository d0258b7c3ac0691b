package graft.operators

import graft.functions.{Fingerprint, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    s"""SELECT doc_id, LENGTH(text) AS chars,
      |       ${TF.tokenCountSql("text")} AS n_tokens,
      |       len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_distinct_tokens,
      |       FLOOR(CAST(LENGTH(text) AS DOUBLE) /
      |             GREATEST(${TF.tokenCountSql("text")}, 1) * 1e6 + 0.5) / 1e6 AS avg_token_len
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
       |       ${TF.qualityScoreSql("text")} AS quality_score
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

  /** DuckDB twin of [[graft.functions.Fingerprint]] — the single-sourced
    * fold fragment ([[Fingerprint.fingerprintSql]]). */
  val fingerprintOracle: String =
    s"""SELECT doc_id,
       |       ${Fingerprint.fingerprintSql("text")} AS fingerprint
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- repetition signals

  /** Word 2-grams (with duplicates) over [[TF.tokens]]'s empty-filtered
    * tokens (same token set as the token counts) — the shared sliding-
    * window builder with a different token source. */
  private def gramsFromToks(toks: Column): Column =
    TF.shinglesOfTokens(toks, 2)

  /** Gopher-style repetition signals per document: type/token ratio and the
    * share of the most frequent token / word-2-gram. Everything is computed
    * in-row — the top counts through the codegen'd
    * [[graft.functions.MaxMultiplicity]] expression (sort + run-scan in one
    * static call per row) — so the operator is one codegen'd pass over the
    * corpus with zero shuffles: the 100 TB form of a quality filter.
    * (History: v1 inlined a builtin `aggregate` fold whose lambda
    * re-evaluated an `array_sort` per element access — expression TREES
    * re-evaluate shared subtrees — costing 83 s at sf0.1; v2 bound the
    * sorts to attributes: 2.1 s; the expression form is ~3× faster still
    * at ×10–×20 volumes and keeps the whole stage codegen'd — SCALE.md.)
    * Fractions are single divisions of exact integers, NULL when the
    * denominator is 0 (docs with <1 token / <2 tokens). */
  def repetition(docs: DataFrame): DataFrame = {
    val r6 = graft.functions.StableRound.stableRound(_: Column, 6)
    val mm = graft.functions.MaxMultiplicity.maxMultiplicity(_: Column)
    docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), gramsFromToks(col("toks")).as("grams"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        size(col("grams")).cast("long").as("n_2grams"),
        mm(col("toks")).as("top_token_count"),
        mm(col("grams")).as("top_2gram_count"))
      .withColumn("ttr",
        when(col("n_tokens") > 0,
          r6(col("n_types").cast("double") / col("n_tokens"))))
      .withColumn("rep_2gram_frac",
        when(col("n_2grams") > 0,
          r6(col("top_2gram_count").cast("double") / col("n_2grams"))))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin: same token/gram sets; the top counts via unnest + GROUP
    * BY + MAX (max multiplicity == the Spark side's max sorted run).
    * `range(1, len)` is empty when len ≤ 1, so short docs get `grams = []`
    * with no guard (DuckDB range, unlike Spark `sequence`, never counts
    * down). */
  val repetitionOracle: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, toks,
      |         [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] AS grams
      |  FROM t
      |), tokc AS (
      |  SELECT doc_id, MAX(c) AS top_token_count FROM (
      |    SELECT doc_id, tok, COUNT(*) AS c
      |    FROM (SELECT doc_id, unnest(toks) AS tok FROM g) GROUP BY doc_id, tok
      |  ) GROUP BY doc_id
      |), gramc AS (
      |  SELECT doc_id, MAX(c) AS top_2gram_count FROM (
      |    SELECT doc_id, gr, COUNT(*) AS c
      |    FROM (SELECT doc_id, unnest(grams) AS gr FROM g) GROUP BY doc_id, gr
      |  ) GROUP BY doc_id
      |)
      |SELECT g.doc_id, len(toks) AS n_tokens,
      |       len(list_distinct(toks)) AS n_types,
      |       len(grams) AS n_2grams,
      |       COALESCE(tokc.top_token_count, 0) AS top_token_count,
      |       COALESCE(gramc.top_2gram_count, 0) AS top_2gram_count,
      |       CASE WHEN len(toks) > 0 THEN
      |         FLOOR(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 1e6 + 0.5) / 1e6
      |       END AS ttr,
      |       CASE WHEN len(grams) > 0 THEN
      |         FLOOR(CAST(gramc.top_2gram_count AS DOUBLE) / len(grams) * 1e6 + 0.5) / 1e6
      |       END AS rep_2gram_frac
      |FROM g LEFT JOIN tokc USING (doc_id) LEFT JOIN gramc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  def repetitionFromDir(spark: SparkSession, dir: String): DataFrame =
    repetition(Tables.documents(spark, dir))

  // ----------------------------------------------------- normalization

  private val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlPattern = "https?://[^ ]+"
  // E.164-ish international phone: '+', 9-16 digits with optional
  // space/dash separators, digit-terminated. The trailing dash in the
  // class is literal in both Java regex and RE2 — no escape divergence.
  private val PhonePattern = "\\+[0-9][0-9 -]{7,14}[0-9]"
  // IPv4-shaped dotted quad (no word boundaries: version strings that
  // look like IPs are redacted too — the conservative direction for a
  // privacy scrub, and the definition both engines implement identically)
  private val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Deterministic text normalization — the canonical-form stage of a
    * training-data pipeline: ASCII-fold (non-ASCII to spaces FIRST, so the
    * later `lower` only ever sees ASCII — Java's full Unicode case mapping
    * and DuckDB's utf8proc simple mapping disagree on special-cased
    * letters like 'İ', which would silently break the oracle on non-ASCII
    * corpora), lowercase, non-alphanumerics to spaces, whitespace
    * collapsed, trimmed — plus PII/link counts on the RAW text (emails,
    * URLs) so a downstream redaction policy can route documents. One
    * codegen'd pass; all patterns are simple character classes with
    * identical Java-regex / RE2 semantics. */
  def normalize(docs: DataFrame): DataFrame = {
    val ascii = regexp_replace(col("text"), "[^\\x20-\\x7E]", " ")
    val norm = trim(regexp_replace(
      regexp_replace(lower(ascii), "[^a-z0-9 ]", " "), " +", " "))
    docs.select(
      col("doc_id"),
      norm.as("norm_text"),
      length(norm).cast("long").as("norm_chars"),
      size(TF.tokens(norm)).cast("long").as("n_norm_tokens"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(UrlPattern)).cast("long").as("n_urls"))
      .orderBy(col("doc_id"))
  }

  val normalizeOracle: String =
    s"""WITH n AS (
       |  SELECT doc_id, text,
       |         trim(regexp_replace(regexp_replace(
       |           lower(regexp_replace(text, '[^\\x20-\\x7E]', ' ', 'g')),
       |           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
       |  FROM documents
       |)
       |SELECT doc_id, norm_text, LENGTH(norm_text) AS norm_chars,
       |       len(list_filter(string_split(norm_text, ' '), x -> x <> '')) AS n_norm_tokens,
       |       len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
       |       len(regexp_extract_all(text, '$UrlPattern')) AS n_urls
       |FROM n ORDER BY doc_id""".stripMargin

  def normalizeFromDir(spark: SparkSession, dir: String): DataFrame =
    normalize(Tables.documents(spark, dir))

  // --------------------------------------------------------- PII redaction

  /** PII/link redaction — the span-REPLACEMENT counterpart of
    * [[normalize]]'s counts: emails then URLs are rewritten to sentinel
    * tokens in that fixed order (order matters when spans nest — an email
    * inside a URL path is redacted first, then the surrounding URL; both
    * engines apply the identical sequence, so the composition is
    * deterministic). Patterns are the same single-sourced RE2-safe
    * definitions the counts use — the redactor and the counter can never
    * disagree about what PII is. One codegen'd pass, zero shuffles: the
    * 100 TB form of a pre-release privacy scrub.
    *
    * The n_* columns are RAW-TEXT MATCH COUNTS (occurrences of each
    * pattern in the input), not tags-emitted counts: because replacements
    * compose in sequence, a match of a later pattern can be swallowed by
    * an earlier replacement — an IP-hosted URL counts 1 in n_ipv4 yet
    * surfaces only as <URL> in redacted_text (no <IP> tag). That is the
    * right audit surface (how much PII-shaped content the INPUT carried);
    * count sentinel tokens in redacted_text to audit emitted tags
    * instead. Identical composition on both engines, so the gate pins
    * the semantics either way. */
  def redact(docs: DataFrame): DataFrame = {
    // order: email (an address inside a URL path redacts first), then
    // URL (swallows IP-hosts and phone-looking path segments whole),
    // then phone, then IPv4 over what survives
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
      UrlPattern, "<URL>"),
      PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
    docs.select(
      col("doc_id"),
      redacted.as("redacted_text"),
      length(redacted).cast("long").as("redacted_chars"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(col("text"), lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("n_ipv4"))
      .orderBy(col("doc_id"))
  }

  /** Gated redaction query. The test corpus contains zero emails/URLs
    * (checked against the raw parquet), so redacting it directly would
    * gate nothing — a broken redactor that returns its input verbatim
    * would still hash-match. The gate therefore PLANTS deterministic PII
    * first — every 3rd doc an email, every 4th a URL, values derived from
    * doc_id by the same concat on both engines — and redacts the result:
    * now a pass-through, a wrong span boundary, or a wrong replacement
    * order each produce a different hash. */
  def redactFromDir(spark: SparkSession, dir: String): DataFrame =
    redact(Tables.documents(spark, dir).select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit(" see https://cdn.example.org/doc/"),
          col("doc_id").cast("string"), lit("?ref=x"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call +212 555-0"),
          (col("doc_id") % 100).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string"))).otherwise(lit("")))
      .as("text")))

  val redactOracle: String =
    s"""WITH p AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0
       |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |            ELSE '' END
       |    || CASE WHEN doc_id % 4 = 0
       |            THEN ' see https://cdn.example.org/doc/' || CAST(doc_id AS VARCHAR) || '?ref=x'
       |            ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |            THEN ' call +212 555-0' || CAST(doc_id % 100 AS VARCHAR)
       |            ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0
       |            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
       |            ELSE '' END AS text
       |  FROM documents
       |), r AS (
       |  SELECT doc_id,
       |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |           text, '$EmailPattern', '<EMAIL>', 'g'),
       |                 '$UrlPattern', '<URL>', 'g'),
       |                 '$PhonePattern', '<PHONE>', 'g'),
       |                 '$Ipv4Pattern', '<IP>', 'g') AS redacted_text,
       |         len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
       |         len(regexp_extract_all(text, '$UrlPattern')) AS n_urls,
       |         len(regexp_extract_all(text, '$PhonePattern')) AS n_phones,
       |         len(regexp_extract_all(text, '$Ipv4Pattern')) AS n_ipv4
       |  FROM p
       |)
       |SELECT doc_id, redacted_text, LENGTH(redacted_text) AS redacted_chars,
       |       n_emails, n_urls, n_phones, n_ipv4
       |FROM r ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ BPE-ish token counts

  /** The RE2-safe GPT-2-style pre-tokenizer — SINGLE-SOURCED from
    * [[graft.functions.BpeMerge.Pattern]] so the segment-count gate, the
    * merge counter, and all DuckDB oracles interpolate one definition (see
    * BpeMerge's scaladoc for why it is explicit-whitespace and
    * lookahead-free). */
  private val BpePattern = graft.functions.BpeMerge.Pattern

  /** BPE-ish token counting — the pre-tokenizer segment count a byte-pair
    * tokenizer's cost model starts from, next to [[tokenStats]]'s
    * whitespace counts. `chars_per_token` is the compression-rate proxy
    * quality filters threshold on. One codegen'd pass, zero shuffles. */
  def bpeTokenStats(docs: DataFrame): DataFrame = {
    val bpe = regexp_count(col("text"), lit(BpePattern)).cast("long")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      bpe.as("bpe_tokens"),
      when(bpe > 0, graft.functions.StableRound.stableRound(
        length(col("text")).cast("double") / bpe, 6)).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  val bpeTokenStatsOracle: String =
    s"""WITH b AS (
       |  SELECT doc_id, LENGTH(text) AS chars,
       |         len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens
       |  FROM documents
       |)
       |SELECT doc_id, chars, bpe_tokens,
       |       CASE WHEN bpe_tokens > 0 THEN
       |         FLOOR(CAST(chars AS DOUBLE) / bpe_tokens * 1e6 + 0.5) / 1e6
       |       END AS chars_per_token
       |FROM b ORDER BY doc_id""".stripMargin

  def bpeTokenStatsFromDir(spark: SparkSession, dir: String): DataFrame =
    bpeTokenStats(Tables.documents(spark, dir))

  /** REAL BPE token counts — pre-tokenizer segments run through the
    * checked-in merge table ([[graft.functions.BpeMerge]]), next to the
    * segment count so the two cost models are comparable per doc (for
    * U+001F-free text every segment is >=1 merged token, so
    * `merged_tokens >= bpe_segments`; a segment of ONLY U+001F chars —
    * stripped as the internal separator — counts 1 segment, 0 tokens).
    * `chars_per_merged_token` is the honest compression rate a token-budget
    * decision should use.
    *
    * Plan shape: one codegen'd pass over the scan (BpeMergeTokens makes a
    * single static call per row), zero shuffles, global sort at the
    * surface only. The merge count is bound to an attribute behind its own
    * projection so the `when` guard and the ratio reference ONE evaluation
    * (round-5 finding: multi-referenced non-cheap expression trees
    * re-evaluate per reference). */
  def bpeMergedStats(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        regexp_count(col("text"), lit(BpePattern)).cast("long").as("bpe_segments"),
        graft.functions.BpeMerge.bpeMergeTokens(col("text")).as("merged_tokens"))
      .select(
        col("doc_id"), col("chars"), col("bpe_segments"), col("merged_tokens"),
        when(col("merged_tokens") > 0, graft.functions.StableRound.stableRound(
          col("chars").cast("double") / col("merged_tokens"), 6))
          .as("chars_per_merged_token"))
      .orderBy(col("doc_id"))

  /** DuckDB twin: same pre-tokenizer, same boundary-anchored replace sweep
    * per segment ([[graft.functions.BpeMerge.segTokensSql]]), summed per
    * doc. CASTs kill HUGEINT (driver hash is dtype-sensitive). */
  val bpeMergedOracle: String = {
    val pat = graft.functions.BpeMerge.Pattern
    val perSeg = graft.functions.BpeMerge.segTokensSql("s")
    s"""WITH seg AS (
       |  SELECT doc_id, LENGTH(text) AS chars,
       |         regexp_extract_all(text, '$pat') AS segs
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, chars,
       |         CAST(len(segs) AS BIGINT) AS bpe_segments,
       |         CAST(COALESCE(list_sum(list_transform(segs, s -> $perSeg)), 0)
       |              AS BIGINT) AS merged_tokens
       |  FROM seg
       |)
       |SELECT doc_id, chars, bpe_segments, merged_tokens,
       |       CASE WHEN merged_tokens > 0 THEN
       |         FLOOR(CAST(chars AS DOUBLE) / merged_tokens * 1e6 + 0.5) / 1e6
       |       END AS chars_per_merged_token
       |FROM m ORDER BY doc_id""".stripMargin
  }

  def bpeMergedFromDir(spark: SparkSession, dir: String): DataFrame =
    bpeMergedStats(Tables.documents(spark, dir))

  def tokenStatsFromDir(spark: SparkSession, dir: String): DataFrame =
    tokenStats(Tables.documents(spark, dir))
  def qualityFromDir(spark: SparkSession, dir: String): DataFrame =
    quality(Tables.documents(spark, dir))
  def langIdFromDir(spark: SparkSession, dir: String): DataFrame =
    langId(Tables.documents(spark, dir))
  def fingerprintsFromDir(spark: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(spark, dir))
}
