package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document unigram language-model log-probability — the cheap
  * perplexity proxy behind "LM-quality" corpus filters: score every doc by
  * the mean log-probability of its tokens under the corpus's own unigram
  * distribution, then drop the tail. Gibberish, boilerplate-with-rare-
  * symbols, and wrong-language docs all surface as low mean log-prob
  * without training anything.
  *
  * Exactness: each token's ln(c_w / N) is rounded to integer MICROS
  * immediately after the one ln (the pmi precedent — the ln's last ulp is
  * the only cross-libm risk, and 6-dp rounding absorbs it), so all
  * downstream sums are LONG sums — order-independent, hash-stable. The
  * mean is one IEEE division of two exactly-represented longs, so it too
  * is bit-identical cross-engine.
  *
  * Scale, in stages:
  *   1. per-doc distinct-token multiplicities ((doc_id, w) groupBy): one
  *      well-spread corpus shuffle — the Zipf head is diluted because the
  *      key carries doc_id;
  *   2. the vocabulary from re-aggregating those rows on w: partial
  *      aggregation collapses hot words to one row per task before the
  *      wire, so the shuffle is vocabulary-sized;
  *   3. scoring join (doc-distinct rows ⋈ vocabulary on w): the hot-key
  *      side is one row per (doc, word) — AQE's skew-join splitting covers
  *      the Zipf head — and each row contributes k·lp_micros in one
  *      multiply, so the join output re-aggregates to |docs| rows.
  * Joining raw token OCCURRENCES against the vocabulary (the naive shape)
  * would shuffle Σ|tokens| rows with an undiluted Zipf head; the
  * multiplicity form moves strictly less data at every stage.
  */
object UnigramLm {

  /** (doc_id, n_tokens, logprob_micros, avg_lp_micros) per doc with ≥1
    * token (a token-less doc has no distribution to score under and is
    * excluded from N as well). */
  def logProbs(docs: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("w"))
    // stage 1: per-doc multiplicities (the pinned stage feeds the
    // vocabulary re-agg AND the scoring join — one shuffle, two readers)
    val dt = Pinned.pin(
      occ.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("k")))
    val vocab = dt.groupBy(col("w")).agg(sum(col("k")).as("c_w"))
    // N collected to the driver: one scalar, same adjudicated pattern as
    // pmi's corpus totals (the alternative — a cross join against a
    // 1-row frame — hides the same value behind a worse plan)
    val n = Option(vocab.agg(sum(col("c_w"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val base = if (n > 0) dt else dt.limit(0)
    val lpMicros = StableRound.microsLong(log(col("c_w").cast("double") / n))
    base.join(vocab, Seq("w"))
      .select(col("doc_id"), col("k"), (col("k") * lpMicros).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"), sum(col("contrib")).as("logprob_micros"))
      // one division of two exact longs: IEEE-exactly-rounded, so the
      // double surface is deterministic without a post-round
      .select(col("doc_id"), col("n_tokens"), col("logprob_micros"),
        (col("logprob_micros").cast("double") / col("n_tokens")).as("avg_lp_micros"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    logProbs(Tables.documents(spark, dir))

  /** DuckDB twin: same filtered tokenization (single-sourced rule shared
    * with pmi/tfidf), same multiplicity decomposition, same
    * micros-after-ln rounding, same long sums and final division. */
  def oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM documents
       |), occ AS (
       |  SELECT doc_id, w FROM toks, LATERAL unnest(ts) AS u(w)
       |), dt AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM occ GROUP BY 1, 2
       |), vocab AS (
       |  SELECT w, SUM(k) AS c_w FROM dt GROUP BY 1
       |), n AS (
       |  SELECT CAST(SUM(c_w) AS DOUBLE) AS n FROM vocab
       |), lp AS (
       |  SELECT dt.doc_id, dt.k,
       |         dt.k * ${StableRound.microsLongSql("LN(CAST(v.c_w AS DOUBLE) / n.n)")} AS contrib
       |  FROM dt JOIN vocab v USING (w) CROSS JOIN n
       |), agg AS (
       |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
       |         CAST(SUM(contrib) AS BIGINT) AS logprob_micros
       |  FROM lp GROUP BY 1
       |)
       |SELECT doc_id, n_tokens, logprob_micros,
       |       CAST(logprob_micros AS DOUBLE) / n_tokens AS avg_lp_micros
       |FROM agg ORDER BY doc_id""".stripMargin
}
