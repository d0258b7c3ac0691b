package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (after Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): estimate bag-of-hashed-n-gram unigram distributions
  * over a small TARGET corpus (the distribution pretraining wants more
  * of) and over the RAW corpus, weight every raw document by its
  * log-likelihood ratio, and sample without replacement proportionally
  * to the weights via Gumbel top-k. Where the CCNet tercile filter
  * ([[BigramLm.refBuckets]]) CUTS by reference fluency, DSIR RESAMPLES
  * toward the target distribution — the selected set's n-gram profile
  * approaches the target's instead of merely dropping the worst tail.
  *
  * The estimator, exactly:
  *   - features: unigrams AND bigrams of the shared token rule, hashed
  *     to `buckets` ids with the cross-engine [[Dedup.hash60]] (the
  *     [[QualityClassifier]] featurization, counts instead of binary);
  *   - both distributions Laplace-smoothed: p(b) = (c_b + 1)/(N + B),
  *     so buckets unseen in the small target stay finite;
  *   - per-doc log-weight = Σ_b k_b · (ln p_target(b) − ln p_raw(b)),
  *     each ln micros-rounded immediately (the [[UnigramLm]] libm
  *     discipline), so the sum is an exact long;
  *   - Gumbel key from md5(doc_id) — deterministic on BOTH engines, the
  *     [[Similarity.hashPlanes]] construction: u = (h₄₈ + 0.5)/2⁴⁸,
  *     e = min(micros(ln u), −1) (the floor keeps the outer log finite
  *     when micros-rounding lands a near-1 u on exactly 0 — a ≤1e-6
  *     distortion at the extreme quantile), g = micros(−ln(−e/10⁶)):
  *     each libm call's input is an exact cross-engine double and its
  *     output rounds to micros before reuse;
  *   - selection: rank by (logw_micros + gumbel_micros) desc — Gumbel
  *     top-k IS sampling ∝ exp(logw) without replacement — and keep the
  *     top 1/`quota` by the integer cut (rk−1)·quota < n (the
  *     [[BigramLm.refBuckets]] tercile formula, generalized).
  *
  * Scale: the hashed feature space is B rows — both count tables and
  * the per-bucket ratio table are broadcast-sized BY CONSTRUCTION
  * (feature hashing is what makes DSIR run where a full-vocabulary
  * ratio would shuffle the Zipf head); the corpus-sized stages are one
  * per-doc multiplicity shuffle (Zipf diluted by the doc_id key, the
  * [[UnigramLm]] discipline) and the distributed prefix-sum rank (range
  * exchange + broadcast offsets — never a one-partition NTILE sort).
  * Driver state: two scalar totals.
  */
object Dsir {

  val Buckets = 64
  val Quota = 4

  /** Per-doc importance weights + Gumbel keys + the sampling decision:
    * (doc_id, n_feats, logw_micros, gumbel_micros, sampled) over every
    * doc with ≥1 token (a token-less doc has no features to weigh).
    * `target` must be a subset-shaped frame with a `text` column. */
  def importanceSample(docs: DataFrame, target: DataFrame,
                       buckets: Int = Buckets, quota: Int = Quota): DataFrame = {
    // ONE pinned multiplicity stage feeds both the raw count re-agg and
    // the scoring join (the UnigramLm two-reader discipline); the target
    // side re-tokenizes only its small slice
    val db = Pinned.pin(bucketed(docs, buckets)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("k")))
    // both count tables are pinned: each has two readers (its N scalar and
    // the scoring join), and tgt's lineage re-tokenizes the target slice —
    // unpinned, the scalar action and the join each paid that tokenize
    val raw = Pinned.pin(db.groupBy(col("b")).agg(sum(col("k")).as("c_r")))
    val tgt = Pinned.pin(
      bucketed(target, buckets).groupBy(col("b")).agg(count(lit(1)).as("c_t")))
    // two driver scalars (the adjudicated UnigramLm pattern)
    val nR = Option(raw.agg(sum(col("c_r"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val nT = Option(tgt.agg(sum(col("c_t"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val lam =
      StableRound.microsLong(log((coalesce(col("c_t"), lit(0L)).cast("double") + 1.0)
        / lit(nT + buckets))) -
      StableRound.microsLong(log((col("c_r").cast("double") + 1.0)
        / lit(nR + buckets)))
    val weighted = db
      .join(raw, Seq("b"))
      .join(tgt, Seq("b"), "left")
      .select(col("doc_id"), col("k"), (col("k") * lam).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_feats"), sum(col("contrib")).as("logw_micros"))
      .withColumn("gumbel_micros", gumbelMicros(col("doc_id")))
    val ranked = ScalableCumsum.withRunningTotal(weighted, lit(1L), "rk",
      negate(col("logw_micros") + col("gumbel_micros")), col("doc_id"))
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_feats"), col("logw_micros"),
        col("gumbel_micros"),
        (expr(s"((rk - 1) * $quota) DIV n") === 0).as("sampled"))
      .orderBy(col("doc_id"))
  }

  /** Hashed unigram+bigram feature occurrences: (doc_id, b) one row per
    * occurrence — counts, not distinct (DSIR weighs by multiplicity). */
  private def bucketed(d: DataFrame, buckets: Int): DataFrame = {
    val ts = TF.tokens(col("text"))
    d.select(col("doc_id"),
        explode(concat(ts, TF.shinglesOfTokens(ts, 2))).as("f"))
      .select(col("doc_id"), (Dedup.hash60(col("f")) % buckets).as("b"))
  }

  /** The deterministic Gumbel key of a doc id (see object scaladoc). */
  private def gumbelMicros(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = conv(substring(md5(concat(lit("dsir_"), docId.cast("string"))), 1, 12),
      16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / lit(TwoPow48)
    val e = least(StableRound.microsLong(log(u)), lit(-1L))
    StableRound.microsLong(-log(-(e.cast("double") / 1e6)))
  }

  private val TwoPow48 = 281474976710656.0 // 16^12: 12 md5 hex chars

  /** Gated variant (`curation_dsir`): source `src0` plays the target —
    * the [[BigramLm.refFromDir]] convention, so the two target-driven
    * selectors (CCNet cut, DSIR resample) are directly comparable. */
  def fromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    importanceSample(docs, docs.filter(col("source") === "src0"))
  }

  /** The weighting+sampling chain as prefixed CTEs ending in
    * `${p}sel (doc_id, n_feats, logw_micros, gumbel_micros, sampled)` —
    * single-sourced so the composed curation oracle reuses the exact
    * rule. `docsFrom` / `targetFrom` are free-form FROM bodies (relation
    * + optional WHERE — the [[BigramLm.refCtesSql]] convention), the
    * target estimated from its OWN tokenize chain so it needs no
    * membership in the weighed corpus (matching [[importanceSample]]'s
    * two-frame API). */
  private[operators] def dsirCtesSql(buckets: Int = Buckets, quota: Int = Quota,
                                     p: String = "",
                                     docsFrom: String = "documents",
                                     targetFrom: String =
                                       "documents WHERE source = 'src0'"): String = {
    val lamT = StableRound.microsLongSql(
      s"LN((CAST(COALESCE(t.c_t, 0) AS DOUBLE) + 1.0) / (nt.n + $buckets))")
    val lamR = StableRound.microsLongSql(
      s"LN((CAST(r.c_r AS DOUBLE) + 1.0) / (nr.n + $buckets))")
    val lnU = StableRound.microsLongSql(
      "LN((CAST(CAST('0x' || substr(md5('dsir_' || CAST(doc_id AS VARCHAR)), 1, 12) " +
        "AS BIGINT) AS DOUBLE) + 0.5) / 281474976710656.0)")
    val g = StableRound.microsLongSql("-LN(-(CAST(e AS DOUBLE) / 1000000.0))")
    s"""${p}toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM $docsFrom
       |), ${p}fb AS (
       |  SELECT doc_id,
       |         CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % $buckets AS b
       |  FROM (
       |    SELECT doc_id, w AS f FROM ${p}toks, LATERAL unnest(ts) AS u(w)
       |    UNION ALL
       |    SELECT doc_id, ts[i.i] || ' ' || ts[i.i + 1] AS f
       |    FROM ${p}toks, LATERAL unnest(range(1, len(ts))) AS i(i)
       |  )
       |), ${p}db AS MATERIALIZED (
       |  SELECT doc_id, b, COUNT(*) AS k FROM ${p}fb GROUP BY 1, 2
       |), ${p}raw AS MATERIALIZED (
       |  SELECT b, CAST(SUM(k) AS BIGINT) AS c_r FROM ${p}db GROUP BY 1
       |), ${p}nr AS (
       |  SELECT CAST(COALESCE(SUM(c_r), 0) AS DOUBLE) AS n FROM ${p}raw
       |), ${p}ttoks AS MATERIALIZED (
       |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM $targetFrom
       |), ${p}tgt AS MATERIALIZED (
       |  SELECT CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % $buckets AS b,
       |         COUNT(*) AS c_t
       |  FROM (
       |    SELECT w AS f FROM ${p}ttoks, LATERAL unnest(ts) AS u(w)
       |    UNION ALL
       |    SELECT ts[i.i] || ' ' || ts[i.i + 1] AS f
       |    FROM ${p}ttoks, LATERAL unnest(range(1, len(ts))) AS i(i)
       |  ) GROUP BY 1
       |), ${p}nt AS (
       |  SELECT CAST(COALESCE(SUM(c_t), 0) AS DOUBLE) AS n FROM ${p}tgt
       |), ${p}dw AS (
       |  SELECT db.doc_id, CAST(SUM(db.k) AS BIGINT) AS n_feats,
       |         CAST(SUM(db.k * ($lamT - $lamR)) AS BIGINT) AS logw_micros
       |  FROM ${p}db db JOIN ${p}raw r USING (b) LEFT JOIN ${p}tgt t USING (b)
       |       CROSS JOIN ${p}nt nt CROSS JOIN ${p}nr nr
       |  GROUP BY 1
       |), ${p}gum AS (
       |  SELECT doc_id, n_feats, logw_micros, $g AS gumbel_micros
       |  FROM (SELECT *, LEAST($lnU, -1) AS e FROM ${p}dw)
       |), ${p}sel AS (
       |  SELECT doc_id, n_feats, logw_micros, gumbel_micros,
       |         ((ROW_NUMBER() OVER (ORDER BY logw_micros + gumbel_micros DESC, doc_id)
       |           - 1) * $quota) // (COUNT(*) OVER ()) = 0 AS sampled
       |  FROM ${p}gum
       |)""".stripMargin
  }

  /** DuckDB twin of [[fromDir]]: same token rule, same md5 bucket hash,
    * same Laplace-smoothed micros-rounded log-ratio, same md5 Gumbel
    * keys, same integer quota cut. */
  def oracle(buckets: Int = Buckets, quota: Int = Quota): String =
    s"""WITH ${dsirCtesSql(buckets, quota)}
       |SELECT doc_id, n_feats, logw_micros, gumbel_micros, sampled
       |FROM sel ORDER BY doc_id""".stripMargin
}
