package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document interpolated bigram language-model log-probability — the
  * context-aware step up from [[UnigramLm]]'s perplexity proxy: score
  * each bigram position (w1, w2) by
  *
  *     ln( λ · c(w1 w2)/c(w1)  +  (1−λ) · c(w2)/N )
  *
  * (Jelinek–Mercer interpolation with the corpus's own counts — the
  * unigram back-off term keeps unseen-in-context words finite without a
  * discounting scheme both engines would have to replicate). Fluent text
  * rides high-count transitions; shuffled or machine-mangled text falls
  * to the back-off term and scores visibly lower than its unigram score —
  * the gap (avg bigram lp − avg unigram lp) is itself a fluency signal.
  *
  * Exactness: the interpolation is a FIXED-ORDER IEEE expression
  * (λ·(c_ab/c_a) + (1−λ)·(c_b/N), two divisions, two multiplies, one
  * add — bit-identical cross-engine over exact long counts), the one ln
  * rounds to integer micros immediately (the UnigramLm/pmi precedent),
  * and everything downstream is LONG sums plus one exact final division.
  *
  * Scale, in stages (the [[UnigramLm]] multiplicity discipline, one
  * bigram wider):
  *   1. ONE pinned token-array stage feeds both count branches;
  *   2. per-doc bigram multiplicities ((doc_id, bigram) groupBy): the
  *      corpus shuffle, Zipf head diluted by the doc_id key; pinned —
  *      the global bigram table re-aggregates it, never the corpus;
  *   3. scoring joins: (doc, bigram) rows ⋈ bigram counts on bigram,
  *      then two vocabulary-sized unigram joins on w1/w2 — AQE covers
  *      the hot-key tail; each row contributes k·lp in one multiply and
  *      collapses to |docs| rows.
  */
object BigramLm {

  /** (doc_id, n_bigrams, logprob_micros, avg_lp_micros) per doc with ≥2
    * tokens (a doc with no bigram window has no transition to score). */
  def logProbs(docs: DataFrame, lambda: Double = 0.75): DataFrame = {
    val toks = Pinned.pin(docs.select(col("doc_id"), TF.tokens(col("text")).as("ts")))
    // pinned: three readers (the N scalar and both w1/w2 count joins) —
    // unpinned, each re-ran the vocabulary aggregation over the token stage
    val uni = Pinned.pin(toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
    val db = Pinned.pin(toks
      .select(col("doc_id"), explode(TF.shinglesOfTokens(col("ts"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("k")))
    val gb = db.groupBy(col("bigram")).agg(sum(col("k")).as("c_ab"))
    // one driver scalar (the adjudicated pattern; see UnigramLm)
    val n = Option(uni.agg(sum(col("c_w"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val base = if (n > 0) db else db.limit(0)
    val parts = split(col("bigram"), " ")
    val p = lit(lambda) * (col("c_ab").cast("double") / col("c_a")) +
      lit(1.0 - lambda) * (col("c_b").cast("double") / n)
    val lp = StableRound.microsLong(log(p))
    base.join(gb, Seq("bigram"))
      .select(col("doc_id"), col("k"), col("c_ab"),
        element_at(parts, 1).as("w1"), element_at(parts, 2).as("w2"))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .select(col("doc_id"), col("k"), (col("k") * lp).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"), sum(col("contrib")).as("logprob_micros"))
      .select(col("doc_id"), col("n_bigrams"), col("logprob_micros"),
        (col("logprob_micros").cast("double") / col("n_bigrams")).as("avg_lp_micros"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    logProbs(Tables.documents(spark, dir))

  /** REFERENCE-LM scoring — the CCNet/KenLM-style quality filter: score
    * EVERY document under a bigram LM whose counts come only from a
    * trusted REFERENCE subset (here: one crawl source), so "looks like
    * the reference distribution" becomes a per-doc number. Differences
    * from [[logProbs]] (which scores the corpus under its own counts):
    * scored bigrams can be UNSEEN in the reference, so the back-off
    * unigram term is Laplace-floored — p = λ·(c_ab/c_a when c_a>0 else
    * 0) + (1−λ)·(c_b+1)/(N+V) with V = reference vocab size — keeping
    * every position's probability strictly positive with exact-integer
    * inputs (N and V are exact longs; N+V is one exactly-representable
    * double on both engines).
    *
    * Scale: reference counts are reference-sized; the corpus-sized side
    * is the same per-doc bigram-multiplicity shuffle as [[logProbs]],
    * with the count joins now LEFT joins (coalesced to 0). */
  def refLogProbs(docs: DataFrame, ref: DataFrame,
                  lambda: Double = 0.75): DataFrame = {
    // pinned: the reference slice is tokenized ONCE; unpinned, the unigram
    // and bigram count builds each re-tokenized it, and every broadcast
    // build below re-ran its whole lineage (3 re-tokenizations of the
    // reference per run in the r20 plan audit)
    val refToks = Pinned.pin(ref.select(TF.tokens(col("text")).as("ts")))
    // pinned: three readers (the N+V scalar and both w1/w2 count joins)
    val uni = Pinned.pin(refToks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
    val gb = refToks
      .select(explode(TF.shinglesOfTokens(col("ts"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
    val nv = uni.agg(
      coalesce(sum(col("c_w")), lit(0L)).as("n"),
      count(lit(1)).as("v")).first()
    val denom = (nv.getAs[Long]("n") + nv.getAs[Long]("v")).toDouble
    // an empty reference slice would make the Laplace term infinite and
    // log(p) non-finite far downstream — fail here with the actual cause
    require(denom > 0, "reference slice is empty: no tokens to estimate the LM from")
    val db = docs
      .select(col("doc_id"),
        explode(TF.shinglesOfTokens(TF.tokens(col("text")), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("k"))
    val parts = split(col("bigram"), " ")
    val ctx = when(col("c_a") > 0,
      col("c_ab").cast("double") / col("c_a")).otherwise(lit(0.0))
    val p = lit(lambda) * ctx +
      lit(1.0 - lambda) * ((col("c_b").cast("double") + 1.0) / lit(denom))
    val lp = StableRound.microsLong(log(p))
    db
      .select(col("doc_id"), col("k"), col("bigram"),
        element_at(parts, 1).as("w1"), element_at(parts, 2).as("w2"))
      .join(gb, Seq("bigram"), "left")
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"), "left")
      .na.fill(0L, Seq("c_ab", "c_a", "c_b"))
      .select(col("doc_id"), col("k"), (col("k") * lp).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"), sum(col("contrib")).as("logprob_micros"))
      .select(col("doc_id"), col("n_bigrams"), col("logprob_micros"),
        (col("logprob_micros").cast("double") / col("n_bigrams")).as("avg_lp_micros"))
      .orderBy(col("doc_id"))
  }

  /** Gated variant (`ref_lm_logprob`): source `src0` plays the trusted
    * reference; every doc is scored. */
  def refFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    refLogProbs(docs, docs.filter(col("source") === "src0"))
  }

  /** The reference-LM scoring chain as prefixed CTEs ending in
    * `${p}agg (doc_id, n_bigrams, logprob_micros, avg_lp_micros)` —
    * single-sourced between [[refOracle]] and the composed curation
    * oracle ([[CurateE2e.lmOracle]]) so the scoring rule cannot drift
    * between the standalone gate and the DAG stage. `refFrom` /
    * `docsFrom` are free-form FROM bodies (relation + optional WHERE). */
  private[operators] def refCtesSql(lambda: Double = 0.75, p: String = "",
                                    refFrom: String = "documents WHERE source = 'src0'",
                                    docsFrom: String = "documents"): String =
    s"""${p}ref AS (
       |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM $refFrom
       |), ${p}uni AS (
       |  SELECT w, COUNT(*) AS c_w FROM ${p}ref, LATERAL unnest(ts) AS u(w) GROUP BY 1
       |), ${p}gb AS (
       |  SELECT ts[i.i] || ' ' || ts[i.i + 1] AS bigram, COUNT(*) AS c_ab
       |  FROM ${p}ref, LATERAL unnest(range(1, len(ts))) AS i(i) GROUP BY 1
       |), ${p}nv AS (
       |  SELECT CAST(COALESCE(SUM(c_w), 0) + COUNT(*) AS DOUBLE) AS denom FROM ${p}uni
       |), ${p}toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM $docsFrom
       |), ${p}db AS (
       |  SELECT doc_id, ts[i.i] || ' ' || ts[i.i + 1] AS bigram, COUNT(*) AS k
       |  FROM ${p}toks, LATERAL unnest(range(1, len(ts))) AS i(i) GROUP BY 1, 2
       |), ${p}lp AS (
       |  SELECT db.doc_id, db.k,
       |         db.k * ${StableRound.microsLongSql(
                  s"LN($lambda * (CASE WHEN COALESCE(ua.c_w, 0) > 0 " +
                  "THEN CAST(COALESCE(g.c_ab, 0) AS DOUBLE) / ua.c_w " +
                  s"ELSE 0.0 END) + ${1.0 - lambda} " +
                  "* ((CAST(COALESCE(ub.c_w, 0) AS DOUBLE) + 1.0) / nv.denom))")} AS contrib
       |  FROM ${p}db db LEFT JOIN ${p}gb g USING (bigram)
       |          LEFT JOIN ${p}uni ua ON ua.w = string_split(db.bigram, ' ')[1]
       |          LEFT JOIN ${p}uni ub ON ub.w = string_split(db.bigram, ' ')[2]
       |          CROSS JOIN ${p}nv nv
       |), ${p}agg AS (
       |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |         CAST(SUM(contrib) AS BIGINT) AS logprob_micros,
       |         CAST(CAST(SUM(contrib) AS BIGINT) AS DOUBLE)
       |           / CAST(SUM(k) AS BIGINT) AS avg_lp_micros
       |  FROM ${p}lp GROUP BY 1
       |)""".stripMargin

  /** DuckDB twin of [[refFromDir]]: reference counts from the same
    * source slice, LEFT joins with COALESCE 0, the same Laplace-floored
    * fixed-order interpolation into one micros-rounded ln. */
  def refOracle(lambda: Double = 0.75): String =
    s"""WITH ${refCtesSql(lambda)}
       |SELECT doc_id, n_bigrams, logprob_micros, avg_lp_micros
       |FROM agg ORDER BY doc_id""".stripMargin

  /** DuckDB twin: same filtered tokenization (single-sourced rule), same
    * bigram windows as the pmi oracle, same fixed-order interpolation
    * into one ln, same micros-then-long-sums, same exact division. λ and
    * 1−λ interpolate as shortest-repr decimal literals — both engines
    * parse them to the identical double. */
  def oracle(lambda: Double = 0.75): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM documents
       |), uni AS (
       |  SELECT w, COUNT(*) AS c_w FROM toks, LATERAL unnest(ts) AS u(w) GROUP BY 1
       |), db AS (
       |  SELECT doc_id, ts[i.i] || ' ' || ts[i.i + 1] AS bigram, COUNT(*) AS k
       |  FROM toks, LATERAL unnest(range(1, len(ts))) AS i(i) GROUP BY 1, 2
       |), gb AS (
       |  SELECT bigram, CAST(SUM(k) AS BIGINT) AS c_ab FROM db GROUP BY 1
       |), n AS (
       |  SELECT CAST(SUM(c_w) AS DOUBLE) AS n FROM uni
       |), lp AS (
       |  SELECT db.doc_id, db.k,
       |         db.k * ${StableRound.microsLongSql(
                  s"LN($lambda * (CAST(g.c_ab AS DOUBLE) / ua.c_w) " +
                  s"+ ${1.0 - lambda} * (CAST(ub.c_w AS DOUBLE) / n.n))")} AS contrib
       |  FROM db JOIN gb g USING (bigram)
       |          JOIN uni ua ON ua.w = string_split(db.bigram, ' ')[1]
       |          JOIN uni ub ON ub.w = string_split(db.bigram, ' ')[2]
       |          CROSS JOIN n
       |), agg AS (
       |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |         CAST(SUM(contrib) AS BIGINT) AS logprob_micros
       |  FROM lp GROUP BY 1
       |)
       |SELECT doc_id, n_bigrams, logprob_micros,
       |       CAST(logprob_micros AS DOUBLE) / n_bigrams AS avg_lp_micros
       |FROM agg ORDER BY doc_id""".stripMargin

  // --------------------------------- CCNet-style perplexity bucketing

  /** CCNet's head/middle/tail split (Wenzek et al. 2019, arXiv:
    * 1911.00359): rank every document by its reference-LM quality and
    * cut the corpus into terciles — `head` (most reference-like) and
    * `middle` are what the pretraining mix keeps; `tail` is the
    * flagged-for-drop slice. The rank is EXACT and distributed: the
    * [[ScalableCumsum]] running count over the (quality desc, doc_id)
    * order — range exchange + broadcast offsets, no single-partition
    * window, the same machinery as `running_revenue`/`corpus_shuffle`
    * (NTILE would plan a global one-partition sort). Bucket index =
    * ⌊(rank−1)·3 / N⌋ — integer math, no percentile-interpolation
    * ambiguity cross-engine. The quality key `avg_lp_micros` is one
    * IEEE division of exactly-representable integers, so its ordering
    * is identical on both engines; ties break on doc_id. */
  def refBuckets(scored: DataFrame): DataFrame = {
    val ranked = ScalableCumsum.withRunningTotal(
      scored.select(col("doc_id"), col("n_bigrams"), col("logprob_micros"),
        col("avg_lp_micros")),
      lit(1L), "rk", negate(col("avg_lp_micros")), col("doc_id"))
    // N from the PINNED ranked frame — counting the raw scored plan would
    // re-run the whole reference-LM scoring DAG a second time
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bidx", expr("((rk - 1) * 3) DIV n"))
      .select(col("doc_id"), col("n_bigrams"), col("logprob_micros"),
        when(col("bidx") === 0, "head")
          .when(col("bidx") === 1, "middle").otherwise("tail").as("bucket"),
        (col("bidx") < 2).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Gated query `ref_lm_buckets`: the bucketing over [[refFromDir]]'s
    * scores (docs with ≥1 bigram — the scored population). */
  def bucketsFromDir(spark: SparkSession, dir: String): DataFrame =
    refBuckets(refFromDir(spark, dir))

  /** The tercile rank over a scored relation carrying `avg_lp_micros` —
    * emits `${p}r (doc_id, n_bigrams, logprob_micros, rk, n)`; the
    * bucket index is `((rk − 1) * 3) // n`. Single-sourced between
    * [[bucketsOracle]] and the composed curation oracle so the cut rule
    * cannot drift. */
  private[operators] def tercileCtesSql(p: String, scored: String): String =
    s"""${p}r AS (
       |  SELECT doc_id, n_bigrams, logprob_micros,
       |         ROW_NUMBER() OVER (ORDER BY avg_lp_micros DESC, doc_id) AS rk,
       |         COUNT(*) OVER () AS n
       |  FROM $scored
       |)""".stripMargin

  /** DuckDB twin: the [[refCtesSql]] scoring chain as the scored
    * relation, one ROW_NUMBER window over the same (quality desc,
    * doc_id) order, the same integer tercile formula. */
  def bucketsOracle(lambda: Double = 0.75): String =
    s"""WITH ${refCtesSql(lambda)},
       |${tercileCtesSql("", "agg")}
       |SELECT doc_id, n_bigrams, logprob_micros,
       |       CASE ((rk - 1) * 3) // n WHEN 0 THEN 'head'
       |            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
       |       ((rk - 1) * 3) // n < 2 AS kept
       |FROM r ORDER BY doc_id""".stripMargin
}
