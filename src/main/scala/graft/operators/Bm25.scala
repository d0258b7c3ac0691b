package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 document retrieval — the ranked-search primitive a curation
  * pipeline runs for decontamination probes ("which training docs look
  * like this eval set"), targeted quality audits, and topic pulls.
  * Okapi BM25 (k1, b), Lucene-style idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Shape at scale (the TfIdf stages, one query-sized join more):
  *   - ONE corpus tokenize → partial-aggregated (doc_id, term) tf shuffle;
  *     per-doc length dl = SUM(tf) re-aggregates the SAME stage (no second
  *     scan), df re-aggregates it to vocabulary size;
  *   - corpus constants (N, total token mass → avgdl) ride a broadcast
  *     single-row aggregate;
  *   - the query is a handful of terms: scoring joins the tf stage against
  *     a term list that is driver-sized BY DEFINITION (the O(K) collect
  *     pattern adjudicated for IVF centroids/prototypes), so only docs
  *     containing a query term are ever scored;
  *   - global top-k plans as TakeOrderedAndProject (per-partition heaps,
  *     driver merges p·k rows — no global sort).
  *
  * Cross-engine exactness: idf is 9-dp-rounded BEFORE use (libm ln may
  * differ in the last ulp); each per-term score is a fixed-order IEEE
  * expression over exact integers and the rounded idf, rounded to micros
  * and summed as LONGS per doc (float SUMS are addition-order-dependent
  * and can never hash-match an oracle — the UnigramLm discipline). The
  * gate's query terms are data-derived deterministically (top-df terms,
  * ties to the lexicographically smaller), so both engines select the
  * identical query.
  */
object Bm25 {

  /** The pinned (doc_id, term, tf) stage — ONE corpus tokenize feeding
    * the dl/df re-aggregates and the scoring join (Spark does not dedupe
    * common subplans; unpinned, the executed plan re-ran the tokenize +
    * tf shuffle per branch — observed in the round-10 plan audit).
    * Released by the harness's per-query [[Dedup.releasePinned]]. */
  private[operators] def tfStage(docs: DataFrame): DataFrame =
    Pinned.pin(docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))

  /** Top-k docs for `queryTerms` by BM25, as (doc_id, bm25_micros). */
  def topDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
              k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topDocsWithTf(docs, tfStage(docs), queryTerms, k, k1, b)

  private def topDocsWithTf(docs: DataFrame, tf: DataFrame,
                            queryTerms: Seq[String], k: Int,
                            k1: Double, b: Double): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N counts ALL docs (the retrieval universe); avgdl = token mass / N.
    // Both are one broadcast row; the division is IEEE over exact longs.
    val consts = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum(col("dl")).as("mass")))
    val qt = df.filter(col("term").isin(queryTerms: _*))
    scoreTail(tf.filter(col("term").isin(queryTerms: _*)), dl, qt, consts,
      k, k1, b)
  }

  /** The shared scoring tail: query-term tf rows ⋈ idf ⋈ dl → micros →
    * per-doc long sums → top-k. Single-sourced between the in-memory path
    * and [[Bm25Index.probe]] so the score math cannot drift from the
    * oracle. `qt` is (term, df); `consts` one (n, mass) row. */
  private[operators] def scoreTail(tfSlice: DataFrame, dl: DataFrame,
                                   qt: DataFrame, consts: DataFrame, k: Int,
                                   k1: Double, b: Double): DataFrame =
    scoredRows(tfSlice, dl, qt, consts, k1, b)
      .groupBy(col("doc_id")).agg(sum(col("micros")).as("bm25_micros"))
      .orderBy(col("bm25_micros").desc, col("doc_id").asc)
      .limit(k)

  /** Per-(doc_id, term) micros-rounded BM25 term scores — the shared
    * scoring core behind [[scoreTail]] and [[HybridRetrieval]]'s
    * per-query aggregation (which needs term kept to map scores back to
    * the query docs containing that term). */
  private[operators] def scoredRows(tfSlice: DataFrame, dl: DataFrame,
                                    qt: DataFrame, consts: DataFrame,
                                    k1: Double, b: Double): DataFrame = {
    val idf = qt.crossJoin(broadcast(consts))
      .select(col("term"),
        StableRound.stableRound(
          log(lit(1.0) + ((col("n") - col("df")).cast("double") + 0.5)
            / (col("df").cast("double") + 0.5)), 9).as("idf"),
        (col("mass") / col("n")).as("avgdl"))
    // fixed-order per-term score, micros-rounded before the per-doc sum
    val termScore = col("idf") * ((col("tf").cast("double") * lit(k1 + 1.0))
      / (col("tf").cast("double")
        + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
    tfSlice.join(idf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"), col("term"),
        floor(termScore * 1e6 + 0.5).cast("long").as("micros"))
  }

  /** Gate: query = the corpus's `numQueryTerms` highest-df terms (df desc,
    * term asc — both engines select the identical set), k top docs. */
  def fromDir(spark: SparkSession, dir: String,
              numQueryTerms: Int = 3, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = tfStage(docs)
    // O(numQueryTerms) driver values — the adjudicated small-collect
    // pattern; df derives from the SAME pinned tf stage the scoring reads
    val queryTerms = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(numQueryTerms).collect().map(_.getString(0)).toSeq
    topDocsWithTf(docs, tf, queryTerms, k, k1 = 1.2, b = 0.75)
  }

  /** The tokenize→tf→dl→df→consts CTE prefix every BM25 twin shares —
    * single-sourced so [[oracle]] and [[HybridRetrieval.oracle]] cannot
    * drift on the token rule or the corpus constants. The parameterized
    * form lets the deletion gate score a FILTERED corpus under the
    * identical rules. */
  private[operators] def coreCtesSqlFor(relation: String): String =
    s"""toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
       |  FROM $relation
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
       |), dl AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
       |), df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
       |), consts AS (
       |  SELECT (SELECT COUNT(*) FROM $relation) AS n,
       |         (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS mass
       |)""".stripMargin

  private[operators] val coreCtesSql: String = coreCtesSqlFor("documents")

  /** The 9-dp idf + fixed-order per-term score SQL fragment shared with
    * the hybrid twin. `qtRel` must provide (term, df). */
  private[operators] def scoreCtesSql(qtRel: String, k1: Double, b: Double): String =
    s"""idf AS (
       |  SELECT term,
       |         FLOOR(ln(1.0 + (CAST(n - df AS DOUBLE) + 0.5)
       |                        / (CAST(df AS DOUBLE) + 0.5)) * 1e9 + 0.5) / 1e9 AS idf,
       |         CAST(mass AS DOUBLE) / n AS avgdl
       |  FROM $qtRel, consts
       |), scored AS (
       |  SELECT tf.doc_id, tf.term,
       |         CAST(FLOOR(idf.idf * ((CAST(tf.tf AS DOUBLE) * ${k1 + 1.0})
       |             / (CAST(tf.tf AS DOUBLE)
       |                + $k1 * ((${1.0 - b}) + $b * (CAST(dl.dl AS DOUBLE) / idf.avgdl))))
       |           * 1e6 + 0.5) AS BIGINT) AS micros
       |  FROM tf JOIN idf ON tf.term = idf.term
       |          JOIN dl ON tf.doc_id = dl.doc_id
       |)""".stripMargin

  /** DuckDB twin: same token rule, same deterministic query-term
    * selection, same 9-dp idf, same fixed-order score expression, same
    * micros rounding and long sums, same (score desc, doc_id asc) cut. */
  def oracle(numQueryTerms: Int = 3, k: Int = 20,
             k1: Double = 1.2, b: Double = 0.75,
             relation: String = "documents", extraCtes: String = ""): String =
    s"""WITH $extraCtes${coreCtesSqlFor(relation)}, qt AS (
       |  SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT $numQueryTerms
       |), ${scoreCtesSql("qt", k1, b)}
       |SELECT doc_id, CAST(SUM(micros) AS BIGINT) AS bm25_micros
       |FROM scored GROUP BY doc_id
       |ORDER BY bm25_micros DESC, doc_id ASC LIMIT $k""".stripMargin
}
