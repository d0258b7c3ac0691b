package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF with per-document top-k terms — the classic relevance
  * signal a retrieval/curation pipeline derives from a corpus (keyword
  * extraction, near-topic filtering, BM25's core statistic).
  *
  * Shape at scale (the plan, not just the math):
  *   - term frequencies: explode → ONE partial-aggregated shuffle on
  *     (doc_id, term) — map-side combine collapses each task's repeats
  *     before anything moves;
  *   - document frequencies: distinct (doc, term) pairs re-aggregated on
  *     term — the result is VOCABULARY-sized, orders of magnitude under
  *     the corpus, and joins back via broadcast/AQE (never a fact-fact
  *     shuffle);
  *   - the corpus size N rides a broadcast single-row aggregate (no
  *     driver collect inside the plan);
  *   - top-k per doc plans as `WindowGroupLimit` — partial top-k before
  *     the rank exchange, the same shape as shipping_priority/source_quota.
  *
  * Cross-engine exactness: idf = ln((N+1)/(df+1)) + 1 is rounded to 9 dp
  * (floor-form) BEFORE the tf multiply — `Math.log` and DuckDB's `ln` are
  * both platform libm and may differ in the last ulp; rounding first makes
  * the multiplied score bit-identical on both engines, so the rank order
  * (score desc, term asc) cannot diverge on a last-ulp tie. The surface
  * rounds the score to 6 dp.
  */
object TfIdf {

  def topTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df derives from tf — one row per distinct (doc, term) already — NOT
    // from a second scan+explode+distinct of the corpus (Spark does not
    // dedupe common subplans; the naive form reads everything twice)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("term"), StableRound.stableRound(
        log((col("n") + 1).cast("double") / (col("df") + 1)) + 1.0, 9).as("idf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(idf, Seq("term"))
      .withColumn("score", col("tf").cast("double") * col("idf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        StableRound.stableRound(col("score"), 6).as("score_r"))
      .orderBy(col("doc_id"), col("rank"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    topTerms(Tables.documents(spark, dir))

  /** DuckDB twin: same token rule as every other text oracle, same
    * 9-dp-rounded idf before the multiply, same (score desc, term asc)
    * rank order. */
  def oracle(k: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
       |), df AS (
       |  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
       |  GROUP BY term
       |), n AS (
       |  SELECT COUNT(*) AS n FROM documents
       |), idf AS (
       |  SELECT term,
       |         FLOOR((ln(CAST(n.n + 1 AS DOUBLE) / (df.df + 1)) + 1.0) * 1e9 + 0.5) / 1e9 AS idf
       |  FROM df, n
       |), ranked AS (
       |  SELECT tf.doc_id, tf.term, CAST(tf.tf AS DOUBLE) * idf.idf AS score,
       |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |                            ORDER BY CAST(tf.tf AS DOUBLE) * idf.idf DESC, tf.term ASC) AS rank
       |  FROM tf JOIN idf ON tf.term = idf.term
       |)
       |SELECT doc_id, rank, term,
       |       FLOOR(score * 1e6 + 0.5) / 1e6 AS score_r
       |FROM ranked WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin
}
