package graft.operators

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite training-corpus cleaning pipeline as ONE declarative plan:
  *
  *   1. quality gate   — drop documents below a quality-score threshold,
  *   2. exact dedup    — keep the min-doc_id canonical per distinct text,
  *   3. near-dup prune — among survivors, drop the higher id of every
  *                       n-gram-Jaccard pair over the threshold.
  *
  * Output: the surviving doc ids with their quality score — what a
  * pretraining-data curator ships downstream. The stages compose from the
  * already-verified operators; the quality expressions fuse into the scan,
  * and the dedup group-by and the shingle join only ever see quality
  * survivors (the filter sits below both). The `canonical` survivor table
  * is pinned once: it feeds BOTH the near-dup branch (via the shingle stage
  * ngramJaccardPairs pins internally) and the final anti-join, so the raw
  * corpus is scanned and quality-scored exactly once per run.
  */
object CorpusClean {

  def apply(docs: DataFrame, qualityMin: Double = 0.5, n: Int = 5,
            jaccardThreshold: Double = 0.5): DataFrame = {
    val scored = docs
      .withColumn("quality_score", TF.qualityScore(col("text")))
      .filter(col("quality_score") >= qualityMin)
    val canonical = Dedup.pinned(scored
      .groupBy(col("text"))
      // min, not first: the score is a function of the group key (text), so
      // any pick is equal — min makes the determinism explicit in the plan
      .agg(min(col("doc_id")).as("doc_id"), min(col("quality_score")).as("quality_score")))
    val nearDupLosers = Dedup
      .ngramJaccardPairs(canonical.select(col("doc_id"), col("text")), n, jaccardThreshold)
      .select(col("id2").as("doc_id")).distinct()
    canonical
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    apply(Tables.documents(spark, dir))

  def oracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5): String =
    s"""WITH ${cleanedCtesSql("documents", qualityMin, n, thr)}
       |SELECT doc_id, quality_score FROM cleaned
       |ORDER BY doc_id""".stripMargin

  /** Shared DuckDB CTE fragment: the full cleaning chain over `relation`,
    * defining `cleaned (doc_id, text, quality_score)` (plus its
    * intermediate CTEs `scored`/`surviving`/`canon`/`losers` and an
    * unprefixed [[Dedup.shingleCtesSql]] instantiation). Used by
    * [[oracle]] AND CurateE2e's composed pipeline, so the cleaning rules
    * are written once. */
  def cleanedCtesSql(relation: String, qualityMin: Double = 0.5,
                     n: Int = 5, thr: Double = 0.5): String =
    s"""scored AS (
       |  SELECT doc_id, text,
       |         ${TF.qualityScoreSql("text")} AS quality_score
       |  FROM $relation
       |), surviving AS (
       |  SELECT * FROM scored WHERE quality_score >= $qualityMin
       |), canon AS (
       |  SELECT MIN(doc_id) AS doc_id, text,
       |         MIN(quality_score) AS quality_score
       |  FROM surviving GROUP BY text
       |), ${Dedup.shingleCtesSql("canon", n)},
       |losers AS (
       |  SELECT DISTINCT p.id2 AS doc_id FROM inter p
       |  JOIN card ca ON p.id1 = ca.doc_id
       |  JOIN card cb ON p.id2 = cb.doc_id
       |  WHERE CAST(p.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.n_common) >= $thr
       |),
       |cleaned AS MATERIALIZED (
       |  SELECT c.doc_id, c.text, c.quality_score FROM canon c
       |  LEFT JOIN losers l ON c.doc_id = l.doc_id
       |  WHERE l.doc_id IS NULL
       |)""".stripMargin
}
