package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus composition dashboard: per (source, lang) stats with ROLLUP
  * subtotals and a grand total — the first thing anyone asks of a corpus
  * ("how much of what, from where, how good"), and the one relational
  * surface (grouping-set aggregation) the engine didn't exercise yet.
  *
  * Exactness across engines by construction: counts and char totals are
  * integer; quality enters as exact 6-dp MICROS (the rounded score × 1e6
  * recovered as a BIGINT) so the per-group sum is order-independent, and
  * the average divides exact integers in one fixed operation order. The
  * rollup NULL markers are coalesced to '<all>' (source/lang are never
  * null in data, so the sentinel is unambiguous).
  *
  * Scale: one partial-aggregated shuffle; Spark expands grouping sets
  * map-side, so the shuffle carries |sources|×|langs| + |sources| + 1
  * group rows per task — dashboard-sized at any corpus size.
  */
object CorpusStats {

  def rollupStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"),
        length(col("text")).cast("long").as("chars"),
        StableRound.microsLong(TF.qualityScore(col("text"))).as("qmicros"))
      .rollup(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        min(col("chars")).as("min_chars"),
        max(col("chars")).as("max_chars"),
        StableRound.stableRound(
          sum(col("qmicros")).cast("double") / 1e6 / count(lit(1)), 6)
          .as("avg_quality"))
      .select(
        coalesce(col("source"), lit("<all>")).as("source"),
        coalesce(col("lang"), lit("<all>")).as("lang"),
        col("n_docs"), col("total_chars"), col("min_chars"),
        col("max_chars"), col("avg_quality"))
      .orderBy(col("source"), col("lang"))

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    rollupStats(Tables.documents(spark, dir))

  /** DuckDB twin: same ROLLUP grouping sets, same exact-integer quality
    * micros (single-sourced quality fragment), BIGINT casts kill HUGEINT
    * on every summed surface. */
  val oracle: String =
    s"""WITH t AS (
       |  SELECT source, lang, LENGTH(text) AS chars,
       |         CAST(FLOOR((${TF.qualityScoreSql("text")}) * 1e6 + 0.5) AS BIGINT) AS qmicros
       |  FROM documents
       |)
       |SELECT COALESCE(source, '<all>') AS source,
       |       COALESCE(lang, '<all>') AS lang,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(chars) AS BIGINT) AS total_chars,
       |       CAST(MIN(chars) AS BIGINT) AS min_chars,
       |       CAST(MAX(chars) AS BIGINT) AS max_chars,
       |       FLOOR(CAST(SUM(qmicros) AS DOUBLE) / 1e6 / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_quality
       |FROM t GROUP BY ROLLUP(source, lang)
       |ORDER BY 1, 2""".stripMargin
}
