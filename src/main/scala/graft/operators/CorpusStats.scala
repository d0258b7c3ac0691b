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

  /** Exact token-count percentiles per source — the length-distribution
    * report that sizes context windows, packing targets, and truncation
    * budgets. PERCENTILE_DISC semantics (the value at rank ⌈p·n/100⌉ of
    * the sorted list) in pure integer arithmetic, so both engines agree
    * bit-for-bit — interpolating percentiles (Spark `percentile`, DuckDB
    * `quantile_cont`) mix doubles whose rounding is engine-specific.
    *
    * Scale: the corpus collapses FIRST to a (source, token_count)
    * HISTOGRAM — partial-aggregated map-side, so the shuffle carries one
    * row per distinct count value per source, not per document. Ranks
    * come from a running sum over that histogram (window over the same
    * hash partitioning — one exchange, reused by the final roll-up). A
    * per-source sort over distinct token counts is bounded by the range
    * of document lengths, never by corpus row count.
    */
  def tokenPercentiles(docs: DataFrame,
                       pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    val bySource = Window.partitionBy(col("source"))
    val hist = docs
      .select(col("source"), TF.tokenCount(col("text")).cast("long").as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val ranked = hist
      .withColumn("hi", sum(col("c")).over(bySource.orderBy(col("tok"))))
      .withColumn("n", sum(col("c")).over(bySource))
      .withColumn("lo", col("hi") - col("c") + 1)
    // the value at rank ⌈p·n/100⌉ is the tok whose [lo, hi] spans it
    def rankOf(p: Int) = expr(s"(n * $p + 99) div 100")
    val pctCols = pcts.map(p =>
      max(when(rankOf(p).between(col("lo"), col("hi")), col("tok"))).as(s"p$p"))
    ranked.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        (min(col("tok")).as("min_tokens") +: pctCols :+
          max(col("tok")).as("max_tokens")): _*)
      .orderBy(col("source"))
  }

  def percentilesFromDir(spark: SparkSession, dir: String): DataFrame =
    tokenPercentiles(Tables.documents(spark, dir))

  /** DuckDB twin of [[tokenPercentiles]]: same histogram → running-sum →
    * rank-span pick, same integer arithmetic (`//` == `div` on
    * positives), token counts through the single-sourced fragment. */
  def percentilesOracle(pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): String = {
    val pctSelects = pcts.map(p =>
      s"       CAST(MAX(CASE WHEN (n * $p + 99) // 100 BETWEEN lo AND hi THEN tok END) AS BIGINT) AS p$p,")
      .mkString("\n")
    s"""WITH t AS (
       |  SELECT source, ${TF.tokenCountSql("text")} AS tok FROM documents
       |), h AS (
       |  SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2
       |), r AS (
       |  SELECT source, tok, c,
       |         SUM(c) OVER (PARTITION BY source ORDER BY tok) AS hi,
       |         SUM(c) OVER (PARTITION BY source) AS n,
       |         SUM(c) OVER (PARTITION BY source ORDER BY tok) - c + 1 AS lo
       |  FROM h
       |)
       |SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
       |       CAST(MIN(tok) AS BIGINT) AS min_tokens,
       |$pctSelects
       |       CAST(MAX(tok) AS BIGINT) AS max_tokens
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

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
