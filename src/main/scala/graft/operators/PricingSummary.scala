package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Headline scan-heavy aggregation in the classic pricing-summary shape:
  * one pass over the full fact table, grouped on two low-cardinality
  * columns, computing additive and average measures. This is the
  * throughput yardstick — it touches every lineitem row and is bounded by
  * scan + partial-aggregation speed, not join or shuffle width.
  *
  * Order-dependent double sums would not hash-match across engines, and
  * even double→DECIMAL casts differ at the last ulp (Spark converts via
  * the shortest decimal string, DuckDB via binary scaling). So the money
  * columns are reduced to EXACT INTEGER units first — prices in cents,
  * discount/tax in percent (all are 2-dp values; ROUND kills the float
  * error before the integer cast) — summed as BIGINT, and scaled back to
  * double once at the surface. Bit-identical on both engines by
  * construction.
  */
object PricingSummary {

  def apply(lineitem: DataFrame): DataFrame = {
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val discPct = round(col("l_discount") * 100, 0).cast("long")
    val taxPct = round(col("l_tax") * 100, 0).cast("long")
    // per-row integer terms are exact in Long (≤ ~2^41); the SUMs run over
    // DECIMAL(38,0) so a group of ~1e9+ rows cannot silently wrap Long —
    // DuckDB's SUM(BIGINT) promotes to HUGEINT, so decimal summation is
    // also what keeps the two engines identical at any scale
    import org.apache.spark.sql.types.DecimalType
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // ROUND before the cast: Spark double→long truncates, DuckDB's
        // CAST rounds — only integral quantities would agree without it
        sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
        sum(cents.cast(DecimalType(38, 0))).as("sum_base_c"),
        sum((cents * (lit(100L) - discPct)).cast(DecimalType(38, 0))).as("sum_disc_c"),
        sum((cents * (lit(100L) - discPct) * (lit(100L) + taxPct))
          .cast(DecimalType(38, 0))).as("sum_charge_c"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("sum_base_c").cast("double") / 1e2).as("sum_base_price"),
        (col("sum_disc_c").cast("double") / 1e4).as("sum_disc_price"),
        (col("sum_charge_c").cast("double") / 1e6).as("sum_charge"),
        (col("sum_qty").cast("double") / col("count_order")).as("avg_qty"),
        (col("sum_base_c").cast("double") / 1e2 / col("count_order")).as("avg_price"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    apply(Tables.lineitem(spark, dir))

  val oracle: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
      |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
      |         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS dpct,
      |         CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tpct
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(qty) AS BIGINT) AS sum_qty,
      |       CAST(SUM(cents) AS DOUBLE) / 1e2 AS sum_base_price,
      |       CAST(SUM(cents * (100 - dpct)) AS DOUBLE) / 1e4 AS sum_disc_price,
      |       CAST(SUM(cents * (100 - dpct) * (100 + tpct)) AS DOUBLE) / 1e6 AS sum_charge,
      |       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       CAST(SUM(cents) AS DOUBLE) / 1e2 / COUNT(*) AS avg_price,
      |       COUNT(*) AS count_order
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
