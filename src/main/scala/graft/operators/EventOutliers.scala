package graft.operators

import graft.functions.StableRound
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-type event-value outliers — the monitoring query behind data-quality
  * alerts: events whose value sits more than k population standard
  * deviations from their type's mean (telemetry spikes, billing anomalies,
  * sensor glitches).
  *
  * The z-score test runs in EXACT integer arithmetic: with vμ the 6-dp
  * micros of value, S = Σvμ, Q = Σvμ², the flag |v−mean| > k·σ is
  * equivalent (multiply both sides by n²) to
  *
  *     (n·vμ − S)²  >  k² · (n·Q − S²)
  *
  * — no sqrt, no division, no doubles, so Spark and DuckDB agree
  * bit-for-bit even at the flag boundary (a rounded z-score would flip
  * across engines on last-ulp ties). Squares ride in DECIMAL(38,0)
  * (DuckDB: HUGEINT), good to ~10⁹ rows per type at |value| ≤ 10³; the
  * bound is ENFORCED from the stats aggregate (assert_true per type):
  * exceeding it fails the job loudly instead of NULL-unflagging the very
  * outliers the query exists to catch. Past the bound, rescale
  * micros→millis or split the sum.
  *
  * Scale: one partial-aggregated shuffle for the per-type stats (5 rows
  * per type per task), then the stats BROADCAST back against the event
  * scan — the corpus-sized side never reshuffles, and the filter runs
  * scan-fused. This is the canonical two-pass pattern for any
  * aggregate-then-compare operator.
  */
object EventOutliers {

  def outliers(events: DataFrame, sigmas: Int = 3): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val dec = "decimal(38,0)"
    val e = events.select(col("event_id"), col("event_type"), col("value"),
      StableRound.microsLong(col("value")).as("vm"))
    val stats0 = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("vm")).as("s"),
      sum(col("vm").cast(dec) * col("vm").cast(dec)).as("q"),
      max(abs(col("vm"))).as("vmax"))
    // HEADROOM ENFORCED, not just documented: under the non-ANSI session a
    // DECIMAL(38,0) overflow NULLs the comparison and silently UNFLAGS
    // exactly the extreme rows this query exists to catch (DuckDB's
    // HUGEINT raises instead — the engines would diverge). |n·vμ − S| ≤
    // 2·n·max|vμ|, so 2·n·max|vμ| < 10¹⁹ bounds the square (and n·Q ≤
    // (n·max|vμ|)² bounds the rhs) inside 38 digits. assert_true rides
    // the per-type stats rows — zero extra scans, thrown loudly at run
    // time; the isNull filter keeps the assertion referenced through
    // column pruning.
    val headroom = lit(new java.math.BigDecimal("10000000000000000000")) // 10^19
    val stats = stats0.filter(assert_true(
      col("n").cast(dec) * col("vmax") * 2 < headroom,
      lit("event_outliers: n·max|value| exceeds exact-arithmetic headroom — " +
        "rescale micros to millis or split the sum")).isNull)
      .drop("vmax")
    // n promotes to decimal BEFORE the multiply: long n·vμ would overflow
    // first, at ~10⁹ rows per type
    val lhsRoot = (col("n").cast(dec) * col("vm") - col("s")).cast(dec)
    val rhs = (col("n").cast(dec) * col("q") - col("s").cast(dec) * col("s").cast(dec))
    e.join(broadcast(stats), Seq("event_type"))
      .filter(lhsRoot * lhsRoot > rhs * lit(sigmas * sigmas))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    outliers(Tables.events(spark, dir))

  /** DuckDB twin: identical integer test in HUGEINT (128-bit, same
    * headroom as the Spark side's DECIMAL(38,0)). */
  def oracle(sigmas: Int = 3): String =
    s"""WITH e AS (
       |  SELECT event_id, event_type, value,
       |         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vm
       |  FROM events
       |), st AS (
       |  SELECT event_type, COUNT(*) AS n,
       |         SUM(CAST(vm AS HUGEINT)) AS s,
       |         SUM(CAST(vm AS HUGEINT) * vm) AS q
       |  FROM e GROUP BY 1
       |)
       |SELECT event_id, event_type, value
       |FROM e JOIN st USING (event_type)
       |WHERE (n * CAST(vm AS HUGEINT) - s) * (n * CAST(vm AS HUGEINT) - s)
       |      > (n * q - s * s) * ${sigmas * sigmas}
       |ORDER BY event_id""".stripMargin
}
