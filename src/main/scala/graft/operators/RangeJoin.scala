package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — `point BETWEEN start AND end` —
  * via BIN BUCKETING. Spark has no native range-join operator: a raw
  * range predicate plans as BroadcastNestedLoopJoin (O(points ×
  * intervals) comparisons), which is fine for a handful of intervals and
  * fatal for many. Binning turns it into a hash equi-join:
  *
  *   - every point keys on its time bin `floor(ts / bin)`;
  *   - every interval explodes to the bins it covers (an interval
  *     spanning k bins emits k rows — choose `binSeconds` near the
  *     median interval length so k stays small);
  *   - the join is a plain shuffled/broadcast HASH join on the bin key,
  *     with the exact BETWEEN re-checked after.
  *
  * Each point falls in exactly ONE bin, so a (point, interval) match is
  * produced exactly once — no post-join distinct. This is the standard
  * interval-bucketing trick (e.g. Databricks' range-join optimization,
  * genomics interval joins) expressed with builtin operators. */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` containing its
    * `ts` (inclusive start, exclusive end). `intervals` must carry
    * `start`/`end` timestamp columns, which appear in the output as
    * `interval_start`/`interval_end` — so a points side with its own
    * start/end columns (sessions vs outages, etc.) never produces an
    * ambiguous result frame; all other columns pass through. */
  def joinPointsToIntervals(points: DataFrame, ts: Column, intervals: DataFrame,
                            binSeconds: Long = 3600L): DataFrame = {
    val reserved = Seq("__bin", "interval_start", "interval_end")
    require(reserved.forall(r => !points.columns.contains(r)),
      s"columns ${reserved.mkString("/")} are reserved by the range join")
    val p = points.withColumn("__bin", floor(ts.cast("long") / binSeconds))
    // drop degenerate intervals BEFORE the bin explode: Spark's
    // sequence(a, b) with b < a yields a DESCENDING sequence, which would
    // fabricate bins (and join rows) for an end-before-start interval
    val iv = intervals.filter(col("end") >= col("start"))
      .withColumnRenamed("start", "interval_start")
      .withColumnRenamed("end", "interval_end")
      .withColumn("__bin",
        explode(sequence(floor(col("interval_start").cast("long") / binSeconds),
          floor(col("interval_end").cast("long") / binSeconds))))
    p.join(iv, Seq("__bin"))
      .filter(ts >= col("interval_start") && ts < col("interval_end"))
      .drop("__bin")
  }

  /** Gated query: per event type, the 2-hour window opening at its first
    * event; count ALL events (any type) landing in each window. */
  def eventsInTypeWindows(events: DataFrame): DataFrame = {
    val windows = events.groupBy(col("event_type").as("window_type"))
      .agg(min(col("ts")).as("start"))
      .withColumn("end", col("start") + expr("INTERVAL 2 HOURS"))
    joinPointsToIntervals(events.select(col("ts")), col("ts"), broadcast(windows))
      .groupBy(col("window_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_type"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    eventsInTypeWindows(Tables.events(spark, dir))

  val oracle: String =
    """WITH iv AS (
      |  SELECT event_type AS window_type, MIN(ts) AS s FROM events GROUP BY 1
      |), iv2 AS (SELECT window_type, s, s + INTERVAL 2 HOUR AS e FROM iv)
      |SELECT window_type, COUNT(*) AS n_events
      |FROM events ev JOIN iv2 ON ev.ts >= iv2.s AND ev.ts < iv2.e
      |GROUP BY window_type ORDER BY window_type""".stripMargin
}
