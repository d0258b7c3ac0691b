package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small operators from SURVEY §2 that are not part of Q1–Q3:
  *   - S5 row-count validation scan (reference dags/pipeline.py:363-367)
  *   - S7 date-predicate snapshot scan (reference dags/pipeline.py:516-520)
  *   - O20/O21 driver-side summary re-aggregation (reference
  *     dags/pipeline.py:573-574,715,751-774)
  */
object MiscOps {

  /** S5: COUNT(*) per registered table, as one small DataFrame.
    * Each count is a partial-aggregated scan; the union is trivial. */
  def rowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.all.map { n =>
      Tables.load(spark, dir, n)
        .agg(count(lit(1)).as("row_count"))
        .select(lit(n).as("table_name"), col("row_count"))
    }.reduce(_.unionAll(_)).orderBy("table_name")

  val s5Oracle: String = Tables.all
    .map(n => s"SELECT '$n' AS table_name, COUNT(*) AS row_count FROM $n")
    .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")

  /** S7: scan with an equality/range date predicate pushed into the source —
    * the Cassandra `snapshot_date = DATE '...'` scan re-expressed over the
    * events table. `.explain` shows the timestamp bounds in PushedFilters. */
  def eventsOnDay(spark: SparkSession, dir: String, day: String = "2024-01-10"): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit(day).cast("date").cast("timestamp") &&
        col("ts") < date_add(lit(day).cast("date"), 1).cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_second"))
      .orderBy("event_id")

  def s7Oracle(day: String = "2024-01-10"): String =
    s"""SELECT event_id, user_id, event_type, value,
       |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_second
       |FROM events
       |WHERE ts >= TIMESTAMP '$day 00:00:00'
       |  AND ts < TIMESTAMP '$day 00:00:00' + INTERVAL 1 DAY
       |ORDER BY event_id""".stripMargin

  /** O20/O21: the cross-stage summary scalars, computed in one aggregate
    * pass instead of the reference's Python loops over fetchall() results. */
  def pipelineSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(
      sum(round(col("l_quantity"), 0).cast("long")).as("total_quantity"),
      count(lit(1)).as("total_lines"),
      count(when(col("l_returnflag") === "R", lit(1))).as("returned_lines"),
      countDistinct(col("l_partkey")).as("distinct_skus"),
      countDistinct(col("l_suppkey")).as("distinct_warehouses"),
      // timestamp max + post-format (primitive agg buffer; see AggregateOrders)
      max(col("l_shipdate")).as("last_ship_ts"))
      .withColumn("last_ship_date", date_format(col("last_ship_ts"), "yyyy-MM-dd"))
      .drop("last_ship_ts")
  }

  val o20Oracle: String =
    """SELECT CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_quantity,
      |       COUNT(*) AS total_lines,
      |       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_lines,
      |       COUNT(DISTINCT l_partkey) AS distinct_skus,
      |       COUNT(DISTINCT l_suppkey) AS distinct_warehouses,
      |       MAX(strftime(l_shipdate, '%Y-%m-%d')) AS last_ship_date
      |FROM lineitem""".stripMargin
}
