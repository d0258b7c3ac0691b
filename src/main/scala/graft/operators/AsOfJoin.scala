package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join: for each event row, attach the latest snapshot
  * row with the same key and snapshot-time ≤ event-time. Spark has no
  * native asof join; the preference-order answer here is tier (a) —
  * COMPOSE built-ins rather than a custom SparkPlan:
  *
  *   1. union the two sides with a side tag (snapshot sorts before event
  *      at equal timestamps, giving the inclusive `>=` semantics),
  *   2. one window per key ordered by (ts, tag, payload): `last(value,
  *      ignoreNulls)` over unbounded-preceding..current carries the most
  *      recent snapshot value forward onto every event row (the payload
  *      tie-break makes equal-(key,ts) snapshot ties deterministic),
  *   3. keep the event rows.
  *
  * Cost: ONE shuffle on the key (the window partitioning) over
  * |events|+|snapshots| rows — same asymptotics as a sort-merge asof join,
  * with no custom Catalyst surface to maintain. Left semantics: events
  * before the first snapshot keep NULL. Verified against DuckDB's native
  * ASOF LEFT JOIN in the driver oracle.
  */
object AsOfJoin {

  /** Generic compose: `events` asof-left-join `snapshots` on `key`, with
    * event time `eventTs`, snapshot time `snapTs`, attaching `valueCols`
    * from the snapshot side. Column names must not collide. */
  def asofLeft(events: DataFrame, snapshots: DataFrame, key: String,
               eventTs: String, snapTs: String, valueCols: Seq[String]): DataFrame = {
    val eventSide = events
      .withColumn("__ts", col(eventTs))
      .withColumn("__tag", lit(1))
    val snapSide0 = snapshots
      .withColumn("__ts", col(snapTs))
      .withColumn("__tag", lit(0))
    // align schemas: each side gets the other's columns as NULLs
    val eventCols = events.columns.toSeq
    val allCols = (eventCols ++ valueCols).distinct
    def aligned(df: DataFrame, have: Set[String]): DataFrame =
      df.select((allCols.map(c =>
        if (have(c)) col(c) else lit(null).as(c)) :+ col("__ts") :+ col("__tag")): _*)
    val unioned = aligned(eventSide, eventCols.toSet)
      .unionByName(aligned(snapSide0, (Seq(key) ++ valueCols).toSet))
      // the value columns travel as ONE struct so every event receives all
      // fields from the SAME (latest) snapshot row — per-column carries
      // would stitch values from different snapshots whenever a field is
      // NULL
      .withColumn("__snapval",
        when(col("__tag") === 0, struct(valueCols.map(col).toIndexedSeq: _*)))
    // final tie-break on the snapshot payload itself: two snapshots with
    // EQUAL (key, ts) would otherwise tie in the window order and the
    // carried row would be run-dependent (partition-layout-dependent).
    // Ordering by the struct makes the field-wise LARGEST payload win,
    // deterministically, with no schema requirements beyond orderable value
    // columns. Event rows carry NULL here and are already separated by
    // __tag, so the extra key never reorders events vs snapshots.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc, col("__snapval").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__snap", last(col("__snapval"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col(s"__snap.$c"))
    }.filter(col("__tag") === 1).drop("__ts", "__tag", "__snap", "__snapval")
  }

  /** Gated query: each lineitem gets the AS-OF yearly minimum unit price of
    * its part (snapshot table = per-(part, year) min price, derived from
    * lineitem itself — both engines derive it identically). */
  def yearlyPriceAsOf(lineitem: DataFrame): DataFrame = {
    val snaps = lineitem
      .groupBy(col("l_partkey").as("s_partkey"),
        date_trunc("year", col("l_shipdate")).as("s_ts"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("asof_price"))
      .withColumnRenamed("s_partkey", "l_partkey")
    val events = lineitem.select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_shipdate"))
    asofLeft(events, snaps, key = "l_partkey",
      eventTs = "l_shipdate", snapTs = "s_ts", valueCols = Seq("asof_price"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("asof_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    yearlyPriceAsOf(Tables.lineitem(spark, dir))

  val oracle: String =
    """WITH snaps AS (
      |  SELECT l_partkey AS s_partkey, date_trunc('year', l_shipdate) AS s_ts,
      |         MIN(l_extendedprice / l_quantity) AS asof_price
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT e.l_orderkey, e.l_linenumber, e.l_partkey,
      |       strftime(e.l_shipdate, '%Y-%m-%d') AS ship_date,
      |       s.asof_price
      |FROM lineitem e
      |ASOF LEFT JOIN snaps s
      |  ON e.l_partkey = s.s_partkey AND e.l_shipdate >= s.s_ts
      |ORDER BY e.l_orderkey, e.l_linenumber""".stripMargin
}
