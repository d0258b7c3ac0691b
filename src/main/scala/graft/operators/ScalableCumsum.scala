package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total — the [[ScalableIds]] offsets pattern
  * generalized from row counts to an arbitrary long-valued column.
  *
  * A global cumulative sum is the classic "looks inherently sequential"
  * operator; the naive Spark translation (`sum().over(Window.orderBy(...))`
  * with no partitioning) funnels every row through ONE task. This variant
  * keeps it distributed:
  *
  *   1. range-repartition + sort within partitions by the sort key (total
  *      order across partition index),
  *   2. per-partition value sums — O(#partitions) longs — collected to the
  *      driver (the sorted stage is pinned so this pass and the output pass
  *      share one computation),
  *   3. within-partition running sums via a window PARTITIONED by the
  *      physical partition id (parallel across partitions, state bounded by
  *      one partition), plus the partition's broadcast cumulative offset.
  *
  * Precondition: `sortKeys` must be a TOTAL order — with ties, the
  * within-partition running sum is order-ambiguous for the tied rows.
  * Caller releases the pinned stage via [[Pinned.release]] after the
  * consuming action. */
object ScalableCumsum {

  /** Adds `totalName` = running total of `valueCol` (inclusive of the
    * current row) in `sortKeys` order. NULL values count as 0 — both the
    * per-partition sums and the window sums would otherwise silently skip
    * them, giving rows a total that excludes their own contribution. */
  def withRunningTotal(df: DataFrame, valueCol: Column, totalName: String,
                       sortKeys: Column*): DataFrame = {
    val sorted = Pinned.pin(
      df.withColumn("__v", coalesce(valueCol.cast("long"), lit(0L)))
        .repartitionByRange(sortKeys: _*)
        .sortWithinPartitions(sortKeys: _*)
        .withColumn("__pid", spark_partition_id().cast("long")))
    val offsetsDf = ScalableIds.cumulativeOffsets(
      sorted.groupBy(col("__pid")).agg(sum(col("__v")).as("__s")))
    val w = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn(totalName, sum(col("__v")).over(w) + col("__offset"))
      .drop("__pid", "__v", "__offset")
  }

  /** Gated query: running revenue over orders in (o_orderdate, o_orderkey)
    * order — a distributed global prefix sum with NO single-partition
    * window stage. Revenue accumulates in exact integer micros (the
    * running-total machinery is long-valued by design); the surface is
    * DOUBLE, the timestamp is formatted so the driver hash-compares
    * strings. o_orderkey is unique, so the sort key is the total order the
    * machinery requires. */
  def runningRevenueFromDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
      .withColumn("__micros", graft.functions.StableRound.microsLong(col("o_totalprice")))
    withRunningTotal(orders, col("__micros"), "__running",
      col("o_orderdate"), col("o_orderkey"))
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("order_ts"),
        col("o_totalprice"),
        (col("__running").cast("double") / 1e6).as("running_revenue"))
      .orderBy(col("order_ts"), col("o_orderkey"))
  }

  /** DuckDB twin: the same micro-exact prefix sum as one window — what the
    * distributed path must equal. */
  val runningRevenueOracle: String =
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS order_ts,
      |       o_totalprice,
      |       CAST(SUM(CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT))
      |              OVER (ORDER BY o_orderdate, o_orderkey
      |                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6 AS running_revenue
      |FROM orders ORDER BY order_ts, o_orderkey""".stripMargin
}
