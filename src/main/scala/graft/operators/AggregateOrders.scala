package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q1 of the reference — "aggregate_orders" (reference dags/pipeline.py:408-426):
  * fact ⋈ two dimension tables on casted keys, 8-column hash aggregate with
  * SUM/COUNT/MAX, global sort descending.
  *
  * Re-expressed over the test corpus: `lineitem` is the daily order fact,
  * `part` plays products, `supplier` plays warehouses. Operator coverage:
  * O1 (projection/alias), O2 (cast in expression), O3 (inner equi-join
  * fact→dim), O7 (hash aggregate, multi-col grouping), O8 (SUM of cast,
  * COUNT(*), lexicographic MAX over ISO date strings — reference
  * pipeline.py:418-420), O11 (global sort DESC with deterministic
  * tie-breaks per SURVEY §2.4(3)).
  *
  * Scale design: both dims are broadcast (part/supplier are KB-scale even at
  * SF100k; the fact side never shuffles for the join). The aggregate is a
  * two-phase HashAggregate (map-side partial + final), so the only shuffle
  * is on the 5 grouping keys, already reduced by partial aggregation. The
  * global sort is a range-partitioned exchange over the ~|part|×|supplier|
  * grouped rows — small relative to the fact input at any SF.
  */
object AggregateOrders {

  def apply(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy(
        col("p_partkey"), col("p_name"), col("p_brand"),
        col("s_suppkey"), col("s_name"))
      .agg(
        // integer-quantity SUM (the reference's SUM(CAST(quantity AS
        // BIGINT)), pipeline.py:418); ROUND precedes the cast because
        // Spark's double→long truncates while DuckDB's CAST rounds —
        // identical only for integral quantities without it
        sum(round(col("l_quantity"), 0).cast("long")).as("total_quantity"),
        count(lit(1)).as("order_count"),
        // MAX over the fixed-width timestamp, formatted AFTER the aggregate:
        // value-identical to the reference's lexicographic string max for
        // ISO dates (SURVEY §2.4(6)), but keeps the aggregation buffer
        // primitive — a string-buffered max forces SortAggregate (sorts the
        // whole fact table per group key) instead of HashAggregate
        max(col("l_shipdate")).as("last_ship_ts"))
      .withColumn("last_order_date", date_format(col("last_ship_ts"), "yyyy-MM-dd"))
      .select(
        col("p_partkey").as("sku_id"),
        col("p_name").as("product_name"),
        col("p_brand").as("category"),
        col("s_suppkey").as("warehouse_id"),
        col("s_name").as("warehouse_name"),
        col("total_quantity"), col("order_count"), col("last_order_date"))
      .orderBy(col("total_quantity").desc, col("sku_id"), col("warehouse_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    apply(Tables.lineitem(spark, dir), Tables.part(spark, dir), Tables.supplier(spark, dir))

  /** DuckDB-equivalent SQL over the same parquet tables (driver oracle). */
  val oracle: String =
    """SELECT p.p_partkey AS sku_id, p.p_name AS product_name, p.p_brand AS category,
      |       s.s_suppkey AS warehouse_id, s.s_name AS warehouse_name,
      |       CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_quantity,
      |       COUNT(*) AS order_count,
      |       MAX(strftime(l.l_shipdate, '%Y-%m-%d')) AS last_order_date
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY total_quantity DESC, sku_id, warehouse_id""".stripMargin
}
