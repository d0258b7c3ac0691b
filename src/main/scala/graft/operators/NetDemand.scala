package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q2 of the reference — "calculate_net_demand" (reference
  * dags/pipeline.py:495-537): a CTE chain (O12) of aggregated demand,
  * safety-stock densification with per-(sku,warehouse) override (O4/O5,
  * COALESCE override→global→0, O13), and an inventory snapshot scan with a
  * date predicate (S7/O10), combined with LEFT-JOIN semantics into
  *   effective = COALESCE(avail,0) - COALESCE(reserved,0)
  *   net_demand = GREATEST(0, demand + COALESCE(safety,0) - effective)  (O14)
  * sorted by net_demand DESC (O11) with a constant calculation_date (O19).
  *
  * Re-expressed over the test corpus: demand = lineitem shipped on/after
  * {runDate}; the snapshot period is calendar-1997 shipments (available =
  * shipped qty, reserved = returned 'R' qty); the global safety threshold
  * derives from part (2×p_size) and the override exists for ~1/3 of
  * (part,supplier) pairs. The reference's "missing snapshot day ⇒ all-zero
  * inventory" semantics (SURVEY §2.4(4)) holds: an absent snapshot window
  * leaves the conditional sums NULL and every COALESCE falls back to 0 —
  * see NetDemandSpec.
  *
  * Scale design — why this is ONE scan and ONE shuffle:
  *   - Demand and inventory group on the same (sku, warehouse) key over the
  *     same fact table, so they are computed as conditional aggregates in a
  *     single partial-aggregated pass ([[pairStats]]) instead of two scans
  *     joined afterwards. LEFT-JOIN-miss semantics survive as NULL sums.
  *   - The safety threshold is a function of broadcast dimension attributes,
  *     so it is computed per demand pair after the broadcast joins — never
  *     by materializing the |part|×|supplier| cross product (20M rows at
  *     sf0.1, ruinous at 100 TB). The explicit densified form (the
  *     reference's own table shape) lives in
  *     [[graft.procurement.Queries.safetyStockCombined]] where the inputs
  *     really are tables.
  */
object NetDemand {
  val runDate = "1998-01-01"
  val snapStart = "1997-01-01"

  /** One pass over the fact table: demand, inventory and price statistics
    * per (sku, warehouse) as conditional aggregates. NULL where a pair has
    * no rows in the corresponding window (== outer-join miss). */
  def pairStats(lineitem: DataFrame, invFrom: String = snapStart,
                invUntil: String = runDate): DataFrame = {
    val inWindow = col("l_shipdate") >= lit(invFrom) && col("l_shipdate") < lit(invUntil)
    lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(when(col("l_shipdate") >= lit(runDate), round(col("l_quantity"), 0).cast("long")))
          .as("aggregated_orders"),
        sum(when(inWindow, round(col("l_quantity"), 0).cast("long"))).as("available_qty"),
        sum(when(inWindow && col("l_returnflag") === "R", round(col("l_quantity"), 0).cast("long"))
          .otherwise(when(inWindow, 0L))).as("reserved_qty"),
        min(col("l_extendedprice") / col("l_quantity")).as("unit_price_all"))
  }

  /** Densified safety-stock table (kept for the operator's own semantics
    * and spec; the query path computes the same value inline). */
  def safetyCombined(part: DataFrame, supplier: DataFrame): DataFrame = {
    val dense = part.select(col("p_partkey").as("ss_partkey"), col("p_size"))
      .crossJoin(supplier.select(col("s_suppkey").as("ss_suppkey")))
    val ovr = safetyOverrides(part, supplier)
    dense
      .join(ovr,
        dense("ss_partkey") === ovr("ov_partkey") &&
          dense("ss_suppkey") === ovr("ov_suppkey"), "left_outer")
      .select(col("ss_partkey"), col("ss_suppkey"),
        coalesce(col("override_qty"), (col("p_size") * 2).cast("long"), lit(0L))
          .as("safety_stock"))
  }

  /** Per-(sku,warehouse) safety-stock override — pairs where
    * (sku + warehouse) % 3 == 0, mirroring the reference's sparse
    * safety_stock_by_warehouse (init.sql:326-352). */
  def safetyOverrides(part: DataFrame, supplier: DataFrame): DataFrame =
    part.select(col("p_partkey").as("ov_partkey"), col("p_size"))
      .crossJoin(supplier.select(col("s_suppkey").as("ov_suppkey")))
      .filter((col("ov_partkey") + col("ov_suppkey")) % 3 === 0)
      .select(col("ov_partkey"), col("ov_suppkey"),
        (col("p_size") + col("ov_suppkey")).cast("long").as("override_qty"))

  /** The inline safety expression: COALESCE(override, global, 0) with the
    * override condition evaluated against broadcast dim attributes —
    * value-identical to joining [[safetyCombined]]. */
  private def safetyExpr = coalesce(
    when((col("l_partkey") + col("l_suppkey")) % 3 === 0,
      (col("p_size") + col("l_suppkey")).cast("long")),
    (col("p_size") * 2).cast("long"),
    lit(0L))

  def apply(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame =
    apply(lineitem, part, supplier, snapStart, runDate)

  def apply(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
            invFrom: String, invUntil: String): DataFrame =
    fromStats(pairStats(lineitem, invFrom, invUntil), part, supplier)

  def fromStats(stats: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    val partDim = part.select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    val suppDim = supplier.select(col("s_suppkey"), col("s_name"))
    stats
      .filter(col("aggregated_orders").isNotNull) // inner semantics of the demand CTE
      .join(broadcast(partDim), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppDim), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("l_partkey").as("sku_id"),
        col("p_name").as("product_name"),
        col("p_brand").as("category"),
        col("l_suppkey").as("warehouse_id"),
        col("s_name").as("warehouse_name"),
        col("aggregated_orders"),
        safetyExpr.as("safety_stock"),
        coalesce(col("available_qty"), lit(0L)).as("available_stock"),
        coalesce(col("reserved_qty"), lit(0L)).as("reserved_stock"),
        (coalesce(col("available_qty"), lit(0L)) - coalesce(col("reserved_qty"), lit(0L)))
          .as("effective_stock"),
        greatest(lit(0L),
          col("aggregated_orders") + safetyExpr
            - (coalesce(col("available_qty"), lit(0L)) - coalesce(col("reserved_qty"), lit(0L))))
          .as("net_demand"),
        lit(runDate).as("calculation_date"))
      .orderBy(col("net_demand").desc, col("sku_id"), col("warehouse_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    apply(Tables.lineitem(spark, dir), Tables.part(spark, dir), Tables.supplier(spark, dir))

  val oracle: String =
    s"""WITH demand AS (
       |  SELECT l_partkey, l_suppkey,
       |         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS aggregated_orders
       |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '$runDate'
       |  GROUP BY 1, 2
       |), overrides AS (
       |  SELECT p.p_partkey, s.s_suppkey,
       |         CAST(p.p_size + s.s_suppkey AS BIGINT) AS override_qty
       |  FROM part p CROSS JOIN supplier s
       |  WHERE (p.p_partkey + s.s_suppkey) % 3 = 0
       |), safety AS (
       |  SELECT p.p_partkey, s.s_suppkey,
       |         COALESCE(o.override_qty, CAST(p.p_size * 2 AS BIGINT), 0) AS safety_stock
       |  FROM part p CROSS JOIN supplier s
       |  LEFT JOIN overrides o ON p.p_partkey = o.p_partkey AND s.s_suppkey = o.s_suppkey
       |), inv AS (
       |  SELECT l_partkey, l_suppkey,
       |         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS available_qty,
       |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(ROUND(l_quantity, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS reserved_qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$snapStart' AND l_shipdate < TIMESTAMP '$runDate'
       |  GROUP BY 1, 2
       |)
       |SELECT d.l_partkey AS sku_id, p.p_name AS product_name, p.p_brand AS category,
       |       d.l_suppkey AS warehouse_id, s.s_name AS warehouse_name,
       |       CAST(d.aggregated_orders AS BIGINT) AS aggregated_orders,
       |       CAST(COALESCE(ss.safety_stock, 0) AS BIGINT) AS safety_stock,
       |       CAST(COALESCE(i.available_qty, 0) AS BIGINT) AS available_stock,
       |       CAST(COALESCE(i.reserved_qty, 0) AS BIGINT) AS reserved_stock,
       |       CAST(COALESCE(i.available_qty, 0) - COALESCE(i.reserved_qty, 0) AS BIGINT) AS effective_stock,
       |       CAST(GREATEST(0, d.aggregated_orders + COALESCE(ss.safety_stock, 0)
       |                   - (COALESCE(i.available_qty, 0) - COALESCE(i.reserved_qty, 0))) AS BIGINT) AS net_demand,
       |       '$runDate' AS calculation_date
       |FROM demand d
       |JOIN part p ON d.l_partkey = p.p_partkey
       |JOIN supplier s ON d.l_suppkey = s.s_suppkey
       |LEFT JOIN safety ss ON d.l_partkey = ss.p_partkey AND d.l_suppkey = ss.s_suppkey
       |LEFT JOIN inv i ON d.l_partkey = i.l_partkey AND d.l_suppkey = i.l_suppkey
       |ORDER BY net_demand DESC, sku_id, warehouse_id""".stripMargin
}
