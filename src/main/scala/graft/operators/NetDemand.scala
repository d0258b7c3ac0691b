package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q2 of the reference — "calculate_net_demand" (reference
  * dags/pipeline.py:495-537): a CTE chain (O12) of
  *   1. aggregated demand per (sku, warehouse),
  *   2. safety-stock densification — global per-SKU threshold CROSS JOIN all
  *      warehouses (O4), LEFT JOIN a per-(sku,warehouse) override on a
  *      composite key (O5), 3-arg COALESCE override→global→0 (O13),
  *   3. inventory snapshot scan with a date predicate (S7/O10),
  * then two LEFT JOINs and the demand formula
  *   effective = COALESCE(avail,0) - COALESCE(reserved,0)
  *   net_demand = GREATEST(0, demand + COALESCE(safety,0) - effective)  (O14)
  * sorted by net_demand DESC (O11) with a constant calculation_date (O19).
  *
  * Re-expressed over the test corpus: demand = lineitem shipped on/after
  * {runDate}; the snapshot period is calendar-1997 shipments (available =
  * shipped qty, reserved = returned 'R' qty); the global safety threshold
  * derives from part (2×p_size) and the override exists for ~1/3 of
  * (part,supplier) pairs. The reference's "missing snapshot day ⇒ all-zero
  * inventory" semantics (SURVEY §2.4(4)) holds here: an absent snapshot
  * window degrades to zeros via the COALESCEs — see NetDemandSpec.
  *
  * Scale design: demand and inventory are both partial-aggregated before
  * their shuffle; both land on the same (sku, warehouse) keys so AQE can
  * plan the final joins without a second shuffle of the big side. The
  * densified safety table is |part|×|supplier| — at 100 TB that product is
  * itself large, so it is built from the two *dimension* tables only (never
  * the fact) and joins the aggregated (already reduced) demand. Dimension
  * lookups are broadcast.
  */
object NetDemand {
  val runDate = "1998-01-01"
  val snapStart = "1997-01-01"

  /** Per-(sku,warehouse) safety-stock override — defined for pairs where
    * (sku + warehouse) % 3 == 0, mirroring the reference's sparse
    * safety_stock_by_warehouse (62 of 400 pairs, init.sql:326-352). */
  def safetyOverrides(part: DataFrame, supplier: DataFrame): DataFrame =
    part.select(col("p_partkey").as("ov_partkey"), col("p_size"))
      .crossJoin(supplier.select(col("s_suppkey").as("ov_suppkey")))
      .filter((col("ov_partkey") + col("ov_suppkey")) % 3 === 0)
      .select(col("ov_partkey"), col("ov_suppkey"),
        (col("p_size") + col("ov_suppkey")).cast("long").as("override_qty"))

  /** Densified safety stock: every (sku, warehouse) pair with the override
    * winning over the global threshold (reference pipeline.py:506-515).
    * Both branches derive from the same dimension scans, so each aliases its
    * keys (fresh exprIds) to keep the self-join unambiguous. */
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

  /** Inventory "snapshot" for the 1997 window: available / reserved per
    * (sku, warehouse); the date predicate is pushed to the parquet scan. */
  def inventory(lineitem: DataFrame, from: String = snapStart, until: String = runDate): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      // renamed keys: inventory shares lineage with the demand branch (both
      // scan lineitem), so distinct names avoid self-join attribute ambiguity
      .groupBy(col("l_partkey").as("i_partkey"), col("l_suppkey").as("i_suppkey"))
      .agg(
        sum(col("l_quantity").cast("long")).as("available_qty"),
        sum(when(col("l_returnflag") === "R", col("l_quantity").cast("long"))
          .otherwise(0L)).as("reserved_qty"))

  def apply(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame =
    apply(lineitem, part, supplier, snapStart, runDate)

  /** Parameterized snapshot window — an empty window reproduces the
    * reference's "missing inventory day ⇒ all zeros" behavior
    * (SURVEY §2.4(4)): every inventory COALESCE falls back to 0 and
    * net_demand degrades to demand + safety. */
  def apply(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
            invFrom: String, invUntil: String): DataFrame = {
    val demand = lineitem
      .filter(col("l_shipdate") >= lit(runDate))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("aggregated_orders"))

    val safety = safetyCombined(part, supplier)
    val inv = inventory(lineitem, invFrom, invUntil)
    val partDim = part.select(col("p_partkey"), col("p_name"), col("p_brand"))
    val suppDim = supplier.select(col("s_suppkey"), col("s_name"))

    demand
      .join(broadcast(partDim), demand("l_partkey") === partDim("p_partkey"))
      .join(broadcast(suppDim), demand("l_suppkey") === suppDim("s_suppkey"))
      .join(safety,
        demand("l_partkey") === safety("ss_partkey") &&
          demand("l_suppkey") === safety("ss_suppkey"), "left_outer")
      .join(inv,
        demand("l_partkey") === inv("i_partkey") &&
          demand("l_suppkey") === inv("i_suppkey"), "left_outer")
      .select(
        demand("l_partkey").as("sku_id"),
        col("p_name").as("product_name"),
        col("p_brand").as("category"),
        demand("l_suppkey").as("warehouse_id"),
        col("s_name").as("warehouse_name"),
        col("aggregated_orders"),
        coalesce(col("safety_stock"), lit(0L)).as("safety_stock"),
        coalesce(col("available_qty"), lit(0L)).as("available_stock"),
        coalesce(col("reserved_qty"), lit(0L)).as("reserved_stock"),
        (coalesce(col("available_qty"), lit(0L)) - coalesce(col("reserved_qty"), lit(0L)))
          .as("effective_stock"),
        greatest(lit(0L),
          col("aggregated_orders") + coalesce(col("safety_stock"), lit(0L))
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
       |         SUM(CAST(l_quantity AS BIGINT)) AS aggregated_orders
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
       |         SUM(CAST(l_quantity AS BIGINT)) AS available_qty,
       |         SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS reserved_qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$snapStart' AND l_shipdate < TIMESTAMP '$runDate'
       |  GROUP BY 1, 2
       |)
       |SELECT d.l_partkey AS sku_id, p.p_name AS product_name, p.p_brand AS category,
       |       d.l_suppkey AS warehouse_id, s.s_name AS warehouse_name,
       |       d.aggregated_orders,
       |       COALESCE(ss.safety_stock, 0) AS safety_stock,
       |       COALESCE(i.available_qty, 0) AS available_stock,
       |       COALESCE(i.reserved_qty, 0) AS reserved_stock,
       |       COALESCE(i.available_qty, 0) - COALESCE(i.reserved_qty, 0) AS effective_stock,
       |       GREATEST(0, d.aggregated_orders + COALESCE(ss.safety_stock, 0)
       |                   - (COALESCE(i.available_qty, 0) - COALESCE(i.reserved_qty, 0))) AS net_demand,
       |       '$runDate' AS calculation_date
       |FROM demand d
       |JOIN part p ON d.l_partkey = p.p_partkey
       |JOIN supplier s ON d.l_suppkey = s.s_suppkey
       |LEFT JOIN safety ss ON d.l_partkey = ss.p_partkey AND d.l_suppkey = ss.s_suppkey
       |LEFT JOIN inv i ON d.l_partkey = i.l_partkey AND d.l_suppkey = i.l_suppkey
       |ORDER BY net_demand DESC, sku_id, warehouse_id""".stripMargin
}
