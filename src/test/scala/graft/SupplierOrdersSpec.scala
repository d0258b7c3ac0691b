package graft

import graft.operators.SupplierOrders
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SupplierOrdersSpec extends SparkSpec {

  lazy val result = SupplierOrders.fromDir(spark, sf).cache()

  test("order_quantity >= max(min_order_qty, net_demand)") {
    val bad = result.filter(
      col("order_quantity") < col("min_order_qty") ||
        col("order_quantity") < col("net_demand"))
    assert(bad.count() === 0)
  }

  test("order_quantity is pack-aligned or exactly min_order_qty") {
    val bad = result.filter(
      col("order_quantity") % col("pack_size") =!= 0.0 &&
        col("order_quantity") =!= col("min_order_qty").cast("double"))
    assert(bad.count() === 0)
  }

  test("only positive-demand rows produce POs") {
    assert(result.filter(col("net_demand") <= 0).count() === 0)
  }

  test("one PO per (sku, warehouse); supplier is unique per sku") {
    assert(result.groupBy("sku_id", "warehouse_id").count()
      .filter(col("count") > 1).count() === 0)
    assert(result.select("sku_id", "supplier_id").distinct()
      .groupBy("sku_id").count().filter(col("count") > 1).count() === 0)
  }

  test("total_cost = order_quantity * unit_price") {
    assert(result.filter(
      col("total_cost") =!= col("order_quantity") * col("unit_price")).count() === 0)
  }

  test("order_id sequence follows the total_cost-desc sort exactly") {
    val ids = result.select("order_id").collect().map(_.getString(0))
    val expected = (1 to ids.length).map(i => f"PO-19980101-$i%05d")
    assert(ids.toSeq === expected)
  }

  test("ScalableIds (the gated path) matches the single-partition window ids") {
    // the gated q3 now assigns PO ids via ScalableIds; re-derive them with
    // the naive global window as the independent oracle
    import org.apache.spark.sql.expressions.Window
    val byCost = Window.orderBy(col("total_cost").desc, col("sku_id"), col("warehouse_id"))
    val viaWindow = result.drop("order_id")
      .withColumn("order_id",
        format_string("PO-%s-%05d", lit("19980101"), row_number().over(byCost)))
      .select(col("order_id"), col("sku_id"), col("warehouse_id"))
    val viaScalable = result.select(col("order_id"), col("sku_id"), col("warehouse_id"))
    assert(viaWindow.except(viaScalable).count() === 0)
    assert(viaScalable.except(viaWindow).count() === 0)
  }

  test("expected_delivery_date = order_date + lead_time_days") {
    val bad = result.filter(
      to_date(col("expected_delivery_date")) =!=
        date_add(to_date(col("order_date")), col("lead_time_days")))
    assert(bad.count() === 0)
  }
}
