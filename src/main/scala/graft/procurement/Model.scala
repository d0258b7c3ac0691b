package graft.procurement

import org.apache.spark.sql.types._

/** Typed schemas of the reference's data model (SURVEY §1.2).
  * Master tables mirror init-scripts/postgres/init.sql:9-71; raw orders keep
  * the all-VARCHAR ingestion contract (dags/pipeline.py:331-345). */
object Model {

  case class Supplier(supplier_id: Long, supplier_code: String, name: String,
                      email: String, phone: String, is_active: Boolean)

  case class Product(sku_id: Long, sku_code: String, name: String,
                     category: String, uom: String, is_active: Boolean)

  case class Warehouse(warehouse_id: Long, warehouse_code: String, name: String,
                       city: String, is_active: Boolean)

  case class SupplierProduct(supplier_id: Long, sku_id: Long, pack_size: Int,
                             min_order_qty: Int, lead_time_days: Int,
                             unit_price: java.math.BigDecimal, currency: String,
                             is_active: Boolean)

  case class SafetyStock(sku_id: Long, safety_stock_qty: Int)

  case class SafetyStockByWarehouse(warehouse_id: Long, sku_id: Long,
                                    safety_stock_qty: Int)

  case class InventorySnapshot(sku_code: String, snapshot_date: String,
                               warehouse_code: String, available_qty: Int,
                               reserved_qty: Int)

  case class StockLevel(warehouse_id: Long, sku_id: Long, current_stock: Long)

  /** Raw order line as ingested — every column a string (S4). */
  case class RawOrder(order_id: String, supplier_id: String, sku_id: String,
                      quantity: String, warehouse_id: String, order_date: String)

  val supplierProductSchema: StructType = StructType(Seq(
    StructField("supplier_id", LongType), StructField("sku_id", LongType),
    StructField("pack_size", IntegerType), StructField("min_order_qty", IntegerType),
    StructField("lead_time_days", IntegerType),
    StructField("unit_price", DecimalType(12, 4)),
    StructField("currency", StringType), StructField("is_active", BooleanType)))
}
