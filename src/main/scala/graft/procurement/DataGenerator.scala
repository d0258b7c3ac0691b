package graft.procurement

import graft.procurement.Model._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.Random

/** Seeded synthetic generator reproducing the *shapes* of the reference's
  * scripts/generateData.py (SURVEY §3.2): 35 suppliers / 40 SKUs / 10
  * warehouses / 70 supplier-product pairs in the master set; daily orders
  * drawn from the pair list with pack-snapped quantities; stock ≈30% and
  * snapshots ≈70% coverage samples. Deterministic under a fixed seed —
  * tests and bench replay identical inputs at any size.
  */
class DataGenerator(seed: Long = 42L, numSuppliers: Int = 35, numProducts: Int = 40,
                    numWarehouses: Int = 10, numPairs: Int = 70) {

  private val rnd = new Random(seed)

  val suppliers: Seq[Supplier] = (1 to numSuppliers).map { i =>
    Supplier(i, f"SUP$i%03d", s"Supplier $i", s"supplier$i@example.com",
      f"+212-5$i%08d", is_active = i % 11 != 0)
  }

  val products: Seq[Product] = (1 to numProducts).map { i =>
    val cats = Seq("Electronics", "Food", "Textile", "Hardware", "Chemicals")
    Product(i, f"PROD$i%03d", s"Product $i", cats(i % cats.size),
      if (i % 3 == 0) "KG" else "UNIT", is_active = true)
  }

  val warehouses: Seq[Warehouse] = (1 to numWarehouses).map { i =>
    val cities = Seq("Casablanca", "Rabat", "Tangier", "Fes", "Marrakech")
    Warehouse(i, f"WH$i%03d", s"Warehouse $i", cities(i % cities.size),
      is_active = true)
  }

  val supplierProducts: Seq[SupplierProduct] = {
    val pairs = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    // every SKU gets at least one supplier; remaining pairs random
    (1 to numProducts).foreach { sku =>
      pairs += ((rnd.nextInt(numSuppliers) + 1).toLong -> sku.toLong)
    }
    while (pairs.size < numPairs)
      pairs += ((rnd.nextInt(numSuppliers) + 1).toLong ->
        (rnd.nextInt(numProducts) + 1).toLong)
    pairs.toSeq.map { case (sup, sku) =>
      val price = new java.math.BigDecimal(5 + rnd.nextInt(995))
        .setScale(4, java.math.RoundingMode.HALF_UP)
      SupplierProduct(sup, sku, pack_size = Seq(1, 5, 10, 20)(rnd.nextInt(4)),
        min_order_qty = rnd.nextInt(10) * 5, lead_time_days = 1 + rnd.nextInt(14),
        unit_price = price, currency = "MAD", is_active = rnd.nextInt(20) != 0)
    }
  }

  val safetyStock: Seq[SafetyStock] =
    (1 to numProducts).map(i => SafetyStock(i, 10 + rnd.nextInt(90)))

  val safetyByWarehouse: Seq[SafetyStockByWarehouse] =
    for {
      w <- 1 to numWarehouses; sku <- 1 to numProducts
      if rnd.nextInt(100) < 16 // sparse overrides, ~62/400 like the seed data
    } yield SafetyStockByWarehouse(w, sku, 5 + rnd.nextInt(50))

  /** One day's raw orders, all columns as strings (the CSV contract). */
  def rawOrders(orderDate: java.time.LocalDate, numOrders: Int): Seq[RawOrder] = {
    val pairs = supplierProducts.toIndexedSeq
    (1 to numOrders).map { i =>
      val p = pairs(rnd.nextInt(pairs.size))
      val qty = math.max(1, (1 + rnd.nextInt(5)) * math.max(1, p.pack_size / 2))
      RawOrder(
        f"ORD-${orderDate.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)}-$i%05d",
        p.supplier_id.toString, p.sku_id.toString, qty.toString,
        (rnd.nextInt(numWarehouses) + 1).toString,
        orderDate.toString)
    }
  }

  def snapshots(day: java.time.LocalDate): Seq[InventorySnapshot] =
    for {
      p <- products; w <- warehouses
      if rnd.nextInt(100) < 70
    } yield InventorySnapshot(p.sku_code, day.toString, w.warehouse_code,
      rnd.nextInt(500), rnd.nextInt(60))

  def stockLevels: Seq[StockLevel] =
    for {
      w <- warehouses; p <- products
      if rnd.nextInt(100) < 30
    } yield StockLevel(w.warehouse_id, p.sku_id, rnd.nextInt(1000).toLong)

  /** Materialize the master set as DataFrames. */
  def masterFrames(spark: SparkSession): Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "suppliers" -> suppliers.toDF(),
      "products" -> products.toDF(),
      "warehouses" -> warehouses.toDF(),
      "supplier_products" -> spark.createDataFrame(
        spark.sparkContext.parallelize(supplierProducts.map(p =>
          org.apache.spark.sql.Row(p.supplier_id, p.sku_id, p.pack_size,
            p.min_order_qty, p.lead_time_days, p.unit_price, p.currency,
            p.is_active))),
        Model.supplierProductSchema),
      "safety_stock" -> safetyStock.toDF(),
      "safety_stock_by_warehouse" -> safetyByWarehouse.toDF())
  }
}
