package graft.procurement

import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ad-hoc federated SQL surface of the reference (its README advertises
  * direct Trino SQL over the hive/postgresql/cassandra catalogs,
  * reference README.md:198-227): every dataset registered as a temp view so
  * `spark.sql("SELECT ... FROM products JOIN inventory_snapshots ...")`
  * answers the same queries — one engine instead of three catalogs.
  *
  * The reference's "key tables" (README.md:222-227: orders, stock,
  * aggregated_orders, net_demand, supplier_orders) are all queryable by
  * name after a pipeline run.
  */
object Views {

  /** Register master data + raw day + snapshot store + pipeline outputs. */
  def register(spark: SparkSession, master: Map[String, DataFrame],
               storeDir: Option[String] = None,
               outputs: Map[String, DataFrame] = Map.empty): Unit = {
    master.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    storeDir.foreach { dir =>
      SnapshotStore.read(spark, dir).createOrReplaceTempView("inventory_snapshots")
    }
    outputs.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** The reference README's example ad-hoc query (README.md:201-212):
    * current inventory by product × warehouse for a given day. */
  def inventoryByProduct(spark: SparkSession, day: String): DataFrame =
    spark.sql(
      s"""SELECT p.sku_code, p.name AS product_name, i.warehouse_code,
         |       i.available_qty, i.reserved_qty,
         |       i.available_qty - i.reserved_qty AS effective_qty
         |FROM products p
         |JOIN inventory_snapshots i ON p.sku_code = i.sku_code
         |JOIN warehouses w ON w.warehouse_code = i.warehouse_code
         |WHERE i.snapshot_date = DATE '$day'
         |ORDER BY effective_qty DESC""".stripMargin)
}
