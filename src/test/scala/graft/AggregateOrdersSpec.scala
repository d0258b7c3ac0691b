package graft

import graft.operators.AggregateOrders
import graft.sources.Tables
import org.apache.spark.sql.functions._

class AggregateOrdersSpec extends SparkSpec {

  lazy val result = AggregateOrders.fromDir(spark, sf).cache()

  test("one output row per observed (sku, warehouse) pair") {
    val li = Tables.lineitem(spark, sf)
    val pairs = li.select("l_partkey", "l_suppkey").distinct().count()
    assert(result.count() === pairs)
  }

  test("aggregation invariant: SUM(total_quantity) == SUM(raw cast quantities)") {
    val li = Tables.lineitem(spark, sf)
    val raw = li.agg(sum(col("l_quantity").cast("long"))).first().getLong(0)
    val agg = result.agg(sum("total_quantity")).first().getLong(0)
    assert(agg === raw)
  }

  test("order_count sums to fact row count") {
    val li = Tables.lineitem(spark, sf)
    assert(result.agg(sum("order_count")).first().getLong(0) === li.count())
  }

  test("globally sorted by total_quantity desc with deterministic tie-break") {
    val rows = result.select("total_quantity", "sku_id", "warehouse_id").collect()
    val key = rows.map(r => (-r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(key.sameElements(key.sorted))
  }

  test("last_order_date is ISO formatted") {
    assert(result.filter(!col("last_order_date").rlike("^\\d{4}-\\d{2}-\\d{2}$")).count() === 0)
  }

  test("driver entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
