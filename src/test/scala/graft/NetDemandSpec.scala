package graft

import graft.operators.NetDemand
import graft.sources.Tables
import org.apache.spark.sql.functions._

class NetDemandSpec extends SparkSpec {

  lazy val li = Tables.lineitem(spark, sf)
  lazy val part = Tables.part(spark, sf)
  lazy val supp = Tables.supplier(spark, sf)
  lazy val result = NetDemand(li, part, supp).cache()

  test("net_demand is never negative (GREATEST clamp)") {
    assert(result.filter(col("net_demand") < 0).count() === 0)
  }

  test("safety stock densification covers all |part| x |supplier| pairs") {
    val n = NetDemand.safetyCombined(part, supp).count()
    assert(n === part.count() * supp.count())
  }

  test("override wins over global threshold on override pairs") {
    val combined = NetDemand.safetyCombined(part, supp)
    val check = combined
      .join(part.select(col("p_partkey"), col("p_size")),
        combined("ss_partkey") === col("p_partkey"))
      .withColumn("expected",
        when((col("ss_partkey") + col("ss_suppkey")) % 3 === 0,
          (col("p_size") + col("ss_suppkey")).cast("long"))
          .otherwise((col("p_size") * 2).cast("long")))
    assert(check.filter(col("safety_stock") =!= col("expected")).count() === 0)
  }

  test("demand formula: net = max(0, demand + safety - effective)") {
    val bad = result.filter(
      col("net_demand") =!= greatest(lit(0L),
        col("aggregated_orders") + col("safety_stock") - col("effective_stock")))
    assert(bad.count() === 0)
  }

  test("empty snapshot window degrades to zeros (reference §2.4(4) semantics)") {
    // 1903 has no shipments → inventory CTE is empty → every row's
    // available/reserved/effective must be 0 and net = demand + safety
    val emptyDay = NetDemand(li, part, supp, "1903-01-01", "1903-01-02").cache()
    assert(emptyDay.count() > 0)
    assert(emptyDay.filter(
      col("available_stock") =!= 0L || col("reserved_stock") =!= 0L ||
        col("effective_stock") =!= 0L).count() === 0)
    assert(emptyDay.filter(
      col("net_demand") =!= col("aggregated_orders") + col("safety_stock")).count() === 0)
  }

  test("effective stock = available - reserved") {
    assert(result.filter(
      col("effective_stock") =!= col("available_stock") - col("reserved_stock")).count() === 0)
  }
}
