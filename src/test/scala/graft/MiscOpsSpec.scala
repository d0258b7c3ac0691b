package graft

import graft.operators.MiscOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MiscOpsSpec extends SparkSpec {

  test("s5 row counts match direct counts") {
    val counts = MiscOps.rowCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("lineitem") === Tables.lineitem(spark, sf).count())
    assert(counts("region") === 5L)
    assert(counts.size === Tables.all.size)
  }

  test("s7 day scan stays within the day and matches a manual filter") {
    val day = MiscOps.eventsOnDay(spark, sf, "2024-01-10").cache()
    assert(day.count() > 0)
    assert(day.filter(!col("ts_second").startsWith("2024-01-10")).count() === 0)
  }

  test("o20 summary scalars are internally consistent") {
    val r = MiscOps.pipelineSummary(spark, sf).first()
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("total_lines") === li.count())
    assert(r.getAs[Long]("returned_lines") ===
      li.filter(col("l_returnflag") === "R").count())
    assert(r.getAs[Long]("total_quantity") > 0)
  }

  test("ad-hoc SQL surface: registered views answer spark.sql") {
    Tables.registerViews(spark, sf)
    val n = spark.sql(
      """SELECT p.p_brand, count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1""".stripMargin).count()
    assert(n > 0)
  }
}
