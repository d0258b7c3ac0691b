package graft

import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed join plans with NO shuffle exchange on either side") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", buckets = 8, keys = Seq("l_orderkey"))
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", buckets = 8, keys = Seq("l_orderkey"))

    val before = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plan inspection

      val bucketed = Bucketing.readTable(spark, "li_b")
        .join(Bucketing.readTable(spark, "ord_b"), Seq("l_orderkey"))
      val unbucketed = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))

      assert(!Bucketing.hasShuffle(bucketed), "bucketed join must not shuffle")
      assert(Bucketing.hasShuffle(unbucketed), "control: plain join does shuffle")
      // and the results are identical
      assert(bucketed.count() === unbucketed.count())
      assert(bucketed.exceptAll(unbucketed).count() === 0)
    } finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
