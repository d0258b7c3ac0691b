package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("asof-left semantics: latest ≤, inclusive equality, null before first snapshot") {
    val events = Seq(
      (1L, "k1", ts("2024-01-05")),  // between snap1 and snap2 → snap1
      (2L, "k1", ts("2024-01-10")),  // exactly snap2's ts → snap2 (inclusive)
      (3L, "k1", ts("2023-12-01")),  // before any snapshot → null
      (4L, "k2", ts("2024-06-01")),  // other key → k2's snapshot
      (5L, "k3", ts("2024-06-01"))   // key with no snapshots at all → null
    ).toDF("event_id", "key", "ets")
    val snaps = Seq(
      ("k1", ts("2024-01-01"), 100.0),
      ("k1", ts("2024-01-10"), 200.0),
      ("k2", ts("2024-01-01"), 999.0)
    ).toDF("key", "sts", "price")

    val got = AsOfJoin.asofLeft(events, snaps, "key", "ets", "sts", Seq("price"))
      .select("event_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) === Some(100.0))
    assert(got(2L) === Some(200.0)) // snapshot at equal ts applies
    assert(got(3L) === None)
    assert(got(4L) === Some(999.0))
    assert(got(5L) === None)
  }

  test("equal-(key,ts) snapshot ties resolve deterministically to the largest payload") {
    val events = Seq((1L, "k", ts("2024-02-01"))).toDF("event_id", "k", "ets")
    // two snapshots with IDENTICAL key and timestamp — without the payload
    // tie-break the carried row would depend on partition layout
    val snaps = Seq(
      ("k", ts("2024-01-01"), 100.0, "a"),
      ("k", ts("2024-01-01"), 200.0, "b")
    ).toDF("k2", "sts", "price", "tagc").withColumnRenamed("k2", "k")
    (1 to 3).foreach { i =>
      val shuffled = if (i % 2 == 0) snaps.repartition(7) else snaps.repartition(1)
      val got = AsOfJoin.asofLeft(events, shuffled, "k", "ets", "sts", Seq("price", "tagc"))
        .select("price", "tagc").collect()
      assert(got.length === 1)
      assert(got.head.getDouble(0) === 200.0 && got.head.getString(1) === "b",
        s"run $i: tie must resolve to the field-wise largest payload")
    }
  }

  test("multi-column values are atomic: all fields from the same snapshot row") {
    val events = Seq((1L, "k", ts("2024-01-15"))).toDF("event_id", "k", "ets")
    val snaps = Seq(
      ("k", ts("2024-01-01"), Some(1.0), Some(2.0)),
      ("k", ts("2024-01-10"), Some(3.0), None)) // newer row shadows b with NULL
      .toDF("k", "sts", "a", "b")
    val r = AsOfJoin.asofLeft(events, snaps, "k", "ets", "sts", Seq("a", "b"))
      .select("a", "b").first()
    assert(r.getDouble(0) === 3.0)
    assert(r.isNullAt(1), "b must be the latest row's NULL, not stitched from the older row")
  }

  test("gated query: asof price equals the part-year minimum for every row") {
    val result = AsOfJoin.fromDir(spark, sf)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_partkey"), year(col("l_shipdate")).as("y"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("expected"))
    val joined = result
      .withColumn("y", year(to_date(col("ship_date"))))
      .join(direct, Seq("l_partkey", "y"))
    // each lineitem's year has its own snapshot entry → asof == that year's min
    assert(joined.filter(col("asof_price") =!= col("expected")).count() === 0)
  }
}
