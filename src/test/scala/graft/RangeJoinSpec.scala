package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bin join == naive range join, including bin-boundary and multi-bin intervals") {
    val points = Seq(
      (1L, ts("2024-02-01 10:00:00")), // exactly on an interval start (inclusive)
      (2L, ts("2024-02-01 10:59:59")),
      (3L, ts("2024-02-01 12:00:00")), // exactly on an interval end (exclusive)
      (4L, ts("2024-02-01 13:30:00")), // inside a 3-bin-spanning interval
      (5L, ts("2024-02-01 23:00:00"))  // in no interval
    ).toDF("id", "ts")
    val intervals = Seq(
      ("A", ts("2024-02-01 10:00:00"), ts("2024-02-01 12:00:00")),
      ("B", ts("2024-02-01 12:30:00"), ts("2024-02-01 15:10:00")), // spans 4 hourly bins
      ("C", ts("2024-02-01 10:30:00"), ts("2024-02-01 14:00:00")), // overlaps A and B
      // end-before-start: must match NOTHING (sequence() would otherwise
      // fabricate descending bins for it)
      ("X", ts("2024-02-01 14:00:00"), ts("2024-02-01 10:00:00"))
    ).toDF("name", "start", "end")

    val binned = RangeJoin.joinPointsToIntervals(points, col("ts"), intervals)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned === naive)
    assert(binned === Set((1L, "A"), (2L, "A"), (2L, "C"), (3L, "C"), (4L, "B"), (4L, "C")))
  }

  test("bin join plans as a hash join, not BroadcastNestedLoop") {
    val points = Seq((1L, ts("2024-02-01 10:00:00"))).toDF("id", "ts")
    val intervals = Seq(("A", ts("2024-02-01 09:00:00"), ts("2024-02-01 11:00:00")))
      .toDF("name", "start", "end")
    val plan = RangeJoin.joinPointsToIntervals(points, col("ts"), intervals)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
