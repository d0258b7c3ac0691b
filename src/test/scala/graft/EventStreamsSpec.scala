package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly agg over a static day equals the batch twin") {
    val q = EventStreams.runToMemorySink(spark, sf, "hourly_test")
    try {
      val streamed = spark.table("hourly_test")
        .select("hour_start", "event_type", "n_events", "sum_value")
      val batch = EventStreams.hourlyBatch(spark, sf)
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() === 0)
      assert(batch.except(streamed).count() === 0)
    } finally q.stop()
  }

  test("sessionization: session gaps respected, totals conserved") {
    val events = graft.sources.Tables.events(spark, sf).cache()
    val sessions = EventStreams.sessionizeBatch(events, gapMinutes = 30).cache()
    assert(sessions.agg(sum("n_events")).first().getLong(0) === events.count())
    // no session spans a gap: end-start <= n_events * gap
    val bad = sessions.filter(
      col("session_end").cast("long") - col("session_start").cast("long") >
        col("n_events") * 30L * 60L)
    assert(bad.count() === 0)
  }
}
