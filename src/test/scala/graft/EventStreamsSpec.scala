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

  test("streaming snapshot ingest: later micro-batches win per key") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_stream_store").toString
    val watch = s"$tmp/incoming"; val store = s"$tmp/store"
    new java.io.File(watch).mkdirs()
    def write(name: String, qty: Int): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$watch/$name"),
        s"""[{"sku_code":"P1","snapshot_date":"2026-01-14","warehouse_code":"W1",
           |"available_qty":$qty,"reserved_qty":0}]""".stripMargin.replace("\n", ""))
    write("b0.json", 10)
    val q = graft.sources.SnapshotStore.streamAppend(spark, watch, store)
    try {
      q.processAllAvailable()
      write("b1.json", 99) // same key, later batch
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.sources.SnapshotStore.read(spark, store).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Int]("available_qty") === 99) // last write won
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
