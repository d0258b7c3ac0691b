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

  test("watermark: closed windows finalize once; late data beyond watermark is dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000000L
    def writeBatch(rows: Seq[(Long, Long)]): Unit = // (event_id, ts_ns)
      rows.map { case (id, t) => (id, t, 1L, "x", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    writeBatch(Seq((1L, ns("2024-02-01T10:05:00Z")), (2L, ns("2024-02-01T15:05:00Z"))))
    val q = EventStreams.hourlyStream(spark, dir, glob = "*.parquet").writeStream
      .outputMode("append").format("memory").queryName("wm_test").start()
    try {
      q.processAllAvailable() // watermark advances to 13:05 after this batch
      // LATE row in the already-closed 10:00 window + a fresh 18:05 row
      writeBatch(Seq((3L, ns("2024-02-01T10:30:00Z")), (4L, ns("2024-02-01T18:05:00Z"))))
      q.processAllAvailable() // emits the 10:00 window; late row is dropped
      writeBatch(Seq((5L, ns("2024-02-01T23:55:00Z")))) // flush 15:00 + 18:00
      q.processAllAvailable()

      val out = spark.table("wm_test")
        .filter(col("event_type") === "x").cache()
      val w10 = out.filter(col("hour_start") === "2024-02-01 10:00:00").collect()
      assert(w10.length === 1, "closed window must be emitted exactly once")
      assert(w10.head.getAs[Long]("n_events") === 1,
        "the late 10:30 event (beyond watermark) must not be counted")
      val w15 = out.filter(col("hour_start") === "2024-02-01 15:00:00").collect()
      assert(w15.length === 1 && w15.head.getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("hourly stream starts on an EMPTY watch directory and picks up arriving files") {
    import spark.implicits._
    // no files match the glob yet — the schema probe cannot infer and must
    // fall back to the ns-as-long default instead of throwing
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_watch").toString
    val q = EventStreams.hourlyStream(spark, dir, glob = "*.parquet").writeStream
      .outputMode("append").format("memory").queryName("empty_watch_test").start()
    try {
      q.processAllAvailable() // zero batches, zero rows — but the stream is LIVE
      assert(spark.table("empty_watch_test").count() === 0)
      def ns(iso: String): Long =
        java.time.Instant.parse(iso).toEpochMilli * 1000000L
      Seq((1L, ns("2024-02-01T10:05:00Z"), 1L, "x", 1.0, "{}"),
          (2L, ns("2024-02-01T15:05:00Z"), 1L, "x", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq((3L, ns("2024-02-01T23:55:00Z"), 1L, "x", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable() // advances the watermark past the 10:00/15:00 windows
      val out = spark.table("empty_watch_test")
      assert(out.filter(col("hour_start") === "2024-02-01 10:00:00").count() === 1,
        "files that arrive AFTER an empty start must flow through the fallback schema")
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

  test("store-derived batch_seq: same-millisecond appends stay strictly ordered") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_seq").toString + "/s"
    def row(qty: Int) = Seq(("P1", "2026-01-14", "W1", qty, 0))
      .toDF("sku_code", "snapshot_date", "warehouse_code", "available_qty", "reserved_qty")
    // burst appends with NO sleeps — wall-clock seqs would tie here
    val seqs = (1 to 4).map(q => graft.sources.SnapshotStore.appendNext(row(q * 10), store))
    assert(seqs === Seq(1L, 2L, 3L, 4L), "store-derived seq is 1,2,3,... regardless of clock")
    val got = graft.sources.SnapshotStore.read(spark, store).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Int]("available_qty") === 40) // the LAST append won, deterministically
  }

  test("streaming corpus ingest: quality gate + fingerprint dedup across micro-batches") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_ingest").toString
    val watch = s"$tmp/in"; val out = s"$tmp/corpus"
    new java.io.File(watch).mkdirs()
    val good = "the supplier and the warehouse are of the number and the part is for this with that from all more" // stopword-rich, passes the gate
    val junk = "000 111 222 333 444"                   // digit-heavy, fails the gate
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s"}"""
    def write(name: String, docs: String*): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$watch/$name"),
        docs.mkString("[", ",", "]"))
    write("b0.json", doc(1, good), doc(2, junk), doc(3, good)) // 3 dups 1 by content
    val q = graft.streaming.CorpusIngest.start(spark, watch, out)
    try {
      q.processAllAvailable()
      write("b1.json", doc(4, good), doc(5, good + " extra")) // 4 re-delivers content
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    // junk gated out; of the three identical-content docs (1, 3, 4 across
    // batches) exactly one survived; the distinct doc 5 survived
    assert(got.count() === 2)
    assert(got.filter(col("doc_id") === 2).count() === 0)
    assert(got.select("fingerprint").distinct().count() === 2)
  }

  test("streaming dedup: re-deliveries within the watermark are emitted exactly once") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val out = EventStreams.dedupStream(mem.toDF().toDF("event_id", "ts"), "1 hour")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-02-01 10:$m%02d:00")
    try {
      mem.addData((1L, ts(0)), (2L, ts(5)), (2L, ts(5))) // duplicate inside the batch
      q.processAllAvailable()
      mem.addData((2L, ts(6)), (3L, ts(10))) // re-delivery across micro-batches
      q.processAllAvailable()
      val got = spark.table("dedup_stream_test")
        .select("event_id").as[Long].collect().sorted
      assert(got.sameElements(Array(1L, 2L, 3L)),
        s"each id exactly once, got ${got.mkString(",")}")
    } finally q.stop()
  }

  test("batch_seq sidecar: advances per append, explicit seqs fold in, fallback scan re-seeds") {
    import spark.implicits._
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft_sidecar").toString + "/s"
    def row(qty: Int) = Seq(("P1", "2026-01-14", "W1", qty, 0))
      .toDF("sku_code", "snapshot_date", "warehouse_code", "available_qty", "reserved_qty")
    val s = graft.sources.SnapshotStore
    assert(s.appendNext(row(10), store) === 1L)
    assert(s.appendNext(row(20), store) === 2L)
    val sidecar = new java.io.File(s"$store/_graft_batch_seq")
    assert(sidecar.exists, "appends must maintain the sequence sidecar")
    assert(Files.readString(sidecar.toPath).trim === "2")
    s.append(row(30), store, 1000L) // explicit sequence advances the sidecar
    assert(Files.readString(sidecar.toPath).trim === "1000")
    assert(s.appendNext(row(40), store) === 1001L)
    assert(sidecar.delete()) // pre-sidecar store: fall back to a parquet scan
    assert(s.appendNext(row(50), store) === 1002L)
    assert(Files.readString(sidecar.toPath).trim === "1002", "fallback re-seeds the sidecar")
    val got = s.read(spark, store).collect()
    assert(got.length === 1 && got.head.getAs[Int]("available_qty") === 50)
    // a sidecar-less store must never be re-seeded below data it already
    // holds: an explicit low-sequence replay leaves the domain intact
    assert(sidecar.delete())
    s.append(row(60), store, 1L) // caller replays an old sequence
    assert(s.appendNext(row(70), store) === 1003L) // seeded from the true max
    val got2 = s.read(spark, store).collect()
    assert(got2.length === 1 && got2.head.getAs[Int]("available_qty") === 70)
    // a CORRUPT sidecar (truncated/garbled control file) degrades to the
    // store scan instead of blocking every subsequent append
    Files.writeString(sidecar.toPath, "not-a-number\n")
    assert(s.appendNext(row(80), store) === 1004L)
    assert(Files.readString(sidecar.toPath).trim === "1004", "append heals the sidecar")
  }

  test("snapshot store lifecycle: multi-day appends, re-load overwrites, compaction") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_lifecycle").toString + "/s"
    def day(d: String, qty: Int, seq: Long) =
      graft.sources.SnapshotStore.append(
        Seq(("P1", d, "W1", qty, 0), ("P2", d, "W1", qty + 1, 0))
          .toDF("sku_code", "snapshot_date", "warehouse_code", "available_qty", "reserved_qty"),
        store, seq)
    day("2026-01-10", 10, 1000); day("2026-01-11", 20, 2000)
    day("2026-01-11", 99, 3000) // corrected re-load of day 11
    day("2026-01-12", 30, 4000)

    val s = graft.sources.SnapshotStore
    assert(s.readDay(spark, store, "2026-01-11")
      .agg(min("available_qty")).first().getInt(0) === 99) // re-load won
    assert(s.read(spark, store).count() === 6) // 3 days x 2 keys after dedup

    s.compact(spark, store) // physically drop the stale rows, collapse epochs
    val day11Rows = spark.read.parquet(s"$store/data")
      .filter(col("snapshot_date") === "2026-01-11").count()
    assert(day11Rows === 2, "compaction must leave only the winning rows")
    assert(s.readDay(spark, store, "2026-01-11")
      .agg(min("available_qty")).first().getInt(0) === 99) // still correct
    assert(s.read(spark, store).count() === 6) // other days untouched
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
