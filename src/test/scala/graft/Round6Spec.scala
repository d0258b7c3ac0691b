package graft

import graft.operators.SkewTools
import org.apache.spark.sql.functions._

/** Round-6 behaviors: watermark-exact streaming session release, the
  * MemoryStream-replay gate's parity with the batch twin, and the round's
  * advice fixes (all-NULL distinct keys, SQL arity errors). */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------- watermark-exact streaming session release

  test("streaming sessions: an interval is held until the watermark passes last+gap, " +
    "so a later-batch event still merges into it") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours").as[SessionEvent]
    val out = EventStreams.sessionizeStreaming(events, gapMinutes = 30)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("r6_hold_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      mem.addData((31L, ts("2024-04-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // a SECOND interval for the same user, 2 h later: pre-round-6 the
      // 10:00 interval (now non-latest) was emitted immediately; now it is
      // held — the watermark (04:00… from batch 1) has not passed 10:30
      mem.addData((31L, ts("2024-04-01 12:00:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("r6_hold_test").filter(col("user_id") === 31L).count() === 0)
      // a watermark-admitted out-of-order event that belongs to the HELD
      // 10:00 interval: merges instead of starting a fresh session
      mem.addData((31L, ts("2024-04-01 10:20:00"), 2.0))
      q.processAllAvailable()
      mem.addData((32L, ts("2024-04-02 12:00:00"), 0.0)) // advance watermark
      q.processAllAvailable()
      mem.addData((33L, ts("2024-04-02 12:01:00"), 0.0)) // fire the timeouts
      q.processAllAvailable()
      val got = spark.table("r6_hold_test").filter(col("user_id") === 31L)
        .orderBy(col("session_start")).collect()
      assert(got.length === 2)
      assert(got(0).getAs[Long]("n_events") === 2) // 10:00 + 10:20 merged
      assert(got(0).getAs[java.sql.Timestamp]("session_end") === ts("2024-04-01 10:20:00"))
      assert(got(0).getAs[Double]("session_value") === 3.0)
      assert(got(1).getAs[Long]("n_events") === 1) // 12:00 untouched
    } finally q.stop()
  }

  test("sessions_streaming gate == batch sessions on sf0.001") {
    val streamed = graft.streaming.EventStreams
      .sessionsStreamingFromDir(spark, sf, nBatches = 5)
    val batch = graft.streaming.EventStreams.sessionsFromDir(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  // ------------------------------------ incremental dedup vs signature index

  test("dedupDelta against a persisted index == full-corpus LSH on the union " +
    "(and never touches the old corpus's text)") {
    import graft.operators.{Dedup, DedupIndex}
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % DedupIndex.DeltaMod =!= 0)
    val delta = docs.filter(col("doc_id") % DedupIndex.DeltaMod === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    DedupIndex.write(old, idx)
    // the delta run's only inputs: the DELTA docs and the index store —
    // the old corpus is not even an argument, so "old text never re-read"
    // holds by construction; equivalence below proves the index suffices
    val got = DedupIndex.dedupDelta(spark, idx, delta)
    val expected = Dedup.minhashLsh(docs)
      .filter(col("id1") % DedupIndex.DeltaMod === 0 ||
        col("id2") % DedupIndex.DeltaMod === 0)
    try {
      assert(got.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(got).count() === 0)
      assert(got.count() > 0, "split must straddle some planted near-dup pairs")
      // the verification side reads the index stores, candidate-bounded
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains(s"$idx/bands") && plan.contains(s"$idx/shingles"))
      // band-partitioned store: a single-band probe prunes the scan
      val probe = spark.read.parquet(s"$idx/bands").filter(col("band") === 0)
      val probePlan = probe.queryExecution.executedPlan.toString
      assert(probePlan.contains("PartitionFilters") && probePlan.contains("band"))
    } finally Dedup.releasePinned(spark)
  }

  test("index append: write(old) + append(delta) holds the same rows as write(union)") {
    import graft.operators.DedupIndex
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 =!= 0)
    val a = java.nio.file.Files.createTempDirectory("graft_idx_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_idx_b").toString
    DedupIndex.write(old, a)
    DedupIndex.append(delta, a)
    DedupIndex.write(docs, b)
    // epoch is physical layout (which append batch landed the row), not
    // content — write(old)+append(delta) has epochs {0,1} vs the union
    // build's {0}; logical equality is everything else
    val ba = spark.read.parquet(s"$a/bands").drop("epoch")
    val bb = spark.read.parquet(s"$b/bands").drop("epoch")
    assert(ba.count() === bb.count())
    assert(ba.exceptAll(bb).count() === 0)
    assert(DedupIndex.readMeta(a) === DedupIndex.readMeta(b))
  }

  // --------------------------------------------- advice fixes, round 6

  test("exactDistinctByKey keeps a key whose members are all NULL (count 0)") {
    val df = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", None), ("b", None) // all-NULL key: SQL GROUP BY returns it with 0
    ).toDF("k", "m")
    val got = SkewTools.exactDistinctByKey(df, "k", "m", "n")
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 0L)))
  }

  // --------------------------------------------- task retry (reference
  // dags/pipeline.py:806-811: retries=2, retry_delay=5 minutes)

  test("task retry: fail once then succeed yields two attempt logs and a success") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry").toString
    var calls = 0
    var slept = 0L
    val out = graft.procurement.TaskLog.timedWithRetry[String](
      dir, "flaky", "01-02-2026", retries = 2, retryDelayMs = 300000L,
      sleep = ms => slept += ms) {
      calls += 1
      if (calls == 1) sys.error("transient") else "ok"
    }
    assert(out === "ok")
    assert(calls === 2)
    assert(slept === 300000L) // one delay between the two attempts
    val attempts = new java.io.File(s"$dir/attempts/01-02-2026/flaky")
    assert(attempts.listFiles().map(_.getName).sorted.toSeq ===
      Seq("attempt=1.log", "attempt=2.log"))
    val a1 = java.nio.file.Files.readString(attempts.toPath.resolve("attempt=1.log"))
    assert(a1.contains("status=start") && a1.contains("failed_retrying"))
    val a2 = java.nio.file.Files.readString(attempts.toPath.resolve("attempt=2.log"))
    assert(a2.contains("status=success"))
    // per-attempt JSON trail: one exception record, one success record
    assert(new java.io.File(s"$dir/exceptions/01-02-2026").listFiles().length === 1)
    assert(new java.io.File(s"$dir/tasks/01-02-2026").listFiles().length === 1)
  }

  test("task retry: three failures exhaust the attempts and rethrow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry3").toString
    var calls = 0
    val e = intercept[RuntimeException] {
      graft.procurement.TaskLog.timedWithRetry[Unit](
        dir, "doomed", "01-02-2026", retries = 2, retryDelayMs = 1L,
        sleep = _ => ()) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(e.getMessage === "boom 3") // the FINAL attempt's failure surfaces
    assert(calls === 3)
    assert(new java.io.File(s"$dir/attempts/01-02-2026/doomed")
      .listFiles().length === 3)
    assert(new java.io.File(s"$dir/exceptions/01-02-2026").listFiles().length === 3)
  }

  test("zero-arg custom SQL functions raise a readable arity error") {
    val s2 = spark.newSession()
    GraftExtensions.registerAll(s2)
    // right arity still works through the shared checked builders
    assert(s2.sql("SELECT max_multiplicity(array('a','b','a'))")
      .collect()(0).getLong(0) === 2L)
    Seq("max_multiplicity()", "doc_fingerprint()", "float_vec_dot(array(1.0F))")
      .foreach { call =>
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          s2.sql(s"SELECT $call").collect()
        }
        assert(e.getMessage.toLowerCase.contains("parameter"),
          s"$call: expected a wrong-arg-count analysis error, got: ${e.getMessage}")
      }
  }
}
