package graft

import graft.operators.{ScalableCumsum, Similarity, SkewTools, TextAnalysis, Pinned}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-5 operator specs: repetition signals, normalization, deterministic
  * LSH ANN, skew-safe exact distinct, running revenue, session ties. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- repetition signals

  test("repetition: crafted docs give exact top counts and guarded fractions") {
    val docs = Seq(
      (1L, "a a a b"),        // toks 4, types 2, top tok 3; grams [a a, a a, a b] top 2
      (2L, "x"),              // 1 token: no grams, ttr 1.0
      (3L, ""),               // 0 tokens after empty-filter
      (4L, "p q p q p")       // toks 5, types 2, top tok 3; grams [p q,q p,p q,q p] top 2
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs).collect().map(x => x.getLong(0) -> x).toMap

    assert(r(1L).getLong(1) === 4 && r(1L).getLong(2) === 2)  // n_tokens, n_types
    assert(r(1L).getLong(4) === 3 && r(1L).getLong(5) === 2)  // top token / top 2gram
    assert(r(2L).getLong(3) === 0 && r(2L).isNullAt(7))       // no grams -> null frac
    assert(r(2L).getDouble(6) === 1.0)                        // ttr of unique token
    assert(r(3L).getLong(1) === 0 && r(3L).isNullAt(6))       // empty doc -> null ttr
    assert(r(4L).getLong(4) === 3 && r(4L).getLong(5) === 2)
    assert(r(4L).getDouble(7) === 0.5)                        // 2 of 4 grams
  }

  test("repetition: in-row max multiplicity equals explode-groupBy on real docs") {
    val docs = Tables.documents(spark, sf).limit(100)
    val inRow = TextAnalysis.repetition(docs)
      .select(col("doc_id"), col("top_token_count"))
    val exploded = docs
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").as("expected"))
    val joined = inRow.join(exploded, "doc_id")
    assert(joined.filter(col("top_token_count") =!= col("expected")).count() === 0)
    assert(joined.count() > 0)
  }

  test("bpe token stats: segment counts match hand-derived GPT-2-ish pre-tokenization") {
    val docs = Seq(
      (1L, "Hello world"),        // [Hello][ world] = 2
      (2L, "a1b2"),               // [a][1][b][2] = 4
      (3L, "don't stop!"),        // [don]['][t][ stop][!] = 5
      (4L, "x  y"),               // [x]["  " via ws+ — greedy, no lookahead][y] = 3
      (5L, ""),                   // 0 tokens, null ratio
      (6L, "." + "\u000B" + "x"),           // VT: Java \s includes it, RE2 doesn't — the
                                  // explicit ws class makes BOTH engines fold
                                  // it into the punctuation run: [.VT][x] = 2
      (7L, "a" + "\u000B" + "b")            // [a][VT as punct-run][b] = 3 in both engines
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenStats(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(2) === 2)
    assert(r(2L).getLong(2) === 4)
    assert(r(3L).getLong(2) === 5)
    assert(r(4L).getLong(2) === 3)
    assert(r(5L).getLong(2) === 0 && r(5L).isNullAt(3))
    assert(r(6L).getLong(2) === 2) // matches DuckDB/RE2 (validated)
    assert(r(7L).getLong(2) === 3)
    assert(r(1L).getDouble(3) === 5.5) // 11 chars / 2 tokens
  }

  // ------------------------------------------------------ normalization

  test("normalize: lowercases, strips, collapses, and counts PII") {
    val docs = Seq(
      (1L, "Hello,  World! reach me at First.Last+x@corp.example.com or https://a.example/b?c=1"),
      (2L, "plain text already")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.normalize(docs).collect().map(x => x.getLong(0) -> x).toMap
    val n1 = r(1L).getString(1)
    assert(!n1.exists(c => c.isUpper || (!c.isLetterOrDigit && c != ' ')))
    assert(!n1.contains("  ") && n1 == n1.trim)
    assert(r(1L).getLong(4) === 1 && r(1L).getLong(5) === 1)  // email, url
    assert(r(2L).getString(1) === "plain text already")
    assert(r(2L).getLong(4) === 0 && r(2L).getLong(5) === 0)
  }

  test("normalize: non-ASCII folds to spaces BEFORE lower (cross-engine-safe)") {
    // 'İ' is the Java-vs-utf8proc case-mapping divergence: it must never
    // reach lower(); the ASCII fold turns it into a space first
    val docs = Seq((1L, "Üñïcødé İstanbul Test")).toDF("doc_id", "text")
    val got = TextAnalysis.normalize(docs).select("norm_text").as[String].head()
    assert(got === "c d stanbul test")
    assert(got.forall(c => c.isLetterOrDigit && c <= 'z' || c == ' '))
  }

  // ------------------------------------------------- deterministic LSH ANN

  test("lsh ann: hashPlanes is deterministic and in [-1,1)") {
    val p1 = Similarity.hashPlanes(8, 2, 3)
    val p2 = Similarity.hashPlanes(8, 2, 3)
    assert(p1.flatten.flatten.toSeq === p2.flatten.flatten.toSeq)
    assert(p1.flatten.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("lsh ann: every returned neighbor carries the exact brute-force cosine") {
    val ann = Similarity.lshAnnFromDir(spark, sf).cache()
    val brute = Similarity.bruteForceKnn(
      Tables.embeddings(spark, sf),
      Tables.embeddings(spark, sf).filter(col("vec_id") < 8),
      k = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"), col("cosine_r").as("expected"))
    assert(ann.count() > 0)
    val joined = ann.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("expected").isNull ||
      col("cosine_r") =!= col("expected")).count() === 0)
    // per query, ranks are contiguous from 1 and cosine_r never increases
    // with rank (production ranks on the RAW cosine; re-deriving order from
    // the 8-dp rounded surface could legitimately flip rounded ties, so
    // assert monotonicity, not an exact re-ranking)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rank"))
    val bad = ann
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_c", lag(col("cosine_r"), 1).over(w))
      .filter(col("rn") =!= col("rank") || col("prev_c") < col("cosine_r"))
    assert(bad.count() === 0)
    ann.unpersist()
  }

  // ------------------------------------------- skew-safe distinct + cumsum

  test("exactDistinctByKey equals countDistinct") {
    val events = Tables.events(spark, sf)
    val twoPhase = SkewTools.exactDistinctByKey(events, "event_type", "user_id", "n")
    val direct = events.groupBy("event_type").agg(countDistinct("user_id").as("expected"))
    assert(twoPhase.join(direct, "event_type")
      .filter(col("n") =!= col("expected")).count() === 0)
  }

  test("running revenue: final total equals the micro-exact sum, no 1-partition window") {
    val r = ScalableCumsum.runningRevenueFromDir(spark, sf).cache()
    try {
      val last = r.orderBy(col("order_ts").desc, col("o_orderkey").desc).limit(1)
        .select("running_revenue").as[Double].head()
      val total = Tables.orders(spark, sf)
        .agg(sum(graft.functions.StableRound.microsLong(col("o_totalprice"))))
        .as[Long].head()
      assert(math.abs(last - total / 1e6) < 1e-9)
      // monotone non-decreasing in sort order (prices are positive)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("order_ts"), col("o_orderkey"))
      assert(r.withColumn("prev", lag(col("running_revenue"), 1).over(w))
        .filter(col("prev") > col("running_revenue")).count() === 0)
    } finally { r.unpersist(); Pinned.release(spark) }
  }

  // ------------------------------------- streaming sessions with timeout

  test("streaming sessions: span micro-batches, idle sessions close via watermark timeout") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour").as[SessionEvent]
    val out = EventStreams.sessionizeStreaming(events, gapMinutes = 30)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // batch 1: user 1 opens a session
      mem.addData((1L, ts("2024-03-01 10:00:00"), 1.0), (1L, ts("2024-03-01 10:10:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("stream_sessions_test").count() === 0) // still open
      // batch 2: user 1 CONTINUES the same session across the batch
      // boundary (the batch twin would split here); user 2 far in the
      // future advances the watermark past user 1's last + gap
      mem.addData((1L, ts("2024-03-01 10:25:00"), 4.0), (2L, ts("2024-03-01 15:00:00"), 9.0))
      q.processAllAvailable()
      // batch 3: any batch after the watermark advance fires the timeout
      mem.addData((3L, ts("2024-03-01 15:01:00"), 0.0))
      q.processAllAvailable()
      val u1 = spark.table("stream_sessions_test")
        .filter(col("user_id") === 1L).collect()
      assert(u1.length === 1, "one merged session, not per-batch fragments")
      assert(u1(0).getAs[Long]("n_events") === 3)
      assert(u1(0).getAs[Double]("session_value") === 7.0)
      assert(u1(0).getAs[java.sql.Timestamp]("session_end") === ts("2024-03-01 10:25:00"))
    } finally q.stop()
  }

  test("streaming sessions: late events absorb into the open session or emit as singletons") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    // 6h watermark delay so cross-batch out-of-order events are ADMITTED
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours").as[SessionEvent]
    val out = EventStreams.sessionizeStreaming(events, gapMinutes = 30)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions_ooo_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      mem.addData((9L, ts("2024-03-02 10:00:00"), 1.0))
      q.processAllAvailable()
      // late but within gap-reach of the session start -> absorbed (start
      // widens backwards, last stays); far older -> separate interval, but
      // (round 6) HELD in state, not emitted — the watermark (04:00) has
      // not yet passed 08:00 + gap, so a still-admissible event could merge
      mem.addData((9L, ts("2024-03-02 09:50:00"), 2.0), (9L, ts("2024-03-02 08:00:00"), 5.0))
      q.processAllAvailable()
      assert(spark.table("stream_sessions_ooo_test")
        .filter(col("user_id") === 9L).count() === 0)
      // advance the watermark far past 10:00 + gap, then fire the timeout:
      // BOTH intervals release — the 08:00 singleton and the merged session
      mem.addData((8L, ts("2024-03-03 12:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData((7L, ts("2024-03-03 12:01:00"), 0.0))
      q.processAllAvailable()
      val singles = spark.table("stream_sessions_ooo_test")
        .filter(col("user_id") === 9L && col("n_events") === 1).collect()
      assert(singles.length === 1)
      assert(singles(0).getAs[Double]("session_value") === 5.0)
      val merged = spark.table("stream_sessions_ooo_test")
        .filter(col("user_id") === 9L && col("n_events") > 1).collect()
      assert(merged.length === 1)
      assert(merged(0).getAs[java.sql.Timestamp]("session_start") === ts("2024-03-02 09:50:00"))
      assert(merged(0).getAs[java.sql.Timestamp]("session_end") === ts("2024-03-02 10:00:00"))
      assert(merged(0).getAs[Double]("session_value") === 3.0)
    } finally q.stop()
  }

  test("streaming sessions: same-batch stragglers chain and bridge into the open session") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours").as[SessionEvent]
    val out = EventStreams.sessionizeStreaming(events, gapMinutes = 30)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions_bridge_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      mem.addData((11L, ts("2024-03-04 10:00:00"), 1.0))
      q.processAllAvailable()
      // each within a gap of the NEXT, 09:40 within a gap of the open
      // session's start: the whole chain bridges into ONE session — the
      // batch twin's answer for the same data
      mem.addData((11L, ts("2024-03-04 09:00:00"), 1.0),
        (11L, ts("2024-03-04 09:25:00"), 1.0), (11L, ts("2024-03-04 09:40:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("stream_sessions_bridge_test")
        .filter(col("user_id") === 11L).count() === 0) // still one open session
      mem.addData((12L, ts("2024-03-05 12:00:00"), 0.0)) // advance watermark
      q.processAllAvailable()
      mem.addData((13L, ts("2024-03-05 12:01:00"), 0.0)) // fire the timeout
      q.processAllAvailable()
      val got = spark.table("stream_sessions_bridge_test")
        .filter(col("user_id") === 11L).collect()
      assert(got.length === 1)
      assert(got(0).getAs[Long]("n_events") === 4)
      assert(got(0).getAs[java.sql.Timestamp]("session_start") === ts("2024-03-04 09:00:00"))
      assert(got(0).getAs[java.sql.Timestamp]("session_end") === ts("2024-03-04 10:00:00"))
    } finally q.stop()
  }

  test("streaming sessions: a watermark jump plus a straggler must not kill the query") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.SessionEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours").as[SessionEvent]
    val out = EventStreams.sessionizeStreaming(events, gapMinutes = 30)
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions_jump_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      mem.addData((21L, ts("2024-03-06 10:00:00"), 1.0))
      q.processAllAvailable()
      mem.addData((22L, ts("2024-03-08 00:00:00"), 0.0)) // watermark jumps ~2 days
      q.processAllAvailable()
      // Spark admits late rows against the PREVIOUS watermark but rejects
      // timeout timestamps below the CURRENT one: re-arming for this
      // straggler used to throw and terminate the query (clamp fix)
      mem.addData((21L, ts("2024-03-06 05:00:00"), 2.0))
      q.processAllAvailable()
      mem.addData((23L, ts("2024-03-08 00:01:00"), 0.0))
      q.processAllAvailable()
      // the query survived, and the original 10:00 session was emitted once
      val tenOClock = spark.table("stream_sessions_jump_test")
        .filter(col("user_id") === 21L &&
          col("session_end") === ts("2024-03-06 10:00:00")).collect()
      assert(tenOClock.length === 1)
    } finally q.stop()
  }

  // ------------------------------------------------------- session ties

  test("sessions: same-timestamp events land in one session deterministically") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:40:00") // > 30 min gap
    val events = Seq(
      (7L, t0, 1.0), (7L, t0, 2.0), (7L, t1, 4.0)
    ).toDF("user_id", "ts", "value")
    val s = graft.streaming.EventStreams.sessionizeBatch(events)
      .orderBy("session_start").collect()
    assert(s.length === 2)
    assert(s(0).getAs[Long]("n_events") === 2)
    assert(s(0).getAs[Double]("session_value") === 3.0)
    assert(s(1).getAs[Long]("n_events") === 1)
  }
}
