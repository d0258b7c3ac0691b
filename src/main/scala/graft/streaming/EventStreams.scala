package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the events table.
  *
  * The reference is strictly daily batch (SURVEY §2 "no streaming
  * constructs"), but its snapshot/ingest cadence is a micro-batch stream in
  * disguise; this module provides the Spark-native streaming equivalents a
  * user scaling that cadence would need: watermarked tumbling-window
  * aggregation and stateful sessionization. [[hourlyBatch]] is the exact
  * batch twin of the windowed aggregation — same plan shape, same results
  * on a static day — which is what makes the streaming path testable
  * against the DuckDB oracle.
  *
  * Scale: windowed aggregation is partial-aggregated per micro-batch and
  * shuffles on (window, event_type) — state size is bounded by
  * |windows in watermark| × |event types|, not by input volume.
  */
object EventStreams {

  /** The events schema after ns→µs conversion (see Tables.events). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 1-hour aggregation, shared by batch and streaming paths.
    * Values reduce to exact integer micros first (floor-form — the
    * double→DECIMAL cast itself rounds differently across engines, see
    * StableRound) and the micro sums are exact/order-independent; the
    * surface is DOUBLE. */
  private def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        sum(graft.functions.StableRound.microsLong(col("value"))).as("sum_micros"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("approx_users"),
        (col("sum_micros").cast("double") / 1e6).as("sum_value"))

  /** Batch twin (driver-contract query). approx_users is excluded from the
    * oracle compare (HLL internals differ per engine) — kept deterministic
    * within Spark. */
  def hourlyBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(Tables.events(spark, dir))
      .drop("approx_users")
      .orderBy(col("hour_start"), col("event_type"))

  val hourlyOracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming variant: file source → watermark → windowed agg. The glob
    * defaults to the test corpus's single file; pass "*.parquet" for a
    * watch directory of arriving part files. */
  def hourlyStream(spark: SparkSession, dir: String,
                   glob: String = "events.parquet"): DataFrame = {
    val raw = spark.readStream
      .schema(StructType(eventSchema.fields.map {
        case f if f.name == "ts" => StructField("ts", LongType) // ns-as-long
        case f => f
      }))
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumn("ts", Tables.nsToTimestampExpr("ts"))
    hourlyAgg(raw.withWatermark("ts", "2 hours"))
  }

  /** Run the stream over a static directory to completion (test/demo). */
  def runToMemorySink(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = hourlyStream(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming ingestion dedup: drop re-deliveries of the same key within
    * the watermark horizon — the at-least-once → effectively-once step in
    * front of any streaming corpus/event ingest (the batch twin is
    * [[graft.operators.Dedup.exact]]).
    *
    * Scale: `dropDuplicatesWithinWatermark` keeps ONE state entry per
    * distinct key seen inside the watermark and expires it as the
    * watermark advances — state is bounded by arrival rate × watermark,
    * never by stream history (a plain `dropDuplicates` on a stream would
    * grow state forever). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours",
                  keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // ------------------------------------------------------- sessionization

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** value accumulates in exact micros (value rounded to 6 dp × 1e6) —
    * the same DECIMAL(18,6) arithmetic the batch twin uses; raw double
    * accumulation would drift from it by last-ulp error per event. */
  case class SessionState(start: java.sql.Timestamp, last: java.sql.Timestamp,
                          n: Long, micros: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     session_value: Double)

  // gap measured in floor-seconds, matching the batch twin's
  // ts.cast("long") semantics (timestamp→long truncates to seconds)
  private def sec(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
  private def emitSession(user: Long, s: SessionState): Session =
    Session(user, s.start, s.last, s.n, s.micros / 1e6)

  /** The ONE session fold shared by [[sessionizeStateful]] and
    * [[sessionizeStreaming]] — the twins must never diverge, so there is
    * exactly one copy of the merge rule. Closed sessions append to `out`;
    * returns the still-open (latest) state, or null.
    *
    * Shape: (1) fold THIS invocation's events — sorted micros-exact via
    * `Timestamp.compareTo`, `getTime` would truncate to millis — into
    * session intervals with the plain gaps-and-islands rule (batch-twin
    * exact for everything delivered together); (2) merge the carried open
    * interval into that time-ordered list, combining neighbors within the
    * floor-second gap; (3) every interval except the LATEST is final. For
    * per-user in-order delivery this is exactly the oracle's rule; for
    * watermark-admitted out-of-order arrivals it is exact for everything
    * that arrives in one invocation (same-batch stragglers chain and can
    * bridge INTO the open session), while events of an already-EMITTED
    * session arriving in a later batch start a fresh interval — the one
    * bounded-state approximation (resurrecting emitted sessions would
    * require keeping history). Event and value totals are conserved in
    * every case. */
  private def foldSorted(user: Long, cur0: SessionState, events: Iterator[SessionEvent],
                         gapSec: Long,
                         out: scala.collection.mutable.ArrayBuffer[Session]): SessionState = {
    // exact accumulation in floor-form micros == the batch twin's sums
    def micros(v: Double): Long = graft.functions.StableRound.microsOf(v)
    def earlier(a: java.sql.Timestamp, b: java.sql.Timestamp) = a.compareTo(b) < 0
    val chain = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    events.toSeq.sortWith((a, b) => earlier(a.ts, b.ts)).foreach { e =>
      if (chain.isEmpty || sec(e.ts) - sec(chain.last.last) > gapSec)
        chain += SessionState(e.ts, e.ts, 1, micros(e.value))
      else {
        val s = chain.last
        val last = if (earlier(s.last, e.ts)) e.ts else s.last
        chain(chain.size - 1) = SessionState(s.start, last, s.n + 1, s.micros + micros(e.value))
      }
    }
    val all = (Option(cur0).toSeq ++ chain)
      .sortWith((a, b) => earlier(a.start, b.start))
    val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    all.foreach { s =>
      if (merged.isEmpty || sec(s.start) - sec(merged.last.last) > gapSec) merged += s
      else {
        val p = merged.last
        val start = if (earlier(s.start, p.start)) s.start else p.start
        val last = if (earlier(p.last, s.last)) s.last else p.last
        merged(merged.size - 1) = SessionState(start, last, p.n + s.n, p.micros + s.micros)
      }
    }
    if (merged.isEmpty) null
    else {
      merged.init.foreach(s => out += emitSession(user, s))
      merged.last
    }
  }

  /** Stateful streaming sessionization: `flatMapGroupsWithState` keeps one
    * open session per user; an event past the gap closes-and-emits the
    * previous session. State is O(|active users|), independent of stream
    * length.
    *
    * `emitOpenSessions` picks the tail behavior:
    *   - `true` (the batch-twin contract): the still-open session is
    *     emitted and state dropped at the end of the invocation — correct
    *     ONLY for batch-over-static-data, where each group sees all its
    *     events at once. In a real stream this would split every session
    *     that spans two micro-batches.
    *   - `false` (streaming): the open session is kept in state and
    *     continues into the next micro-batch; prefer [[sessionizeStreaming]],
    *     which adds the event-time timeout that actually closes idle
    *     sessions. */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMinutes: Int = 30,
                         emitOpenSessions: Boolean = true): org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapSec = gapMinutes * 60L
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
      (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        val cur = foldSorted(user, state.getOption.orNull, it, gapSec, out)
        if (cur != null) {
          if (emitOpenSessions) { // batch twin: the group is complete
            out += emitSession(user, cur)
            state.remove()
          } else state.update(cur) // streaming: session continues next batch
        }
        out.iterator
      })
  }

  /** TRUE streaming sessionization: `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT. Sessions that close inside a micro-batch (a new
    * event arrives past the gap) emit immediately; the still-open session
    * stays in state with a timeout at `last + gap`, and when the WATERMARK
    * passes that point the state times out and the session is emitted with
    * no further event from that user needed — the piece
    * [[sessionizeStateful]]'s streaming mode (`emitOpenSessions = false`)
    * leaves to deployment wiring. Sessions spanning micro-batches merge
    * (the batch twin, seeing each batch in isolation, would split them).
    *
    * Scale: state is O(|open sessions|) = O(|active users|); the watermark
    * bounds how long an idle session occupies state. Call on a stream that
    * already has `withWatermark("ts", ...)` applied — the timeout needs it.
    */
  def sessionizeStreaming(events: org.apache.spark.sql.Dataset[SessionEvent],
                          gapMinutes: Int = 30): org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapSec = gapMinutes * 60L
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())(
      (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
        if (state.hasTimedOut) {
          // the watermark passed the first instant at which no event could
          // merge any more (see the timeout arming below): final
          val done = state.get
          state.remove()
          Iterator.single(emitSession(user, done))
        } else {
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          val cur = foldSorted(user, state.getOption.orNull, it, gapSec, out)
          if (cur != null) {
            state.update(cur)
            // the gap rule merges while sec(e.ts) <= sec(last) + gapSec, so
            // the earliest NON-merging instant is the start of floor-second
            // sec(last) + gap + 1 — arming at raw last+gap millis would fire
            // up to ~1 s early and split a session the batch twin merges.
            // CLAMPED above the current EVICTION watermark: Spark admits
            // late rows against the PREVIOUS batch's watermark but rejects
            // timeout timestamps below the current one (throws, killing the
            // query) — a late straggler re-arming an old session hits
            // exactly that window; the clamp fires the timeout next batch.
            state.setTimeoutTimestamp(math.max(
              (sec(cur.last) + gapSec + 1) * 1000L,
              state.getCurrentWatermarkMs + 1))
          }
          out.iterator
        }
      })
  }

  /** Batch twin of sessionization via the window-gap pattern — verifies
    * [[sessionizeStateful]] on static data. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(graft.functions.StableRound.microsLong(col("value"))).cast("double") / 1e6)
          .as("session_value"))
  }

  /** Gated sessionization query: 30-minute-gap sessions over the events
    * table. The surface drops the internal session ordinal — a session is
    * identified by (user_id, session_start), which is unique because two
    * sessions of one user are separated by more than the gap. Timestamps
    * are formatted to micro precision so the driver hash-compares strings,
    * not engine-specific timestamp encodings (same convention as
    * [[hourlyBatch]]).
    *
    * Tie safety: rows with equal (user_id, ts) sort ambiguously under the
    * lag window, but equal timestamps are contiguous under ANY order and
    * their inter-row gap is 0 — the island partition (and every aggregate,
    * all order-independent) is identical regardless of tie order, so the
    * result is deterministic and matches the oracle. */
  def sessionsFromDir(spark: SparkSession, dir: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    sessionizeBatch(Tables.events(spark, dir).select(col("user_id"), col("ts"), col("value")))
      .select(
        col("user_id"),
        date_format(col("session_start"), fmt).as("session_start"),
        date_format(col("session_end"), fmt).as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** DuckDB twin: the gaps-and-islands pattern. The gap is measured in
    * floor-seconds (`epoch_us // 1e6` == Spark's `ts.cast("long")`
    * truncation); values accumulate in exact integer micros. */
  def sessionsOracle(gapMinutes: Int = 30): String =
    s"""WITH e AS (
       |  SELECT user_id, ts, CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vmicros,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR epoch_us(ts) // 1000000
       |                   - epoch_us(lag(ts) OVER w) // 1000000 > ${gapMinutes * 60L}
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), s AS (
       |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |              ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM e
       |)
       |SELECT user_id,
       |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(vmicros) AS DOUBLE) / 1e6 AS session_value
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_start""".stripMargin
}
