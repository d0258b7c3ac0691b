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
    * watch directory of arriving part files.
    *
    * The file source needs an explicit schema, and `ts`'s physical
    * encoding has varied across testdata regenerations (ns-as-long vs
    * TIMESTAMP_NTZ micros — see Tables.events). One batch-reader schema
    * probe picks the matching on-read type, then the stream normalizes to
    * TimestampType exactly as the batch loader does. On an EMPTY watch
    * directory (no file matches the glob yet) the probe cannot infer and
    * falls back to ns-as-long (the historical default), so a stream may
    * start before its first file arrives. Consequence of probing once: all
    * files a watch directory will ever receive must share ONE ts encoding
    * — a mid-stream encoding flip would be read under the frozen schema
    * (normalize encodings at file-write time; the driver corpora are
    * single-encoding per directory). */
  def hourlyStream(spark: SparkSession, dir: String,
                   glob: String = "events.parquet"): DataFrame = {
    // only the EMPTY-directory case may fall back to the historical
    // default — any other probe failure (corrupt file, IO error, missing
    // ts column) must stay loud: swallowing it here would freeze a wrong
    // schema and turn a setup error into a silently wrong stream later
    val onDisk =
      try spark.read.option("pathGlobFilter", glob).parquet(dir)
        .schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && (e.getMessage.contains("PATH_NOT_FOUND")
              || e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")
              || e.getMessage.contains("unable to infer")) =>
          LongType
      }
    val raw = spark.readStream
      .schema(StructType(eventSchema.fields.map {
        case f if f.name == "ts" => StructField("ts", onDisk)
        case f => f
      }))
      .option("pathGlobFilter", glob)
      .parquet(dir)
    val ticked = onDisk match {
      case LongType => raw.withColumn("ts", Tables.nsToTimestampExpr("ts"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
    hourlyAgg(ticked.withWatermark("ts", "2 hours"))
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

  /** Driver-gated streaming dedup: replays the events table through a
    * `MemoryStream` in ts-ordered micro-batches and PLANTS a re-delivery
    * of every 7th event into the FOLLOWING batch — the raw table has
    * unique event_ids, so without planting, a pass-through (no dedup at
    * all) would trivially match the oracle. [[dedupStream]] must drop
    * exactly the re-deliveries, leaving the sink equal to the raw events
    * table ([[dedupStreamOracle]] — a plain projection of it). The
    * watermark delay is sized past the table's full time span so no state
    * expires mid-replay (expiry would re-admit a duplicate and fail the
    * hash); production uses a horizon-sized delay, which is the point of
    * `dropDuplicatesWithinWatermark` over stream-global dropDuplicates.
    *
    * Driver-side collect is the MemoryStream replay harness (gate scale
    * only), same adjudicated pattern as [[sessionsStreamingFromDir]]. */
  def dedupStreamFromDir(spark: SparkSession, dir: String,
                         nBatches: Int = 8): DataFrame = {
    import spark.implicits._
    val evs: Array[(Long, java.sql.Timestamp, Long, String, Double)] =
      Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect()
    require(evs.nonEmpty, s"no events under $dir")
    val spanSec = (evs.last._2.getTime - evs.head._2.getTime) / 1000L + 3600L
    val batches = Replay.evenBatches(evs, nBatches)
    // re-deliveries ride one batch behind their original (dupes of the
    // last batch get a trailing batch of their own)
    val redeliveries = batches.map(_.zipWithIndex.collect {
      case (e, i) if i % 7 == 0 => e
    })
    val withDupes = batches.zipWithIndex.map { case (b, k) =>
      if (k == 0) b else b ++ redeliveries(k - 1)
    } :+ redeliveries.last
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Replay.run(spark, withDupes,
      Seq("event_id", "ts", "user_id", "event_type", "value"),
      df => dedupStream(df, watermark = s"$spanSec seconds"),
      out => out
        .select(col("event_id"), date_format(col("ts"), fmt).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")))
  }

  /** Driver-gated STREAMING windowed aggregation: replays the events
    * table through a `MemoryStream` in ts-ordered micro-batches, runs the
    * SAME [[hourlyAgg]] the batch twin uses (watermarked, append mode —
    * each window emits exactly once, when the watermark proves it final),
    * flushes the tail with one far-future sentinel, and returns the sink
    * shaped exactly like [[hourlyBatch]] — so the SAME [[hourlyOracle]]
    * must hash-match it. In-order replay means every event is
    * watermark-admitted; window sums are integer micros (associative), so
    * the streaming answer is provably the batch answer.
    *
    * Driver-side collect is the MemoryStream replay harness (gate scale
    * only), same adjudicated pattern as [[sessionsStreamingFromDir]]. */
  def hourlyStreamingFromDir(spark: SparkSession, dir: String,
                             nBatches: Int = 8): DataFrame = {
    import spark.implicits._
    val evs: Array[(java.sql.Timestamp, Long, String, Double)] =
      Tables.events(spark, dir)
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_type"), col("value"))
        .as[(java.sql.Timestamp, Long, String, Double)].collect()
    require(evs.nonEmpty, s"no events under $dir")
    // the LEADING SPACE is intentional (r19 ADVICE asked that it be
    // documented): real event_types are non-padded identifiers, so
    // " flush" cannot collide, and it sorts before every real type
    val sentinelType = " flush"
    // one far-future event pushes the watermark past every real window
    val far = new java.sql.Timestamp(evs.last._1.getTime + 3L * 24 * 3600 * 1000)
    val batches = Replay.evenBatches(evs, nBatches) :+
      Seq((far, -1L, sentinelType, 0.0))
    Replay.run(spark, batches, Seq("ts", "user_id", "event_type", "value"),
      df => hourlyAgg(df.withWatermark("ts", "2 hours")).drop("approx_users"),
      out => out
        .filter(col("event_type") =!= sentinelType)
        .orderBy(col("hour_start"), col("event_type")))
  }

  /** The batch truth for [[dedupStreamFromDir]]: re-deliveries dropped ⇔
    * the raw events table, projected and formatted identically. */
  val dedupStreamOracle: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      |       user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

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

  /** Carried state for the streaming variants: the time-ordered list of
    * session intervals not yet provably final. Neighbors are separated by
    * more than the gap (mergeFold's invariant); the streaming emit rule
    * releases an interval only once the watermark passes `last + gap`, so
    * the list length is bounded by |sessions inside the watermark horizon|
    * per user, not by stream history. */
  case class SessionChain(intervals: Seq[SessionState])

  /** The ONE session merge shared by [[sessionizeStateful]] and
    * [[sessionizeStreaming]] — the twins must never diverge, so there is
    * exactly one copy of the rule. Pure: returns the merged, time-ordered
    * interval list; the CALLER decides which intervals are final.
    *
    * Shape: (1) fold THIS invocation's events — sorted micros-exact via
    * `Timestamp.compareTo`, `getTime` would truncate to millis — into
    * session intervals with the plain gaps-and-islands rule (batch-twin
    * exact for everything delivered together); (2) merge the carried
    * intervals into that time-ordered list, combining neighbors within the
    * floor-second gap. Event and value totals are conserved in every case. */
  private def mergeFold(carried: Seq[SessionState], events: Iterator[SessionEvent],
                        gapSec: Long): Seq[SessionState] = {
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
    val all = (carried ++ chain).sortWith((a, b) => earlier(a.start, b.start))
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
    merged.toSeq
  }

  /** Stateful streaming sessionization: `flatMapGroupsWithState` keeps one
    * open session per user; an event past the gap closes-and-emits the
    * previous session. State is O(|active users|), independent of stream
    * length.
    *
    * `emitOpenSessions` picks the tail behavior:
    *   - `true` (the batch-twin contract): every merged interval is emitted
    *     and state dropped at the end of the invocation — correct ONLY for
    *     batch-over-static-data, where each group sees all its events at
    *     once. In a real stream this would split every session that spans
    *     two micro-batches.
    *   - `false`: ALL intervals are held in state and nothing is emitted —
    *     with `NoTimeout` there is no watermark to prove an interval final,
    *     so this mode is a building block only; use [[sessionizeStreaming]],
    *     whose event-time timeout both closes idle sessions and releases
    *     intervals exactly when the watermark proves them final. */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMinutes: Int = 30,
                         emitOpenSessions: Boolean = true): org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapSec = gapMinutes * 60L
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
      (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionChain]) => {
        val merged = mergeFold(state.getOption.map(_.intervals).getOrElse(Nil), it, gapSec)
        if (emitOpenSessions) { // batch twin: the group is complete
          state.remove()
          merged.iterator.map(emitSession(user, _))
        } else { // hold everything; emission needs a watermark (see scaladoc)
          if (merged.nonEmpty) state.update(SessionChain(merged))
          Iterator.empty
        }
      })
  }

  /** TRUE streaming sessionization: `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT, exact for all watermark-admitted data (the
    * `session_window` rule). An interval is emitted ONLY once the
    * watermark passes `last + gap` — the first point where no admissible
    * event (every later event has `ts > watermark ≥ last + gap`) can merge
    * into or bridge onto it. Until then closed-looking intervals are HELD
    * in state, so an out-of-order event arriving micro-batches later still
    * merges into the session it belongs to instead of starting a fresh one
    * (the pre-round-6 behavior emitted every non-latest interval
    * immediately, splitting exactly that case). Sessions spanning
    * micro-batches merge; idle sessions close via the timeout with no
    * further event from that user needed. The only residual approximation:
    * an event BELOW the current watermark that Spark still admits (the
    * one-batch grace against the previous watermark) can target an
    * already-released interval and then starts a new session — that is
    * data the watermark contract already classifies as late.
    *
    * Scale: state is O(|intervals inside the watermark horizon|) per user
    * — bounded by the watermark delay over the session gap, independent of
    * stream length. Call on a stream that already has
    * `withWatermark("ts", ...)` applied — the timeout needs it. */
  def sessionizeStreaming(events: org.apache.spark.sql.Dataset[SessionEvent],
                          gapMinutes: Int = 30): org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapSec = gapMinutes * 60L
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())(
      (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionChain]) => {
        val wmSec = Math.floorDiv(state.getCurrentWatermarkMs, 1000L)
        // final ⇔ the watermark passed the interval's merge horizon
        def ripe(s: SessionState): Boolean = sec(s.last) + gapSec < wmSec
        // hold the rest; re-arm at the EARLIEST pending close. The gap rule
        // merges while sec(e.ts) <= sec(last) + gapSec, so the earliest
        // non-merging instant is the start of floor-second
        // sec(last) + gap + 1 — arming at raw last+gap millis would fire up
        // to ~1 s early and split a session the batch twin merges. CLAMPED
        // above the current EVICTION watermark: Spark admits late rows
        // against the PREVIOUS batch's watermark but rejects timeout
        // timestamps below the current one (throws, killing the query) — a
        // late straggler re-arming an old session hits exactly that window;
        // the clamp fires the timeout next batch. (Held intervals have
        // close ≥ watermark by the ripe() split, so the clamp is a
        // belt-and-braces guard, not the normal path.)
        def release(merged: Seq[SessionState]): Iterator[Session] = {
          val (done, held) = merged.partition(ripe)
          if (held.nonEmpty) {
            state.update(SessionChain(held))
            state.setTimeoutTimestamp(math.max(
              (held.map(s => sec(s.last)).min + gapSec + 1) * 1000L,
              state.getCurrentWatermarkMs + 1))
          } else state.remove()
          done.iterator.map(emitSession(user, _))
        }
        if (state.hasTimedOut) release(state.get.intervals)
        else release(mergeFold(state.getOption.map(_.intervals).getOrElse(Nil), it, gapSec))
      })
  }

  /** Driver-gated streaming sessionization: replays the events table
    * through a `MemoryStream` in `nBatches` event-time-ordered
    * micro-batches, runs [[sessionizeStreaming]] over it (watermarked,
    * append-mode memory sink), flushes the tail with two far-future
    * sentinel batches (the first advances the watermark past every real
    * session's close; the second fires the armed event-time timeouts), and
    * returns the collected sink shaped exactly like [[sessionsFromDir]] —
    * so the SAME DuckDB oracle ([[sessionsOracle]]) must hash-match it.
    * In-order replay means every event is watermark-admitted, so the
    * streaming result is provably identical to the batch gaps-and-islands
    * answer: intervals merge the same (the fold is shared code), micro
    * sums are associative, and emission timing never changes content.
    *
    * The driver-side collect is inherent to `MemoryStream` (a test/replay
    * harness — production wiring reads Kafka/files via `readStream`); the
    * events table is 10k–100k rows at gate scales. */
  def sessionsStreamingFromDir(spark: SparkSession, dir: String,
                               nBatches: Int = 8): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .orderBy(col("ts"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .collect()
    require(evs.nonEmpty, s"no events under $dir")
    // two far-future sentinel batches: the first advances the watermark
    // past every real session's close; the second fires the armed timeouts
    val far = new java.sql.Timestamp(evs.last._2.getTime + 3L * 24 * 3600 * 1000)
    val batches = Replay.evenBatches(evs, nBatches) :+
      Seq((-1L, far, 0.0)) :+
      Seq((-1L, new java.sql.Timestamp(far.getTime + 3600L * 1000), 0.0))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Replay.run(spark, batches, Seq("user_id", "ts", "value"),
      df => sessionizeStreaming(
        df.withWatermark("ts", "10 minutes").as[SessionEvent]).toDF(),
      out => out
        .filter(col("user_id") >= 0) // drop the flush sentinels
        .select(
          col("user_id"),
          date_format(col("session_start"), fmt).as("session_start"),
          date_format(col("session_end"), fmt).as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start")))
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
