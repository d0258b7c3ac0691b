package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The ONE MemoryStream replay scaffold behind every driver-gated
  * streaming query (`sessions_streaming`, `dedup_stream`,
  * `corpus_ingest_stream`, `events_hourly_streaming`): feed caller-built
  * micro-batches (including planted re-deliveries and sentinel flushes)
  * through a stateful streaming transform into a memory sink, return the
  * post-processed sink detached from the temp view. Shared so a
  * scaffolding fix lands once — the pre-factor copies had already drifted
  * (sentinel filter conventions) and shared a latent leak (conf set and
  * `start()` OUTSIDE the try: an analysis-time failure in `start()` left
  * the session pinned at 4 shuffle partitions for every later query).
  *
  * The replay runs 4-wide: per-micro-batch cost at gate scale is
  * state-store commits (one store per shuffle partition per stateful
  * operator), not data. The driver-side collect feeding `batches` is the
  * documented harness pattern (gate scale only; production wiring reads
  * Kafka/files via readStream).
  */
private[streaming] object Replay {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def run[T](spark: SparkSession,
             batches: Seq[Seq[T]],
             colNames: Seq[String],
             toStream: DataFrame => DataFrame,
             post: DataFrame => DataFrame)
            (implicit enc: org.apache.spark.sql.Encoder[T]): DataFrame = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = s"graft_replay_${sinkSeq.incrementAndGet()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    var q: StreamingQuery = null
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
      q = toStream(mem.toDF().toDF(colNames: _*)).writeStream
        .outputMode("append").format("memory").queryName(sink).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val out = post(spark.table(sink))
      spark.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      if (q != null) q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.catalog.dropTempView(sink)
    }
  }

  /** Caller convenience: rows → `nBatches` even batches. */
  def evenBatches[T](rows: Array[T], nBatches: Int): Vector[Seq[T]] = {
    val per = math.max(1, math.ceil(rows.length.toDouble / nBatches).toInt)
    rows.grouped(per).map(_.toSeq).toVector
  }
}
