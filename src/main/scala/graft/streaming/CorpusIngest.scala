package graft.streaming

import graft.functions.{Fingerprint, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming corpus ingest — the curation pipeline's continuous-arrival
  * face: watch a directory of document JSON, quality-gate, drop re-deliveries
  * AND exact-content duplicates by fingerprint within the watermark, and
  * append survivors to a parquet corpus.
  *
  * This composes the already-verified batch operators at their streaming
  * equivalents: `TextFunctions.qualityScore` (scan-fused expressions),
  * the codegen'd `Fingerprint` content hash, and
  * `dropDuplicatesWithinWatermark` (state = one entry per distinct
  * fingerprint inside the watermark, expired as it advances — a plain
  * stream dropDuplicates would grow state with corpus history).
  *
  * Scale: every transform is per-row and scan-fused; the only stateful
  * operator is the fingerprint dedup, whose state is bounded by arrival
  * rate × watermark. The parquet sink appends — downstream batch dedup
  * (MinHash, clusters) runs on the accumulated corpus on its own cadence,
  * which is how near-dup (unbounded-lookback) semantics and streaming
  * (bounded-state) semantics divide the work.
  */
object CorpusIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType)))

  /** The ingest transform, shared by [[start]] (production file-watch
    * wiring) and [[ingestStreamFromDir]] (the gated MemoryStream replay) —
    * ONE copy of the rule so the gated path proves the production path.
    * Input needs `text` and an event-time `ingest_ts` column; quality gate
    * first (state never holds rejected docs), then content-fingerprint
    * dedup within the watermark. */
  def cleanse(docs: org.apache.spark.sql.DataFrame, qualityMin: Double = 0.5,
              watermark: String = "1 hour"): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("quality_score", TextFunctions.qualityScore(col("text")))
      .filter(col("quality_score") >= qualityMin)
      .withColumn("fingerprint", Fingerprint.docFingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Start the ingest: `watchDir` JSON in, quality-gated fingerprint-deduped
    * parquet out at `outDir`. */
  def start(spark: SparkSession, watchDir: String, outDir: String,
            qualityMin: Double = 0.5, watermark: String = "1 hour"): StreamingQuery =
    cleanse(
      spark.readStream.schema(docSchema)
        .option("multiLine", "true").json(watchDir)
        // arrival time is the event time of an ingest stream: re-deliveries
        // land later, which is exactly what the watermark bounds
        .withColumn("ingest_ts", current_timestamp()),
      qualityMin, watermark)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/.ingest_checkpoint")
      .start()

  /** Driver-gated streaming corpus ingest: replays the documents table
    * through a `MemoryStream` in micro-batches with a DETERMINISTIC
    * synthetic arrival time (base + batch index seconds — production's
    * `current_timestamp()` would never hash-match an oracle), planting an
    * exact-content re-delivery of every 6th doc — SAME text, DIFFERENT
    * doc_id (offset by 10M) — into the following batch. [[cleanse]] must
    * (a) drop every below-threshold doc at the quality gate and (b) drop
    * every planted copy at the fingerprint dedup (content dedup, which a
    * key-based dedup would NOT catch since the ids differ), leaving
    * exactly the quality survivors of the raw table — which is what
    * [[ingestOracle]] computes in DuckDB. All 500/5000 gate-corpus
    * fingerprints are distinct (verified), so no accidental collision can
    * eat a legitimate doc.
    *
    * Driver-side collect is the MemoryStream replay harness (gate scale
    * only), same adjudicated pattern as [[EventStreams.sessionsStreamingFromDir]]. */
  def ingestStreamFromDir(spark: SparkSession, dir: String,
                          nBatches: Int = 8): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(batch: Int) = new java.sql.Timestamp(base.getTime + batch * 1000L)
    val docs: Array[(Long, String)] =
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .as[(Long, String)].collect()
    require(docs.nonEmpty, s"no documents under $dir")
    val batches = Replay.evenBatches(docs, nBatches)
    val redeliveries = batches.map(_.zipWithIndex.collect {
      case ((id, text), i) if i % 6 == 0 => (id + 10_000_000L, text)
    })
    // re-deliveries ride one batch behind their original, stamped with the
    // deterministic per-batch arrival time (see scaladoc)
    val timed = batches.zipWithIndex.map { case (b, k) =>
      (b ++ (if (k == 0) Nil else redeliveries(k - 1)))
        .map { case (id, t) => (id, at(k), t) }
    } :+ redeliveries.last.map { case (id, t) => (id, at(batches.size), t) }
    Replay.run(spark, timed, Seq("doc_id", "ingest_ts", "text"),
      df => cleanse(df, watermark = "1 hour"),
      out => out
        .select(col("doc_id"), col("quality_score"), col("fingerprint"))
        .orderBy(col("doc_id")))
  }

  /** The batch truth for [[ingestStreamFromDir]]: quality-filtered raw
    * table with its content fingerprint — planted re-deliveries gone
    * (their 10M-offset ids never appear), rejected docs gone. Quality and
    * fingerprint twins interpolate the SAME single-sourced fragments the
    * `text_quality` / `text_fingerprint` gates prove
    * ([[TextFunctions.qualityScoreSql]], [[Fingerprint.fingerprintSql]])
    * — a formula change cannot silently leave this oracle computing a
    * different truth. */
  def ingestOracle(qualityMin: Double = 0.5): String =
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |         ${TextFunctions.qualityScoreSql("text")} AS quality_score
       |  FROM documents
       |)
       |SELECT doc_id, quality_score,
       |       ${Fingerprint.fingerprintSql("text")} AS fingerprint
       |FROM scored WHERE quality_score >= $qualityMin
       |ORDER BY doc_id""".stripMargin
}
