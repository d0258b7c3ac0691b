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

  /** Start the ingest: `watchDir` JSON in, quality-gated fingerprint-deduped
    * parquet out at `outDir`. */
  def start(spark: SparkSession, watchDir: String, outDir: String,
            qualityMin: Double = 0.5, watermark: String = "1 hour"): StreamingQuery =
    spark.readStream.schema(docSchema)
      .option("multiLine", "true").json(watchDir)
      // arrival time is the event time of an ingest stream: re-deliveries
      // land later, which is exactly what the watermark bounds
      .withColumn("ingest_ts", current_timestamp())
      .withColumn("quality_score", TextFunctions.qualityScore(col("text")))
      .filter(col("quality_score") >= qualityMin)
      .withColumn("fingerprint", Fingerprint.docFingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/.ingest_checkpoint")
      .start()
}
