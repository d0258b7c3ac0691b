package graft.operators

import graft.functions.Fingerprint
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the training-prep step that turns
  * long documents into fixed-size overlapping windows (context-length
  * packing reads these, dedup runs per-chunk, retrieval indexes them).
  *
  * Windows start at multiples of `stride`; generation stops at the FIRST
  * window that reaches the end of the text, so a doc of length L yields
  * one chunk when `L <= size`, else `(L - size + stride - 1) div stride
  * + 1` — every character is covered, consecutive chunks overlap by
  * `size - stride`, and no window is a redundant subset of its
  * predecessor (continuing past the end would emit tail windows fully
  * contained in the previous one, inflating downstream per-chunk dedup
  * and packing for nothing).
  *
  * The gate surface carries chunk COORDINATES plus a content fingerprint
  * — not the chunk text itself. At 100 TB the chunk text is written to
  * shards (see Curation.packShards for that path); what every downstream
  * consumer needs from the chunker is offsets + identity, which keep the
  * output narrow. The plan is one scan with an in-row `explode(sequence)`
  * — zero shuffles before the presentation sort, no joins, nothing
  * corpus-wide; chunking 1000× the corpus is 1000× the same map work.
  */
object Chunker {

  def chunks(docs: DataFrame, size: Int = 200, stride: Int = 150): DataFrame = {
    require(stride >= 1 && size >= stride,
      s"need size >= stride >= 1, got size=$size stride=$stride")
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      // last window index: 0 when the doc fits in one window, else the
      // first start whose window reaches the end (integer div, positive)
      .withColumn("chunk_idx", explode(sequence(lit(0L), expr(
        s"case when len <= $size then 0L " +
          s"else (len - $size + ${stride - 1}) div $stride end"))))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .select(
        col("doc_id"), col("chunk_idx"), col("chunk_start"),
        least(lit(size.toLong), col("len") - col("chunk_start")).as("chunk_len"),
        Fingerprint.docFingerprint(
          col("text").substr(col("chunk_start") + 1, lit(size))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(spark, dir))

  /** DuckDB twin: same window arithmetic (`//` == `div` on positives),
    * same substring coordinates (both engines 1-based, character-counted),
    * fingerprints through the single-sourced fold fragment. */
  def oracle(size: Int = 200, stride: Int = 150): String =
    s"""WITH d AS (
       |  SELECT doc_id, text, LENGTH(text) AS len
       |  FROM documents WHERE LENGTH(text) > 0
       |), c AS (
       |  SELECT doc_id, text, len,
       |         unnest(range(0, CASE WHEN len <= $size THEN 1
       |                 ELSE (len - $size + ${stride - 1}) // $stride + 1 END)) AS chunk_idx
       |  FROM d
       |)
       |SELECT doc_id, chunk_idx,
       |       chunk_idx * $stride AS chunk_start,
       |       LEAST($size, len - chunk_idx * $stride) AS chunk_len,
       |       ${Fingerprint.fingerprintSql(s"substr(text, chunk_idx * $stride + 1, $size)")} AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
}
