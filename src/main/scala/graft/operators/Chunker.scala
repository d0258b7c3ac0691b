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

  /** The chunk CTEs, shared by [[oracle]] and [[Boilerplate.oracle]] —
    * ONE copy of the window arithmetic on the SQL side, like the Scala
    * side shares [[chunks]]. Defines CTEs `d` and `c`; `c` has
    * (doc_id, text, len, chunk_idx). */
  def chunkCtesSql(size: Int, stride: Int): String =
    s"""d AS (
       |  SELECT doc_id, text, LENGTH(text) AS len
       |  FROM documents WHERE LENGTH(text) > 0
       |), c AS (
       |  SELECT doc_id, text, len,
       |         unnest(range(0, CASE WHEN len <= $size THEN 1
       |                 ELSE (len - $size + ${stride - 1}) // $stride + 1 END)) AS chunk_idx
       |  FROM d
       |)""".stripMargin

  /** The per-chunk fingerprint expression over CTE `c`'s columns. */
  def chunkFpSql(size: Int, stride: Int): String =
    Fingerprint.fingerprintSql(s"substr(text, chunk_idx * $stride + 1, $size)")

  /** DuckDB twin: same window arithmetic (`//` == `div` on positives),
    * same substring coordinates (both engines 1-based, character-counted),
    * fingerprints through the single-sourced fold fragment. */
  def oracle(size: Int = 200, stride: Int = 150): String =
    s"""WITH ${chunkCtesSql(size, stride)}
       |SELECT doc_id, chunk_idx,
       |       chunk_idx * $stride AS chunk_start,
       |       LEAST($size, len - chunk_idx * $stride) AS chunk_len,
       |       ${chunkFpSql(size, stride)} AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
}

/** Boilerplate detection: windows whose exact content recurs across
  * DISTINCT documents are template material (headers, footers, license
  * blocks, navigation chrome) — a standard corpus-cleaning signal that
  * pure per-doc quality scores cannot see. Composes [[Chunker]]: chunk →
  * group by content fingerprint → flag fingerprints seen in >= minDocs
  * documents → per-doc boilerplate fraction.
  *
  * Plan shape: the chunk stage is pinned once (it feeds both the
  * fingerprint aggregate and the join back); both the aggregate and the
  * join shuffle on the 8-byte fingerprint — never on chunk text. At
  * 100 TB the fingerprint table is |windows|-sized but narrow, and the
  * per-doc rollup is the standard partial-aggregated shuffle. Within-doc
  * repeats do NOT count as boilerplate (the signal is CROSS-document
  * recurrence — COUNT(DISTINCT doc_id)); they still appear in n_chunks.
  */
object Boilerplate {

  def score(docs: DataFrame, size: Int = 200, stride: Int = 150,
            minDocs: Int = 2): DataFrame = {
    val ch = Dedup.pinned(
      Chunker.chunks(docs, size, stride).select(col("doc_id"), col("chunk_fp")))
    // the >= minDocs cut runs BELOW the join: the unfiltered per-fp table
    // is corpus-scale (one row per distinct window), but the RECURRING
    // subset is boilerplate-sparse — joining only that side keeps the
    // join's small side genuinely small (AQE can broadcast it from real
    // post-shuffle stats), and the left join preserves every chunk row
    // for the n_chunks denominator
    val recurring = ch.groupBy(col("chunk_fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs_fp"))
      .filter(col("n_docs_fp") >= minDocs)
    ch.join(recurring, Seq("chunk_fp"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_fp").isNotNull, 1L).otherwise(0L)).as("n_boilerplate"))
      .select(col("doc_id"), col("n_chunks"), col("n_boilerplate"),
        graft.functions.StableRound.stableRound(
          col("n_boilerplate").cast("double") / col("n_chunks"), 6)
          .as("boilerplate_frac"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    score(Tables.documents(spark, dir))

  def oracle(size: Int = 200, stride: Int = 150, minDocs: Int = 2): String =
    s"""WITH ${Chunker.chunkCtesSql(size, stride)}, f AS (
       |  SELECT doc_id, ${Chunker.chunkFpSql(size, stride)} AS chunk_fp FROM c
       |), fp AS (
       |  SELECT chunk_fp, COUNT(DISTINCT doc_id) AS n_docs_fp
       |  FROM f GROUP BY chunk_fp
       |)
       |SELECT f.doc_id, COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN fp.n_docs_fp >= $minDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       |       FLOOR(CAST(SUM(CASE WHEN fp.n_docs_fp >= $minDocs THEN 1 ELSE 0 END) AS DOUBLE)
       |             / COUNT(*) * 1e6 + 0.5) / 1e6 AS boilerplate_frac
       |FROM f JOIN fp ON f.chunk_fp = fp.chunk_fp
       |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin
}
