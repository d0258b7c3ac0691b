package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix — the curation diagnostic behind "which
  * crawls/feeds are copying each other": verified near-dup pair counts
  * bucketed by the unordered (source, source) pair. High off-diagonal
  * cells mean two sources ship overlapping content (mirror sites, feed
  * re-syndication) and deduplicating them jointly matters; a hot diagonal
  * cell means one source self-duplicates and per-source dedup suffices.
  *
  * Scale: the pair graph is the sparse LSH/threshold-verified minority
  * the dedup family already computes; resolving each pair's two sources
  * takes ONE corpus scan — the pair list is exploded to (pair, member)
  * rows and joined once against the narrow (doc_id, source) projection,
  * then re-grouped by the pair key. The pair-keyed shuffle is
  * pair-graph-sized, never corpus-sized, and the matrix itself is
  * |sources|² — dashboard-sized at any volume. (The naive alternative —
  * joining the corpus twice, once per pair side — pays a second full
  * scan for no benefit.)
  */
object SourceMatrix {

  /** (source_a, source_b, n_pairs) with source_a <= source_b. */
  def matrix(docs: DataFrame, n: Int = 5, threshold: Double = 0.5): DataFrame =
    matrixWith(docs, Dedup.ngramJaccardPairs(docs, n, threshold))

  /** Matrix against a caller-supplied verified pair list — the from-scratch
    * graph or the persisted [[ClusterStore.readPairs]] artifact (given the
    * store, the matrix costs one corpus scan + a pair-sized regroup). */
  def matrixWith(docs: DataFrame, pairList: DataFrame): DataFrame = {
    val pairs = pairList.select(col("id1"), col("id2"))
    val members = pairs.select(col("id1"), col("id2"),
      explode(array(col("id1"), col("id2"))).as("doc_id"))
    val src = docs.select(col("doc_id"), col("source"))
    members.join(src, Seq("doc_id"))
      .groupBy(col("id1"), col("id2"))
      .agg(
        min(when(col("doc_id") === col("id1"), col("source"))).as("s1"),
        min(when(col("doc_id") === col("id2"), col("source"))).as("s2"))
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    matrix(Tables.documents(spark, dir))

  /** DuckDB twin: the shared shingle + pair fragments
    * ([[Dedup.shingleCtesSql]], [[Dedup.pairsCteSql]]), sources resolved
    * per pair side, unordered-pair canonicalization via LEAST/GREATEST. */
  def oracle(n: Int = 5, threshold: Double = 0.5): String =
    s"""WITH ${Dedup.shingleCtesSql("documents", n)},
       |${Dedup.pairsCteSql(threshold)},
       |ps AS (
       |  SELECT LEAST(da.source, db.source) AS source_a,
       |         GREATEST(da.source, db.source) AS source_b
       |  FROM pairs p
       |  JOIN documents da ON p.id1 = da.doc_id
       |  JOIN documents db ON p.id2 = db.doc_id
       |)
       |SELECT source_a, source_b, COUNT(*) AS n_pairs
       |FROM ps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
