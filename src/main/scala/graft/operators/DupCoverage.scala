package graft.operators

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-document duplicated n-gram coverage — the exact-substring
  * duplication signal (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better"): for each document, the fraction of its word
  * n-gram positions whose n-gram also occurs in at least one OTHER
  * document. Doc-level dedup (Dedup/NearDupClusters) misses boilerplate
  * spans shared across otherwise-distinct pages; this surfaces them as a
  * per-doc score a curation pass can threshold or feed to span removal.
  * Complements [[TextAnalysis]]'s within-doc repetition and
  * [[Curation.decontaminate]]'s train-vs-eval overlap.
  *
  * Shape at scale:
  *   - ONE corpus tokenize + shingle explode, partial-aggregated to
  *     (doc_id, shingle, k) — k = how many positions of this doc hold
  *     that shingle — then pinned: the dup-shingle set, the per-doc
  *     totals, and the scoring join all re-read this stage, never the
  *     corpus;
  *   - the dup set (shingles in ≥2 distinct docs) is the agg of the
  *     pinned stage FILTERED before the join — the overwhelming
  *     singleton majority of the shingle vocabulary never re-joins;
  *   - the coverage join is merge-hinted: post-Generate size estimates
  *     misprice the exploded side, and an auto-broadcast of a
  *     corpus-scale frame is the known pathology on every self-join in
  *     this engine (Dedup.scala's guard);
  *   - output is doc-sized; the division is ONE IEEE op over exact longs
  *     so both engines produce identical bits.
  */
object DupCoverage {

  /** Per-doc (n_pos, dup_pos, dup_frac) for word `n`-grams. Docs shorter
    * than `n` tokens score (0, 0, 0.0). */
  def coverage(docs: DataFrame, n: Int = 8): DataFrame = {
    val perDoc = Pinned.pin(docs
      .select(col("doc_id"), explode(TF.wordShingles(col("text"), n)).as("shingle"))
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("k")))
    // rows are distinct (doc, shingle), so count(*) counts distinct docs
    val dup = perDoc.groupBy(col("shingle"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("shingle"))
    val tot = perDoc.groupBy(col("doc_id")).agg(sum(col("k")).as("n_pos"))
    val dupPos = perDoc.hint("merge").join(dup, Seq("shingle"))
      .groupBy(col("doc_id")).agg(sum(col("k")).as("dup_pos"))
    docs.select(col("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .join(dupPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("dup_pos"), lit(0L)).as("dup_pos"))
      .withColumn("dup_frac",
        when(col("n_pos") === 0, lit(0.0))
          .otherwise(col("dup_pos").cast("double") / col("n_pos")))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    coverage(Tables.documents(spark, dir), n)

  /** DuckDB twin: same raw-split tokens, same 1-based window starts as
    * [[Curation.decontaminateOracle]], same ≥2-distinct-doc dup rule,
    * same single-division double. */
  def oracle(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |sh AS (SELECT doc_id, array_to_string(a[i.i:i.i+${n - 1}], ' ') AS shingle
       |       FROM toks, LATERAL unnest(range(1, len(a) - ${n - 2})) AS i(i)),
       |pdoc AS (SELECT doc_id, shingle, COUNT(*) AS k FROM sh GROUP BY 1, 2),
       |dup AS (SELECT shingle FROM pdoc GROUP BY shingle HAVING COUNT(*) >= 2),
       |tot AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_pos FROM pdoc GROUP BY doc_id),
       |dp AS (SELECT p.doc_id, CAST(SUM(p.k) AS BIGINT) AS dup_pos
       |       FROM pdoc p JOIN dup d USING (shingle) GROUP BY p.doc_id)
       |SELECT d.doc_id,
       |       COALESCE(t.n_pos, 0) AS n_pos,
       |       COALESCE(dp.dup_pos, 0) AS dup_pos,
       |       CASE WHEN COALESCE(t.n_pos, 0) = 0 THEN 0.0
       |            ELSE CAST(COALESCE(dp.dup_pos, 0) AS DOUBLE) / t.n_pos END AS dup_frac
       |FROM documents d
       |LEFT JOIN tot t USING (doc_id)
       |LEFT JOIN dp USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
}
