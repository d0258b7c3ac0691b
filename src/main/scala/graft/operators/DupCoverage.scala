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

  /** The transform [[coverage]] is the report for: REMOVE every token
    * position covered by a cross-doc-duplicated n-gram window and
    * re-assemble the text — Lee et al.'s exact-substring dedup applied
    * at span granularity (boilerplate dies, the unique prose survives,
    * no document is dropped whole).
    *
    * Shape at scale: one pinned token-array stage feeds the position
    * explode AND the window explode; covered positions explode only from
    * DUP window starts (the sparse minority), the kept-token anti-join
    * is per-doc-bounded, and reassembly is one partial-aggregated
    * sort-by-position fold — order is carried by the position key, so
    * the rebuild is deterministic under any partitioning. */
  def removeSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    // ONE corpus scan: the pinned token-array stage feeds the position
    // explode AND the window explode
    val arrs = Pinned.pin(docs.select(col("doc_id"), split(col("text"), " ").as("a")))
    val positions = arrs.select(col("doc_id"), posexplode(col("a")).as(Seq("p", "w")))
    // window starts by position (0-based), same raw-split windows as
    // coverage; k-multiplicity is irrelevant here so keep starts distinct
    val starts = arrs.select(col("doc_id"),
      posexplode(TF.shinglesOfTokens(col("a"), n)).as(Seq("s", "shingle")))
    val dup = starts.select(col("doc_id"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("shingle"))
    val covered = starts.hint("merge").join(dup, Seq("shingle"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(n - 1))).as("p"))
      .distinct()
    val kept = positions.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("w")))),
          e => e.getField("w")), " ").as("text_clean"))
    docs.select(col("doc_id"))
      .join(positions.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens")),
        Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy(col("doc_id"))
  }

  def removeFromDir(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    removeSpans(Tables.documents(spark, dir), n)

  /** DuckDB twin of [[removeSpans]]: same raw-split positions, same
    * 0-based window starts, same ≥2-distinct-doc dup rule, covered =
    * start..start+n−1 union, rebuild via position-ordered string_agg. */
  def removeOracle(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |pos AS (SELECT doc_id, i.i - 1 AS p, a[i.i] AS w
       |        FROM toks, LATERAL unnest(range(1, len(a) + 1)) AS i(i)),
       |starts AS (SELECT doc_id, i.i - 1 AS s,
       |                  ${Dedup.shingleSliceSql(n)} AS shingle
       |           FROM toks, ${Dedup.shingleLateralSql(n)}),
       |dup AS (SELECT shingle FROM (SELECT DISTINCT doc_id, shingle FROM starts)
       |        GROUP BY shingle HAVING COUNT(*) >= 2),
       |covered AS (SELECT DISTINCT st.doc_id, st.s + o.o AS p
       |            FROM starts st JOIN dup d USING (shingle),
       |                 LATERAL unnest(range(0, $n)) AS o(o)),
       |kept AS (
       |  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |         string_agg(p.w, ' ' ORDER BY p.p) AS text_clean
       |  FROM pos p LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.p = c.p
       |  WHERE c.doc_id IS NULL GROUP BY p.doc_id
       |),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
       |        FROM pos GROUP BY doc_id)
       |SELECT d.doc_id,
       |       COALESCE(t.n_tokens, 0) AS n_tokens,
       |       COALESCE(k.n_kept, 0) AS n_kept,
       |       COALESCE(k.text_clean, '') AS text_clean
       |FROM documents d
       |LEFT JOIN tot t USING (doc_id)
       |LEFT JOIN kept k USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin: same raw-split tokens, same 1-based window starts as
    * [[Curation.decontaminateOracle]], same ≥2-distinct-doc dup rule,
    * same single-division double. */
  def oracle(n: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |sh AS (SELECT doc_id, ${Dedup.shingleSliceSql(n)} AS shingle
       |       FROM toks, ${Dedup.shingleLateralSql(n)}),
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
