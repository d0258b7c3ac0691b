package graft.operators

import graft.functions.Fingerprint
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — dataset versioning between two crawl days:
  * which documents were ADDED, REMOVED, or CHANGED (same id, different
  * content), and which survived untouched. Every serious training-data
  * pipeline keeps this ledger: it is what makes a dataset release
  * auditable ("v2 = v1 + 1.2M docs − 0.3M − 40k edited") and what an
  * incremental re-processing run keys off (only added ∪ changed flow
  * through dedup/quality again).
  *
  * Shape at scale: ONE full outer join keyed on doc_id — both sides
  * shuffle-partition on the key (no broadcast: both snapshots are
  * corpus-sized) — comparing content FINGERPRINTS, not text: the
  * codegen'd rolling hash ([[Fingerprint]], the split gate's
  * content-address) reduces the compare to a long equality, so the
  * shuffle carries (id, fp) pairs, never document bodies. Output is the
  * per-doc ledger; `summary` folds it to one row per status.
  *
  * The gate derives two deterministic snapshots from the documents
  * table (old = ids with residue ≠ 0 mod 10; new = ids ≠ 5 mod 10, with
  * every text of residue 3 rewritten) so both engines construct the
  * identical pair of days.
  */
object CorpusDiff {

  /** Per-doc ledger: (doc_id, status) for status ∈ added | removed |
    * changed | unchanged. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val a = oldDocs.select(col("doc_id"),
      Fingerprint.docFingerprint(col("text")).as("fp_old"))
    val b = newDocs.select(col("doc_id"),
      Fingerprint.docFingerprint(col("text")).as("fp_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** One row per status with counts — the release-note surface. */
  def summary(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    diff(oldDocs, newDocs)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))

  /** Gated query: the deterministic two-snapshot derivation, full per-doc
    * ledger (sorted). */
  def fromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldDay = docs.filter(col("doc_id") % 10 =!= 0)
    val newDay = docs.filter(col("doc_id") % 10 =!= 5)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 3, concat(lit("edited "), col("text")))
          .otherwise(col("text")).as("text"))
    diff(oldDay, newDay).orderBy(col("doc_id"))
  }

  /** DuckDB twin: the SAME fingerprint fold ([[Fingerprint.fingerprintSql]]
    * — single-sourced with the split gates), same derivation, same
    * status rules over a FULL OUTER join. */
  def oracle(): String =
    s"""WITH old_day AS (
       |  SELECT doc_id, ${Fingerprint.fingerprintSql("text")} AS fp
       |  FROM documents WHERE doc_id % 10 <> 0
       |), new_day AS (
       |  SELECT doc_id, ${Fingerprint.fingerprintSql(
             "CASE WHEN doc_id % 10 = 3 THEN 'edited ' || text ELSE text END")} AS fp
       |  FROM documents WHERE doc_id % 10 <> 5
       |)
       |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |       CASE WHEN a.doc_id IS NULL THEN 'added'
       |            WHEN b.doc_id IS NULL THEN 'removed'
       |            WHEN a.fp = b.fp THEN 'unchanged'
       |            ELSE 'changed' END AS status
       |FROM old_day a FULL OUTER JOIN new_day b ON a.doc_id = b.doc_id
       |ORDER BY doc_id""".stripMargin
}
