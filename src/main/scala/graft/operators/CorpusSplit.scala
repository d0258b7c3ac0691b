package graft.operators

import graft.functions.Fingerprint
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test split — the assignment step every training
  * pipeline runs after dedup, done so near-duplicates can never straddle
  * splits. A naive per-doc hash split leaks: doc A in train and its
  * near-dup A' in test means the eval set contains (approximately) training
  * data, silently inflating benchmark numbers. The split UNIT here is the
  * near-dup CLUSTER (connected component of the verified pair graph, see
  * [[NearDupClusters]]); singleton docs are their own unit.
  *
  * Assignment is CONTENT-ADDRESSED: the unit's bucket is its
  * representative document's content fingerprint mod 100, compared against
  * the percentage cut points. Re-ingesting the same corpus under different
  * doc_ids reproduces the same split (ids never enter the hash), and
  * adding new documents never moves an existing unit between splits —
  * the two properties that make a split stable across corpus versions.
  *
  * Scale: the cluster table is near-dup-bounded (sparse by construction —
  * LSH/pair-verified minority of the corpus), so both joins broadcast the
  * sparse side against the one fingerprint scan: rep-fingerprint lookup
  * (cluster reps × corpus fp) and member assignment (docs × cluster map)
  * are map-side. The corpus-sized path is scan → fingerprint (codegen'd,
  * in-row) → broadcast-join → project: ZERO corpus-wide shuffles beyond
  * the pair graph itself, which dedup already paid for.
  */
object CorpusSplit {

  /** (doc_id, split_unit, bucket, split) for every doc. `trainPct`/`valPct`
    * are integer percent cut points on the fingerprint bucket. */
  def split(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
            n: Int = 5, threshold: Double = 0.5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct and trainPct + valPct < 100, got $trainPct/$valPct")
    val fps = docs.select(col("doc_id"),
      Fingerprint.docFingerprint(col("text")).as("fp"))
    val clusters = NearDupClusters.connectedComponents(
      Dedup.ngramJaccardPairs(docs, n, threshold))
    // representative fingerprint per clustered doc: the sparse cluster map
    // joins the fingerprint scan once on the representative id
    val withRep = broadcast(clusters)
      .join(fps.select(col("doc_id").as("cluster_id"), col("fp").as("rep_fp")),
        Seq("cluster_id"))
    val bucket = col("unit_fp") % 100
    fps.join(broadcast(withRep.select(col("doc_id"), col("cluster_id"), col("rep_fp"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_unit"),
        // singleton units are content-addressed by their OWN fingerprint —
        // no join needed for the corpus majority
        coalesce(col("rep_fp"), col("fp")).as("unit_fp"))
      .select(col("doc_id"), col("split_unit"), bucket.as("bucket"),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    split(Tables.documents(spark, dir))

  /** DuckDB twin: the shared connected-components fragment
    * ([[NearDupClusters.ccCtesSql]]) + the shared fingerprint fold
    * ([[Fingerprint.fingerprintSql]]) — both single-sourced, so neither
    * the closure nor the content hash can drift from its gated sibling. */
  def oracle(trainPct: Int = 90, valPct: Int = 5,
             n: Int = 5, threshold: Double = 0.5): String =
    s"""WITH RECURSIVE ${NearDupClusters.ccCtesSql(n, threshold)},
       |fp AS (
       |  SELECT doc_id, ${Fingerprint.fingerprintSql("text")} AS fp
       |  FROM documents
       |),
       |rep AS (
       |  SELECT cc.doc_id, cc.cluster_id, rf.fp AS rep_fp
       |  FROM cc JOIN fp rf ON cc.cluster_id = rf.doc_id
       |),
       |u AS (
       |  SELECT f.doc_id,
       |         COALESCE(rep.cluster_id, f.doc_id) AS split_unit,
       |         COALESCE(rep.rep_fp, f.fp) % 100 AS bucket
       |  FROM fp f LEFT JOIN rep ON f.doc_id = rep.doc_id
       |)
       |SELECT doc_id, split_unit, bucket,
       |       CASE WHEN bucket < $trainPct THEN 'train'
       |            WHEN bucket < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM u ORDER BY doc_id""".stripMargin
}
