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
  * Assignment is CONTENT-ADDRESSED and ID-INDEPENDENT: the unit's bucket is
  * the MINIMUM content fingerprint over its member documents, mod 100,
  * compared against the percentage cut points. MIN over members is
  * invariant under ANY doc_id renumbering — including one that reorders ids
  * WITHIN a cluster (an id-chosen representative's fingerprint is not:
  * renumbering that hands the smallest id to a different member would pick
  * a different representative text and silently re-bucket the whole
  * cluster). A unit's assignment changes only when the unit's MEMBERSHIP
  * changes — a genuinely new near-dup joining (or bridging) the cluster —
  * which is the correct behavior: the unit then literally contains
  * different content, and keeping it pinned to the old bucket would let the
  * new member leak across the boundary its cluster-mates sit behind.
  * (`split_unit` itself is labeled by the cluster's min doc_id — a display
  * key, not an input to the assignment.)
  *
  * Scale: the cluster table is near-dup-bounded (sparse by construction —
  * LSH/pair-verified minority of the corpus), so the per-unit MIN and both
  * joins against the corpus-sized fingerprint scan keep their big side
  * shuffle-partitioned by AQE from REAL runtime sizes — deliberately no
  * `broadcast()` hint: on a boilerplate-heavy corpus where MOST docs are
  * clustered, a hard-coded hint would build a corpus-scale driver hash
  * table, while AQE simply keeps the shuffle join. The corpus-sized path is
  * scan → fingerprint (codegen'd, in-row) → join → project: no corpus-wide
  * aggregation beyond the pair graph itself, which dedup already paid for.
  */
object CorpusSplit {

  private def validatePcts(trainPct: Int, valPct: Int): Unit =
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct and trainPct + valPct < 100, got $trainPct/$valPct")

  /** (doc_id, split_unit, bucket, split) for every doc. `trainPct`/`valPct`
    * are integer percent cut points on the fingerprint bucket — validated
    * BEFORE the cluster map is built: `clustersOf` runs an eager
    * corpus-scale Spark job during construction, which bad percentages
    * must not pay for. */
  def split(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
            n: Int = 5, threshold: Double = 0.5): DataFrame = {
    validatePcts(trainPct, valPct)
    splitWith(docs, NearDupClusters.clustersOf(docs, n, threshold),
      trainPct, valPct)
  }

  /** Split against a caller-supplied cluster map — [[NearDupClusters]]
    * output or the persisted [[ClusterStore]] artifact (the pair graph is
    * the expensive stage; given the store, the split is fingerprint scan +
    * two cluster-bounded joins). */
  def splitWith(docs: DataFrame, clusters: DataFrame,
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    validatePcts(trainPct, valPct)
    val fps = docs.select(col("doc_id"),
      Fingerprint.docFingerprint(col("text")).as("fp"))
    // id-independent unit fingerprint: MIN member fingerprint per cluster
    // (cluster-bounded aggregate over the sparse clustered minority)
    val unitFps = clusters.join(fps, Seq("doc_id"))
      .groupBy(col("cluster_id")).agg(min(col("fp")).as("unit_fp"))
    val members = clusters.join(unitFps, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("unit_fp"))
    val bucket = col("ufp") % 100
    fps.join(members, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_unit"),
        // singleton units are content-addressed by their OWN fingerprint —
        // no aggregate needed for the corpus majority
        coalesce(col("unit_fp"), col("fp")).as("ufp"))
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
    * the closure nor the content hash can drift from its gated sibling.
    * `relation`/`extraCtes` let a composed gate split a DERIVED corpus
    * (the `corpus_diff_recurate` day-2 snapshot) under the identical
    * rules. */
  def oracle(trainPct: Int = 90, valPct: Int = 5,
             n: Int = 5, threshold: Double = 0.5,
             relation: String = "documents", extraCtes: String = ""): String =
    s"""WITH RECURSIVE $extraCtes${NearDupClusters.ccCtesSql(n, threshold, relation)},
       |fp AS MATERIALIZED (
       |  SELECT doc_id, ${Fingerprint.fingerprintSql("text")} AS fp
       |  FROM $relation
       |),
       |ufp AS (
       |  SELECT cc.cluster_id, MIN(f.fp) AS unit_fp
       |  FROM cc JOIN fp f ON cc.doc_id = f.doc_id
       |  GROUP BY cc.cluster_id
       |),
       |rep AS (
       |  SELECT cc.doc_id, cc.cluster_id, u.unit_fp
       |  FROM cc JOIN ufp u ON cc.cluster_id = u.cluster_id
       |),
       |u AS (
       |  SELECT f.doc_id,
       |         COALESCE(rep.cluster_id, f.doc_id) AS split_unit,
       |         COALESCE(rep.unit_fp, f.fp) % 100 AS bucket
       |  FROM fp f LEFT JOIN rep ON f.doc_id = rep.doc_id
       |)
       |SELECT doc_id, split_unit, bucket,
       |       CASE WHEN bucket < $trainPct THEN 'train'
       |            WHEN bucket < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM u ORDER BY doc_id""".stripMargin
}
