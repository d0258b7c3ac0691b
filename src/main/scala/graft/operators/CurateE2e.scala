package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily curation DAG as ONE oracle-gated pipeline:
  *
  *   quality gate → exact dedup → near-dup prune   ([[CorpusClean]])
  *     → eval-set decontamination                  ([[Curation.contaminatedIds]])
  *       → leakage-safe train/val/test split       ([[CorpusSplit]])
  *
  * Every stage is an already-gated operator; this gate proves they
  * COMPOSE — same per-doc verdicts when chained as when run alone, the
  * end-to-end property a "switch your pipeline to this library" user
  * actually depends on. The split's cluster map is computed over the
  * corpus the pipeline SHIPS (post-clean, post-decon) — split units are
  * defined by the shipped corpus's near-dup structure, not the raw
  * crawl's.
  *
  * Scale: each stage keeps its own audited shape (scan-fused quality
  * scoring, shingle self-joins via the guarded merge path, broadcast
  * eval shingles — benchmark suites are small by definition, AQE-chosen
  * split joins). The pipeline pays the shingle self-join ONCE: clean's
  * near-dup prune at (n, thr) makes the shipped corpus provably
  * pair-free at the same (n, thr), so the split's cluster map is an
  * empty constant — see [[curate]]'s doc for the proof. A deployment
  * composing the stages at different thresholds amortizes the second
  * pair graph via [[ClusterStore]]/[[CorpusSplit.splitWith]], which the
  * indexed gates prove equal.
  */
object CurateE2e {

  /** (doc_id, quality_score, split_unit, bucket, split) for every doc the
    * pipeline ships.
    *
    * The split's pair graph is NOT recomputed: this method passes ONE
    * (n, thr) to both the clean and the split, and clean's near-dup prune
    * drops the higher id of EVERY exact-Jaccard pair at that (n, thr)
    * (CorpusClean.scala:36-39, the same [[Dedup.ngramJaccardPairs]]
    * predicate [[NearDupClusters.clustersOf]] would run). So for any
    * i < j both shipped, jaccard(i, j) < thr — else j was pruned — and
    * since the pair predicate is pairwise (corpus-independent), the
    * shipped corpus's pair graph is empty BY CONSTRUCTION: every split
    * unit is a singleton. [[CorpusSplit.splitWith]] against an empty
    * cluster map produces exactly that (each doc content-addressed by its
    * own fingerprint — the identical output the full closure computes, as
    * the unchanged DuckDB oracle still proves), and skips the pipeline's
    * second shingle self-join + CC — the two most expensive stages of the
    * composed plan, ~60% of its wall time at sf0.1 (26.5 → 10.4 s
    * isolated). A caller composing
    * clean and split at DIFFERENT (n, thr) must use [[CorpusSplit.split]]
    * directly; the theorem only holds for the shared-parameter DAG this
    * method defines. */
  def curate(docs: DataFrame, eval: DataFrame, qualityMin: Double = 0.5,
             n: Int = 5, thr: Double = 0.5, deconN: Int = 8,
             trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val kept = CorpusClean(docs, qualityMin, n, thr)
    val cleaned = kept.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    val decon = cleaned.join(
      Curation.contaminatedIds(cleaned, eval, deconN), Seq("doc_id"), "left_anti")
    val spark = docs.sparkSession
    val noClusters = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType))))
    CorpusSplit.splitWith(decon.select(col("doc_id"), col("text")),
        noClusters, trainPct, valPct)
      .join(decon.select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .select(col("doc_id"), col("quality_score"), col("split_unit"),
        col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Gated variant: every 20th doc_id plays the held-out benchmark set
    * (the decontaminate gate's convention). */
  def fromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curate(docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))
  }

  /** DuckDB twin: every stage is the SAME single-sourced fragment its
    * standalone gate runs — [[CorpusClean.cleanedCtesSql]] over the train
    * partition, the decontaminate oracle's raw-split 8-gram CTEs over
    * `cleaned`, and [[NearDupClusters.ccCtesSql]] (prefix `s_`, over the
    * shipped corpus) + the split oracle's fingerprint CTEs. Nothing here
    * restates a rule; a drift in any stage's logic breaks its standalone
    * gate and this one together. */
  def oracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5,
             deconN: Int = 8, trainPct: Int = 90, valPct: Int = 5): String =
    s"""WITH RECURSIVE evals AS (
       |  SELECT * FROM documents WHERE doc_id % 20 = 0
       |), train0 AS (
       |  SELECT * FROM documents WHERE doc_id % 20 <> 0
       |), ${CorpusClean.cleanedCtesSql("train0", qualityMin, n, thr)},
       |etoks AS (SELECT string_split(text, ' ') AS a FROM evals),
       |esh AS (SELECT DISTINCT array_to_string(a[i.i:i.i+${deconN - 1}], ' ') AS shingle
       |        FROM etoks, LATERAL unnest(range(1, len(a) - ${deconN - 2})) AS i(i)),
       |ttoks AS (SELECT doc_id, string_split(text, ' ') AS a FROM cleaned),
       |tsh AS (SELECT DISTINCT doc_id, array_to_string(a[i.i:i.i+${deconN - 1}], ' ') AS shingle
       |        FROM ttoks, LATERAL unnest(range(1, len(a) - ${deconN - 2})) AS i(i)),
       |bad AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN esh e ON t.shingle = e.shingle),
       |decon AS (
       |  SELECT c.doc_id, c.text, c.quality_score FROM cleaned c
       |  LEFT JOIN bad b ON c.doc_id = b.doc_id
       |  WHERE b.doc_id IS NULL
       |), ${NearDupClusters.ccCtesSql(n, thr, relation = "decon", prefix = "s_")},
       |fp AS (
       |  SELECT doc_id, ${graft.functions.Fingerprint.fingerprintSql("text")} AS fp
       |  FROM decon
       |),
       |ufp AS (
       |  SELECT s_cc.cluster_id, MIN(f.fp) AS unit_fp
       |  FROM s_cc JOIN fp f ON s_cc.doc_id = f.doc_id
       |  GROUP BY s_cc.cluster_id
       |),
       |rep AS (
       |  SELECT s_cc.doc_id, s_cc.cluster_id, u.unit_fp
       |  FROM s_cc JOIN ufp u ON s_cc.cluster_id = u.cluster_id
       |),
       |u AS (
       |  SELECT f.doc_id,
       |         COALESCE(rep.cluster_id, f.doc_id) AS split_unit,
       |         COALESCE(rep.unit_fp, f.fp) % 100 AS bucket
       |  FROM fp f LEFT JOIN rep ON f.doc_id = rep.doc_id
       |)
       |SELECT u.doc_id, d.quality_score, u.split_unit, u.bucket,
       |       CASE WHEN u.bucket < $trainPct THEN 'train'
       |            WHEN u.bucket < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM u JOIN decon d ON u.doc_id = d.doc_id
       |ORDER BY u.doc_id""".stripMargin
}
