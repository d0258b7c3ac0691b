package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-noise detection by leave-one-out kNN label agreement — the
  * confident-learning-style screen over a labeled embedding table: a row
  * whose k nearest neighbors vote for a DIFFERENT label is a candidate
  * mislabel (or an out-of-distribution sample), the rows a curation pass
  * audits or drops before the labels train anything.
  *
  * Two candidate generators, one verdict finisher:
  *   - [[knnLabelAgreement]]: exact all-pairs ([[Similarity.bruteForceKnn]]
  *     — its documented broadcast crossJoin). The CORRECTNESS baseline;
  *     quadratic by construction, gate-scale only.
  *   - [[knnLabelAgreementIvf]]: candidates bounded to each vector's
  *     nProbe IVF cells — the 100 TB path. Unlike the few-query ANN gates
  *     the probes frame here is CORPUS-sized (every vector is a query),
  *     so the candidate join shuffles on centroid_id and is merge-hinted;
  *     nothing corpus-scale is ever broadcast.
  * Everything after the neighbor list is k-bounded: votes are
  * (query, label)-sized, the winner is a per-query window over ≤k rows,
  * and the verdict join is vec_id-keyed. Rank order rides the unrounded
  * cosine (bit-equal cross-engine via [[graft.functions.FloatVecDot]] —
  * the knn_cosine_topk pairing); the vote winner breaks count ties to the
  * SMALLER label, so the verdict is deterministic on both engines even
  * when k splits evenly across classes.
  */
object LabelNoise {

  /** (vec_id, label, knn_label, agree) from (query_id, nlabel) neighbor
    * votes: majority with count ties to the smaller label. Queries with
    * zero candidates drop out (both engines: inner joins). */
  private def verdict(embeddings: DataFrame, nbrs: DataFrame): DataFrame = {
    val votes = nbrs.groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cnt").desc, col("nlabel").asc)
    val winner = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id").as("vec_id"), col("nlabel").as("knn_label"))
    embeddings.select(col("vec_id"), col("label"))
      .join(winner, Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("knn_label"),
        (col("label") === col("knn_label")).as("agree"))
      .orderBy(col("vec_id"))
  }

  /** Exact variant: per-vector majority label of the k nearest neighbors
    * (excluding self), leave-one-out over the whole table. */
  def knnLabelAgreement(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val nbrs = Similarity.bruteForceKnn(embeddings, embeddings, k)
      .select(col("query_id"), col("neighbor_id"))
      .join(embeddings.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), Seq("neighbor_id"))
      .select(col("query_id"), col("nlabel"))
    verdict(embeddings, nbrs)
  }

  /** Scale variant: neighbors drawn from each vector's `nProbe` nearest
    * IVF cells under `centroids`. Equals [[knnLabelAgreement]] exactly
    * when the probed cells cover the true top-k (spec-pinned at full
    * probe coverage); at lower nProbe it is the standard IVF recall
    * trade. */
  def knnLabelAgreementIvf(embeddings: DataFrame, k: Int = 10,
                           nProbe: Int = 4,
                           centroids: Array[(Int, Array[Double])]): DataFrame = {
    val cells = Similarity.assignToCentroids(embeddings, centroids)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("label").as("nlabel"))
    val probes = Similarity.queryProbes(
      embeddings.select(col("vec_id"), col("embedding")), centroids, nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val nbrs = probes.hint("merge").join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nlabel"))
    verdict(embeddings, nbrs)
  }

  def fromDir(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    knnLabelAgreement(Tables.embeddings(spark, dir), k)

  /** Gated IVF variant under the [[Similarity.hashCentroids]] quantizer
    * (md5-derived, so DuckDB recomputes identical centroids — the
    * ivf_ann_topk recipe with every vector as a query). */
  def ivfFromDir(spark: SparkSession, dir: String, k: Int = 10,
                 numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = Similarity.dimForDir(dir, e)
    require(dim == Similarity.LshOracleDim,
      s"embeddings under $dir are $dim-wide but ivfOracle generates " +
        s"${Similarity.LshOracleDim}-dim centroids — regenerate the oracle with dim=$dim")
    knnLabelAgreementIvf(e, k, nProbe, Similarity.hashCentroids(dim, numCentroids))
  }

  /** DuckDB twin of [[knnLabelAgreement]]: same all-pairs cosine rank
    * (the knn_cosine_topk pairing), same ≤k vote, same
    * (count desc, label asc) winner rule. */
  def oracle(k: Int = 10): String =
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(n.embedding AS DOUBLE[])) AS cosine
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs
       |)
       |${verdictSql(k)}""".stripMargin

  /** DuckDB twin of [[ivfFromDir]]: the ivfAnnOracle pipeline (identical
    * md5 centroids, assignment ties to the LARGER cid, probe ties to the
    * SMALLER, cell-bounded candidates, exact re-score) with every vector
    * as a query, finished by the same vote/winner verdict. */
  def ivfOracle(k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                dim: Int = Similarity.LshOracleDim): String =
    s"""WITH ${Similarity.centroidSimsCtesSql(dim, numCentroids)}, assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM sims
       |  ) WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid ASC) AS rk
       |    FROM sims
       |  ) WHERE rk <= $nProbe
       |), cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assign a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.query_id
       |), scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cosine
       |  FROM cand c JOIN embeddings qe ON qe.vec_id = c.query_id
       |              JOIN embeddings ne ON ne.vec_id = c.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |${verdictSql(k)}""".stripMargin

  /** The shared vote/winner/verdict tail over a `ranked` CTE. */
  private def verdictSql(k: Int): String =
    s""", votes AS (
       |  SELECT r.query_id, e.label AS nlabel, COUNT(*) AS cnt
       |  FROM ranked r JOIN embeddings e ON r.neighbor_id = e.vec_id
       |  WHERE r.rank <= $k GROUP BY 1, 2
       |), winner AS (
       |  SELECT query_id, nlabel,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cnt DESC, nlabel ASC) AS rn
       |  FROM votes
       |)
       |SELECT e.vec_id, e.label, w.nlabel AS knn_label,
       |       (e.label = w.nlabel) AS agree
       |FROM embeddings e JOIN winner w ON w.query_id = e.vec_id AND w.rn = 1
       |ORDER BY e.vec_id""".stripMargin
}
