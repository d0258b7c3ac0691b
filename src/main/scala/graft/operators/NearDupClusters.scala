package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup CLUSTERING — the step after pairwise dedup: connected
  * components over the near-dup pair graph, so each group of mutually
  * similar documents gets one cluster id (its minimum doc_id) and a
  * curator can keep exactly one canonical per cluster. Pairwise output
  * alone under-deletes: A~B and B~C pairs leave {A,B,C} as two
  * independent decisions; the component {A,B,C} is the deletion unit.
  *
  * Algorithm: hash-min label propagation — every node starts as its own
  * label; each round takes the min of its neighbors' labels; converges in
  * O(component diameter) rounds. This is the standard large-graph CC
  * (the same shape GraphX/Pregel uses), expressed as DataFrame
  * join+groupBy rounds:
  *   - each round is one shuffle on node id — no global structure, so it
  *     scales with the edge list, and near-dup graphs are SPARSE (bounded
  *     by the verified pair count, itself LSH-bounded);
  *   - each round persists and drops its predecessor once materialized —
  *     releasable blocks (unlike localCheckpoint's), shallow per-round
  *     lineage (plans embed the prior round's InMemoryRelation), and the
  *     caller frees the surviving round via [[Pinned.release]]; for very
  *     deep graphs on a churning cluster, add a reliable `checkpoint()`
  *     every ~20 rounds;
  *   - labels tables hold ONLY nodes that appear in some pair (the
  *     clustered minority), never the corpus;
  *   - the edge list is pinned once ([[Pinned]]) and read every round.
  *
  * Determinism: min-label is order-independent, so cluster ids are exact
  * and the DuckDB twin (recursive-CTE transitive closure + MIN) matches
  * bit-for-bit.
  */
object NearDupClusters {

  /** (doc_id, cluster_id) for every doc in `pairs`; cluster_id = min
    * doc_id of its connected component.
    *
    * `upstreamMarker`: a [[Pinned.marker]] taken BEFORE the pair pipeline
    * was built scopes the mid-iteration release to exactly that pipeline's
    * pins, so a composite caller's earlier pinned stages survive (see
    * [[clustersOf]], which handles the marker for the docs→CC path).
    * Without one the release is session-wide — correct only when the
    * caller owns every live pin, as the gated queries do. */
  def connectedComponents(pairs: DataFrame,
                          upstreamMarker: Option[Long] = None): DataFrame = {
    val edges = Pinned.pin(
      pairs.select(col("id1").as("a"), col("id2").as("b"))
        .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b"))))
    // materialize the sparse edge list ONCE, then free the corpus-scale
    // upstream pins it derives from (shingle/array stages): the rounds
    // below re-read EDGES only, and on a memory-bounded executor the
    // corpus-sized blocks would otherwise crowd the storage pool for the
    // whole iteration (measured 5x round-cost inflation at x10 local)
    edges.count()
    upstreamMarker match {
      case Some(m) => Pinned.releaseSince(edges.sparkSession, m, Seq(edges))
      case None    => Pinned.releaseOthers(edges.sparkSession, Seq(edges))
    }
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // initial label = min(self, direct neighbors): the first propagation
    // round fused into initialization — one groupBy instead of a distinct
    // plus a full join round (shallow components often converge here)
    var labels = edges
      .groupBy(col("a"))
      .agg(least(min(col("b")), col("a")).as("label"))
      .select(col("a").as("id"), col("label"))
      .persist(level)
    var changed = 1L
    var round = 0
    while (changed > 0) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("label")).as("nlabel"))
      // rounds persist (RELEASABLE blocks) and the convergence count
      // materializes each round fully BEFORE its predecessor is dropped.
      // The logical plan references the prior round TWICE per iteration
      // (neighborMin + the join), i.e. it doubles per round — so every
      // 8th round truncates lineage with an eager localCheckpoint,
      // capping plan growth at 2^8 references to a leaf while keeping
      // 7 of 8 rounds' blocks releasable (checkpoint blocks are freed by
      // the ContextCleaner once unreferenced)
      val nextPlan = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("nlabel") < col("label")).as("__improved"))
      val next =
        if (round % 8 == 7) nextPlan.localCheckpoint(true)
        else nextPlan.persist(level)
      changed = next.filter(col("__improved")).count()
      labels.unpersist(blocking = false) // no-op on a checkpointed round
      labels = next
      round += 1
    }
    // the surviving round backs the returned frame: registered so the
    // caller's Pinned.release (after the consuming action) frees it
    Pinned.track(labels)
    labels.drop("__improved")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** CC over `docs`' verified n-gram-Jaccard pair graph, with the pair
    * pipeline's pins scoped (a composite caller's own pinned stages
    * survive the mid-iteration release). */
  def clustersOf(docs: DataFrame, n: Int = 5, thr: Double = 0.5): DataFrame = {
    val m = Pinned.marker(docs.sparkSession)
    connectedComponents(Dedup.ngramJaccardPairs(docs, n, thr), Some(m))
  }

  /** Gated query: components of the exact n-gram-Jaccard pair graph. */
  def fromDir(spark: SparkSession, dir: String): DataFrame =
    clustersOf(Tables.documents(spark, dir))

  /** Shared DuckDB CTE fragment: the exact n-gram-Jaccard pair graph's
    * connected components over `documents` — same pair CTEs as
    * [[Dedup.ngramJaccardOracle]], then a recursive transitive closure and
    * MIN(reachable id) per node. Defines CTE `${prefix}cc`
    * (doc_id, cluster_id), holding ONLY clustered docs. The enclosing
    * query must open with `WITH RECURSIVE`. Used by [[oracle]] AND
    * [[CorpusSplit.oracle]], so the closure logic cannot drift between
    * them (or from the Spark side). `relation`/`prefix` let a composed
    * oracle (CurateE2e) run the closure over a derived corpus alongside
    * another instantiation of the shingle fragment. */
  def ccCtesSql(n: Int = 5, thr: Double = 0.5,
                relation: String = "documents", prefix: String = ""): String =
    s"""${Dedup.shingleCtesSql(relation, n, prefix)},
       |${Dedup.pairsCteSql(thr, prefix)},
       |${prefix}edges AS (SELECT id1 AS a, id2 AS b FROM ${prefix}pairs
       |          UNION ALL SELECT id2, id1 FROM ${prefix}pairs),
       |${prefix}nodes AS (SELECT DISTINCT a AS id FROM ${prefix}edges),
       |${prefix}reach AS (
       |  SELECT id, id AS label FROM ${prefix}nodes
       |  UNION
       |  SELECT e.a AS id, r.label FROM ${prefix}edges e JOIN ${prefix}reach r ON e.b = r.id
       |),
       |${prefix}cc AS MATERIALIZED (SELECT id AS doc_id, MIN(label) AS cluster_id
       |       FROM ${prefix}reach GROUP BY id)""".stripMargin

  /** DuckDB twin: the shared closure fragment, presented per doc. */
  def oracle(n: Int = 5, thr: Double = 0.5): String =
    s"""WITH RECURSIVE ${ccCtesSql(n, thr)}
       |SELECT doc_id, cluster_id FROM cc ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- canonical selection

  /** Quality-max canonical selection — "keep the BEST copy, drop the
    * rest": within each near-dup cluster the survivor is the highest
    * quality-score doc (exact 6-dp micros; ties break to min doc_id),
    * not the min-id representative. Min-id keeps whichever copy happened
    * to be crawled first; quality-max keeps the cleanest one — the policy
    * an actual curation pipeline wants.
    *
    * Scale: quality is scored only for CLUSTERED docs (usually a sparse
    * minority of the corpus), the per-cluster window runs over those
    * sparse rows, and the losers anti-join back sparse-vs-corpus. Whether
    * the sparse side broadcasts is deliberately left to AQE's runtime
    * sizes — no `broadcast()` hint: on a boilerplate-heavy corpus the
    * "sparse" side can be MOST of the corpus, and a hard-coded hint would
    * build a corpus-scale driver hash table where AQE keeps the shuffle
    * join (see the majority-clustered spec). Singleton docs never enter
    * a window: they survive by construction. */
  def canonical(docs: DataFrame, n: Int = 5, thr: Double = 0.5): DataFrame =
    canonicalWith(docs, clustersOf(docs, n, thr))

  /** Canonical selection against a caller-supplied cluster map — either
    * [[connectedComponents]] output or [[ClusterStore.readClusters]] (the
    * persisted artifact; `dedup_canonical_indexed` gates that path under
    * the SAME oracle as the from-scratch one). */
  def canonicalWith(docs: DataFrame, clusters: DataFrame): DataFrame = {
    import graft.functions.{StableRound, TextFunctions => TF}
    val clustered = docs
      .join(clusters, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        StableRound.microsLong(TF.qualityScore(col("text"))).as("qmicros"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("qmicros").desc, col("doc_id").asc)
    val losers = clustered
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def canonicalFromDir(spark: SparkSession, dir: String): DataFrame =
    canonical(Tables.documents(spark, dir))

  /** DuckDB twin: shared closure fragment + the single-sourced quality
    * fragment; same window, same tie-break, same anti-join. */
  def canonicalOracle(n: Int = 5, thr: Double = 0.5): String = {
    import graft.functions.{StableRound, TextFunctions => TF}
    s"""WITH RECURSIVE ${ccCtesSql(n, thr)},
       |cq AS (
       |  SELECT d.doc_id, cc.cluster_id,
       |         ${StableRound.microsLongSql(TF.qualityScoreSql("d.text"))} AS qmicros
       |  FROM documents d JOIN cc ON d.doc_id = cc.doc_id
       |), losers AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
       |             ORDER BY qmicros DESC, doc_id ASC) AS rk
       |    FROM cq
       |  ) WHERE rk > 1
       |)
       |SELECT d.doc_id, d.n_chars FROM documents d
       |LEFT JOIN losers l ON d.doc_id = l.doc_id
       |WHERE l.doc_id IS NULL
       |ORDER BY d.doc_id""".stripMargin
  }
}
