package graft.operators

import graft.functions.StableRound
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity pass a retrieval stack runs over its top-k: pick
  * results one at a time, each maximizing
  *
  *     λ · rel(d)  −  (1−λ) · max_{s ∈ selected} sim(d, s)
  *
  * so near-duplicate hits stop crowding the list. For a training-data
  * pipeline this is also the anti-redundancy selector for few-shot /
  * retrieval-augmented example sets.
  *
  * Exact-arithmetic discipline (the BpeTrain/QualityClassifier rule for
  * ITERATIVE operators): rel and sim are micros-rounded cosines, the
  * MMR objective is the INTEGER 5·rel − 5·sim (λ = 0.5 as exact tenths
  * — no float weights to drift), MAX over longs, ties → smaller id.
  * Every greedy step is a DataFrame stage — the k steps are UNROLLED
  * (constant plan depth k), never a driver loop over collected rows.
  *
  * Scale: everything after the candidate stage is query-bounded —
  * |Q|·kList candidate rows, |Q|·kList² pairwise sims, k unrolled
  * query-sized selection steps. The candidate stage itself is pluggable
  * (here the brute top-kList anchor; production feeds any tier's probe
  * output), so the operator adds NO corpus-scale work of its own.
  */
object Mmr {

  val LambdaTenths = 5 // λ = 0.5 (the classic default): 5·rel_micros − 5·maxsim_micros
  val KList = 20
  val K = 5

  /** Diversified top-k over per-query candidates.
    * `cands`: (query_id, neighbor_id, rel_micros);
    * `sims`:  (query_id, id1, id2, sim_micros) among the candidates.
    * Returns (query_id, pick, neighbor_id, rel_micros, maxsim_micros). */
  def mmrSelect(cands: DataFrame, sims: DataFrame, k: Int = K): DataFrame = {
    // the k greedy steps run inside ONE codegen'd kernel call per query
    // ([[graft.functions.MmrGreedy]]) over the collected per-query
    // candidate/sim arrays — both query-bounded BY CONSTRUCTION
    // (|Q|·kList and |Q|·kList² rows). The r15 unrolled-stage form
    // (each step: anti-join + two joins + max-agg + rank window + union,
    // pinned per step) computed the identical integer selection but paid
    // ~4 exchanges per step at every data scale — 6.8 s for 8 queries at
    // sf0.1, pure stage-count ([[mmrSelectUnrolled]] preserves it for the
    // equivalence spec). Both groupBys ride the same query_id hash
    // partitioning; the kernel's argmax/tie/eligibility rules replicate
    // the unrolled form's exactly (see MmrGreedy's scaladoc).
    val ca = cands.groupBy(col("query_id")).agg(
      collect_list(struct(col("neighbor_id"), col("rel_micros"))).as("ca"))
    val sa = sims.groupBy(col("query_id")).agg(
      collect_list(struct(col("id1"), col("id2"), col("sim_micros"))).as("sa"))
    val emptySims = array().cast("array<struct<id1:bigint,id2:bigint,sim_micros:bigint>>")
    ca.join(sa, Seq("query_id"), "left")
      .select(col("query_id"),
        explode(graft.functions.MmrGreedy.mmrGreedy(
          col("ca"), coalesce(col("sa"), emptySims), k, LambdaTenths)).as("p"))
      .select(col("query_id"), col("p.pick").as("pick"),
        col("p.neighbor_id").as("neighbor_id"),
        col("p.rel_micros").as("rel_micros"),
        col("p.maxsim_micros").as("maxsim_micros"))
      .orderBy(col("query_id"), col("pick"))
  }

  /** The r15 unrolled-DataFrame-stage form of [[mmrSelect]] — kept as the
    * reference implementation the equivalence spec compares the kernel
    * against (and as the shape a deployment without custom expressions
    * would run). */
  private[graft] def mmrSelectUnrolled(cands: DataFrame, sims: DataFrame,
                                       k: Int = K): DataFrame = {
    val first = pickTop(cands
      .withColumn("maxsim_micros", lit(0L))
      .withColumn("score", col("rel_micros") * LambdaTenths), 1)
    // pin the growing selected set ONCE PER STEP: each step references
    // it twice (the left_anti and the selected-set join) and feeds the
    // union back in, so unpinned the logical plan holds ~2^k copies of
    // the chain by step k — BENCH_r16 measured the difference as 133 s
    // in-suite vs 13-19 s isolated for the same rows. Pinned, every
    // reference reads the |Q|·t-row cached frame and plan depth stays
    // constant in k. The intermediates are released by the caller's
    // per-query Pinned release like every other pinned stage.
    (2 to k).foldLeft(Pinned.pin(first)) { (selected, t) =>
      val remaining = cands.join(
        selected.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val scored = remaining
        .join(sims.withColumnRenamed("id1", "neighbor_id"),
          Seq("query_id", "neighbor_id"))
        .join(selected.select(col("query_id"), col("neighbor_id").as("id2")),
          Seq("query_id", "id2"))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel_micros"))
        .agg(max(col("sim_micros")).as("maxsim_micros"))
        .withColumn("score",
          col("rel_micros") * LambdaTenths -
            col("maxsim_micros") * (10 - LambdaTenths))
      Pinned.pin(selected.unionAll(pickTop(scored, t)))
    }.orderBy(col("query_id"), col("pick"))
  }

  /** The greedy argmax of one step: highest score, ties → smaller id. */
  private def pickTop(scored: DataFrame, pick: Int): DataFrame =
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rk") === 1)
      .select(col("query_id"), lit(pick.toLong).as("pick"),
        col("neighbor_id"), col("rel_micros"), col("maxsim_micros"))

  private def cosMicros(a: Column, b: Column): Column =
    StableRound.microsLong(Similarity.cosine(a, b))

  /** Gated query `mmr_rerank`: brute top-kList cosine candidates for the
    * first `numQueries` vectors, diversified to k by the unrolled greedy
    * selection. */
  def fromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
              k: Int = K, kList: Int = KList): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val cands = Pinned.pin(broadcast(q).crossJoin(n)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rel_micros", cosMicros(col("qe"), col("ne")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("rel_micros").desc, col("neighbor_id").asc)))
      .filter(col("rk") <= kList)
      .select(col("query_id"), col("neighbor_id"), col("rel_micros"),
        col("ne")))
    // single reader since the kernel rewrite (collect_list) — derives
    // from the pinned cands, so the self-join inputs are cached
    val sims = cands.select(col("query_id"), col("neighbor_id").as("id1"),
        col("ne").as("e1"))
      .join(cands.select(col("query_id"), col("neighbor_id").as("id2"),
        col("ne").as("e2")), Seq("query_id"))
      .filter(col("id1") =!= col("id2"))
      .select(col("query_id"), col("id1"), col("id2"),
        cosMicros(col("e1"), col("e2")).as("sim_micros"))
    mmrSelect(cands.select(col("query_id"), col("neighbor_id"),
      col("rel_micros")), sims, k)
  }

  /** DuckDB twin: the candidate/sims CTEs, then the k greedy steps
    * UNROLLED — each step a (remaining ⋈ sims ⋈ selected) max + one
    * ROW_NUMBER pick, integer 5·rel − 5·maxsim throughout. */
  def oracle(numQueries: Int = 8, k: Int = K, kList: Int = KList): String = {
    val lam = LambdaTenths
    val steps = (2 to k).map { t =>
      val prev = s"sel${t - 1}"
      s"""sc$t AS MATERIALIZED (
         |  SELECT c.query_id, c.neighbor_id, c.rel_micros,
         |         MAX(sm.sim_micros) AS maxsim_micros
         |  FROM cand c
         |  JOIN sims sm ON sm.query_id = c.query_id AND sm.id1 = c.neighbor_id
         |  JOIN $prev s ON s.query_id = sm.query_id AND s.neighbor_id = sm.id2
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |                    WHERE x.query_id = c.query_id
         |                      AND x.neighbor_id = c.neighbor_id)
         |  GROUP BY 1, 2, 3
         |), p$t AS (
         |  SELECT query_id, CAST($t AS BIGINT) AS pick, neighbor_id,
         |         rel_micros, maxsim_micros
         |  FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY rel_micros * $lam - maxsim_micros * ${10 - lam} DESC,
         |                      neighbor_id ASC) AS rk
         |    FROM sc$t
         |  ) WHERE rk = 1
         |), sel$t AS MATERIALIZED (
         |  SELECT query_id, pick, neighbor_id, rel_micros, maxsim_micros
         |  FROM sel${t - 1}
         |  UNION ALL SELECT * FROM p$t
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         ${StableRound.microsLongSql(
              "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
                "CAST(n.embedding AS DOUBLE[]))")} AS rel_micros
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), cand AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, rel_micros FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY rel_micros DESC, neighbor_id ASC) AS rk
       |    FROM pairs
       |  ) WHERE rk <= $kList
       |), sims AS MATERIALIZED (
       |  SELECT a.query_id, a.neighbor_id AS id1, b.neighbor_id AS id2,
       |         ${StableRound.microsLongSql(
              "list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), " +
                "CAST(e2.embedding AS DOUBLE[]))")} AS sim_micros
       |  FROM cand a JOIN cand b
       |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
       |  JOIN embeddings e1 ON e1.vec_id = a.neighbor_id
       |  JOIN embeddings e2 ON e2.vec_id = b.neighbor_id
       |), sel1 AS MATERIALIZED (
       |  SELECT query_id, CAST(1 AS BIGINT) AS pick, neighbor_id,
       |         rel_micros, CAST(0 AS BIGINT) AS maxsim_micros
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY rel_micros * $lam DESC, neighbor_id ASC) AS rk
       |    FROM cand
       |  ) WHERE rk = 1
       |),
       |$steps
       |SELECT query_id, pick, neighbor_id, rel_micros, maxsim_micros
       |FROM sel$k ORDER BY query_id, pick""".stripMargin
  }
}
