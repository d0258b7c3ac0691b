package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *   - [[bruteForceKnn]]: exact top-k by cosine — the correctness baseline.
  *     Cost |Q|·|N|; fine when the query set is small (broadcast) even if N
  *     is 100 TB, because it is a single pass over N with a per-query heap
  *     (here: window top-k after a broadcast cross join).
  *   - [[lshCosineCandidates]] / [[lshKnn]]: random-hyperplane LSH — sign
  *     bits of seeded hyperplane projections form bucket keys across
  *     several tables; only bucket-mates are scored. This is the scale
  *     path: candidate generation is an equi-join on bucket keys (shuffle
  *     on narrow keys, no cross product).
  *
  * The dot products run through `zip_with` + `aggregate` — codegen'd
  * builtins evaluating left-to-right, which makes the doubles bit-identical
  * to the DuckDB oracle's `list_cosine_similarity` over DOUBLE[].
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double via
    * the fused codegen'd dot product ([[graft.functions.FloatVecDot]] —
    * identical operation order to `aggregate(zip_with(...))`, so values are
    * bit-stable against the composed-builtin form and the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.FloatVecDot.dot(a, b)
    dot / (sqrt(graft.functions.FloatVecDot.dot(a, a)) *
      sqrt(graft.functions.FloatVecDot.dot(b, b)))
  }

  /** L2 norm column for precomputing per-row (norms are per-vector; compute
    * them |N| times before a pairwise join, not |N|² times inside it). */
  def l2norm(e: Column): Column = sqrt(graft.functions.FloatVecDot.dot(e, e))

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2norm(col("embedding")).as("qn"))
    val n = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
      l2norm(col("embedding")).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(n)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        graft.functions.FloatVecDot.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver-contract query: neighbors of the first `numQueries` vectors. */
  def knnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    bruteForceKnn(e, e.filter(col("vec_id") < numQueries), k)
  }

  def knnOracle(numQueries: Int = 8, k: Int = 10): String =
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(n.embedding AS DOUBLE[])) AS cosine
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, ROUND(cosine, 8) AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Seeded random unit-ish hyperplanes: `tables` independent LSH tables of
    * `bitsPerTable` planes each, as literal nested arrays (broadcast with
    * the plan — no closure capture). */
  def hyperplanes(dim: Int, tables: Int, bitsPerTable: Int, seed: Long = 7L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  /** Bucket key per (vector, table): the sign-bit string of the plane
    * projections. Vectors with equal keys in ANY table become candidates. */
  def lshBuckets(embeddings: DataFrame, planes: Array[Array[Array[Double]]]): DataFrame = {
    val tableExprs = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val bits = tablePlanes.zipWithIndex.map { case (plane, _) =>
        val planeCol = array(plane.map(lit): _*)
        val proj = aggregate(
          zip_with(col("embedding"), planeCol, (x, p) => x.cast("double") * p),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }
      struct(lit(t).as("table"), concat(bits.toIndexedSeq: _*).as("bucket"))
    }
    embeddings
      .select(col("vec_id"), explode(array(tableExprs.toIndexedSeq: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
  }

  /** ANN top-k: score only same-bucket candidates, then per-query top-k. */
  def lshKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
             tables: Int = 8, bitsPerTable: Int = 6, seed: Long = 7L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(dim, tables, bitsPerTable, seed)
    val nb = lshBuckets(embeddings, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("neighbor_id"))
    val qb = lshBuckets(queries, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("query_id"))
    val candidates = qb.join(nb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(n, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }
}
