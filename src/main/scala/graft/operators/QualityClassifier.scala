package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED quality/domain classifier — the fasttext-linear-model tier
  * of corpus filtering (CCNet, GPT-3's quality filter, LLaMA's
  * Wikipedia-reference classifier are all linear models over cheap text
  * features): logistic regression on hashed bag-of-token features,
  * trained by full-batch gradient descent ON the corpus, then applied
  * to every document. The heuristic `text_quality` gate scores surface
  * shape; this learns a decision boundary from labels.
  *
  * Training label here: lang == 'en' (the corpus's own metadata — the
  * "does this look like the target distribution" proxy; a production
  * run feeds curated positive/negative sets through the same surface).
  *
  * Exact-arithmetic discipline (the BpeTrain/UnigramLm pattern, which
  * is what makes an ITERATIVE trainer oracle-checkable): weights live
  * as integer MICROS; a doc's margin is an exact integer sum of its
  * feature dims' weights (binary features — order-free); the ONLY
  * float step per iteration is one sigmoid, immediately micros-rounded,
  * so residuals and gradients are exact longs; the weight update
  * divides two exact integers (lr=0.5 ⇒ Δ = round(grad/2n)) — correctly
  * rounded IEEE on both engines, no libm beyond exp.
  *
  * Shape at scale: the feature frame is ≤ (D+1) rows per doc (D=32
  * hashed dims + bias), pinned once; each of the T iterations is one
  * margin aggregation + one gradient aggregation over it (shuffles
  * keyed by doc_id / dim), ending in a D+1-row collect — the
  * adjudicated O(K) pattern. T·2 data-parallel passes total; driver
  * state is D+1 longs. The corpus text is tokenized exactly ONCE.
  *
  * What the two checks prove: the DRIVER GATE proves both engines run
  * the identical training trajectory (weights, probabilities, and
  * predictions hash-match after T unrolled iterations); the SPEC proves
  * the trainer actually LEARNS — 100% accuracy on a separable planted
  * corpus. The gate corpus itself is vocabulary-shared across langs by
  * construction (synthetic), so no token model can beat majority there;
  * the gate is about trajectory exactness, the BpeTrain convention.
  */
object QualityClassifier {

  val Dims = 32
  val Iterations = 6

  private def pMicros(margin: Column): Column =
    floor(lit(1e6) / (lit(1.0) + exp(-(margin.cast("double") / lit(1e6))))
      + 0.5).cast("long")

  /** Per-doc scores under the trained model:
    * (doc_id, label, prob_micros, pred). */
  def trainAndScore(docs: DataFrame, iterations: Int = Iterations): DataFrame = {
    val spark = docs.sparkSession
    // binary hashed features + a bias dim present on every doc
    val feats = Pinned.pin(
      docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .select(col("doc_id"), (Dedup.hash60(col("term")) % Dims).as("dim"))
        .distinct()
        .unionAll(docs.select(col("doc_id"), lit(Dims.toLong).as("dim"))))
    val labels = Pinned.pin(docs.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(0L).as("label")))
    val n = docs.count()

    var w = Array.fill(Dims + 1)(0L) // micros
    for (_ <- 1 to iterations) {
      val wArr = array(w.toIndexedSeq.map(lit(_)): _*)
      val resid = feats
        .groupBy(col("doc_id"))
        .agg(sum(element_at(wArr, col("dim").cast("int") + 1)).as("margin"))
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"),
          (pMicros(col("margin")) - col("label") * 1000000L).as("resid"))
      // gradient: exact long sums per dim; D+1 rows to the driver
      val grad = feats.join(resid, Seq("doc_id"))
        .groupBy(col("dim")).agg(sum(col("resid")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wd, d) =>
        wd - math.floor(grad.getOrElse(d, 0L).toDouble / (2.0 * n) + 0.5).toLong
      }
    }

    val wArr = array(w.toIndexedSeq.map(lit(_)): _*)
    feats.groupBy(col("doc_id"))
      .agg(sum(element_at(wArr, col("dim").cast("int") + 1)).as("margin"))
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("label"),
        pMicros(col("margin")).as("prob_micros"))
      .withColumn("pred",
        (col("prob_micros") >= 500000L).cast("long"))
      .orderBy(col("doc_id"))
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    trainAndScore(Tables.documents(spark, dir))

  /** DuckDB twin: the SAME token rule ([[Bm25.coreCtesSql]]'s `toks`),
    * the same md5 feature hash ([[Dedup.hash60Sql]]), and the T
    * iterations UNROLLED as CTE chains (the BpeTrain twin pattern) —
    * margin/residual/gradient/update per iteration, all in exact
    * integer micros except the one rounded sigmoid. */
  def oracle(iterations: Int = Iterations): String = {
    val iterCtes = (1 to iterations).map { t =>
      val pw = s"w${t - 1}"
      s"""m$t AS (
         |  SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS margin
         |  FROM feats f JOIN $pw w ON w.dim = f.dim GROUP BY f.doc_id
         |), r$t AS (
         |  SELECT m.doc_id,
         |         CAST(FLOOR(1000000.0 / (1.0 + exp(-(CAST(m.margin AS DOUBLE) / 1000000.0))) + 0.5) AS BIGINT)
         |           - l.label * 1000000 AS resid
         |  FROM m$t m JOIN labels l ON l.doc_id = m.doc_id
         |), g$t AS (
         |  SELECT f.dim, CAST(SUM(r.resid) AS BIGINT) AS g
         |  FROM feats f JOIN r$t r ON r.doc_id = f.doc_id GROUP BY f.dim
         |), w$t AS (
         |  SELECT w.dim,
         |         w.w - CAST(FLOOR(CAST(COALESCE(g.g, 0) AS DOUBLE)
         |                          / (2.0 * (SELECT n FROM cn)) + 0.5) AS BIGINT) AS w
         |  FROM $pw w LEFT JOIN g$t g ON g.dim = w.dim
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Bm25.coreCtesSql}, feats AS (
       |  SELECT DISTINCT doc_id, ${Dedup.hash60Sql("term")} % $Dims AS dim FROM toks
       |  UNION ALL
       |  SELECT doc_id, $Dims AS dim FROM documents
       |), labels AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
       |  FROM documents
       |), cn AS (SELECT COUNT(*) AS n FROM documents),
       |w0 AS (SELECT CAST(t AS BIGINT) AS dim, CAST(0 AS BIGINT) AS w
       |       FROM (SELECT unnest(range(0, ${Dims + 1})) AS t)),
       |$iterCtes
       |SELECT doc_id, label, prob_micros,
       |       CAST(CASE WHEN prob_micros >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM (
       |  SELECT l.doc_id, CAST(l.label AS BIGINT) AS label,
       |         CAST(FLOOR(1000000.0 / (1.0 + exp(-(CAST(m.margin AS DOUBLE) / 1000000.0))) + 0.5) AS BIGINT) AS prob_micros
       |  FROM (SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS margin
       |        FROM feats f JOIN w$iterations w ON w.dim = f.dim
       |        GROUP BY f.doc_id) m
       |  JOIN labels l ON l.doc_id = m.doc_id
       |)
       |ORDER BY doc_id""".stripMargin
  }
}
