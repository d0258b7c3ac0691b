package graft.tools

import graft.GraftSession
import graft.operators.{LabelNoise, Pinned, SemanticDedup, Similarity}
import graft.sources.Tables

/** Measures the C ∝ N quantizer-sizing rule instead of asserting it.
  *
  * The IVF-family gates pin C=16 for oracle determinism, so their ×k
  * scale curves are O(N²/C): every copy of the constructed corpus lands
  * in the same 16 cells and within-cell work grows quadratically
  * (SCALE.md: `label_knn_agreement_ivf` ×10.2 at ×20, `semantic_dedup`
  * ×1.8 at ×2). The production rule ([[Similarity.sizedCentroidCount]])
  * scales C with the corpus, keeping cells probe-sized and the per-row
  * cost flat. This probe times BOTH cell-bounded operators at
  * C = sizedCentroidCount(16, k) over the [[ScaleBench]]-constructed ×k
  * corpus (identical data to the pinned-C curve rows, so the two curves
  * are directly comparable) — two passes, second reported.
  *
  * Usage: runMain graft.tools.CScaledProbe [baseSfDir] [outRoot] [k1,k2,...]
  * Prints one JSON line per (scale, query).
  */
object CScaledProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val ks = (if (args.length > 2) args(2) else "1,2,5,10,20")
      .split(",").map(_.trim.toInt)
    val spark = GraftSession.builder("graft-cscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- ks) {
      val dir = if (k == 1) base else ScaleBench.buildScaled(spark, base, outRoot, k)
      val c = Similarity.sizedCentroidCount(16, k.toDouble)
      val e = Tables.embeddings(spark, dir)
      val dim = Similarity.embeddingDim(e)
      val cents = Similarity.hashCentroids(dim, c)
      def time(f: => org.apache.spark.sql.DataFrame): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          try {
            f.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } finally Pinned.release(spark)
        }
        once(); once() // warm pass, then the reported steady-state pass
      }
      val sd = time(SemanticDedup.prune(e, numCentroids = c))
      println(s"""{"scale":"x$k","rel_volume":$k,"query":"semantic_dedup","c":$c,"sec":$sd}""")
      val ln = time(LabelNoise.knnLabelAgreementIvf(e, 10, 4, cents))
      println(s"""{"scale":"x$k","rel_volume":$k,"query":"label_knn_agreement_ivf","c":$c,"sec":$ln}""")
      // the IMI comparison rows: same sized effective cell count via two
      // half-space codebooks of ceil(sqrt C) — (a) the assignment sweep
      // in isolation (the exact O(N*C) component the two-level quantizer
      // retires) and (b) semantic_dedup end-to-end with only the
      // assignment stage swapped
      val cSide = math.ceil(math.sqrt(c.toDouble)).toInt
      val half = dim / 2
      val hc1 = Similarity.hashCentroids(half, cSide)
      val hc2 = Similarity.hashCentroids(half, cSide)
      import org.apache.spark.sql.functions.col
      val af = time(Similarity.assignToCentroids(e, cents)
        .select(col("vec_id"), col("centroid_id")))
      println(s"""{"scale":"x$k","rel_volume":$k,"query":"assign_flat","c":$c,"sec":$af}""")
      val ai = time(Similarity.assignImi(e, hc1, hc2, half)
        .select(col("vec_id"),
          (col("cid1") * cSide + col("cid2")).as("centroid_id")))
      println(s"""{"scale":"x$k","rel_volume":$k,"query":"assign_imi","c":${cSide * cSide},"sec":$ai}""")
      val sdImi = time(SemanticDedup.pruneAssigned(
        Similarity.assignImi(e, hc1, hc2, half)
          .withColumn("centroid_id", col("cid1") * cSide + col("cid2"))
          .drop("cid1", "cid2")))
      println(s"""{"scale":"x$k","rel_volume":$k,"query":"semantic_dedup_imi","c":${cSide * cSide},"sec":$sdImi}""")
    }
    spark.stop()
  }
}
