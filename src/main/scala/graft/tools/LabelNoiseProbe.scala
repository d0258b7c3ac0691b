package graft.tools

import graft.GraftSession
import graft.operators.{LabelNoise, Pinned, Similarity}
import graft.sources.Tables

/** Quantizer-sizing probe for the IVF label-noise screen: times
  * `knnLabelAgreementIvf` at a given cell count, two-pass (ScaleBench's
  * protocol). The gate pins C=16 for oracle determinism, which makes its
  * scale curve O(N²/C) on the ×k corpus (every copy lands in the same
  * cell); the production sizing rule is C ∝ N — this probe measures that
  * claim instead of asserting it.
  *
  * Usage: runMain graft.tools.LabelNoiseProbe <dir> <numCentroids> [k] [nProbe]
  */
object LabelNoiseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x20")
    val numCentroids = (if (args.length > 1) args(1) else "320").toInt
    val k = (if (args.length > 2) args(2) else "10").toInt
    val nProbe = (if (args.length > 3) args(3) else "4").toInt
    val spark = GraftSession.get("graft-labelnoise-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val dim = Similarity.embeddingDim(e)
    val n = e.count()
    def once(): Double = {
      val t0 = System.nanoTime()
      try {
        LabelNoise.knnLabelAgreementIvf(e, k, nProbe,
            Similarity.hashCentroids(dim, numCentroids))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally Pinned.release(spark)
    }
    val warm = once()
    val measured = once()
    println(f"[probe] label_knn_ivf dir=$dir n=$n C=$numCentroids nProbe=$nProbe: " +
      f"warm=$warm%.2f s measured=$measured%.2f s")
    spark.stop()
  }
}
