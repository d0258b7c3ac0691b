package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.Pinned

/** Two-pass timing probe mimicking ScaleBench's protocol for comparing
  * queries in one JVM. Usage: runMain graft.tools.SplitProbe <dir> <q1,q2,...>
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x10")
    val names = (if (args.length > 1) args(1) else "dedup_clusters,corpus_split")
      .split(",").toSeq
    val spark = GraftSession.get("graft-split-probe")
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally Pinned.release(spark)
    }
    names.foreach { n =>
      val warm = once(n)
      val measured = once(n)
      println(f"[probe] $n: warm=$warm%.2f s measured=$measured%.2f s")
    }
    spark.stop()
  }
}
