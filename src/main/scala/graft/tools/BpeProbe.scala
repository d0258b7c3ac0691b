package graft.tools
import graft.GraftSession
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("bpe-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val docs = graft.sources.Tables.documents(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    val merges = graft.operators.BpeTrain.train(docs, numMerges = args.lift(1).map(_.toInt).getOrElse(30))
    merges.zipWithIndex.foreach { case (m, i) =>
      if (i < 3 || i == merges.size - 1)
        System.err.println(f"[bpe] ${(System.nanoTime()-t0)/1e9}%.1fs $m")
    }
    spark.stop()
  }
}
