package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `explain("formatted")` for every driver-contract query — the plan
  * review loop: check PushedFilters / ReadSchema pruning, broadcast joins,
  * WholeStageCodegen spans, and exchange reuse.
  *
  * Usage: runMain graft.tools.ExplainAll [sfDir] [queryName...]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get("graft-explain")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
