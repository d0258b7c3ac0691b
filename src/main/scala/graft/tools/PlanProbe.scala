package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.Pinned

/** Dump the POST-EXECUTION adaptive plan of a driver-contract query — what
  * AQE actually ran, not the static estimate (`ExplainAll` shows the
  * pre-execution plan; join-strategy conversions happen at runtime).
  *
  * Usage: runMain graft.tools.PlanProbe <dir> <query> [joinsOnly]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "dedup_ngram_jaccard"
    val joinsOnly = args.length > 2 && args(2) == "joins"
    val spark = GraftSession.get("graft-plan-probe")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.foreach(_ => ()) // materialize THIS Dataset's QueryExecution
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = df.queryExecution.executedPlan.toString
    if (joinsOnly)
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .foreach(println)
    else println(plan)
    println(f"[plan-probe] $name ran in $sec%.2f s")
    Pinned.release(spark)
    spark.stop()
  }
}
