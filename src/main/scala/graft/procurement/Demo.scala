package graft.procurement

import graft.GraftSession

/** Runnable end-to-end demo of the daily procurement pipeline:
  * generates one day of raw inputs (reference layout), runs
  * ingest → snapshot store → Q1 → Q2 → Q3 → summary, prints the summary.
  *
  * Usage: runMain graft.procurement.Demo [workDir] [numOrders] [runDate] [snapshotDate]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val workDir = args.lift(0).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val numOrders = args.lift(1).map(_.toInt).getOrElse(1000)
    val runDate = java.time.LocalDate.parse(args.lift(2).getOrElse("2026-01-14"))
    val snapDate = args.lift(3).map(java.time.LocalDate.parse).getOrElse(runDate)

    val spark = GraftSession.get("graft-procurement-demo")
    val gen = new DataGenerator()
    Pipeline.writeRawDay(spark, gen, s"$workDir/raw", runDate, numOrders, snapDate)
    val summary = Pipeline.run(spark, s"$workDir/raw", s"$workDir/store",
      s"$workDir/out", runDate, gen.masterFrames(spark))
    println(s"SUMMARY $summary")
    println(s"outputs under $workDir/out")
    spark.stop()
  }
}
