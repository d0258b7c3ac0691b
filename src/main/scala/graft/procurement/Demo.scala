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
    val master = gen.masterFrames(spark)
    val summary = Pipeline.run(spark, s"$workDir/raw", s"$workDir/store",
      s"$workDir/out", runDate, master)
    println(s"SUMMARY $summary")
    println(s"outputs under $workDir/out")

    // ad-hoc SQL surface (§3.3): the reference README's example query
    Views.register(spark, master, storeDir = Some(s"$workDir/store"))
    println("-- ad-hoc SQL: inventory by product (reference README example)")
    Views.inventoryByProduct(spark, snapDate.toString).show(5)

    // streaming ingest path: watch dir → micro-batch upsert into a store
    val ddMMyyyy = runDate.format(java.time.format.DateTimeFormatter.ofPattern("dd-MM-yyyy"))
    val q = graft.sources.SnapshotStore.streamAppend(
      spark, s"$workDir/raw/snapshots/$ddMMyyyy", s"$workDir/stream_store")
    q.processAllAvailable(); q.stop()
    println(s"-- streaming ingest: store rows = " +
      graft.sources.SnapshotStore.read(spark, s"$workDir/stream_store").count())
    spark.stop()
  }
}
