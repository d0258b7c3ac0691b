package graft.tools

import graft.GraftSession
import graft.sources.SnapshotStore

/** Store sanity probe: exercises the upsert contract across BOTH ingest
  * paths — a batch append (Pipeline-style) followed immediately by a
  * streaming append of the same key must resolve to the streamed (newer)
  * value. No sleep between the two: the store-derived batch_seq is immune
  * to same-millisecond ties. Usage: runMain graft.tools.StoreProbe [workDir]
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_storeprobe").toString)
    val spark = GraftSession.get("graft-store-probe")
    import spark.implicits._

    val store = s"$dir/store"
    // 1. batch path (what Pipeline.run does)
    val batchRow = Seq(("P1", "2026-01-14", "W1", 10, 0))
      .toDF("sku_code", "snapshot_date", "warehouse_code", "available_qty", "reserved_qty")
    SnapshotStore.appendNext(batchRow, store)
    // 2. streaming path, same key, newer value
    val watch = s"$dir/incoming"
    new java.io.File(watch).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$watch/a.json"),
      """[{"sku_code":"P1","snapshot_date":"2026-01-14","warehouse_code":"W1","available_qty":99,"reserved_qty":1}]""")
    val q = SnapshotStore.streamAppend(spark, watch, store)
    q.processAllAvailable(); q.stop()

    val rows = SnapshotStore.read(spark, store).collect()
    println(s"rows=${rows.length} available=${rows.head.getAs[Int]("available_qty")}")
    println(if (rows.length == 1 && rows.head.getAs[Int]("available_qty") == 99)
      "STORE PROBE OK: streamed (newer) value won across mixed ingest paths"
    else "STORE PROBE FAILED")
    spark.stop()
  }
}
