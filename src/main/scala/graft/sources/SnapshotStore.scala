package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S3 — the inventory-snapshot store (replaces the reference's Cassandra
  * table `procurement.inventory_snapshots`, init-scripts/cassandra/init.cql:7-17,
  * loaded row-by-row at dags/pipeline.py:275-289).
  *
  * Cassandra INSERT is an upsert: repeated writes of the same primary key
  * ((sku_code), snapshot_date, warehouse_code) last-write-win. Reproduced
  * Spark-natively as: append-only parquet batches carrying a monotonically
  * increasing `batch_seq`, and a read path that keeps, per key, only the row
  * from the highest batch (ROW_NUMBER over the key ordered by batch_seq
  * DESC — SURVEY §2.4(5)).
  *
  * Scale design: the store is written partitioned by `snapshot_date`, so the
  * reference's `WHERE snapshot_date = DATE '...'` scan (S7) becomes partition
  * pruning — the 100 TB history is never touched for a single-day read. The
  * dedup window partitions by the full key, so it parallelizes across keys;
  * there is no global window. Compaction (`compact`) rewrites a date
  * partition to its deduped form so hot dates pay the window once.
  */
object SnapshotStore {

  val keyCols: Seq[String] = Seq("sku_code", "snapshot_date", "warehouse_code")

  /** Sidecar file holding the store's current max batch sequence — a
    * driver-side control-plane read of a few bytes per append, instead of
    * an O(store-size) scan of every parquet footer (and, without aggregate
    * pushdown, every row of the batch_seq column) per micro-batch. */
  private val SeqFileName = "_graft_batch_seq"

  private def hadoopFs(spark: SparkSession, storeDir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)

  /** Read the sidecar; ANY failure (missing, truncated, garbled — e.g. a
    * non-atomic rename on an object store) degrades to None, which sends
    * the caller down the parquet-scan fallback instead of blocking every
    * subsequent append on an unreadable control file. */
  private def readSeqSidecar(fs: org.apache.hadoop.fs.FileSystem,
                             storeDir: String): Option[Long] =
    try {
      val p = new org.apache.hadoop.fs.Path(storeDir, SeqFileName)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val line = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8")).readLine()
          Option(line).map(_.trim.toLong)
        } finally in.close()
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[snapshotstore] unreadable sequence sidecar, " +
          s"falling back to store scan: $e")
        None
    }

  /** Record `seq` as the store's max (temp-write + rename; the brief
    * missing-file window during the swap falls back to the parquet scan). */
  private def writeSeqSidecar(fs: org.apache.hadoop.fs.FileSystem,
                              storeDir: String, seq: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(storeDir, s".$SeqFileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$seq\n".getBytes("UTF-8")) finally out.close()
    val dest = new org.apache.hadoop.fs.Path(storeDir, SeqFileName)
    fs.delete(dest, false) // rename does not overwrite on all filesystems
    if (!fs.rename(tmp, dest))
      // non-fatal: a missing/garbled sidecar degrades to the store scan
      System.err.println("[snapshotstore] sequence sidecar rename failed; " +
        "next append will fall back to the store scan")
  }

  /** Next monotonic batch sequence: one more than the store's current max,
    * derived from the STORE rather than the clock — two appends in the same
    * millisecond (or a clock step-back) must neither tie nor invert
    * last-write-wins order. Shared by the batch and streaming ingest paths
    * so the two stay one comparable sequence domain.
    *
    * The current max lives in the [[SeqFileName]] sidecar, so per-append
    * cost is one tiny file read — NOT a scan of the growing store. Stores
    * written before the sidecar existed (or with a deleted sidecar) fall
    * back to a one-time batch_seq-only parquet scan, after which the next
    * append re-seeds the sidecar. Single writer per store assumed (as in
    * the reference's sequential DAG): batch and streaming ingest into the
    * SAME store must not run concurrently — concurrent writers need an
    * external sequencer, same as Cassandra's timestamp ties.
    */
  /** The store's max batch_seq from the data itself (batch_seq-only scan);
    * 0 for an empty/absent store. The seed/fallback path when no readable
    * sidecar exists. */
  private def storeMaxSeq(spark: SparkSession, storeDir: String): Long = {
    val existing =
      try spark.read.parquet(storeDir).select(col("batch_seq"))
        .agg(max(col("batch_seq"))).first()
      catch { case _: org.apache.spark.sql.AnalysisException => null } // no store yet
    if (existing == null || existing.isNullAt(0)) 0L else existing.getLong(0)
  }

  /** The store's current max sequence: sidecar if readable, else scan. */
  private def currentSeq(spark: SparkSession, storeDir: String): Long = {
    val fs = hadoopFs(spark, storeDir)
    readSeqSidecar(fs, storeDir).getOrElse(storeMaxSeq(spark, storeDir))
  }

  def nextBatchSeq(spark: SparkSession, storeDir: String): Long =
    currentSeq(spark, storeDir) + 1L

  /** Append one load batch with the next store-derived sequence. The
    * current sequence is derived ONCE and threaded through — not
    * re-derived inside the append, which on a sidecar-less store would
    * double the fallback scans on every (micro-)batch. */
  def appendNext(snapshots: DataFrame, storeDir: String): Long = {
    val current = currentSeq(snapshots.sparkSession, storeDir)
    doAppend(snapshots, storeDir, current + 1L, current)
    current + 1L
  }

  /** Append one load batch. `batchSeq` orders re-loads: later batches win.
    *
    * The sequence sidecar is advanced BEFORE the data write (reserve,
    * then write): a crash between the two leaves a harmless gap in the
    * sequence, never a duplicate — a duplicate would tie the
    * last-write-wins row_number and let stale data win. When no readable
    * sidecar exists, the reservation seeds from the store's actual max
    * (never blindly from `batchSeq`), so a pre-sidecar store cannot be
    * re-seeded below data it already holds. Explicit `batchSeq` values at
    * or below the store's current max are the caller's own replay
    * semantics and leave the sidecar untouched. */
  def append(snapshots: DataFrame, storeDir: String, batchSeq: Long): Unit =
    doAppend(snapshots, storeDir, batchSeq,
      currentSeq(snapshots.sparkSession, storeDir))

  private def doAppend(snapshots: DataFrame, storeDir: String, batchSeq: Long,
                       current: Long): Unit = {
    val fs = hadoopFs(snapshots.sparkSession, storeDir)
    if (current < batchSeq) writeSeqSidecar(fs, storeDir, batchSeq)
    snapshots
      .withColumn("batch_seq", lit(batchSeq))
      .write.mode("append").partitionBy("snapshot_date").parquet(storeDir)
  }

  /** Read with upsert semantics: per key, latest batch wins. */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("batch_seq").desc)
    spark.read.parquet(storeDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch_seq")
  }

  /** Date-pruned read — the `snapshot_date = DATE '...'` scan. The filter
    * lands on the partition column, so only one directory is listed/read. */
  def readDay(spark: SparkSession, storeDir: String, day: String): DataFrame =
    read(spark, storeDir).filter(col("snapshot_date") === lit(day))

  /** Streaming ingest: watch a directory of snapshot JSON files and append
    * each micro-batch to the store with the batch id as the upsert
    * sequence — later micro-batches win, which is exactly the Cassandra
    * last-write-wins contract under continuous arrival. */
  def streamAppend(spark: SparkSession, watchDir: String,
                   storeDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "sku_code STRING, snapshot_date STRING, warehouse_code STRING, " +
        "available_qty INT, reserved_qty INT")
    spark.readStream.schema(schema)
      .option("multiLine", "true").json(watchDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // store-derived sequence, NOT the streaming batchId (resets to 0 on
        // checkpoint recreation) and NOT wall-clock (same-millisecond ties
        // invert LWW): the shared nextBatchSeq keeps batch and streaming
        // appends in one strictly increasing domain
        appendNext(batch, storeDir); ()
      }
      .option("checkpointLocation", s"$storeDir/.stream_checkpoint")
      .start()
  }

  /** Rewrite one date partition to its deduped form (idempotent). */
  def compact(spark: SparkSession, storeDir: String, day: String): Unit = {
    val deduped = readDay(spark, storeDir, day)
      .withColumn("batch_seq", lit(0L))
      .drop("snapshot_date") // supplied by the partition directory
    val tmp = s"$storeDir/.compact_tmp_$day"
    deduped.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(storeDir), conf)
    val dest = new org.apache.hadoop.fs.Path(s"$storeDir/snapshot_date=$day")
    fs.delete(dest, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dest)
  }
}
