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

  /** Next monotonic batch sequence: one more than the store's current max,
    * derived from the STORE rather than the clock — two appends in the same
    * millisecond (or a clock step-back) must neither tie nor invert
    * last-write-wins order. Shared by the batch and streaming ingest paths
    * so the two stay one comparable sequence domain. Single writer per
    * store assumed (as in the reference's sequential DAG); concurrent
    * writers need an external sequencer, same as Cassandra's timestamp
    * ties. The max() is answered from parquet footer statistics per file —
    * no row data is read.
    */
  def nextBatchSeq(spark: SparkSession, storeDir: String): Long = {
    val existing =
      try spark.read.parquet(storeDir).agg(max(col("batch_seq"))).first()
      catch { case _: org.apache.spark.sql.AnalysisException => null } // no store yet
    if (existing == null || existing.isNullAt(0)) 1L else existing.getLong(0) + 1L
  }

  /** Append one load batch with the next store-derived sequence. */
  def appendNext(snapshots: DataFrame, storeDir: String): Long = {
    val seq = nextBatchSeq(snapshots.sparkSession, storeDir)
    append(snapshots, storeDir, seq)
    seq
  }

  /** Append one load batch. `batchSeq` orders re-loads: later batches win. */
  def append(snapshots: DataFrame, storeDir: String, batchSeq: Long): Unit =
    snapshots
      .withColumn("batch_seq", lit(batchSeq))
      .write.mode("append").partitionBy("snapshot_date").parquet(storeDir)

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
