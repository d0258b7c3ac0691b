package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out replacement for a single-partition global ROW_NUMBER (O18).
  *
  * The reference assigns PO ids by enumerating the sorted result on the
  * driver (reference dags/pipeline.py:682-687); the direct Spark translation
  * is `row_number().over(Window.orderBy(...))`, which forces every row
  * through ONE task — fine for a dimension-bounded output, fatal for a
  * 100 TB fact-sized result.
  *
  * This variant keeps the data distributed AND stays entirely inside
  * Catalyst (no RDD boundary — the rounds-2/3 `zipWithIndex` version
  * converted every row out of Tungsten and back, killing whole-stage
  * codegen and column pruning above it):
  *
  *   1. range-repartition by the sort key + sort within partitions (the
  *      same exchange a global sort uses: partition index order + local
  *      sort == total order),
  *   2. `monotonically_increasing_id()` — a codegen'd expression encoding
  *      (partition index << 33) | local row position, i.e. a free
  *      per-partition row number in one pass,
  *   3. per-partition row counts — O(#partitions) longs — collect to the
  *      driver (the sorted stage is pinned so this pass and the output
  *      pass share one computation),
  *   4. cumulative offsets broadcast back and added to the local position.
  *
  * The only driver-side data is one (pid, count) pair per partition —
  * O(#partitions), like collecting IVF centroids, never O(rows). The
  * pinned stage is MEMORY_AND_DISK (spill-safe) and is released by the
  * caller's [[Pinned.release]] after the consuming action; at 100 TB its
  * disk footprint is the same order as the shuffle files the zipWithIndex
  * variant re-read.
  *
  * Preconditions: `sortKeys` must be a TOTAL order (include tie-break
  * columns) — with ties, recomputation after release could permute equal
  * rows. Partitions must stay under 2^33 rows (the id's local-position
  * field), which `repartitionByRange`'s even ranges guarantee in practice.
  */
object ScalableIds {

  private val LocalMask = (1L << 33) - 1

  /** Driver-side prefix scan over per-partition totals: collects the
    * O(#partitions) `(pid: long, total: long)` rows, accumulates running
    * offsets in pid order, and returns a broadcastable
    * `(__pid, __offset)` frame. The shared offset protocol of the
    * global-id and running-total ([[ScalableCumsum]]) operators — empty
    * partitions simply don't appear, contributing 0 by construction. */
  private[operators] def cumulativeOffsets(perPartitionTotals: DataFrame): DataFrame = {
    val spark = perPartitionTotals.sparkSession
    val rows = perPartitionTotals
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offsets = rows.map { case (p, n) => val o = running; running += n; (p, o) }
    import spark.implicits._
    offsets.toSeq.toDF("__pid", "__offset")
  }

  def withGlobalRowNumbers(df: DataFrame, idCol: String, sortKeys: Column*): DataFrame = {
    val sorted = Pinned.pin(
      df.repartitionByRange(sortKeys: _*)
        .sortWithinPartitions(sortKeys: _*)
        .withColumn("__mid", monotonically_increasing_id()))
    val pid = shiftrightunsigned(col("__mid"), 33)
    val local = col("__mid").bitwiseAND(lit(LocalMask))
    val offsetsDf = cumulativeOffsets(
      sorted.groupBy(pid.as("__pid")).agg((max(local) + 1L).as("__n")))
    sorted
      .withColumn("__pid", pid)
      .join(broadcast(offsetsDf), Seq("__pid"))
      // ids are 1-based to match ROW_NUMBER()
      .withColumn(idCol, col("__offset") + local + lit(1L))
      .drop("__pid", "__mid", "__offset")
  }
}
