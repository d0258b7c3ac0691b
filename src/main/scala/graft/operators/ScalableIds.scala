package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out replacement for a single-partition global ROW_NUMBER (O18).
  *
  * The reference assigns PO ids by enumerating the sorted result on the
  * driver (reference dags/pipeline.py:682-687); the direct Spark translation
  * is `row_number().over(Window.orderBy(...))`, which forces every row
  * through ONE task — fine for Q3's dimension-bounded output, fatal for a
  * 100 TB fact-sized result.
  *
  * This variant keeps the data distributed:
  *   1. range-repartition by the sort key (same exchange a global sort uses),
  *   2. sort within partitions (no extra shuffle: range + local sort ==
  *      total order),
  *   3. count rows per partition (one lightweight job),
  *   4. add each partition's starting offset to a per-partition local rank.
  * Net cost: one range exchange + one count pass — no single-task stage.
  */
object ScalableIds {

  def withGlobalRowNumbers(df: DataFrame, idCol: String, sortKeys: Column*): DataFrame = {
    // cached: the counts job and the id job must observe the SAME partition
    // layout — re-executing the exchange twice would both double the
    // dominant shuffle and risk AQE/replay repartitioning between jobs,
    // which would silently misalign the collected offsets
    val sorted = df.repartitionByRange(sortKeys: _*).sortWithinPartitions(sortKeys: _*)
      .cache()
    val counts = sorted
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1))
      .toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val enc = org.apache.spark.sql.Encoders.row(
      org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+
          org.apache.spark.sql.types.StructField(
            idCol, org.apache.spark.sql.types.LongType, nullable = false)))
    val withId = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = bc.value.getOrElse(pid, 0L)
      it.map { r =>
        i += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
    }(enc)
    withId
  }
}
