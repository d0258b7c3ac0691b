package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-out replacement for a single-partition global ROW_NUMBER (O18).
  *
  * The reference assigns PO ids by enumerating the sorted result on the
  * driver (reference dags/pipeline.py:682-687); the direct Spark translation
  * is `row_number().over(Window.orderBy(...))`, which forces every row
  * through ONE task — fine for a dimension-bounded output, fatal for a
  * 100 TB fact-sized result.
  *
  * This variant keeps the data distributed:
  *   1. range-repartition by the sort key (same exchange a global sort uses),
  *   2. sort within partitions (no extra shuffle: range + local sort ==
  *      total order),
  *   3. `RDD.zipWithIndex` — Spark's own two-job count-then-offset pattern.
  * Both of zipWithIndex's jobs (per-partition counts, then offset+assign)
  * run over the SAME RDD object, so the range exchange's map output is
  * computed once and the second job re-reads the shuffle files — no cache,
  * nothing to unpersist, and no risk of the two jobs observing different
  * partition layouts (the round-1 version cached for that and leaked the
  * cached blocks).
  *
  * Precondition: `sortKeys` must be a TOTAL order (include tie-break
  * columns). With ties, the within-partition sort order — and therefore the
  * assigned ids — can differ between the two zipWithIndex jobs and across
  * runs, because shuffle-block arrival order is nondeterministic.
  */
object ScalableIds {

  def withGlobalRowNumbers(df: DataFrame, idCol: String, sortKeys: Column*): DataFrame = {
    val sorted = df.repartitionByRange(sortKeys: _*).sortWithinPartitions(sortKeys: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    // ids are 1-based to match ROW_NUMBER()
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(withId, schema)
  }
}
