package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join storage layout.
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) on the
  * join key lets Spark plan a SortMergeJoin with NO shuffle exchange on
  * either side: each bucket pair joins locally. At 100 TB this turns the
  * nightly fact⋈fact joins from full-network shuffles into embarrassingly
  * parallel per-bucket merges; the shuffle is paid once at write time and
  * amortized over every subsequent join. (BucketingSpec asserts the
  * exchange-free plan.)
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table on `keys`.
    * Drops any previous table AND clears a stale warehouse location (a
    * location left by a previous session is untracked by the fresh
    * in-memory catalog and would fail LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    require(!table.contains("."),
      "writeBucketed takes an unqualified table name (default database)")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // saveAsTable lowercases the identifier when resolving its location
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/${table.toLowerCase(java.util.Locale.ROOT)}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the executed plan of `df` contains a shuffle exchange — the
    * thing bucketing is supposed to eliminate. Recurses through adaptive
    * wrappers: AdaptiveSparkPlanExec and query stages are LeafExecNodes, so
    * a plain `plan.exists` is blind to everything inside them and would
    * report `false` for ANY plan under the session default AQE=on. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case q: QueryStageExec => q.isInstanceOf[
        org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec] || scan(q.plan)
      case _: ShuffleExchangeLike => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
