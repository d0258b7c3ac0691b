package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test corpus
  * (`/root/testdata/sf*`: TPC-H-ish star schema + `events`, `documents`,
  * `embeddings`).
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan (`PushedFilters`/`ReadSchema`), so every
  * downstream operator should express selection declaratively rather than
  * materializing wide frames. At 100 TB the same call reads a partitioned
  * table; nothing here assumes single-file layout.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet's `ts` physical encoding has varied across driver
    * regenerations — INT64 TIMESTAMP(NANOS) (surfaces as a long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (surfaces as TIMESTAMP_NTZ under Spark's
    * default NTZ inference). Normalize BOTH to session-zone TimestampType
    * here, at the one load point: the session zone is pinned to UTC
    * (GraftSession), so the NTZ→LTZ cast is wall-clock-identity and
    * `ts.cast("long")` epoch math stays equal to the DuckDB oracle's
    * naive `epoch(ts)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", nsToTimestampExpr("ts"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          raw.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Nanosecond-epoch long column → TimestampType, floor-truncated to
    * micros. Integer DIV (not double division — precision loss above 2^53
    * ns); the single conversion rule for batch AND streaming readers. */
  def nsToTimestampExpr(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr(s"$colName DIV 1000"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view — the ad-hoc SQL surface the
    * reference exposes through Trino catalogs (reference README.md:198-227);
    * here `spark.sql("SELECT ... FROM lineitem ...")` works the same way. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach {
      // events goes through its ts-normalizing loader so the SQL surface
      // sees the same TimestampType the DataFrame operators see
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
