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
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a long. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", nsToTimestampExpr("ts"))
    else raw
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
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
