package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-ingestion sources mirroring the reference's contracts.
  *
  * S1/S4 (reference dags/pipeline.py:162-197,306-385): daily order CSVs are
  * declared ALL-VARCHAR (Trino Hive CSV limitation) with the header skipped;
  * numeric meaning is applied per-query via CAST, and a malformed value
  * degrades to NULL (non-ANSI cast), never a read failure.
  *
  * S2 (reference dags/pipeline.py:204-245): stock arrives as a JSON array
  * and is persisted as header CSV `[warehouse_id, sku_id, current_stock]`.
  */
object Ingest {

  /** Read a header CSV with every column as string — the all-VARCHAR
    * contract. An explicit schema (names only, all StringType) keeps the
    * read schema-stable even on empty files. */
  def csvAllStrings(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .csv(path)

  /** Infer-free all-string CSV read when column names come from the header
    * itself (ad-hoc files). */
  def csvAllStrings(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // everything stays string
      .csv(path)

  val orderColumns: Seq[String] =
    Seq("order_id", "supplier_id", "sku_id", "quantity", "warehouse_id", "order_date")

  def orders(spark: SparkSession, path: String): DataFrame =
    csvAllStrings(spark, path, orderColumns)

  /** JSON-array file (the reference reads whole-file arrays, not JSONL). */
  def jsonArray(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S2: stock JSON → CSV with the fixed header column order. */
  def stockJsonToCsv(spark: SparkSession, jsonPath: String, csvOut: String): DataFrame = {
    val df = jsonArray(spark, jsonPath)
      .select(col("warehouse_id").cast("long"), col("sku_id").cast("long"),
        col("current_stock").cast("long"))
    df.write.mode("overwrite").option("header", "true").csv(csvOut)
    df
  }
}

/** S8 (reference dags/pipeline.py:436-457,554-571,692-713): every query
  * result lands as a JSON + CSV pair in a per-date directory. */
object Writers {

  def dualSink(df: DataFrame, baseDir: String, dataset: String, runDate: String,
               singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(s"$baseDir/$dataset/$runDate/json")
    out.write.mode("overwrite").option("header", "true").csv(s"$baseDir/$dataset/$runDate/csv")
  }
}
