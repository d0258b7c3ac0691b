package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 — live master-data over JDBC.
  *
  * The reference federates a live PostgreSQL database through its query
  * engine (trino/etc/catalog/postgresql.properties; the master tables are
  * joined into every query, e.g. dags/pipeline.py:422-423, 502-514). The
  * Spark-native equivalent is the built-in JDBC source: `fromJdbc` returns
  * a DataFrame whose filters and column selection are pushed into the
  * remote SQL by Catalyst (JDBCScan shows PushedFilters), so a dimension
  * probe never drags the whole table across the wire.
  *
  * Scale notes:
  *   - The six master tables are dimensions — small enough that a
  *     single-partition read into a broadcast join side is the RIGHT plan;
  *     parallel JDBC partitioning would only multiply connections.
  *   - For a genuinely large JDBC table, pass `partitionColumn` /
  *     `lowerBound` / `upperBound` / `numPartitions` through `options` and
  *     Spark fans the read out across executors with range predicates.
  *   - Works against any JDBC database; the spec exercises embedded Derby
  *     (the only JDBC engine shipped with Spark's jars), production would
  *     point `url` at PostgreSQL exactly like the reference's catalog file.
  */
object MasterData {

  /** The reference's master tables (init-scripts/postgres/init.sql:9-71). */
  val masterTables: Seq[String] = Seq(
    "suppliers", "products", "warehouses", "supplier_products",
    "safety_stock", "safety_stock_by_warehouse")

  /** One table over JDBC. `options` passes through driver/credentials/
    * partitioning (`user`, `password`, `driver`, `partitionColumn`, ...). */
  def fromJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** The full master-data map Pipeline.run consumes, read live over JDBC —
    * the drop-in alternative to the parquet/fixture loaders. */
  def masterFramesJdbc(spark: SparkSession, url: String,
                       options: Map[String, String] = Map.empty): Map[String, DataFrame] =
    masterTables.map(t => t -> fromJdbc(spark, url, t, options)).toMap
}
