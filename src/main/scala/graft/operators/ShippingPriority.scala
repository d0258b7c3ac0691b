package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-heavy top-k: revenue of undelivered orders for a market segment —
  * the classic shipping-priority shape (3-way join on two fact tables +
  * group + top-k by revenue).
  *
  * Scale notes:
  *   - customer is filtered THEN broadcast (segment predicate pushed to its
  *     scan); lineitem⋈orders is the real join — both sides filtered by
  *     their date predicates before the shuffle.
  *   - The final `orderBy(...).limit(k)` plans as TakeOrderedAndProject:
  *     each partition keeps a k-row heap and the driver merges k·p rows —
  *     no global sort of the aggregate output ever materializes. That is
  *     THE top-k pattern at 100 TB (a full sort + limit would range-shuffle
  *     everything for k rows).
  *   - Revenue is summed in exact integer hundredths-of-cents (price cents
  *     × (100−disc)), bit-identical to DuckDB (see PricingSummary).
  */
object ShippingPriority {
  val segment = "BUILDING"
  val cutoff = "1995-03-15"

  def apply(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
            k: Int = 20): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders.filter(col("o_orderdate") < lit(cutoff))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = lineitem.filter(col("l_shipdate") > lit(cutoff))
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("rev_c"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority").as("priority"))
      .agg(sum(col("rev_c")).as("rev_sum"))
      .select(col("l_orderkey").as("order_id"), col("order_date"), col("priority"),
        (col("rev_sum").cast("double") / 1e4).as("revenue"))
      .orderBy(col("revenue").desc, col("order_id"))
      .limit(k)
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    apply(Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir))

  def oracle(k: Int = 20): String =
    s"""SELECT l.l_orderkey AS order_id,
       |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       |       o.o_orderpriority AS priority,
       |       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
       |                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_mktsegment = '$segment'
       |  AND o.o_orderdate < TIMESTAMP '$cutoff'
       |  AND l.l_shipdate > TIMESTAMP '$cutoff'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, order_id
       |LIMIT $k""".stripMargin
}
