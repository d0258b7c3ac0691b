package graft

import graft.procurement.{DataGenerator, Queries}
import graft.sources.MasterData
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** S6 — live master data over JDBC, exercised end-to-end against embedded
  * Derby (the one JDBC engine shipped in Spark's jars; production points the
  * URL at PostgreSQL exactly like the reference's Trino catalog file). */
class MasterDataSpec extends SparkSpec {

  private lazy val dbDir = Files.createTempDirectory("graft_derby").resolve("db").toString
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val gen = new DataGenerator(seed = 7L)
  private lazy val fixtures = gen.masterFrames(spark)

  // the six master tables written INTO Derby through Spark's JDBC sink,
  // then read back live through MasterData — a full wire roundtrip
  private lazy val live: Map[String, org.apache.spark.sql.DataFrame] = {
    fixtures.foreach { case (t, df) =>
      opts.foldLeft(
        df.write.format("jdbc").option("url", url).option("dbtable", t)
      ) { case (w, (k, v)) => w.option(k, v) }.mode("overwrite").save()
    }
    MasterData.masterFramesJdbc(spark, url, opts)
  }

  test("S6: all six master tables roundtrip through JDBC bit-exactly") {
    assert(live.keySet === MasterData.masterTables.toSet)
    for (t <- MasterData.masterTables) {
      val want = fixtures(t).collect().map(_.toSeq).toSet
      val got = live(t).selectExpr(fixtures(t).columns.map(c => s"`$c`"): _*)
        .collect().map(_.toSeq).toSet
      assert(got === want, s"JDBC roundtrip mismatch for $t")
    }
  }

  test("S6: dimension probes push filters into the remote SQL") {
    val probe = live("products").filter(col("is_active")).select("sku_id")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("is_active"),
      s"filter must reach the JDBC scan, got:\n$plan")
  }

  test("S6: Q1 over live JDBC master data equals Q1 over fixture frames") {
    import spark.implicits._
    val orders = gen.rawOrders(java.time.LocalDate.of(2026, 1, 14), 500).toDF()
    def q1(m: Map[String, org.apache.spark.sql.DataFrame]) =
      Queries.aggregateOrders(orders, m("products"), m("warehouses"))
        .collect().map(_.toSeq).toSet
    assert(q1(live) === q1(fixtures))
  }
}
