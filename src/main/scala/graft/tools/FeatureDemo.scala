package graft.tools

import graft.{GraftExtensions, GraftSession}
import graft.operators.SkewTools
import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Runnable tour of the extension surface: SQL-registered custom
  * expressions, skew-salted joins, stateful sessionization.
  *
  * Usage: runMain graft.tools.FeatureDemo [sfDir]
  */
object FeatureDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("graft-features")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Tables.registerViews(spark, dir)
    println("-- SQL: doc_fingerprint + float_vec_dot (registered via GraftExtensions)")
    spark.sql(
      """SELECT d.doc_id, doc_fingerprint(d.text) AS fp,
        |       float_vec_dot(e.embedding, e.embedding) AS self_dot
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id LIMIT 5""".stripMargin).show(truncate = false)

    println("-- salted join on a synthetic hot key (50% of rows on key=1)")
    val left = spark.range(100000)
      .select(when(col("id") % 2 === 0, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val right = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val plain = left.join(right, Seq("k")).count()
    val salted = SkewTools.saltedJoin(left, right, "k", salts = 8).count()
    println(s"plain=$plain salted=$salted equal=${plain == salted}")

    println("-- asof multi-column atomicity: both values from the SAME snapshot row")
    val asofEvents = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("event_id", "k", "ets")
    val asofSnaps = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), Some(2.0)),
      ("k", java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), Some(3.0), None))
      .toDF("k", "sts", "a", "b")
    val asof = graft.operators.AsOfJoin
      .asofLeft(asofEvents, asofSnaps, "k", "ets", "sts", Seq("a", "b"))
      .select("a", "b").first()
    println(s"a=${asof.get(0)} b=${asof.get(1)} (atomic: expect a=3.0 b=null, NOT b=2.0)")

    println("-- AQE-aware shuffle detection (AQE ON, broadcast off => real SMJ)")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val aqeJoin = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
    println(s"shuffled join under AQE: hasShuffle=${graft.sources.Bucketing.hasShuffle(aqeJoin)} (expect true)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)

    println("-- bucketed co-located join: shuffle-free vs control")
    val liB = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_quantity")
    val ordB = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    graft.sources.Bucketing.writeBucketed(liB, "demo_li_b", 8, Seq("l_orderkey"))
    graft.sources.Bucketing.writeBucketed(ordB, "demo_ord_b", 8, Seq("l_orderkey"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val bj = spark.table("demo_li_b").join(spark.table("demo_ord_b"), Seq("l_orderkey"))
    val cj = liB.join(ordB, Seq("l_orderkey"))
    println(s"bucketed shuffles=${graft.sources.Bucketing.hasShuffle(bj)} " +
      s"control shuffles=${graft.sources.Bucketing.hasShuffle(cj)} " +
      s"rows equal=${bj.count() == cj.count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    println("-- IVF ANN vs brute force (recall@10)")
    val emb = Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 8)
    val brute = graft.operators.Similarity.bruteForceKnn(emb, qs, 10)
      .select("query_id", "neighbor_id")
    val ivf = graft.operators.Similarity.ivfKnn(emb, qs, 10, numCentroids = 8, nProbe = 4)
      .select("query_id", "neighbor_id")
    println(s"recall@10 = ${brute.intersect(ivf).count().toDouble / brute.count()}")

    println("-- frame sampling over binary payloads")
    val media = graft.operators.Multimodal.asBinaryPayloads(Tables.documents(spark, dir))
    graft.operators.Multimodal.sampleFrames(media).groupBy()
      .agg(count(lit(1)).as("frames"), countDistinct(col("media_id")).as("docs")).show()

    println("-- shingles of a 3-token doc (must be empty, not [1,0]-bogus)")
    val short = Seq((1L, "one two three")).toDF("doc_id", "text")
    println(s"shingle rows = ${graft.operators.Dedup.shingles(short, 5).count()}")

    println("-- streaming hourly agg over the static corpus (default glob)")
    val hq = graft.streaming.EventStreams.runToMemorySink(spark, dir, "demo_hourly")
    val streamedRows = spark.table("demo_hourly").count()
    hq.stop()
    val batchRows = graft.streaming.EventStreams.hourlyBatch(spark, dir).count()
    println(s"streamed windows=$streamedRows batch windows=$batchRows equal=${streamedRows == batchRows}")

    println("-- stateful sessionization (flatMapGroupsWithState) vs batch twin")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value")).as[EventStreams.SessionEvent]
    val stateful = EventStreams.sessionizeStateful(ev)
    val batch = EventStreams.sessionizeBatch(Tables.events(spark, dir))
    println(s"stateful sessions=${stateful.count()} batch sessions=${batch.count()}")
    stateful.orderBy("user_id", "session_start").show(5)

    spark.stop()
  }
}
