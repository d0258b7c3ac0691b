package graft

import graft.functions.{Fingerprint, TextFunctions}
import graft.procurement.{DataGenerator, Queries}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY §5 item 4): the order-sizing and demand
  * invariants over generated inputs, plus expression-level properties
  * checked against Scala reference computations through Spark. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  test("order sizing: qty >= max(min_order, net) and pack-aligned or min (property)") {
    check(Prop.forAll(Gen.choose(1L, 10000L), Gen.choose(1, 50), Gen.choose(0, 500)) {
      (net: Long, pack: Int, minQ: Int) =>
        val packed = math.ceil(net.toDouble / pack).toLong * pack
        val qty = math.max(minQ.toLong, packed).toDouble
        qty >= minQ && qty >= net && (qty % pack == 0.0 || qty == minQ.toDouble)
    })
  }

  test("net demand formula is non-negative and monotone in demand (property)") {
    check(Prop.forAll(Gen.choose(0L, 100000L), Gen.choose(0L, 5000L),
      Gen.choose(-10000L, 100000L)) { (demand: Long, safety: Long, effective: Long) =>
      val nd = math.max(0L, demand + safety - effective)
      nd >= 0 && math.max(0L, (demand + 1) + safety - effective) >= nd
    })
  }

  test("fingerprint expression == reference impl on arbitrary strings (via Spark)") {
    val strs = Gen.listOfN(200, Gen.asciiPrintableStr.map(_.take(60))).sample.get
    val rows = strs.toDF("text")
      .select(col("text"), Fingerprint.docFingerprint(col("text")).as("fp"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === Fingerprint.reference(r.getString(0)))
      assert(r.getLong(1) >= 0 && r.getLong(1) < 1000000007L)
    }
  }

  test("shingle count == max(0, tokens - n + 1) across sizes (via Spark)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val cases = (for {
      k <- 0 to 12; n <- 2 to 6
    } yield (Gen.listOfN(k, word).sample.get, n)).toSeq
    val df = cases.zipWithIndex
      .map { case ((ws, n), i) => (i, ws.mkString(" "), n) }
      .toDF("id", "text", "n")
    for (n <- 2 to 6) {
      val got = df.filter(col("n") === n)
        .select(col("id"), size(TextFunctions.wordShingles(col("text"), n)).as("c"),
          size(TextFunctions.tokens(col("text"))).as("t"))
        .collect()
      got.foreach(r => assert(r.getInt(1) === math.max(0, r.getInt(2) - n + 1),
        s"n=$n tokens=${r.getInt(2)}"))
    }
  }

  test("connected components == driver union-find on random graphs (via Spark)") {
    // a handful of random graphs through the REAL distributed operator,
    // checked against an independent driver-side union-find
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nNodes = 3 + rnd.nextInt(20)
      val nEdges = 1 + rnd.nextInt(25)
      val edges = Seq.fill(nEdges)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes
          .groupBy(find).toSeq
          .flatMap { case (_, members) => members.map(_ -> members.min) }.toMap
        val got = graft.operators.NearDupClusters
          .connectedComponents(edges.toDF("id1", "id2"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        graft.operators.Pinned.release(spark)
        assert(got === expected, s"trial $trial: $edges")
      }
    }
  }

  test("scalable cumsum == naive window on random values and skewed keys (via Spark)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "v")
    val expected = rows.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.drop(1).toMap
    val got = graft.operators.ScalableCumsum
      .withRunningTotal(df.repartition(17), col("v"), "cum", col("k"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cum"))).toMap
    graft.operators.Pinned.release(spark)
    assert(got === expected)
  }

  test("bin range join == naive join on random intervals across bin sizes (via Spark)") {
    val rnd = new scala.util.Random(13)
    val day = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def t(offsetSec: Long) = new java.sql.Timestamp(day + offsetSec * 1000)
    val points = (1 to 200).map(i => (i.toLong, t(rnd.nextInt(86400).toLong))).toDF("id", "ts")
    val intervals = (1 to 20).map { i =>
      val s = rnd.nextInt(86400).toLong
      (s"iv$i", t(s), t(s + rnd.nextInt(5 * 3600).toLong))
    }.toDF("name", "start", "end")
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (bin <- Seq(600L, 3600L, 7200L)) {
      val binned = graft.operators.RangeJoin
        .joinPointsToIntervals(points, col("ts"), intervals, binSeconds = bin)
        .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(binned === naive, s"bin=$bin")
    }
  }

  test("generated pipeline days preserve the aggregation invariant at any size") {
    for (orders <- Seq(10, 500)) {
      val gen = new DataGenerator(seed = orders)
      val raw = gen.rawOrders(java.time.LocalDate.of(2026, 2, 1), orders).toDF()
      val master = gen.masterFrames(spark)
      val agg = Queries.aggregateOrders(raw, master("products"), master("warehouses"))
      assert(agg.agg(sum("total_quantity")).first().getLong(0) ===
        raw.select(sum(col("quantity").cast("long"))).first().getLong(0))
      assert(agg.agg(sum("order_count")).first().getLong(0) === orders.toLong)
    }
  }

  test("max_multiplicity expression == groupBy count on arbitrary token lists (property)") {
    val lists = Gen.listOfN(150,
      Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "")).map(_.take(40))).sample.get
    val rows = lists.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "arr")
      .select(col("id"), graft.functions.MaxMultiplicity.maxMultiplicity(col("arr")).as("mm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lists.zipWithIndex.foreach { case (l, i) =>
      val expected = if (l.isEmpty) 0L
        else l.groupBy(identity).values.map(_.size).max.toLong
      assert(rows(i.toLong) === expected, s"list $l")
    }
  }

  test("sessionization conserves events and value at any gap (property)") {
    val base = java.time.Instant.parse("2024-06-01T00:00:00Z")
    val evs = Gen.listOfN(300, for {
      u <- Gen.choose(1L, 5L); off <- Gen.choose(0L, 86400L); v <- Gen.choose(0, 1000)
    } yield (u, java.sql.Timestamp.from(base.plusSeconds(off)), v / 100.0)).sample.get
    val df = evs.toDF("user_id", "ts", "value")
    for (gap <- Seq(1, 30, 720)) {
      val s = graft.streaming.EventStreams.sessionizeBatch(df, gapMinutes = gap)
      assert(s.agg(sum("n_events")).first().getLong(0) === evs.size.toLong)
      // value conserved in exact micros (floor-form re-quantization — a
      // bare double→long cast truncates x.9999 representation error)
      val gotMicros = s.agg(sum(
        graft.functions.StableRound.microsLong(col("session_value")))).first().getLong(0)
      val expMicros = evs.map(e => graft.functions.StableRound.microsOf(e._3)).sum
      assert(gotMicros === expMicros)
      // session boundaries respect the gap: within a user, consecutive
      // sessions are separated by MORE than the gap
      val perUser = s.select("user_id", "session_start", "session_end")
        .collect().groupBy(_.getLong(0))
      perUser.values.foreach { arr =>
        val sorted = arr.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            val gapSec = Math.floorDiv(b.getAs[java.sql.Timestamp]("session_start").getTime, 1000L) -
              Math.floorDiv(a.getAs[java.sql.Timestamp]("session_end").getTime, 1000L)
            assert(gapSec > gap * 60L)
          case _ =>
        }
      }
    }
  }

  test("repetition bounds: top counts within totals, types <= tokens (property over corpus)") {
    val r = graft.operators.TextAnalysis.repetition(
      graft.sources.Tables.documents(spark, sf))
    assert(r.filter(col("n_types") > col("n_tokens")).count() === 0)
    assert(r.filter(col("top_token_count") > col("n_tokens") ||
      (col("n_tokens") > 0) && col("top_token_count") < 1).count() === 0)
    assert(r.filter(col("top_2gram_count") > col("n_2grams") ||
      (col("n_2grams") > 0) && col("top_2gram_count") < 1).count() === 0)
    assert(r.filter(col("ttr") > 1.0 || col("rep_2gram_frac") > 1.0).count() === 0)
  }
}
