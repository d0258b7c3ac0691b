package graft

import graft.operators.SkewTools
import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions expose custom expressions to SQL") {
    // the extension hook applies cleanly to a fresh extensions container
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // for the already-running test session, the function-registry path is the
    // runtime equivalent of injectFunction:
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "doc_fingerprint", exprs => graft.functions.Fingerprint(exprs.head), "built-in")
    Tables.documents(s2, sf).createOrReplaceTempView("docs_ext")
    val viaSql = s2.sql("SELECT doc_id, doc_fingerprint(text) AS fp FROM docs_ext")
      .orderBy("doc_id").limit(5).collect().map(_.getLong(1))
    val viaColumn = graft.operators.TextAnalysis.fingerprints(Tables.documents(s2, sf))
      .limit(5).collect().map(_.getLong(1))
    assert(viaSql.toSeq === viaColumn.toSeq)
  }

  test("salted join equals plain join (with a synthetic hot key)") {
    val left = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = SkewTools.saltedJoin(left, right, "k", salts = 8)
      .select("k", "v", "name")
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("stateful sessionization equals the batch window-gap twin") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).as[EventStreams.SessionEvent]
    // session_value included: micros accumulation must equal the decimal sums
    val cols = Seq("user_id", "session_start", "session_end", "n_events", "session_value")
      .map(col)
    val stateful = EventStreams.sessionizeStateful(events, gapMinutes = 30)
      .select(cols: _*)
    val batch = EventStreams.sessionizeBatch(
      Tables.events(spark, sf), gapMinutes = 30)
      .select(cols: _*)
    assert(stateful.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stateful).count() === 0)
  }
}
