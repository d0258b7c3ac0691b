package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-7 behaviors: PII redaction, retry-log collision safety, and the
  * round's advice fixes. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- redaction

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
  private val urlRe = "https?://[^ ]+".r

  test("redact: replaced spans, preserved prose, zero residual matches") {
    val docs = Seq(
      (1L, "write to a.b+c@ex-2.co.uk or see https://x.io/p?q=1 soon"),
      (2L, "no pii here at all"),
      (3L, "http://plain.org/a b@c.de trailing"),
      (4L, "email inside url http://h.com/x@y.com/z stays one URL or splits deterministically")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redact(docs).collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("redacted_text") ===
      "write to <EMAIL> or see <URL> soon")
    assert(byId(1L).getAs[Long]("n_emails") === 1L)
    assert(byId(1L).getAs[Long]("n_urls") === 1L)
    assert(byId(2L).getAs[String]("redacted_text") === "no pii here at all")
    assert(byId(2L).getAs[Long]("n_emails") === 0L)
    // emails redact FIRST, then URLs — doc 3 has one of each
    assert(byId(3L).getAs[String]("redacted_text") === "<URL> <EMAIL> trailing")
    // property: no pattern survives redaction, on every doc
    got.foreach { r =>
      val t = r.getAs[String]("redacted_text")
      assert(emailRe.findFirstIn(t).isEmpty, s"email survived in: $t")
      assert(urlRe.findFirstIn(t).isEmpty, s"url survived in: $t")
      assert(r.getAs[Long]("redacted_chars") === t.length.toLong)
    }
  }

  test("redactFromDir gate: planted PII is exercised and fully scrubbed") {
    val out = TextAnalysis.redactFromDir(spark, sf).collect()
    // the gate plants emails on doc_id%3==0 and URLs on doc_id%4==0 — a
    // pass-through redactor cannot hash-match, and the property holds
    assert(out.map(_.getAs[Long]("n_emails")).sum > 0)
    assert(out.map(_.getAs[Long]("n_urls")).sum > 0)
    out.foreach { r =>
      val t = r.getAs[String]("redacted_text")
      assert(emailRe.findFirstIn(t).isEmpty && urlRe.findFirstIn(t).isEmpty)
      val id = r.getAs[Long]("doc_id")
      assert((id % 3 === 0) === t.contains("<EMAIL>"))
      assert((id % 4 === 0) === t.contains("<URL>"))
    }
  }

  // ------------------------------------------- task-log collision safety

  test("same-millisecond attempt records never clobber: all three exception " +
    "files survive a zero-delay retry burst") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry_ms").toString
    intercept[RuntimeException] {
      graft.procurement.TaskLog.timedWithRetry[Unit](
        dir, "burst", "01-02-2026", retries = 2, retryDelayMs = 1L,
        sleep = _ => ()) { sys.error("boom") }
    }
    // three attempts in (likely) the same millisecond -> three files, with
    // sequence suffixes where the timestamp collides
    assert(new java.io.File(s"$dir/exceptions/01-02-2026").listFiles().length === 3)
  }

  test("fatal errors are not retried") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry_fatal").toString
    var calls = 0
    intercept[OutOfMemoryError] {
      graft.procurement.TaskLog.timedWithRetry[Unit](
        dir, "fatal", "01-02-2026", retries = 2, retryDelayMs = 1L,
        sleep = _ => ()) { calls += 1; throw new OutOfMemoryError("simulated") }
    }
    assert(calls === 1, "an OOM must propagate immediately, not re-run")
  }
}
