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
  private val phoneRe = "\\+[0-9][0-9 -]{7,14}[0-9]".r
  private val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r

  test("redact: replaced spans, preserved prose, zero residual matches") {
    val docs = Seq(
      (1L, "write to a.b+c@ex-2.co.uk or see https://x.io/p?q=1 soon"),
      (2L, "no pii here at all"),
      (3L, "http://plain.org/a b@c.de trailing"),
      (4L, "email inside url http://h.com/x@y.com/z stays one URL or splits deterministically"),
      (5L, "dial +212 555-0199 or ping 192.168.0.1 tonight"),
      (6L, "ip-host url https://10.1.2.3/x is ONE tag, not a URL around an IP")
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
    assert(byId(5L).getAs[String]("redacted_text") ===
      "dial <PHONE> or ping <IP> tonight")
    assert(byId(5L).getAs[Long]("n_phones") === 1L)
    assert(byId(5L).getAs[Long]("n_ipv4") === 1L)
    // URL redacts BEFORE IP: an IP-hosted URL collapses to one <URL> tag
    assert(byId(6L).getAs[String]("redacted_text") ===
      "ip-host url <URL> is ONE tag, not a URL around an IP")
    // property: no pattern survives redaction, on every doc
    got.foreach { r =>
      val t = r.getAs[String]("redacted_text")
      assert(emailRe.findFirstIn(t).isEmpty, s"email survived in: $t")
      assert(urlRe.findFirstIn(t).isEmpty, s"url survived in: $t")
      assert(phoneRe.findFirstIn(t).isEmpty, s"phone survived in: $t")
      assert(ipRe.findFirstIn(t).isEmpty, s"ip survived in: $t")
      assert(r.getAs[Long]("redacted_chars") === t.length.toLong)
    }
  }

  test("redactFromDir gate: planted PII is exercised and fully scrubbed") {
    val out = TextAnalysis.redactFromDir(spark, sf).collect()
    // the gate plants emails on doc_id%3==0 and URLs on doc_id%4==0 — a
    // pass-through redactor cannot hash-match, and the property holds
    assert(out.map(_.getAs[Long]("n_emails")).sum > 0)
    assert(out.map(_.getAs[Long]("n_urls")).sum > 0)
    assert(out.map(_.getAs[Long]("n_phones")).sum > 0)
    assert(out.map(_.getAs[Long]("n_ipv4")).sum > 0)
    out.foreach { r =>
      val t = r.getAs[String]("redacted_text")
      assert(emailRe.findFirstIn(t).isEmpty && urlRe.findFirstIn(t).isEmpty)
      assert(phoneRe.findFirstIn(t).isEmpty && ipRe.findFirstIn(t).isEmpty)
      val id = r.getAs[Long]("doc_id")
      assert((id % 3 === 0) === t.contains("<EMAIL>"))
      assert((id % 4 === 0) === t.contains("<URL>"))
      assert((id % 5 === 0) === t.contains("<PHONE>"))
      assert((id % 7 === 0) === t.contains("<IP>"))
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
