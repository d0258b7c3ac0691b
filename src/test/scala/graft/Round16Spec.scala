package graft

import org.apache.spark.sql.functions._

/** Round-16 additions: the IndexIngest sink-side batch ledger (the r15
  * ADVICE medium — foreachBatch replays must not double-append). */
class Round16Spec extends SparkSpec {

  test("guardedAppend: a replayed batchId is skipped; new batchIds append") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ingest_ledger")
    try {
      var calls = 0
      var rows = 0L
      val guarded = graft.streaming.IndexIngest.guardedAppend(
        stateDir.toString, b => { calls += 1; rows += b.count() })
      val batch = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f)))
        .toDF("vec_id", "embedding")
      guarded(batch, 0L)
      assert(calls === 1 && rows === 2)
      // restart replay of the SAME uncommitted-at-source batchId: the
      // ledger marker must swallow it — a second append would land
      // duplicate vec_ids in cells (duplicate neighbors in every probe)
      guarded(batch, 0L)
      assert(calls === 1 && rows === 2, "replayed batchId must be skipped")
      // the next batchId is new work and must go through
      guarded(batch, 1L)
      assert(calls === 2 && rows === 4)
      // markers are per-batch files under <stateDir>/commits
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")))
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-1")))
    } finally {
      java.nio.file.Files.walk(stateDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("guardedAppend: a failed append leaves no marker, so the retry lands") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ingest_ledger2")
    try {
      var calls = 0
      var fail = true
      val guarded = graft.streaming.IndexIngest.guardedAppend(
        stateDir.toString,
        _ => { calls += 1; if (fail) sys.error("transient store failure") })
      val batch = Seq((1L, Seq(0.1f))).toDF("vec_id", "embedding")
      intercept[RuntimeException] { guarded(batch, 0L) }
      assert(!java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")),
        "a marker for a FAILED append would permanently drop the batch")
      fail = false
      guarded(batch, 0L) // the streaming engine's retry of the same batch
      assert(calls === 2)
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")))
    } finally {
      java.nio.file.Files.walk(stateDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
