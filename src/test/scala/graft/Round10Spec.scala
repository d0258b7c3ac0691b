package graft

import graft.operators.{ClusterStore, CorpusSplit, Dedup, NearDupClusters, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-10 additions: the persisted IVF index lifecycle gates, the
  * composed ClusterStore append→split loop, and the append-path guards
  * (corpus stamp, self-pair filter, stored cardinalities). */
class Round10Spec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // ---------------------------------------------- persisted IVF lifecycle

  test("ivf_probe_indexed: persisted-index probe equals the in-memory gated IVF pipeline") {
    val fromIndex = rows(Similarity.ivfProbeIndexedFromDir(spark, sf))
    val inMemory = rows(Similarity.ivfAnnFromDir(spark, sf))
    assert(fromIndex == inMemory)
  }

  test("ivf_index_append: append + probe equals a same-quantizer full-corpus probe") {
    val appended = rows(Similarity.ivfAppendProbeFromDir(spark, sf))
    val inMemory = rows(Similarity.ivfAnnFromDir(spark, sf))
    assert(appended == inMemory)
  }

  // ---------------------------------------------- composed append → split

  test("corpus_split_append: split from the appended store equals from-scratch split") {
    val composed = rows(ClusterStore.splitAppendFromDir(spark, sf))
    val scratch = rows(CorpusSplit.fromDir(spark, sf))
    Dedup.releasePinned(spark)
    assert(composed == scratch)
  }

  // ---------------------------------------------- append-path guards

  test("append rejects an oldDocs frame that drifted from the build corpus") {
    import spark.implicits._
    val t1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val backlog = Seq((1L, t1), (2L, t1.replace("w20", "q")))
      .toDF("doc_id", "text")
    val delta = Seq((9L, t1.replace("w21", "x"))).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft_stamp_spec")
    ClusterStore.write(backlog, p.toString, ClusterStore.Config(5, 0.45))
    // dropping a doc (count drifts) and renumbering (max drifts) both abort
    val dropped = intercept[IllegalArgumentException] {
      ClusterStore.append(spark, p.toString, backlog.filter($"doc_id" === 1L), delta)
    }
    assert(dropped.getMessage.contains("drifted backlog"))
    val renumbered = intercept[IllegalArgumentException] {
      ClusterStore.append(spark, p.toString,
        backlog.withColumn("doc_id", $"doc_id" + 100L), delta)
    }
    assert(renumbered.getMessage.contains("drifted backlog"))
    // the matching frame still appends fine
    ClusterStore.append(spark, p.toString, backlog, delta)
    Dedup.releasePinned(spark)
    assert(ClusterStore.readClusters(spark, p.toString).count() == 3)
    // and the stamp advanced to cover the delta, so a SECOND append
    // validates against the updated corpus
    assert(ClusterStore.readCorpusStamp(p.toString) == ((3L, 9L)))
  }

  test("append never fabricates self-pairs when old and new share a doc_id") {
    import spark.implicits._
    val t1 = (1 to 40).map(i => s"s$i").mkString(" ")
    val backlog = Seq((1L, t1), (2L, t1.replace("s20", "q")))
      .toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft_selfpair_spec")
    ClusterStore.write(backlog, p.toString, ClusterStore.Config(5, 0.45))
    // a re-delivered doc 2 (same id, same text) — without the oid =!= nid
    // guard the cross join would store (2, 2, jaccard 1.0)
    ClusterStore.append(spark, p.toString, backlog,
      Seq((2L, t1.replace("s20", "q"))).toDF("doc_id", "text"))
    Dedup.releasePinned(spark)
    val pairs = ClusterStore.readPairs(spark, p.toString)
    assert(pairs.filter($"id1" === $"id2").count() == 0)
  }

  test("store cards table holds the exact per-doc shingle cardinalities") {
    val docs = Tables.documents(spark, sf)
    val cfg = ClusterStore.Config()
    val p = java.nio.file.Files.createTempDirectory("graft_cards_spec")
    ClusterStore.write(docs, p.toString, cfg)
    Dedup.releasePinned(spark)
    val stored = rows(ClusterStore.readCards(spark, p.toString))
    val scratch = rows(Dedup.shingleArrays(docs, cfg.n)
      .select(col("doc_id"), size(col("sharr")).cast("long").as("n_shingles")))
    assert(stored == scratch)
  }

  test("bad split percentages fail fast — before any corpus-scale cluster work") {
    val docs = Tables.documents(spark, sf)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    intercept[IllegalArgumentException] {
      CorpusSplit.split(docs, trainPct = 80, valPct = 30)
    }
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore,
      "invalid percentages must not run the pair-graph/CC jobs")
  }
}
