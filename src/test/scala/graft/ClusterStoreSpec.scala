package graft

import graft.operators.{ClusterStore, CorpusSplit, Dedup, NearDupClusters, SourceMatrix}
import graft.sources.Tables

/** The persisted pair-graph/cluster artifact: build once, consume
  * everywhere — every store-consuming variant must equal its from-scratch
  * sibling row-for-row. */
class ClusterStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_store_spec")
    ClusterStore.write(Tables.documents(spark, sf), p.toString)
    p.toString
  }

  test("store round-trips config and holds the exact pair graph and cluster map") {
    val cfg = ClusterStore.readMeta(store)
    assert(cfg == ClusterStore.Config(5, 0.5))
    val docs = Tables.documents(spark, sf)
    assert(rows(ClusterStore.readPairs(spark, store)) ==
      rows(Dedup.ngramJaccardPairs(docs)))
    Dedup.releasePinned(spark)
    assert(rows(ClusterStore.readClusters(spark, store)) ==
      rows(NearDupClusters.connectedComponents(Dedup.ngramJaccardPairs(docs))))
    Dedup.releasePinned(spark)
  }

  test("canonical selection from the store equals from-scratch") {
    val docs = Tables.documents(spark, sf)
    val indexed = rows(NearDupClusters.canonicalWith(
      docs, ClusterStore.readClusters(spark, store)))
    val scratch = rows(NearDupClusters.canonical(docs))
    Dedup.releasePinned(spark)
    assert(indexed == scratch)
  }

  test("corpus split from the store equals from-scratch") {
    val docs = Tables.documents(spark, sf)
    val indexed = rows(CorpusSplit.splitWith(
      docs, ClusterStore.readClusters(spark, store)))
    val scratch = rows(CorpusSplit.split(docs))
    Dedup.releasePinned(spark)
    assert(indexed == scratch)
  }

  test("source matrix from the store equals from-scratch") {
    val docs = Tables.documents(spark, sf)
    val indexed = rows(SourceMatrix.matrixWith(
      docs, ClusterStore.readPairs(spark, store)))
    val scratch = rows(SourceMatrix.matrix(docs))
    Dedup.releasePinned(spark)
    assert(indexed == scratch)
  }

  test("incremental append equals from-scratch on the full corpus (DeltaMod split)") {
    val incremental = rows(ClusterStore.appendFromDir(spark, sf))
    val scratch = rows(NearDupClusters.fromDir(spark, sf))
    Dedup.releasePinned(spark)
    assert(incremental == scratch)
  }

  test("append merges clusters when a delta doc BRIDGES two existing components") {
    import spark.implicits._
    val t1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val t2 = (1 to 40).map(i => s"z$i").mkString(" ")
    // backlog: two independent near-dup clusters {1,2} and {3,4}
    val backlog = Seq(
      (1L, t1), (2L, t1.replace("w20", "q")),
      (3L, t2), (4L, t2.replace("z20", "q"))
    ).toDF("doc_id", "text")
    // bridge doc: T1 ++ T2 — Jaccard vs T1 = 36/76 ≈ 0.474, same vs T2,
    // ≥ the store's 0.45 threshold, so it pairs with BOTH clusters
    val delta = Seq((5L, s"$t1 $t2")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft_bridge_spec")
    ClusterStore.write(backlog, p.toString, ClusterStore.Config(5, 0.45))
    val before = ClusterStore.readClusters(spark, p.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    ClusterStore.append(spark, p.toString, backlog, delta)
    val after = ClusterStore.readClusters(spark, p.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one merged component labeled by the global min id — per-cluster
    // patching cannot produce this; only CC over the merged graph can
    assert(after == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // and it matches a from-scratch build over the union
    val scratch = java.nio.file.Files.createTempDirectory("graft_bridge_scratch")
    ClusterStore.write(backlog.unionAll(delta), scratch.toString,
      ClusterStore.Config(5, 0.45))
    assert(rows(ClusterStore.readClusters(spark, p.toString)) ==
      rows(ClusterStore.readClusters(spark, scratch.toString)))
    Dedup.releasePinned(spark)
  }

  test("store consumers leave no pinned stages behind (parquet side input, no lineage)") {
    val docs = Tables.documents(spark, sf)
    NearDupClusters.canonicalWith(docs, ClusterStore.readClusters(spark, store))
      .collect()
    assert(graft.operators.Pinned.release(spark) == 0,
      "consuming the persisted artifact must not pin pipeline stages")
  }
}
