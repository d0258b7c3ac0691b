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

  test("store consumers leave no pinned stages behind (parquet side input, no lineage)") {
    val docs = Tables.documents(spark, sf)
    NearDupClusters.canonicalWith(docs, ClusterStore.readClusters(spark, store))
      .collect()
    assert(graft.operators.Pinned.release(spark) == 0,
      "consuming the persisted artifact must not pin pipeline stages")
  }
}
