package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (or a training-data
  * pipeline extension) expressed over the driver test corpus; `oracleSql`
  * holds the DuckDB-equivalent SQL the driver hash-compares against.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    AggregateOrders.fromDir(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg_orders" -> ((s, dir) => { GraftSession.tune(s); AggregateOrders.fromDir(s, dir) }),
    "q2_net_demand" -> ((s, dir) => { GraftSession.tune(s); NetDemand.fromDir(s, dir) }),
    "q3_supplier_orders" -> ((s, dir) => { GraftSession.tune(s); SupplierOrders.fromDir(s, dir) }),
    "s5_row_counts" -> ((s, dir) => { GraftSession.tune(s); MiscOps.rowCounts(s, dir) }),
    "s7_snapshot_scan" -> ((s, dir) => { GraftSession.tune(s); MiscOps.eventsOnDay(s, dir) }),
    "o20_summary" -> ((s, dir) => { GraftSession.tune(s); MiscOps.pipelineSummary(s, dir) }),
    // ---- training-data pipeline extensions ----
    "dedup_exact" -> ((s, dir) => { GraftSession.tune(s); Dedup.exactFromDir(s, dir) }),
    "dedup_ngram_jaccard" -> ((s, dir) => { GraftSession.tune(s); Dedup.ngramFromDir(s, dir) }),
    "dedup_minhash_lsh" -> ((s, dir) =>
      { GraftSession.tune(s); Dedup.minhashLsh(graft.sources.Tables.documents(s, dir)) }),
    "dedup_simhash" -> ((s, dir) =>
      { GraftSession.tune(s); Dedup.simhashNearDups(graft.sources.Tables.documents(s, dir)) }),
    "dedup_embedding_cosine" -> ((s, dir) => { GraftSession.tune(s); Dedup.embeddingFromDir(s, dir) }),
    "knn_cosine_topk" -> ((s, dir) => { GraftSession.tune(s); Similarity.knnFromDir(s, dir) }),
    "text_token_stats" -> ((s, dir) => { GraftSession.tune(s); TextAnalysis.tokenStatsFromDir(s, dir) }),
    "text_quality" -> ((s, dir) => { GraftSession.tune(s); TextAnalysis.qualityFromDir(s, dir) }),
    "text_langid" -> ((s, dir) => { GraftSession.tune(s); TextAnalysis.langIdFromDir(s, dir) }),
    "text_fingerprint" -> ((s, dir) => { GraftSession.tune(s); TextAnalysis.fingerprintsFromDir(s, dir) }),
    "multimodal_meta" -> ((s, dir) => { GraftSession.tune(s); Multimodal.metaFromDir(s, dir) }),
    "events_hourly" -> ((s, dir) =>
      { GraftSession.tune(s); graft.streaming.EventStreams.hourlyBatch(s, dir) }),
    "pricing_summary" -> ((s, dir) => { GraftSession.tune(s); PricingSummary.fromDir(s, dir) }),
    "corpus_clean" -> ((s, dir) => { GraftSession.tune(s); CorpusClean.fromDir(s, dir) })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg_orders" -> AggregateOrders.oracle,
    "q2_net_demand" -> NetDemand.oracle,
    "q3_supplier_orders" -> SupplierOrders.oracle,
    "s5_row_counts" -> MiscOps.s5Oracle,
    "s7_snapshot_scan" -> MiscOps.s7Oracle(),
    "o20_summary" -> MiscOps.o20Oracle,
    "dedup_exact" -> Dedup.exactOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle(),
    // dedup_minhash_lsh / dedup_simhash / text_fingerprint: hash-family
    // internals aren't SQL-expressible → rows-only check; semantics
    // verified in ScalaTest against exact-Jaccard / reference impls
    "dedup_embedding_cosine" -> Dedup.embeddingNearDupsOracle(),
    "knn_cosine_topk" -> Similarity.knnOracle(),
    "text_token_stats" -> TextAnalysis.tokenStatsOracle,
    "text_quality" -> TextAnalysis.qualityOracle,
    "multimodal_meta" -> Multimodal.payloadMetaOracle,
    "events_hourly" -> graft.streaming.EventStreams.hourlyOracle,
    "text_langid" -> TextAnalysis.langIdOracle,
    "pricing_summary" -> PricingSummary.oracle,
    "corpus_clean" -> CorpusClean.oracle()
  )
}
