package graft

import graft.operators.{Curation, ScalableCumsum, Pinned}
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  lazy val docs = graft.sources.Tables.documents(spark, sf).cache()

  test("scalable cumsum equals the single-partition window cumsum") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("k", "v")
    val naive = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = ScalableCumsum.withRunningTotal(df, col("v"), "cum", col("k"))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Pinned.release(spark)
    assert(dist === naive)
  }

  test("shards: cumulative tokens are a prefix sum; shard ids are monotone budget bins") {
    val shards = Curation.shardByTokenBudget(docs, capacity = 5000L).collect()
    Pinned.release(spark)
    var cum = 0L
    for (r <- shards) {
      val n = r.getAs[Long]("n_tokens"); cum += n
      assert(r.getAs[Long]("cum_tokens") === cum, s"prefix sum broke at ${r.get(0)}")
      assert(r.getAs[Long]("shard_id") === (cum - n) / 5000L)
    }
    // shard ids never decrease in doc order and start at 0
    assert(shards.head.getAs[Long]("shard_id") === 0L)
    assert(shards.sliding(2).forall(p =>
      p.head.getAs[Long]("shard_id") <= p.last.getAs[Long]("shard_id")))
  }

  test("source quota: at most k per source, stable across runs, WindowGroupLimit planned") {
    val q = Curation.sourceQuota(docs, k = 7)
    val got = q.collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 7))
    assert(bySource.values.forall(g =>
      g.map(_.getAs[Long]("qrank")).sorted.sameElements(1L to g.length)))
    // deterministic: a second run picks the identical sample
    assert(Curation.sourceQuota(docs, k = 7).collect().map(_.toSeq).toSeq
      === got.map(_.toSeq).toSeq)
    // the rank<=k filter pushes below the window exchange as a partial top-k
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("packed shards: totals reconcile with shard assignment; packing is deterministic") {
    val packed = Curation.packShards(docs, capacity = 5000L).collect()
    Pinned.release(spark)
    val shards = Curation.shardByTokenBudget(docs, capacity = 5000L).collect()
    Pinned.release(spark)
    val byShard = shards.groupBy(_.getAs[Long]("shard_id"))
    assert(packed.length === byShard.size)
    for (p <- packed) {
      val members = byShard(p.getAs[Long]("shard_id"))
      assert(p.getAs[Long]("n_docs") === members.length)
      assert(p.getAs[Long]("shard_tokens") === members.map(_.getAs[Long]("n_tokens")).sum)
    }
    // shuffle arrival order must not change the packed hash
    val again = Curation.packShards(docs, capacity = 5000L).collect()
    Pinned.release(spark)
    assert(again.map(_.toSeq).toSeq === packed.map(_.toSeq).toSeq)
  }

  test("mixture sample: content-hash Bernoulli is deterministic and weight-ordered") {
    val s1 = Curation.mixtureSampleFromDir(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    val s2 = Curation.mixtureSampleFromDir(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    assert(s1.sameElements(s2), "same content, same verdicts")
    assert(s1.nonEmpty && s1.length < docs.count())
    // higher-weight sources keep (statistically) more: check the extreme
    // weights 15% vs 75% aggregated over their source groups
    val kept = Curation.mixtureSampleFromDir(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    def bucket(w: Int) = (0 until 20).filter(_ % 5 == w).map(i => s"src$i")
    val low = bucket(0).map(kept.getOrElse(_, 0L)).sum   // 15% sources
    val high = bucket(4).map(kept.getOrElse(_, 0L)).sum  // 75% sources
    assert(low < high, s"15%-weight kept $low, 75%-weight kept $high")
  }

  test("near-dup clusters: min-label components over a known graph") {
    import spark.implicits._
    // two components {1,2,3} (path) and {10,11}, singleton edges absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val cc = graft.operators.NearDupClusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Pinned.release(spark)
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("near-dup clusters: every corpus pair lands in one cluster; ids are component minima") {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs).cache()
    val cc = graft.operators.NearDupClusters.connectedComponents(pairs).cache()
    Pinned.release(spark)
    // both endpoints of every pair share a cluster
    val joined = pairs
      .join(cc.withColumnRenamed("doc_id", "id1").withColumnRenamed("cluster_id", "c1"), Seq("id1"))
      .join(cc.withColumnRenamed("doc_id", "id2").withColumnRenamed("cluster_id", "c2"), Seq("id2"))
    assert(joined.filter(col("c1") =!= col("c2")).count() === 0)
    // cluster id is a member of its own cluster and its minimum
    val mins = cc.groupBy("cluster_id").agg(min("doc_id").as("m"))
    assert(mins.filter(col("cluster_id") =!= col("m")).count() === 0)
    pairs.unpersist(); cc.unpersist()
  }

  test("decontaminate: survivors share no n-gram with eval; dropped docs all do") {
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val clean = Curation.decontaminate(train, eval, n = 8).cache()
    val evalSh = eval.select(
      explode(TextFunctions.wordShingles(col("text"), 8)).as("shingle")).distinct()
    def overlapping(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), explode(TextFunctions.wordShingles(col("text"), 8)).as("shingle"))
      .join(evalSh, Seq("shingle")).select("doc_id").distinct()
    // no survivor overlaps eval
    assert(clean.join(overlapping(train.join(clean, Seq("doc_id"), "left_semi")),
      Seq("doc_id")).count() === 0)
    // every dropped doc overlaps eval (nothing was dropped spuriously)
    val dropped = train.select("doc_id").exceptAll(clean.select("doc_id"))
    assert(dropped.exceptAll(overlapping(train).select("doc_id")).count() === 0)
    // near-dup corpus: the planted duplicates that straddle the eval split
    // must actually produce contamination, or the test proves nothing
    assert(dropped.count() > 0, "expected at least one contaminated train doc")
    clean.unpersist()
  }
}
