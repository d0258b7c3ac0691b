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
