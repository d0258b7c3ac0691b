package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf).cache()
  lazy val queries = emb.filter(col("vec_id") < 8)

  test("brute-force knn matches a driver-side recomputation for one query") {
    val knn = Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") === 0), k = 5)
      .collect()
    val all = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val q = all(0L)
    val expected = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(knn.map(_.getAs[Long]("neighbor_id")).toSeq === expected)
  }

  test("knn returns exactly k ranked neighbors per query, never self") {
    val knn = Similarity.bruteForceKnn(emb, queries, k = 10).cache()
    val counts = knn.groupBy("query_id").count().collect()
    assert(counts.length === 8 && counts.forall(_.getLong(1) === 10))
    assert(knn.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(knn.filter(col("rank") < 1 || col("rank") > 10).count() === 0)
  }

  test("LSH-bucketed ANN: candidates only, with reasonable recall@10") {
    val brute = Similarity.bruteForceKnn(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
    val ann = Similarity.lshKnn(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
    val hit = brute.intersect(ann).count()
    val total = brute.count()
    val recall = hit.toDouble / total
    info(s"LSH ANN recall@10 = $recall ($hit/$total)")
    assert(recall >= 0.2, s"recall $recall too low") // random-hyperplane LSH floor
  }

  test("LSH ANN similarities are exact for returned pairs (verified re-score)") {
    val ann = Similarity.lshKnn(emb, queries, k = 10)
    val joined = ann
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), Seq("query_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), Seq("neighbor_id"))
      .withColumn("check", round(Similarity.cosine(col("qe"), col("ne")), 8))
    assert(joined.filter(col("check") =!= col("cosine_r")).count() === 0)
  }
}
