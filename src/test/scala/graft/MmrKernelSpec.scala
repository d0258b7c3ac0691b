package graft

import graft.operators.{Mmr, Pinned}
import org.apache.spark.sql.functions._

/** The r20 MMR kernel ([[graft.functions.MmrGreedy]]) must reproduce the
  * r15 unrolled-DataFrame-stage selection EXACTLY — same picks, same
  * rel/maxsim values, same tie-breaks — on data wide enough to exercise
  * ties, near-duplicate crowding, sparse sims, and the empty-step tail. */
class MmrKernelSpec extends SparkSpec {
  import spark.implicits._

  private def assertSameSelection(cands: org.apache.spark.sql.DataFrame,
                                  sims: org.apache.spark.sql.DataFrame,
                                  k: Int): Unit = {
    val kernel = Mmr.mmrSelect(cands, sims, k).collect().map(_.toSeq).toSeq
    Pinned.release(spark)
    val unrolled = Mmr.mmrSelectUnrolled(cands, sims, k).collect().map(_.toSeq).toSeq
    Pinned.release(spark)
    assert(kernel === unrolled)
  }

  test("kernel selection == unrolled selection on the sf0.001 gate data") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val cands = Pinned.pin(broadcast(q).crossJoin(n)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rel_micros", graft.functions.StableRound.microsLong(
        graft.operators.Similarity.cosine(col("qe"), col("ne"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("rel_micros").desc, col("neighbor_id").asc)))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rel_micros"), col("ne")))
    val sims = cands.select(col("query_id"), col("neighbor_id").as("id1"), col("ne").as("e1"))
      .join(cands.select(col("query_id"), col("neighbor_id").as("id2"), col("ne").as("e2")),
        Seq("query_id"))
      .filter(col("id1") =!= col("id2"))
      .select(col("query_id"), col("id1"), col("id2"),
        graft.functions.StableRound.microsLong(
          graft.operators.Similarity.cosine(col("e1"), col("e2"))).as("sim_micros"))
    assertSameSelection(
      cands.select(col("query_id"), col("neighbor_id"), col("rel_micros")), sims, k = 4)
  }

  test("kernel handles ties, sparse sims and the empty-step tail like the unrolled form") {
    // query 7: scored ties (equal rel, equal sim) must break to the
    // smaller id at every step; query 9: NO sims at all — only the first
    // pick is possible (the unrolled INNER join emits nothing afterward)
    val cands = Seq(
      (7L, 1L, 100L), (7L, 2L, 100L), (7L, 3L, 100L), (7L, 4L, 50L),
      (9L, 11L, 5L), (9L, 12L, 9L)
    ).toDF("query_id", "neighbor_id", "rel_micros")
    val sims = Seq(
      // all pairs equal sim for query 7 → pure id tie-breaks
      (7L, 1L, 2L, 30L), (7L, 2L, 1L, 30L), (7L, 1L, 3L, 30L), (7L, 3L, 1L, 30L),
      (7L, 2L, 3L, 30L), (7L, 3L, 2L, 30L), (7L, 4L, 1L, 30L), (7L, 4L, 2L, 30L),
      (7L, 4L, 3L, 30L), (7L, 1L, 4L, 30L), (7L, 2L, 4L, 30L), (7L, 3L, 4L, 30L)
    ).toDF("query_id", "id1", "id2", "sim_micros")
    assertSameSelection(cands, sims, k = 5)
    // negative sims (anti-similar candidates boost, not penalize)
    val negSims = Seq(
      (7L, 1L, 2L, -40L), (7L, 2L, 1L, -40L), (7L, 3L, 1L, 25L), (7L, 3L, 2L, 25L),
      (7L, 1L, 3L, 25L), (7L, 2L, 3L, 25L), (7L, 4L, 1L, -10L), (7L, 4L, 2L, -10L),
      (7L, 4L, 3L, -10L), (7L, 1L, 4L, -10L), (7L, 2L, 4L, -10L), (7L, 3L, 4L, -10L)
    ).toDF("query_id", "id1", "id2", "sim_micros")
    assertSameSelection(cands, negSims, k = 4)
  }
}
