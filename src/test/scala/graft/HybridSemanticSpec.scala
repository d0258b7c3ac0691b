package graft

import graft.operators.{HybridRetrieval, SemanticDedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-12 retrieval/dedup extensions: reciprocal-rank fusion and
  * SemDeDup-style within-cell pruning. */
class HybridSemanticSpec extends SparkSpec {
  import spark.implicits._

  test("RRF fusion: contributions are micros-exact and both lists merge") {
    // doc 0 is the query (vec_id/doc_id aligned). Lexically doc 1 shares
    // both its terms, doc 2 one; in vector space doc 2 is nearest.
    val docs = Seq(
      (0L, "alpha beta"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val out = HybridRetrieval.hybridTopK(docs, emb, numQueries = 1,
      kList = 3, k = 4).collect()
    // lexical ranks: doc1 (alpha+beta) 1, doc2 (alpha) 2; doc3 never scored
    // vector ranks: doc2 (cos≈0.995) 1, doc3 (≈0.70) 2, doc1 (0.0) 3
    def c(r: Int) = math.floor(1e6 / (60 + r) + 0.5).toLong
    val got = out.map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(got(2L) == c(2) + c(1)) // lexical 2nd + vector 1st
    assert(got(1L) == c(1) + c(3)) // lexical 1st + vector 3rd
    assert(got(3L) == c(2))        // vector-only
    // fused order: doc2 > doc1 > doc3
    assert(out.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq == Seq(2L, 1L, 3L))
  }

  test("RRF kernel fuse ≡ the unrolled groupBy+window form, gate data and corners") {
    // the r20 optimization runs the per-doc sum + rank cut inside one
    // kernel call per query; this pins it against the unrolled form on
    // real gate lists AND on hand-built corners (doc in both lists,
    // rrf ties → doc_id asc, fewer docs than k)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val docs = graft.sources.Tables.documents(spark, sf)
    val e = graft.sources.Tables.embeddings(spark, sf)
    val lex = HybridRetrieval.lexList(docs, 8, 20, 1.2, 0.75)
    val vec = Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 8), 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vrank"))
    assert(rows(HybridRetrieval.fuse(lex, vec, 10, 60)) ===
      rows(HybridRetrieval.fuseUnrolled(lex, vec, 10, 60)))
    graft.operators.Pinned.release(spark)

    // corners: docs 1,2 in both lists; lex(3) and vec(4) get the SAME
    // contribution (rank 3 in one list each) → tie breaks doc_id asc;
    // query 1 has fewer docs than k
    val lexC = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), (1L, 9L, 1L))
      .toDF("query_id", "doc_id", "lrank")
    val vecC = Seq((0L, 2L, 1L), (0L, 1L, 2L), (0L, 4L, 3L), (1L, 9L, 1L))
      .toDF("query_id", "doc_id", "vrank")
    for (k <- Seq(2, 10)) {
      assert(rows(HybridRetrieval.fuse(lexC, vecC, k, 60)) ===
        rows(HybridRetrieval.fuseUnrolled(lexC, vecC, k, 60)), s"k=$k")
      graft.operators.Pinned.release(spark)
    }
  }

  test("hybrid_rrf matches its own oracle's shape on sf0.001") {
    val out = HybridRetrieval.fromDir(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // 8 queries, ≤10 each, ranks contiguous from 1 per query
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    graft.operators.Dedup.releasePinned(spark)
  }

  test("IVF-fused hybrid == brute-fused hybrid at full probe coverage") {
    // nProbe = numCentroids probes every cell, so the IVF candidate set is
    // the whole corpus and fusion must agree with the brute twin exactly —
    // the property that makes the vector list swappable without touching
    // the lexical list or the fusion
    val brute = HybridRetrieval.fromDir(spark, sf).collect().map(_.toSeq).toSeq
    val ivf = HybridRetrieval.hybridTopKIvf(spark, sf,
      numCentroids = 16, nProbe = 16).collect().map(_.toSeq).toSeq
    assert(ivf == brute)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("persisted-index hybrid == in-memory IVF hybrid (save->reload->probe->fuse)") {
    val mem = HybridRetrieval.hybridTopKIvf(spark, sf).collect().map(_.toSeq).toSeq
    val idx = HybridRetrieval.fromDirIndexed(spark, sf).collect().map(_.toSeq).toSeq
    assert(idx == mem)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("hard negatives: lexically-ranked docs below the cosine bar, and only those") {
    // doc 1 shares terms AND points the same way (easy positive — excluded);
    // doc 2 shares a term but is orthogonal (the hard negative);
    // doc 3 shares nothing (never lexically ranked, excluded even though far)
    val docs = Seq(
      (0L, "alpha beta"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.97f, 0.24f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val out = HybridRetrieval.hardNegatives(docs, emb, numQueries = 1,
      kList = 3, tau = 0.5).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L),
      s"only the lexically-ranked orthogonal doc mines, got ${out.toSeq}")
    assert(out.head.getDouble(3) < 0.5)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("semantic dedup at an unreachable tau prunes nothing") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val kept = graft.operators.SemanticDedup.prune(e, numCentroids = 16,
      tau = 1.1).count()
    assert(kept == e.count())
    graft.operators.Dedup.releasePinned(spark)
  }

  test("corpus diff: every status classifies correctly, bodies never compared") {
    val oldDay = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newDay = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = graft.operators.CorpusDiff.diff(oldDay, newDay)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val sum = graft.operators.CorpusDiff.summary(oldDay, newDay)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("added" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "unchanged" -> 1L))
  }

  test("quality classifier learns a separable corpus to 100% accuracy") {
    // positives (lang=en) carry planted tokens the negatives never use;
    // full-batch GD in integer micros must find the boundary
    val docs = (0 until 16).map { i =>
      val pos = i % 2 == 0
      (i.toLong,
        if (pos) s"alpha beta common filler token$i" else s"gamma delta common filler token$i",
        if (pos) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val out = graft.operators.QualityClassifier.trainAndScore(docs).collect()
    assert(out.length == 16)
    assert(out.forall(r => r.getLong(3) == r.getLong(1)),
      s"every pred must equal its label, got ${out.map(r => (r.getLong(1), r.getLong(3))).toSeq}")
    // probabilities actually separate (not a degenerate all-0.5 fit)
    val pPos = out.filter(_.getLong(1) == 1L).map(_.getLong(2))
    val pNeg = out.filter(_.getLong(1) == 0L).map(_.getLong(2))
    assert(pPos.min > pNeg.max)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("semantic dedup: identical vectors in one cell collapse, singletons survive") {
    // 8-dim (the quantizer's oracle dim isn't required off-gate, any dim
    // works for the operator itself)
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(d => (math.sin(seed * 37.0 + d) * 0.5).toFloat)
    val emb = Seq(
      (0L, v(1)), (1L, v(1)),             // exact dups — same cell, cos=1
      (2L, v(2)), (3L, v(3)))             // distinct directions
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val kept = SemanticDedup.prune(emb, numCentroids = 4, tau = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L),
      s"dominated twin must prune (kept=$kept)")
    assert(kept.contains(2L) && kept.contains(3L))
    graft.operators.Dedup.releasePinned(spark)
  }

  test("semantic dedup is cell-bounded: cross-cell near-dups are NOT pruned") {
    // two near-identical vectors forced into different cells would need a
    // cross-cell compare to prune; the operator's contract (SemDeDup) is
    // within-cell only. Verify via the assignment itself.
    val e = graft.sources.Tables.embeddings(spark, sf)
    val dim = Similarity.embeddingDim(e)
    val cents = Similarity.hashCentroids(dim, 16)
    val assigned = Similarity.assignToCentroids(e, cents)
      .select(col("vec_id"), col("centroid_id"))
    val kept = SemanticDedup.prune(e, numCentroids = 16, tau = 0.4)
    // every kept vec keeps its assignment's cell id
    val mismatch = kept.join(assigned, Seq("vec_id"))
      .filter(kept("centroid_id") =!= assigned("centroid_id")).count()
    assert(mismatch == 0)
    graft.operators.Dedup.releasePinned(spark)
  }
}
