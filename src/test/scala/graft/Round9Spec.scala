package graft

import graft.functions.Fingerprint
import graft.operators.CorpusSplit
import org.apache.spark.sql.functions.col

/** Round-9 behaviors: leakage-safe corpus splitting — near-dup clusters
  * are the split unit, assignment is content-addressed, and the split is
  * stable under doc_id renumbering. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // Two near-dups (one word differs out of ~40 → Jaccard >> 0.5), one
  // unrelated doc, one short doc below the shingle length (no shingles →
  // never clustered). Text is long enough for 5-gram shingles to overlap.
  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private val nearDup = base.replace("w20", "w20x")
  private val other = (1 to 40).map(i => s"z$i").mkString(" ")
  private def frame(ids: (Long, Long, Long, Long)) = Seq(
    (ids._1, base), (ids._2, nearDup), (ids._3, other), (ids._4, "tiny doc")
  ).toDF("doc_id", "text")

  test("corpus_split: near-dups share a unit and therefore a split; singletons are their own unit") {
    val out = CorpusSplit.split(frame((10L, 11L, 12L, 13L)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    // the near-dup pair collapses onto the min-id representative
    assert(out(10L)._1 == 10L && out(11L)._1 == 10L)
    assert(out(10L)._3 == out(11L)._3, "clustered docs must land in ONE split")
    // singletons are their own unit
    assert(out(12L)._1 == 12L && out(13L)._1 == 13L)
    // content-addressing: bucket == MIN member fingerprint % 100 for the
    // cluster, own fingerprint for singletons
    val unitFp = math.min(Fingerprint.reference(base), Fingerprint.reference(nearDup))
    assert(out(10L)._2 == unitFp % 100)
    assert(out(11L)._2 == unitFp % 100)
    assert(out(12L)._2 == Fingerprint.reference(other) % 100)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("corpus_split: renumbering doc_ids never moves a doc's content between splits") {
    val a = CorpusSplit.split(frame((10L, 11L, 12L, 13L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val b = CorpusSplit.split(frame((507L, 900L, 1234L, 77L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // same content, different ids → same (bucket, split) per doc position
    assert(a(10L) == b(507L) && a(11L) == b(900L))
    assert(a(12L) == b(1234L) && a(13L) == b(77L))
    graft.operators.Dedup.releasePinned(spark)
  }

  test("corpus_split: renumbering that SWAPS which cluster member has the smaller id is a no-op") {
    // In frame(a) `base` holds the min id of its cluster; in frame(c) the
    // NEAR-DUP does. An id-chosen representative would re-bucket the whole
    // cluster here; MIN(member fingerprint) cannot (it never reads ids).
    val a = CorpusSplit.split(frame((10L, 11L, 12L, 13L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val c = CorpusSplit.split(frame((900L, 507L, 1234L, 77L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(a(10L) == c(900L) && a(11L) == c(507L))
    assert(a(12L) == c(1234L) && a(13L) == c(77L))
    graft.operators.Dedup.releasePinned(spark)
  }

  test("token_percentiles: hand-derived ranks, percentile_disc semantics") {
    // source A: token counts 1..10 → p25 = value at rank ceil(2.5)=3,
    // p50 at 5, p75 at 8, p90 at 9, p99 at 10
    // source B: all equal counts → every percentile is that value
    val docs = ((1 to 10).map(k => ("A", (1 to k).map(i => s"t$i").mkString(" "))) ++
      Seq.fill(4)(("B", "x y z"))).zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = graft.operators.CorpusStats.tokenPercentiles(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4), a.getLong(5),
      a.getLong(6), a.getLong(7), a.getLong(8)) == ((10L, 1L, 3L, 5L, 8L, 9L, 10L, 10L)))
    val b = out("B")
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(7), b.getLong(8))
      == ((4L, 3L, 3L, 3L, 3L)))
  }

  test("token_percentiles: histogram ranks == sorted-list ranks on real docs (sf0.001)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = graft.operators.CorpusStats.tokenPercentiles(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    // independent recomputation: collect counts, sort, index directly
    val counts = docs.select(col("source"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.keySet == counts.keySet)
    counts.foreach { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def disc(p: Int) = sorted(((n.toLong * p + 99) / 100).toInt - 1)
      val r = out(src)
      assert(r.getLong(1) == n && r.getLong(2) == sorted.head && r.getLong(8) == sorted.last)
      assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
        == ((disc(25), disc(50), disc(75), disc(90), disc(99))), s"source $src")
    }
  }

  test("event_outliers: crafted spike is flagged, the tight cluster is not; boundary is exact") {
    // 10 values at 100.0 plus one spike at 200.0: mean ≈ 109.09,
    // σ_pop ≈ 28.75 → z(spike) ≈ 3.16 > 3, z(100) ≈ 0.32. And a second
    // type whose values are all equal (σ = 0): nothing flags, including
    // the boundary case lhs = rhs = 0 (strict >).
    val rows = ((1 to 10).map(i => (i.toLong, "a", 100.0)) :+ (11L, "a", 200.0)) ++
      (12 to 15).map(i => (i.toLong, "b", 50.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val out = graft.operators.EventOutliers.outliers(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L))
    // sigmas=4 is past the spike's z ≈ 3.16 → nothing flags
    assert(graft.operators.EventOutliers.outliers(df, sigmas = 4).count() == 0)
  }

  test("event_outliers: exceeding the exact-arithmetic headroom fails loudly, not by unflagging") {
    // one event at 6e12: vm = 6e18, so 2·n·max|vm| = 1.2e19 ≥ 1e19 — under
    // the non-ANSI session the squares would NULL out and the spike would
    // silently vanish from the result; the guard must throw instead
    val df = Seq((1L, "a", 6.0e12), (2L, "a", 1.0)).toDF("event_id", "event_type", "value")
    val ex = intercept[Exception] {
      graft.operators.EventOutliers.outliers(df).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("headroom")), ex.toString)
    // comfortably inside the bound: values ≤ 10³, n = 11 (one spike among
    // ten gives z ≈ 3.16 > 3; with fewer rows a lone spike can't exceed
    // √(n−1)σ) — the guard passes and the spike flags
    val ok = ((1L, "a", 1000.0) +: (2L to 11L).map(i => (i, "a", 1.0)))
      .toDF("event_id", "event_type", "value")
    assert(graft.operators.EventOutliers.outliers(ok).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("clustersOf scopes its release: a composite caller's earlier pin survives") {
    import graft.operators.{NearDupClusters, Pinned}
    val mine = Pinned.pin(Seq((1L, "caller stage")).toDF("id", "v"))
    mine.count()
    NearDupClusters.clustersOf(frame((1L, 2L, 3L, 4L))).collect()
    // pre-round-9 the CC iteration's session-wide releaseOthers silently
    // unpersisted `mine`; the scoped release must leave it resident
    assert(mine.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "composite caller's pin was stolen by the CC release")
    assert(Pinned.release(spark) >= 3) // mine + edges + surviving round
  }

  test("event_outliers: integer test == double z-score recomputation on real events (sf0.001)") {
    val events = graft.sources.Tables.events(spark, sf)
    val flagged = graft.operators.EventOutliers.outliers(events)
      .collect().map(_.getLong(0)).toSet
    // independent double-precision recomputation (safe away from the
    // boundary: synthetic values are not adversarially close to 3σ)
    val evs = events.select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val byType = evs.groupBy(_._2)
    val expect = byType.values.flatMap { rows =>
      val vm = rows.map(r => math.floor(r._3 * 1e6 + 0.5))
      val n = vm.length.toDouble
      val mean = vm.sum / n
      val varPop = vm.map(v => (v - mean) * (v - mean)).sum / n
      rows.zip(vm).collect {
        case ((id, _, _), v) if (v - mean) * (v - mean) > 9 * varPop => id
      }.toSeq
    }.toSet
    assert(flagged == expect)
    assert(flagged.nonEmpty, "the heavy-tailed synthetic data must produce outliers")
  }

  test("corpus_split: every unit maps to exactly one split, cut points respected (sf0.001)") {
    val out = CorpusSplit.split(graft.sources.Tables.documents(spark, sf))
    val rows = out.collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    // one split per unit
    val perUnit = rows.groupBy(_.getLong(1)).values
    assert(perUnit.forall(_.map(_.getString(3)).distinct.length == 1))
    // bucket ↔ split mapping is the declared case expression
    assert(rows.forall { r =>
      val (bucket, split) = (r.getLong(2), r.getString(3))
      bucket >= 0 && bucket < 100 &&
        split == (if (bucket < 90) "train" else if (bucket < 95) "val" else "test")
    })
    graft.operators.Dedup.releasePinned(spark)
  }

  // ---- scale-stability guards: the corpus-scale self-joins must never
  // broadcast (the exploded-side size misestimate bistably flipped the
  // x10 run into single-threaded multi-GB broadcast builds), and the CC
  // iteration must not run with the corpus-scale upstream pins resident.

  test("shingle/band/chunk self-joins plan as shuffle joins, never broadcast") {
    import graft.operators.Dedup
    val docs = frame((1L, 2L, 3L, 4L))
    def joinLines(plan: String, key: String): Seq[String] =
      plan.linesIterator.filter(l => l.contains("Join") && l.contains(key)).toSeq
    val ngram = Dedup.ngramJaccardPairs(docs).queryExecution.sparkPlan.toString
    assert(joinLines(ngram, "shingle").nonEmpty, ngram)
    assert(joinLines(ngram, "shingle").forall(_.contains("SortMergeJoin")), ngram)
    val bands = Dedup.minhashLshCandidatesArr(
      Dedup.minhashSignaturesArr(Dedup.hashedShingleArrays(docs, 5)),
      64, 16).queryExecution.sparkPlan.toString
    assert(joinLines(bands, "band").nonEmpty, bands)
    assert(joinLines(bands, "band").forall(_.contains("SortMergeJoin")), bands)
    val sim = Dedup.simhashNearDups(docs, 3)
      .queryExecution.sparkPlan.toString
    assert(joinLines(sim, "chunk").nonEmpty, sim)
    assert(joinLines(sim, "chunk").forall(_.contains("SortMergeJoin")), sim)
    Dedup.releasePinned(spark)
  }

  test("boilerplate joins only the recurring-fp subset (filter below the join)") {
    val plan = graft.operators.Boilerplate.score(frame((1L, 2L, 3L, 4L)))
      .queryExecution.optimizedPlan.toString
    // the >= minDocs cut must sit under the join, not in the final agg
    val joinIdx = plan.indexOf("Join LeftOuter")
    val filterIdx = plan.indexOf(">= 2")
    assert(joinIdx >= 0 && filterIdx > joinIdx, plan)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("connectedComponents releases corpus-scale upstream pins before iterating") {
    import graft.operators.{Dedup, NearDupClusters, Pinned}
    val docs = frame((1L, 2L, 3L, 4L))
    val cc = NearDupClusters.connectedComponents(Dedup.ngramJaccardPairs(docs))
    cc.collect()
    // survivors: the pinned edge list + the final label round — the
    // shingle-array pin must already be gone (released at edge build)
    assert(Pinned.release(spark) == 2)
  }

  test("semantic_quality: prototypes score 1.0, orthogonal vectors score 0, threshold splits") {
    import graft.operators.Similarity
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),  // the prototype
      (1L, Array(2f, 0f, 0f, 0f)),  // parallel → cosine 1.0
      (2L, Array(0f, 3f, 0f, 0f)),  // orthogonal → 0.0
      (3L, Array(1f, 1f, 0f, 0f))   // 45° → √2/2 ≈ 0.70710678
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticQuality(emb,
        Array((0L, Array(1.0, 0.0, 0.0, 0.0))), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(0L) == ((1.0, true)) && out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false)))
    assert(out(3L)._1 == 0.70710678 && out(3L)._2)
    // best-of-K: adding an orthogonal prototype lifts vec 2 to 1.0
    val two = Similarity.semanticQuality(emb,
        Array((0L, Array(1.0, 0.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0, 0.0))),
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(two(2L) == 1.0)
  }

  test("semantic_quality plans with zero exchanges below the presentation sort") {
    val plan = graft.operators.Similarity
      .semanticQualityFromDir(spark, sf).queryExecution.executedPlan.toString
    // at most the final orderBy's range exchange; no joins, no aggregates
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1, plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("dedup_source_matrix: cross-source pair counted once, unordered canonicalization") {
    import graft.operators.SourceMatrix
    val docs = Seq(
      (1L, base, "srcB"), (2L, nearDup, "srcA"),      // cross-source near-dup
      (3L, other, "srcC"), (4L, other + " z41", "srcC"), // within-source near-dup
      (5L, "tiny doc", "srcD")
    ).toDF("doc_id", "text", "source")
    val m = SourceMatrix.matrix(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (srcB, srcA) canonicalizes to (srcA, srcB)
    assert(m == Map(("srcA", "srcB") -> 1L, ("srcC", "srcC") -> 1L))
    graft.operators.Dedup.releasePinned(spark)
  }

  test("dedup_canonical keeps the best-quality copy, not the min id") {
    import graft.operators.NearDupClusters
    // nearDup (id 1) vs base (id 2): identical except one word — but give
    // the HIGHER id better quality by appending clean prose to it, so the
    // quality-max policy must keep id 2 while min-id would keep id 1.
    // Quality here differs because doc 1 gets digits appended (digit
    // ratio lowers the score) while doc 2 gets words.
    val docs = Seq(
      (1L, base + " 111 222 333 444 555", 40L),
      (2L, nearDup + " and some further pleasant clean prose here", 40L),
      (3L, other, 40L)
    ).toDF("doc_id", "text", "n_chars")
    val kept = NearDupClusters.canonical(docs, n = 5, thr = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"expected quality-max survivor 2, got $kept")
    graft.operators.Dedup.releasePinned(spark)
  }

  test("pmi_bigrams: hand-computed PMI, minCount prune, tie-break by bigram") {
    import graft.operators.Collocations
    // tokens: x:4 y:3 z:1 (N_u=8); bigrams: "x y":3, "x z":1 (N_b=4)
    // PMI(x,y) = ln((3*8*8)/(4*3*4)) = ln(4) = 1.386294361 at 9 dp
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x z"))
      .toDF("doc_id", "text")
    val out = Collocations.pmiBigrams(docs, minCount = 2, k = 10).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "x y" && out.head.getLong(1) == 3L)
    assert(out.head.getDouble(2) == 1.386294361)
    // equal-PMI ties order by bigram text: a fully symmetric corpus
    val sym = Seq((1L, "a b"), (2L, "a b"), (3L, "c d"), (4L, "c d"))
      .toDF("doc_id", "text")
    val top = Collocations.pmiBigrams(sym, minCount = 2, k = 10)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("a b", "c d"))
    // empty / all-blank corpus: empty result with the right schema, no NPE
    val empty = Collocations.pmiBigrams(
      Seq((1L, ""), (2L, " ")).toDF("doc_id", "text"), minCount = 1, k = 10)
    assert(empty.columns.toSeq == Seq("bigram", "c_ab", "pmi_r"))
    assert(empty.count() == 0)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("canonical/split never hint broadcast: a majority-clustered corpus still plans (AQE decides)") {
    import graft.operators.NearDupClusters
    // EVERY doc sits in a near-dup pair — the "clustered docs are a sparse
    // minority" assumption is maximally violated. With a hard-coded
    // broadcast() hint this shape is the driver-OOM case at corpus scale;
    // without hints AQE chooses from real sizes, so the plans must carry
    // no broadcast strategy hint and the results must still be exact.
    val docs = (0 until 12).map { i =>
      val t = (1 to 40).map(j => s"w${i / 2}_$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) t else t.replace(s"w${i / 2}_20", "q"), 40L)
    }.toDF("doc_id", "text", "n_chars")
    val canon = NearDupClusters.canonical(docs)
    assert(!canon.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "canonical must not pin a broadcast strategy")
    assert(canon.collect().length == 6, "one survivor per near-dup pair")
    graft.operators.Dedup.releasePinned(spark)
    val sp = CorpusSplit.split(docs)
    assert(!sp.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "split must not pin a broadcast strategy")
    val rows = sp.collect()
    assert(rows.length == 12)
    // pair-mates share unit and split
    assert((0 until 12 by 2).forall { i =>
      val m = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
      m(i.toLong) == m(i.toLong + 1)
    })
    graft.operators.Dedup.releasePinned(spark)
  }

  test("unigram_logprob: hand-computed micros, multiplicity decomposition, empty corpus") {
    import graft.operators.UnigramLm
    // corpus: a:2 b:2 c:1, N=5. micros(ln(2/5)) = floor(-916290.73+0.5) =
    // -916291; micros(ln(1/5)) = -1609438.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = UnigramLm.logProbs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L * -916291L, (3L * -916291L).toDouble / 3)))
    assert(out(2L) == ((2L, -916291L + -1609438L, (-916291L + -1609438L).toDouble / 2)))
    graft.operators.Dedup.releasePinned(spark)
    // gibberish scores below plain text under the corpus's own distribution
    val mixed = (1L to 8L).map(i => (i, "the quick brown fox jumps over the lazy dog")) :+
      (9L, "zxqv wqpt kjhg zxqv")
    val scored = UnigramLm.logProbs(mixed.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(9L) < scored(1L), "rare-token doc must score lower")
    graft.operators.Dedup.releasePinned(spark)
    // all-blank corpus: empty result, right schema, no NPE
    val empty = UnigramLm.logProbs(Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text"))
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tokens", "logprob_micros", "avg_lp_micros"))
    assert(empty.count() == 0)
    graft.operators.Dedup.releasePinned(spark)
  }

  test("releaseOthers keeps the kept frame tracked and frees the rest") {
    import graft.operators.Pinned
    val a = Pinned.pin(Seq((1L, "x")).toDF("id", "v"))
    val b = Pinned.pin(Seq((2L, "y")).toDF("id", "v"))
    a.count(); b.count()
    assert(Pinned.releaseOthers(spark, Seq(b)) == 1)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(b.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(Pinned.release(spark) == 1) // b was re-tracked
  }
}
