package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily curation DAG as ONE oracle-gated pipeline:
  *
  *   quality gate → exact dedup → near-dup prune   ([[CorpusClean]])
  *     → eval-set decontamination                  ([[Curation.contaminatedIds]])
  *       → leakage-safe train/val/test split       ([[CorpusSplit]])
  *
  * Every stage is an already-gated operator; this gate proves they
  * COMPOSE — same per-doc verdicts when chained as when run alone, the
  * end-to-end property a "switch your pipeline to this library" user
  * actually depends on. The split's cluster map is computed over the
  * corpus the pipeline SHIPS (post-clean, post-decon) — split units are
  * defined by the shipped corpus's near-dup structure, not the raw
  * crawl's.
  *
  * Scale: each stage keeps its own audited shape (scan-fused quality
  * scoring, shingle self-joins via the guarded merge path, broadcast
  * eval shingles — benchmark suites are small by definition, AQE-chosen
  * split joins). The pipeline pays the shingle self-join ONCE: clean's
  * near-dup prune at (n, thr) makes the shipped corpus provably
  * pair-free at the same (n, thr), so the split's cluster map is an
  * empty constant — see [[curate]]'s doc for the proof. A deployment
  * composing the stages at different thresholds amortizes the second
  * pair graph via [[ClusterStore]]/[[CorpusSplit.splitWith]], which the
  * indexed gates prove equal.
  */
object CurateE2e {

  /** (doc_id, quality_score, split_unit, bucket, split) for every doc the
    * pipeline ships.
    *
    * The split's pair graph is NOT recomputed: this method passes ONE
    * (n, thr) to both the clean and the split, and clean's near-dup prune
    * drops the higher id of EVERY exact-Jaccard pair at that (n, thr)
    * (CorpusClean.scala:36-39, the same [[Dedup.ngramJaccardPairs]]
    * predicate [[NearDupClusters.clustersOf]] would run). So for any
    * i < j both shipped, jaccard(i, j) < thr — else j was pruned — and
    * since the pair predicate is pairwise (corpus-independent), the
    * shipped corpus's pair graph is empty BY CONSTRUCTION: every split
    * unit is a singleton. [[CorpusSplit.splitWith]] against an empty
    * cluster map produces exactly that (each doc content-addressed by its
    * own fingerprint — the identical output the full closure computes, as
    * the unchanged DuckDB oracle still proves), and skips the pipeline's
    * second shingle self-join + CC — the two most expensive stages of the
    * composed plan, ~60% of its wall time at sf0.1 (26.5 → 10.4 s
    * isolated). A caller composing
    * clean and split at DIFFERENT (n, thr) must use [[CorpusSplit.split]]
    * directly; the theorem only holds for the shared-parameter DAG this
    * method defines. */
  def curate(docs: DataFrame, eval: DataFrame, qualityMin: Double = 0.5,
             n: Int = 5, thr: Double = 0.5, deconN: Int = 8,
             trainPct: Int = 90, valPct: Int = 5): DataFrame =
    splitShipped(cleanAndDecon(docs, eval, qualityMin, n, thr, deconN),
      trainPct, valPct)

  /** The DAG with the FUZZY decontamination stage composed in after the
    * exact pass: quality → exact dedup → near-dup prune → exact 8-gram
    * decon → MinHash near-dup decon vs eval ([[Curation
    * .fuzzyContaminatedIds]] — paraphrased benchmark leakage sharing no
    * exact 8-gram) → leakage-safe split. A production pipeline screens
    * near-dup leakage in the same pass as exact leakage; this gate
    * proves the stages compose. The empty-cluster-map proof of
    * [[curate]] survives: the fuzzy stage only REMOVES docs, and a
    * subset of a pair-free corpus is pair-free, so the split's cluster
    * map stays the empty constant and the second shingle self-join +
    * CC remain deleted-by-proof. The pipeline's fuzzy pass does pay the
    * [[Dedup.minhashLsh]] envelope over shipped ∪ eval (signatures
    * scan-fused, band-bucket candidates — never all-pairs). */
  def curateFuzzy(docs: DataFrame, eval: DataFrame, qualityMin: Double = 0.5,
                  n: Int = 5, thr: Double = 0.5, deconN: Int = 8,
                  // defaults ALIGNED with fuzzyOracle's (0.4, 3): a caller
                  // pairing the two by defaults must not get a silent
                  // oracle mismatch (r14 ADVICE)
                  fuzzyThr: Double = 0.4, fuzzyN: Int = 3,
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val exact = cleanAndDecon(docs, eval, qualityMin, n, thr, deconN)
    val decon = exact.join(
      Curation.fuzzyContaminatedIds(exact, eval, fuzzyThr, fuzzyN),
      Seq("doc_id"), "left_anti")
    splitShipped(decon, trainPct, valPct)
  }

  /** The DAG with the CCNet-style REFERENCE-LM filter composed in after
    * exact decontamination: quality → exact dedup → near-dup prune →
    * exact decon → perplexity-bucket drop ([[BigramLm.refBuckets]] over
    * [[BigramLm.refLogProbs]] — docs in the `tail` tercile of
    * reference-LM quality are flagged and removed, the CCNet keep rule)
    * → leakage-safe split. The heuristic quality gate and the LM filter
    * are complementary (surface stats vs distribution match); a
    * production mix runs both, which is exactly what this DAG does. The
    * reference LM trains on a caller-supplied TRUSTED corpus `ref` —
    * external to the crawl being curated, the CCNet shape (KenLM on
    * Wikipedia): an external reference neither shrinks as curation
    * tightens nor leaks curation decisions back into its own counts.
    * Docs the LM cannot score (fewer than 2 tokens — no transition)
    * are KEPT, not silently dropped: only a provable `tail` membership
    * removes a doc. The empty-cluster-map proof of [[curate]] survives
    * (the stage only removes docs), so the split tail is unchanged. */
  def curateLm(docs: DataFrame, eval: DataFrame, ref: DataFrame,
               qualityMin: Double = 0.5,
               n: Int = 5, thr: Double = 0.5, deconN: Int = 8,
               lambda: Double = 0.75,
               trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val decon = cleanAndDecon(docs, eval, qualityMin, n, thr, deconN)
    val scored = BigramLm.refLogProbs(
      decon.select(col("doc_id"), col("text")), ref, lambda)
    val tailIds = BigramLm.refBuckets(scored)
      .filter(col("bucket") === "tail").select(col("doc_id"))
    splitShipped(decon.join(tailIds, Seq("doc_id"), "left_anti"),
      trainPct, valPct)
  }

  /** The DAG with DSIR importance RESAMPLING composed in after exact
    * decontamination: quality → exact dedup → near-dup prune → exact
    * decon → Gumbel top-1/quota resample toward the target distribution
    * ([[Dsir.importanceSample]] over the shipped corpus, target = a
    * caller-supplied trusted corpus external to the crawl, the
    * [[curateLm]] reference shape) → leakage-safe split. Where
    * [[curateLm]] CUTS the reference-unlike tail, this RESAMPLES the
    * kept mix toward the target's n-gram profile — the two selectors a
    * production stack chooses between (or layers). The drop rule is
    * conservative like the LM stage's: only a doc the resampler
    * PROVABLY passed over (weighed and not sampled) is removed —
    * featureless docs it cannot weigh are kept. The empty-cluster-map
    * proof of [[curate]] survives (the stage only removes docs). */
  def curateDsir(docs: DataFrame, eval: DataFrame, target: DataFrame,
                 qualityMin: Double = 0.5,
                 n: Int = 5, thr: Double = 0.5, deconN: Int = 8,
                 buckets: Int = Dsir.Buckets, quota: Int = Dsir.Quota,
                 trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val decon = cleanAndDecon(docs, eval, qualityMin, n, thr, deconN)
    val passedOver = Dsir.importanceSample(
      decon.select(col("doc_id"), col("text")), target, buckets, quota)
      .filter(!col("sampled")).select(col("doc_id"))
    splitShipped(decon.join(passedOver, Seq("doc_id"), "left_anti"),
      trainPct, valPct)
  }

  /** Stages 1–4 (quality gate → exact dedup → near-dup prune → exact
    * decontamination): the shipped-corpus prefix both DAG variants
    * share. Returns (doc_id, text, quality_score). */
  private def cleanAndDecon(docs: DataFrame, eval: DataFrame, qualityMin: Double,
                            n: Int, thr: Double, deconN: Int): DataFrame = {
    val kept = CorpusClean(docs, qualityMin, n, thr)
    // pinned: `cleaned` feeds BOTH the decon shingle probe and the
    // anti-join left side — unpinned, the whole clean prefix (including
    // the shingle self-join) executed once per reference (r20 profile:
    // decon_ids_only ≈ clean + a full second clean execution)
    val cleaned = Pinned.pin(
      kept.join(docs.select(col("doc_id"), col("text")), Seq("doc_id")))
    // pinned: every DAG variant reads the shipped prefix 2–3× (the extra
    // stage's scoring input + the split tail's fingerprint scan + the
    // quality_score re-join) — the single most re-evaluated joint of the
    // composed plan before r20
    Pinned.pin(cleaned.join(
      Curation.contaminatedIds(cleaned, eval, deconN), Seq("doc_id"), "left_anti"))
  }

  /** The split tail over the shipped corpus (empty cluster map — see
    * [[curate]]'s proof). */
  private def splitShipped(decon0: DataFrame, trainPct: Int, valPct: Int): DataFrame = {
    // the split tail reads the shipped frame twice (the fingerprint scan
    // and the quality_score re-join); pin unless the caller already did
    // (curate passes cleanAndDecon's pinned frame through unchanged, the
    // filtered variants hand a fresh anti-join result)
    val decon =
      if (decon0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        Pinned.pin(decon0)
      else decon0
    val spark = decon.sparkSession
    val noClusters = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType))))
    CorpusSplit.splitWith(decon.select(col("doc_id"), col("text")),
        noClusters, trainPct, valPct)
      .join(decon.select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .select(col("doc_id"), col("quality_score"), col("split_unit"),
        col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Gated variant: every 20th doc_id plays the held-out benchmark set
    * (the decontaminate gate's convention). */
  def fromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curate(docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))
  }

  /** Gated variant of [[curateLm]] (the %20 eval convention; `src0`
    * plays the external trusted reference — at this corpus src0 is
    * exactly the %20 slice, so the reference is provably DISJOINT from
    * the curated train partition, the CCNet deployment shape). The
    * stage is non-vacuous BY CONSTRUCTION: the tail tercile of the
    * scored shipped corpus is ⌈N/3⌉ docs, so at any gate scale with
    * N ≥ 3 the LM filter provably removes documents the heuristic gate
    * kept. */
  def lmFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curateLm(docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      docs.filter(col("source") === "src0"))
  }

  /** DuckDB twin: every stage is the SAME single-sourced fragment its
    * standalone gate runs — [[CorpusClean.cleanedCtesSql]] over the train
    * partition, the decontaminate oracle's raw-split 8-gram CTEs over
    * `cleaned`, and [[NearDupClusters.ccCtesSql]] (prefix `s_`, over the
    * shipped corpus) + the split oracle's fingerprint CTEs. Nothing here
    * restates a rule; a drift in any stage's logic breaks its standalone
    * gate and this one together.
    *
    * Oracle-cost invariant (r17): every multi-referenced CTE joint in
    * these composed chains (`cleaned`, `decon*`, `pairs`, `cc`, `fp`,
    * the DSIR count tables) is `AS MATERIALIZED` — DuckDB 1.0 INLINES
    * plain CTE references, so a joint referenced 2-3× at several levels
    * re-evaluates its whole prefix combinatorially (measured: the r16
    * fuzzy/dsir oracles ran >20 min; with the joints pinned, 1.2 s/0.7 s
    * on the same data). Two hard limits, both measured on DuckDB 1.0:
    * never materialize the direct inputs of a RECURSIVE cte (`edges`/
    * `nodes` → internal "Recursive CTE scan without node" error), and
    * never materialize a CTE whose name shadows one in a nested WITH
    * (binder "Duplicate alias" — why the embedded minhash fragment in
    * [[fuzzyOracle]] stays unmaterialized). `tools/oracle_budget.py`
    * gates every oracle's DuckDB cost per round. */
  def oracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5,
             deconN: Int = 8, trainPct: Int = 90, valPct: Int = 5): String =
    s"""WITH RECURSIVE ${deconCtesSql(qualityMin, n, thr, deconN)},
       |${splitTailSql("decon", n, thr, trainPct, valPct)}""".stripMargin

  /** DuckDB twin of [[curateFuzzy]] as [[fuzzyFromDir]] composes it: the
    * shared exact-prefix CTEs with the evals CTE swapped for the SAME
    * paraphrase construction (indexed 1-based list_filter ↔ Spark's
    * 0-based filter), then the FULL [[Dedup.minhashLshOracle]] pipeline
    * as a subquery over `decon ∪ evals` restricted to cross pairs
    * (membership = the id offset), then the shared split tail over the
    * doubly-decontaminated corpus. */
  def fuzzyOracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5,
                  deconN: Int = 8, fuzzyThr: Double = 0.4, fuzzyN: Int = 3,
                  trainPct: Int = 90, valPct: Int = 5): String = {
    val off = FuzzyEvalIdOffset
    val evalsSql =
      s"""SELECT doc_id + $off AS doc_id,
         |         array_to_string(list_filter(string_split(text, ' '),
         |                                     (t, i) -> i % 8 <> 0), ' ') AS text
         |  FROM documents WHERE doc_id % 40 = 1""".stripMargin
    s"""WITH RECURSIVE ${deconCtesSql(qualityMin, n, thr, deconN, evalsSql)},
       |fz_bad AS (
       |  SELECT DISTINCT CASE WHEN id1 < $off THEN id1 ELSE id2 END AS doc_id
       |  FROM (
       |${Dedup.minhashLshOracle(n = fuzzyN, threshold = fuzzyThr,
           pairFilter = Some(s"(i.id1 >= $off) <> (i.id2 >= $off)"),
           relation = "fz_corpus",
           extraCtes = "fz_corpus AS (SELECT doc_id, text FROM decon " +
             "UNION ALL SELECT doc_id, text FROM evals), ")}
       |  )
       |), decon2 AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, d.quality_score FROM decon d
       |  LEFT JOIN fz_bad b ON d.doc_id = b.doc_id
       |  WHERE b.doc_id IS NULL
       |),
       |${splitTailSql("decon2", n, thr, trainPct, valPct)}""".stripMargin
  }

  /** DuckDB twin of [[curateLm]] as [[lmFromDir]] composes it: the
    * shared exact-prefix CTEs, then [[BigramLm.refCtesSql]] (prefix
    * `lm_` — reference from the FULL table's src0 slice (external to
    * the train partition at this corpus), scored relation = `decon`;
    * the SAME single-sourced scoring chain as `ref_lm_logprob`)
    * + [[BigramLm.tercileCtesSql]] (the SAME cut rule as
    * `ref_lm_buckets`), tail ids anti-joined out, then the shared split
    * tail over the LM-filtered corpus. Docs without a scored row (no
    * bigram) never reach `lm_tail` — kept on both engines. */
  def lmOracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5,
               deconN: Int = 8, lambda: Double = 0.75,
               trainPct: Int = 90, valPct: Int = 5): String =
    s"""WITH RECURSIVE ${deconCtesSql(qualityMin, n, thr, deconN)},
       |${BigramLm.refCtesSql(lambda, "lm_",
           refFrom = "documents WHERE source = 'src0'", docsFrom = "decon")},
       |${BigramLm.tercileCtesSql("lm_", "lm_agg")},
       |lm_tail AS (SELECT doc_id FROM lm_r WHERE ((rk - 1) * 3) // n = 2),
       |decon_lm AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, d.quality_score FROM decon d
       |  LEFT JOIN lm_tail t ON d.doc_id = t.doc_id
       |  WHERE t.doc_id IS NULL
       |),
       |${splitTailSql("decon_lm", n, thr, trainPct, valPct)}""".stripMargin

  /** Gated variant of [[curateDsir]] (the %20 eval convention; `src0`
    * plays the external target, as in [[lmFromDir]]). Non-vacuous BY
    * CONSTRUCTION: the resampler keeps ⌈N/quota⌉ of the N weighed docs,
    * so at any gate scale with N > quota it provably removes documents
    * the heuristic gate and decon kept. */
  def dsirFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curateDsir(docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      docs.filter(col("source") === "src0"))
  }

  /** DuckDB twin of [[curateDsir]] as [[dsirFromDir]] composes it: the
    * shared exact-prefix CTEs, then [[Dsir.dsirCtesSql]] (prefix `ds_`,
    * weighed relation = `decon`, target = the full table's src0 slice —
    * the SAME single-sourced chain as `curation_dsir`), passed-over ids
    * anti-joined out, then the shared split tail. Featureless docs never
    * reach `ds_sel` — kept on both engines. */
  def dsirOracle(qualityMin: Double = 0.5, n: Int = 5, thr: Double = 0.5,
                 deconN: Int = 8, buckets: Int = Dsir.Buckets,
                 quota: Int = Dsir.Quota,
                 trainPct: Int = 90, valPct: Int = 5): String =
    s"""WITH RECURSIVE ${deconCtesSql(qualityMin, n, thr, deconN)},
       |${Dsir.dsirCtesSql(buckets, quota, "ds_", docsFrom = "decon",
           targetFrom = "documents WHERE source = 'src0'")},
       |ds_drop AS (SELECT doc_id FROM ds_sel WHERE NOT sampled),
       |decon_ds AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, d.quality_score FROM decon d
       |  LEFT JOIN ds_drop t ON d.doc_id = t.doc_id
       |  WHERE t.doc_id IS NULL
       |),
       |${splitTailSql("decon_ds", n, thr, trainPct, valPct)}""".stripMargin

  /** The exact-prefix CTE chain (evals/train0 → cleaned → 8-gram decon),
    * ending in `decon (doc_id, text, quality_score)` — shared by both
    * oracle variants so the stages cannot drift between them. The evals
    * definition is swappable (the fuzzy gate constructs its evals). */
  private def deconCtesSql(qualityMin: Double, n: Int, thr: Double,
                           deconN: Int,
                           evalsSql: String =
                             "SELECT * FROM documents WHERE doc_id % 20 = 0"): String =
    s"""evals AS (
       |  $evalsSql
       |), train0 AS (
       |  SELECT * FROM documents WHERE doc_id % 20 <> 0
       |), ${CorpusClean.cleanedCtesSql("train0", qualityMin, n, thr)},
       |etoks AS (SELECT string_split(text, ' ') AS a FROM evals),
       |esh AS (SELECT DISTINCT ${Dedup.shingleSliceSql(deconN)} AS shingle
       |        FROM etoks, ${Dedup.shingleLateralSql(deconN)}),
       |ttoks AS (SELECT doc_id, string_split(text, ' ') AS a FROM cleaned),
       |tsh AS (SELECT DISTINCT doc_id, ${Dedup.shingleSliceSql(deconN)} AS shingle
       |        FROM ttoks, ${Dedup.shingleLateralSql(deconN)}),
       |bad AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN esh e ON t.shingle = e.shingle),
       |decon AS MATERIALIZED (
       |  SELECT c.doc_id, c.text, c.quality_score FROM cleaned c
       |  LEFT JOIN bad b ON c.doc_id = b.doc_id
       |  WHERE b.doc_id IS NULL
       |)""".stripMargin

  /** The split tail over the shipped relation — the [[CorpusSplit]]
    * fragments both oracle variants share. */
  private def splitTailSql(shipped: String, n: Int, thr: Double,
                           trainPct: Int, valPct: Int): String =
    s"""${NearDupClusters.ccCtesSql(n, thr, relation = shipped, prefix = "s_")},
       |fp AS MATERIALIZED (
       |  SELECT doc_id, ${graft.functions.Fingerprint.fingerprintSql("text")} AS fp
       |  FROM $shipped
       |),
       |ufp AS (
       |  SELECT s_cc.cluster_id, MIN(f.fp) AS unit_fp
       |  FROM s_cc JOIN fp f ON s_cc.doc_id = f.doc_id
       |  GROUP BY s_cc.cluster_id
       |),
       |rep AS (
       |  SELECT s_cc.doc_id, s_cc.cluster_id, u.unit_fp
       |  FROM s_cc JOIN ufp u ON s_cc.cluster_id = u.cluster_id
       |),
       |u AS (
       |  SELECT f.doc_id,
       |         COALESCE(rep.cluster_id, f.doc_id) AS split_unit,
       |         COALESCE(rep.unit_fp, f.fp) % 100 AS bucket
       |  FROM fp f LEFT JOIN rep ON f.doc_id = rep.doc_id
       |)
       |SELECT u.doc_id, d.quality_score, u.split_unit, u.bucket,
       |       CASE WHEN u.bucket < $trainPct THEN 'train'
       |            WHEN u.bucket < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM u JOIN $shipped d ON u.doc_id = d.doc_id
       |ORDER BY u.doc_id""".stripMargin

  /** The id offset that marks CONSTRUCTED eval docs in the fuzzy gate
    * (corpus ids stay far below it). */
  val FuzzyEvalIdOffset = 1000000L

  /** Gated variant of [[curateFuzzy]] — and the reason the gate is
    * NON-VACUOUS. With the %20 eval convention the fuzzy stage provably
    * never fires at this corpus: any train doc MinHash-near a %20 doc
    * also shares an 8-gram with it (the corpus's duplicates are
    * copy-grade), so exact decon removes it first and both engines
    * compute an empty fuzzy set — a gate that cannot catch an
    * empty-set bug. So the gate CONSTRUCTS paraphrase-grade leakage:
    * evals are every-40th-remainder-1 docs (which stay IN train) with
    * every 8th word dropped and ids offset by [[FuzzyEvalIdOffset]]. A
    * surviving 8-gram needs 8 consecutive kept words — impossible under
    * a period-8 drop — so the EXACT stage is provably blind to the
    * pairs by construction, while 3-gram jaccard stays ≈0.5, which the
    * fuzzy pass at (n=3, thr=0.4) catches: 6 train docs removed at
    * sf0.01 that no exact pass could see. Both engines rebuild the same
    * perturbed evals from expressions (split → indexed filter → join),
    * so the construction is itself oracle-checked. */
  def fuzzyFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the id-space partition is a real precondition, not a convention: a
    // corpus id >= the offset would be tagged eval by both the Spark
    // membership probes and the oracle's `< offset` test — silently wrong
    // decontamination. Fail loudly at the boundary instead.
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    require(maxId < FuzzyEvalIdOffset,
      s"corpus doc_ids reach $maxId — the constructed-eval id offset " +
        s"$FuzzyEvalIdOffset no longer partitions the id space; raise it")
    val evals = docs.filter(col("doc_id") % 40 === 1).select(
      (col("doc_id") + FuzzyEvalIdOffset).as("doc_id"),
      array_join(filter(split(col("text"), " "),
        (_, i) => (i + 1) % 8 =!= 0), " ").as("text"))
    curateFuzzy(docs.filter(col("doc_id") % 20 =!= 0), evals,
      fuzzyThr = 0.4, fuzzyN = 3)
  }
}
