package graft.operators

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale design notes (the point of each variant):
  *   - exact: one hash-shuffle on the text (or fingerprint) key; at 100 TB
  *     group on a 64-bit fingerprint instead of the raw text to keep shuffle
  *     rows narrow, with an optional in-group equality re-check.
  *   - n-gram Jaccard: the candidate generation is a self-join on SHARED
  *     SHINGLES, never an all-pairs product — cost is Σ|bucket|², bounded by
  *     shingle selectivity. The exact Jaccard is integer set math, so it
  *     cross-checks bit-exactly against the DuckDB oracle.
  *   - MinHash+LSH: replaces the shingle join's worst case with fixed-width
  *     signatures; candidate pairs only form inside an LSH band bucket.
  *     Probability a pair with Jaccard j collides: 1-(1-j^r)^b.
  *   - SimHash: 64-bit near-dup sketch; Hamming-close pairs found by
  *     exact-match blocking on bit-chunks (pigeonhole: d ≤ k differences ⇒
  *     some chunk of k+1 is identical), again never all-pairs.
  */
object Dedup {

  /** Pin a shared pipeline stage: persist it so every downstream branch
    * reads the computed rows instead of re-deriving the stage from the raw
    * corpus. ReuseExchange can NOT be relied on for this — each branch
    * pushes different projections into the scan, so the post-optimization
    * subtrees differ and reuse never fires; the round-2 recorded plans
    * re-scanned `documents` up to 6x per dedup query because of exactly
    * that. The pinned stages here are the SMALL derived tables (8-byte
    * hashed shingles, fixed-width signatures), never the raw corpus.
    *
    * Lifecycle: see [[Pinned]] — lazy persist with full lineage, tracked
    * per session, released by callers after the consuming action via
    * [[releasePinned]]. */
  private[operators] def pinned(stage: DataFrame): DataFrame = Pinned.pin(stage)

  /** Unpersist every stage pinned in `spark` since the last release
    * (delegates to [[Pinned.release]] — one registry for dedup stages and
    * every other pinned operator stage). */
  def releasePinned(spark: SparkSession): Int = Pinned.release(spark)

  /** Exact dedup by content: canonical id = min doc_id per distinct text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))
      .select(col("canonical_id"), col("dup_count"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy(col("canonical_id"))

  val exactOracle: String =
    """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count,
      |       LENGTH(text) AS text_len
      |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin

  /** Distinct word-n-gram shingles per doc (row form — derived from the
    * array form, so the distinct is per-row set dedup, never a shuffle). */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    shingleArrays(docs, n)
      .select(col("doc_id"), explode(col("sharr")).as("shingle"))

  /** Distinct word-n-gram shingle ARRAYS per doc — one row per doc, built
    * entirely inside the scan (shingling + array_distinct are per-row
    * expressions). Cardinalities are `size(sharr)` — free — and the row
    * form is one Generate away; neither needs a shuffle. Docs shorter
    * than n tokens are excluded (empty shingle sets).
    *
    * Precondition (here and in [[hashedShingleArrays]]): `doc_id` is
    * UNIQUE in `docs` — its primary key, as in the documents table. The
    * per-row distinct cannot merge shingles of two input rows sharing an
    * id the way the old corpus-wide distinct did; feed a deduplicated
    * frame (e.g. [[exact]]'s canonical output) if ids can repeat. */
  def shingleArrays(docs: DataFrame, n: Int): DataFrame =
    // one-pass codegen kernel == array_distinct(wordShingles(text, n)) —
    // the declarative HOF form ran interpreted and cost ~2.5 s/corpus
    // pass at sf0.1 (ShingleKernels doc, r20 guide-§1 profile)
    docs.select(col("doc_id"),
      graft.functions.ShingleExprs.wordShinglesDistinct(col("text"), n).as("sharr"))
      .filter(size(col("sharr")) > 0)

  /** Cross-engine 60-bit string hash: the first 15 hex chars of md5,
    * parsed as a (always-positive) BIGINT. DuckDB computes the identical
    * value ([[hash60Sql]]), which is what makes the MinHash and SimHash
    * pipelines oracle-checkable end-to-end — xxhash64 has no DuckDB twin.
    * Still a builtin codegen'd expression chain (md5+substring+conv), and
    * md5's 60 truncated bits keep collisions at ~n²/2⁶¹: negligible even
    * at 10¹² shingles, and in any case IDENTICAL on both engines. */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The DuckDB twin of [[hash60]] over SQL expression `x`. */
  def hash60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** The word-n-gram shingle ARITHMETIC, written once (r17 ADVICE): the
    * 1-based DuckDB slice over token array `a` at LATERAL position `i.i`.
    * Every oracle that shingles — the dedup family, curation/decon, dup
    * coverage, the KMV sketches — derives its fragment from this +
    * [[shingleLateralSql]], so the window math cannot silently fork
    * between families (or from the Spark side's TextFunctions twin). */
  def shingleSliceSql(n: Int): String = s"array_to_string(a[i.i:i.i+${n - 1}], ' ')"

  /** The matching LATERAL position generator: starts 1 .. len(a)−n+1
    * (DuckDB `range`'s upper bound is exclusive). */
  def shingleLateralSql(n: Int): String =
    s"LATERAL unnest(range(1, len(a) - ${n - 2})) AS i(i)"

  /** Session conf: set to `true` to hash shingles/tokens with the codegen'd
    * xxhash64 instead of [[hash60]] — several times less CPU per row, the
    * right choice for a real 100 TB run. Defaults to false because only
    * [[hash60]] has a DuckDB twin, i.e. only the default keeps the MinHash/
    * SimHash pipelines oracle-checkable end-to-end. Both are uniform 64/60-
    * bit hash families, so the LSH collision model is unaffected. */
  val FastHashConf = "spark.graft.dedup.fastHash"

  /** The dedup-internal content hash: [[hash60]] (cross-engine, default) or
    * xxhash64 (fast path) per [[FastHashConf]]. Masked to the low 60 bits
    * either way so [[SimhashBits]] signature bits are always backed. */
  private[operators] def contentHash(df: DataFrame)(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (df.sparkSession.conf.get(FastHashConf, "false").toBoolean)
      xxhash64(c).bitwiseAND(lit((1L << 60) - 1))
    else hash60(c)

  /** Distinct hashed shingles per doc — the MinHash/LSH internal
    * representation: every downstream shuffle and join moves an 8-byte key
    * instead of a ~30-byte string. Hash collisions are folded BEFORE the
    * distinct, so per-doc cardinalities are over hashed sets on both
    * engines; the oracle-checked [[ngramJaccardPairs]] stays string-exact. */
  def hashedShingles(docs: DataFrame, n: Int): DataFrame =
    hashedShingleArrays(docs, n)
      .select(col("doc_id"), explode(col("harr")).as("h"))

  /** The ARRAY form of [[hashedShingles]]: one row per doc carrying its
    * distinct hashed-shingle array, built entirely inside the scan
    * (shingle → hash → array_distinct are per-row expressions). The
    * distinct that used to be a corpus-wide SHUFFLE becomes in-row set
    * dedup; the exploded row form derives from this with a Generate —
    * also shuffle-free. Same (doc, hash-set) contents as hashedShingles,
    * so the oracle is untouched. Empty-shingle docs are excluded, as the
    * row form excluded them implicitly (no rows → no group). */
  def hashedShingleArrays(docs: DataFrame, n: Int): DataFrame =
    // one-pass codegen kernel == array_distinct(transform(wordShingles,
    // contentHash)) — hashes each window's byte range directly, no
    // interpreted lambda chain (ShingleKernels doc)
    docs.select(col("doc_id"),
      graft.functions.ShingleExprs.hashedShinglesDistinct(col("text"), n,
        fast = docs.sparkSession.conf.get(FastHashConf, "false").toBoolean).as("harr"))
      .filter(size(col("harr")) > 0)

  /** Exact n-gram Jaccard near-dup pairs (candidates = docs sharing ≥1
    * shingle; similarity = |∩|/|∪| in integer math). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5, threshold: Double = 0.5): DataFrame = {
    // the pinned ARRAY stage feeds three branches (cardinalities + both
    // join sides): the corpus is tokenized and scanned exactly once, the
    // per-doc distinct is in-row set dedup (the row-form pipeline paid a
    // corpus-wide distinct shuffle here), and cardinalities read
    // size(sharr) instead of a count aggregate
    jaccardPairsFromArrays(pinned(shingleArrays(docs, n)), threshold)
  }

  /** [[ngramJaccardPairs]] over a CALLER-pinned shingle-array stage — for
    * composite callers ([[ClusterStore.write]]) that also derive other
    * outputs (the persisted per-doc cardinalities) from the same stage and
    * must not pay a second corpus scan + shingling for them. */
  private[operators] def jaccardPairsFromArrays(arrs: DataFrame,
                                                threshold: Double): DataFrame = {
    val sh = arrs.select(col("doc_id"), explode(col("sharr")).as("shingle"))
    val card = arrs.select(col("doc_id"), size(col("sharr")).cast("long").as("n_shingles"))
    val a = sh.select(col("doc_id").as("id1"), col("shingle"))
    val b = sh.select(col("doc_id").as("id2"), col("shingle"))
    // merge hint: BOTH sides are the exploded corpus — a shuffle join is
    // the only sane strategy at any scale, but Catalyst's width-ratio
    // size estimate for a Generate output can collapse below the
    // broadcast threshold, and whether it does depends on whether the
    // pinned stage's stats are actual-cached or estimated at planning
    // time. Unhinted, the x10 scale run bistably flipped to building a
    // single-threaded multi-GB broadcast of the exploded side (75 s vs
    // 600+ s for identical code and data); the hint pins the strategy.
    val inter = a.hint("merge").join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(card.select(col("doc_id").as("id1"), col("n_shingles").as("n1")), Seq("id1"))
      .join(card.select(col("doc_id").as("id2"), col("n_shingles").as("n2")), Seq("id2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("n_common"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Shared DuckDB CTE fragment: distinct word-n-gram shingles + per-doc
    * cardinalities + shared-shingle pair intersections over `relation` —
    * the SQL twin of [[shingles]]. Used by this oracle AND CorpusClean's,
    * so the two cannot drift from each other (or from the Spark side).
    * `prefix` renames every defined CTE (`toks`→`${prefix}toks`, …) so a
    * composed oracle can instantiate the fragment over TWO relations in
    * one WITH chain (CurateE2e: the clean stage's pair graph AND the
    * split stage's) without name collisions. */
  def shingleCtesSql(relation: String, n: Int, prefix: String = ""): String =
    s"""${prefix}toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM $relation),
       |${prefix}sh AS (SELECT DISTINCT doc_id, ${shingleSliceSql(n)} AS shingle
       |       FROM ${prefix}toks, ${shingleLateralSql(n)}),
       |${prefix}card AS (SELECT doc_id, COUNT(*) AS n_sh FROM ${prefix}sh GROUP BY 1),
       |${prefix}inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
       |          FROM ${prefix}sh a JOIN ${prefix}sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)""".stripMargin

  /** Shared DuckDB CTE: the verified near-dup pair list (threshold applied)
    * over [[shingleCtesSql]]'s `inter`/`card` (same `prefix`). Defines CTE
    * `${prefix}pairs (id1, id2)`. Used by [[NearDupClusters.ccCtesSql]] AND
    * [[SourceMatrix.oracle]], so the pair predicate is written once. */
  def pairsCteSql(thr: Double, prefix: String = ""): String =
    s"""${prefix}pairs AS MATERIALIZED (
       |  SELECT id1, id2 FROM ${prefix}inter
       |  JOIN ${prefix}card ca ON id1 = ca.doc_id
       |  JOIN ${prefix}card cb ON id2 = cb.doc_id
       |  WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= $thr
       |)""".stripMargin

  def ngramJaccardOracle(n: Int = 5, threshold: Double = 0.5): String =
    s"""WITH ${shingleCtesSql("documents", n)}
       |SELECT id1, id2, n_common,
       |       CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jaccard
       |FROM inter
       |JOIN card ca ON id1 = ca.doc_id
       |JOIN card cb ON id2 = cb.doc_id
       |WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= $threshold
       |ORDER BY id1, id2""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** Deterministic universal-hash parameters for MinHash signatures. */
  private[graft] def hashParams(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((math.abs(rnd.nextLong() % 2147483647L) + 1,
      math.abs(rnd.nextLong() % 2147483647L)))
  }

  /** MinHash signatures as mh_* columns: per doc, the min of
    * (a·h(shingle)+b mod p) per hash function — computed ZERO-shuffle via
    * the array form + the codegen'd [[graft.functions.MinHashAll]]
    * expression (identical math to the aggregate formulation). */
  def minhashSignatures(docs: DataFrame, n: Int = 5, numHashes: Int = 64,
                        seed: Long = 42L): DataFrame = {
    val sigs = minhashSignaturesArr(hashedShingleArrays(docs, n), numHashes, seed)
    sigs.select(col("doc_id") +:
      (0 until numHashes).map(i => element_at(col("mh_arr"), i + 1).as(s"mh_$i")): _*)
  }

  /** MinHash signatures over the ARRAY form: one codegen'd expression per
    * row computes all `numHashes` minima in a single pass — no explode,
    * no distinct shuffle, no wide hash-aggregate. The signature stage of
    * a 100 TB corpus becomes pure scan work. */
  def minhashSignaturesArr(shingleArrays: DataFrame, numHashes: Int = 64,
                           seed: Long = 42L): DataFrame =
    shingleArrays.select(col("doc_id"),
      graft.functions.MinHashAll.minhashAll(col("harr"),
        hashParams(numHashes, seed)).as("mh_arr"))

  /** LSH banding over array signatures: docs whose signature agrees on ALL
    * rows of some band land in the same bucket; bucket-mates are candidate
    * pairs. The bucket key is the band's signature SLICE itself (an array
    * of longs), not a hash of it: exact LSH semantics with no false bucket
    * collisions, an engine-neutral join key for the oracle, and at ~32
    * bytes still a narrow shuffle key. (The p = 2³¹−1 exact-Long argument
    * for the signature math lives in [[graft.functions.MinHashAll]].) */
  /** The banded form of an array-signature table: one row per (doc, band)
    * carrying that band's signature slice as the bucket key — the row
    * layout the LSH self-join buckets on, and the layout the persistent
    * signature index ([[DedupIndex]]) stores. */
  def bandedSignatures(signatures: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // fail FAST on a signature/width mismatch: slicing past a too-short
    // array would silently yield empty buckets — identical (band, [])
    // keys for every doc, degenerating the band self-join into the full
    // n²/2 cross product LSH exists to avoid
    val sig = when(size(col("mh_arr")) === numHashes, col("mh_arr"))
      .otherwise(raise_error(concat(
        lit("MinHash signature width "), size(col("mh_arr")).cast("string"),
        lit(s" != expected $numHashes"))))
    val bandExprs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        slice(sig, b * rows + 1, rows).as("bucket"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  def minhashLshCandidatesArr(signatures: DataFrame, numHashes: Int,
                              bands: Int): DataFrame = {
    val banded = bandedSignatures(signatures, numHashes, bands)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id1"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id2"))
    // merge hint: both sides are corpus × bands — never broadcastable
    // (same exploded-side misestimate guard as the shingle self-join)
    l.hint("merge").join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  /** Exact Jaccard computed ONLY for the given candidate pairs — over an
    * already-derived hashed-shingle row table: the shingle sets of each
    * side are joined through the candidate list, so cost is
    * O(|candidates| · shingles-per-doc) — never the shared-shingle
    * self-join of the full corpus. */
  def candidateJaccardHashed(sh: DataFrame, candidates: DataFrame): DataFrame =
    candidateJaccardHashed(sh, candidates,
      sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles")))

  /** [[candidateJaccardHashed]] with caller-supplied per-doc cardinalities
    * `(doc_id, n_shingles)` — when the shingles derive from an array
    * stage, `size(harr)` gives them for free, with no count aggregate. */
  def candidateJaccardHashed(sh: DataFrame, candidates: DataFrame,
                             card: DataFrame): DataFrame = {
    val inter = candidates
      .join(sh.select(col("doc_id").as("id1"), col("h")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("h")), Seq("id2", "h"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(card.select(col("doc_id").as("id1"), col("n_shingles").as("n1")), Seq("id1"))
      .join(card.select(col("doc_id").as("id2"), col("n_shingles").as("n2")), Seq("id2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from banding, verified
    * with exact Jaccard — the verification touches candidate pairs only,
    * not the corpus product (that asymmetry is the whole point of LSH at
    * 100 TB: banding bounds the candidate set, verification stays cheap). */
  def minhashLsh(docs: DataFrame, n: Int = 5, numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    // the corpus is shingled+hashed+deduped exactly once, per row, inside
    // the scan of the ONE pinned array stage; signatures are one codegen'd
    // expression over it (no explode/distinct/aggregate shuffles — the
    // rounds-2/3 row-form pipeline paid two corpus-wide shuffles here),
    // pinned because the banding self-join reads them from BOTH sides.
    // The exploded row form for verification and cardinalities derives
    // from the array stage with a Generate — also shuffle-free.
    val arrs = pinned(hashedShingleArrays(docs, n))
    val sigs = pinned(minhashSignaturesArr(arrs, numHashes, seed))
    val cands = minhashLshCandidatesArr(sigs, numHashes, bands)
    val hsh = arrs.select(col("doc_id"), explode(col("harr")).as("h"))
    // cardinalities from size(harr) — no count aggregate over the
    // exploded shingle rows
    val card = arrs.select(col("doc_id"), size(col("harr")).cast("long").as("n_shingles"))
    candidateJaccardHashed(hsh, cands, card)
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** DuckDB twin of the FULL MinHash-LSH pipeline ([[minhashLsh]]):
    * identical shingles, identical 60-bit shingle hash, the same universal
    * hash family (the a/b parameters are embedded as literals from the same
    * seeded generator), band buckets as signature-row lists, candidate-only
    * exact Jaccard. Every intermediate is integer math; the one double
    * (jaccard) is a single int/int division — bit-exact on both engines. */
  def minhashLshOracle(n: Int = 5, numHashes: Int = 64, bands: Int = 16,
                       threshold: Double = 0.5, seed: Long = 42L,
                       pairFilter: Option[String] = None,
                       relation: String = "documents",
                       extraCtes: String = ""): String = {
    val p = 2147483647L
    val params = hashParams(numHashes, seed)
    val rows = numHashes / bands
    val minExprs = params.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((ha * ${a % p} + ${b % p}) % $p) AS mh_$i"
    }.mkString(",\n       |           ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => s"mh_$i").mkString(", ")
      s"($b, [$cols])"
    }.mkString(",\n       |             ")
    s"""WITH $extraCtes${shingleCtesSql(relation, n)},
       |hsh AS (SELECT DISTINCT doc_id, ${hash60Sql("shingle")} AS h FROM sh),
       |ha AS (SELECT doc_id, h % $p AS ha FROM hsh),
       |sig AS (SELECT doc_id,
       |           $minExprs
       |        FROM ha GROUP BY doc_id),
       |banded AS (SELECT doc_id, v.band, v.bucket
       |           FROM sig, LATERAL (VALUES
       |             $bandRows) AS v(band, bucket)),
       |cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |         FROM banded l JOIN banded r
       |           ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
       |hcard AS (SELECT doc_id, COUNT(*) AS n_sh FROM hsh GROUP BY 1),
       |hinter AS (SELECT c.id1, c.id2, COUNT(*) AS n_common
       |           FROM cand c
       |           JOIN hsh a ON a.doc_id = c.id1
       |           JOIN hsh b ON b.doc_id = c.id2 AND b.h = a.h
       |           GROUP BY 1, 2)
       |SELECT i.id1, i.id2,
       |       CAST(i.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_common) AS jaccard
       |FROM hinter i
       |JOIN hcard ca ON i.id1 = ca.doc_id
       |JOIN hcard cb ON i.id2 = cb.doc_id
       |WHERE CAST(i.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_common) >= $threshold
       |${pairFilter.map(f => s"  AND ($f)").getOrElse("")}
       |ORDER BY id1, id2""".stripMargin
  }

  // ---------------------------------------------------------------- SimHash

  /** Signature width: 60 bits — the width of [[hash60]], so every
    * signature bit is backed by a real hash bit on BOTH engines. */
  val SimhashBits = 60

  /** 60-bit SimHash over tokens: bit_i = sign(Σ_tokens ±1 on hash bit i).
    * Tokens keep their multiplicity (no distinct) — a repeated word weighs
    * more, the standard SimHash weighting. Computed ZERO-shuffle by the
    * codegen'd [[graft.functions.SimHash60]] expression over the per-row
    * hashed-token array — the rounds-1..4 formulation exploded every token
    * occurrence into a corpus-wide 60-column hash aggregate (at 100 TB, a
    * shuffle of every token in the corpus). Identical math; token-less
    * docs excluded, as the aggregate form excluded them implicitly. */
  def simhash(docs: DataFrame): DataFrame =
    // hashed-token kernel == transform(tokens, contentHash) — the HOF
    // form paid an interpreted md5 chain per token occurrence (r20)
    docs.select(col("doc_id"),
      graft.functions.ShingleExprs.hashedTokens(col("text"),
        fast = docs.sparkSession.conf.get(FastHashConf, "false").toBoolean).as("tharr"))
      .filter(size(col("tharr")) > 0)
      .select(col("doc_id"),
        graft.functions.SimHash60.simhash60(col("tharr")).as("simhash"))

  /** Hamming-distance near-dup pairs via pigeonhole blocking: split the 60
    * bits into (maxDistance+1) chunks; pairs within distance must share at
    * least one exact chunk — candidates only form inside chunk buckets.
    * Chunk width is ceil(60/chunks) so the chunks tile ALL signature bits
    * (a floor width would leave uncovered bits and break the pigeonhole
    * guarantee when chunks does not divide 60). */
  def simhashNearDups(docs: DataFrame, maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val bits = (SimhashBits + chunks - 1) / chunks
    // Scala shifts are mod 64: (1L << 64) - 1 == 0, which would collapse
    // every row into bucket 0 — use -1L (all bits) if bits ever reaches 64
    val mask = if (bits >= 64) -1L else (1L << bits) - 1
    // pin the signature table (one narrow row per doc): the blocking
    // self-join reads it from both sides, and the token-explode + 60-column
    // bit-sum aggregate behind it is the expensive part of the query
    val sigs = pinned(simhash(docs))
    val chunkExprs = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * bits).bitwiseAND(mask).as("key"))
    }
    val blocked = sigs.select(col("doc_id"), col("simhash"),
      explode(array(chunkExprs: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.key"))
    val l = blocked.select(col("chunk"), col("key"),
      col("doc_id").as("id1"), col("simhash").as("sig1"))
    val r = blocked.select(col("chunk"), col("key"),
      col("doc_id").as("id2"), col("simhash").as("sig2"))
    // merge hint: both sides are corpus × bit-chunks (same guard as above)
    l.hint("merge").join(r, Seq("chunk", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
      .orderBy(col("id1"), col("id2"))
  }

  /** DuckDB twin of [[simhashNearDups]]∘[[simhash]]: same tokens (with
    * multiplicity), same 60-bit token hash, the same per-bit ±1 sums and
    * sign assembly (as a sum of disjoint powers of two), the same
    * pigeonhole chunk blocking, hamming via bit_count(xor). All integer
    * math — bit-exact on both engines. */
  def simhashOracle(maxDistance: Int = 3): String = {
    val chunks = maxDistance + 1
    val bits = (SimhashBits + chunks - 1) / chunks
    val mask = (1L << bits) - 1
    val bitSums = (0 until SimhashBits).map { i =>
      s"SUM(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS b_$i"
    }.mkString(",\n       |          ")
    val sigExpr = (0 until SimhashBits).map { i =>
      s"(CASE WHEN b_$i > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val chunkList = (0 until chunks).mkString("[", ", ", "]")
    s"""WITH tk AS (
       |  SELECT doc_id, t.t AS token
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |        FROM documents),
       |       LATERAL unnest(toks) AS t(t)
       |), th AS (SELECT doc_id, ${hash60Sql("token")} AS h FROM tk),
       |bs AS (SELECT doc_id,
       |          $bitSums
       |       FROM th GROUP BY doc_id),
       |sg AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS sig FROM bs),
       |blocked AS (SELECT doc_id, sig, c.c AS chunk,
       |                   (sig >> (c.c * $bits)) & $mask AS key
       |            FROM sg, LATERAL unnest($chunkList) AS c(c)),
       |pairs AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2, l.sig AS s1, r.sig AS s2
       |          FROM blocked l JOIN blocked r
       |            ON l.chunk = r.chunk AND l.key = r.key AND l.doc_id < r.doc_id)
       |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
       |FROM pairs
       |WHERE bit_count(xor(s1, s2)) <= $maxDistance
       |ORDER BY id1, id2""".stripMargin
  }

  // ------------------------------------------------------- embedding cosine

  /** Pairwise cosine near-dups over the embeddings table. Brute-force
    * O(n²/2) pairs — the oracle-checkable baseline; the LSH-bucketed scale
    * path is [[Similarity.lshCosineCandidates]]. */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    // norms precomputed per vector (|N| sqrt-dots), not per pair (|N|²/2);
    // pinned so the norm pass and the embeddings scan happen once, not per
    // cross-join side
    val withNorm = pinned(embeddings.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("norm")))
    val a = withNorm.select(col("vec_id").as("id1"), col("embedding").as("e1"),
      col("norm").as("n1"))
    val b = withNorm.select(col("vec_id").as("id2"), col("embedding").as("e2"),
      col("norm").as("n2"))
    a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .withColumn("cosine",
        graft.functions.FloatVecDot.dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("id1"), col("id2"))
  }

  def embeddingNearDupsOracle(threshold: Double = 0.4): String =
    s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
       |       FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                              CAST(b.embedding AS DOUBLE[])) * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) >= $threshold
       |ORDER BY id1, id2""".stripMargin

  def exactFromDir(spark: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(spark, dir))
  def ngramFromDir(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir))
  def embeddingFromDir(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDups(Tables.embeddings(spark, dir))

  // ------------------------------------------------------- LSH recall eval

  /** LSH RECALL evaluation — the config question every dedup deployment
    * asks before trusting banding at scale: of the TRUE near-dup pairs
    * (exact hashed-shingle Jaccard ≥ threshold over every shingle-sharing
    * pair), how many does the (numHashes, bands) banding surface? Both
    * pipelines run over the SAME pinned hashed-shingle-array stage (one
    * corpus scan, one signature pass), and every LSH-verified pair
    * necessarily shares a shingle, so lsh ⊆ truth structurally —
    * `n_missed = n_true − n_lsh ≥ 0` and precision is 1 by construction;
    * the open quantity is recall, reported as an exact-integer-backed
    * percentage. The analytic expectation for a pair at Jaccard j is
    * 1−(1−j^r)^b (r = numHashes/bands); this gate measures the realized
    * value on the corpus, the same way `ann_recall` prices the IVF tiers
    * against brute truth. At 100 TB the truth side (the Σ|bucket|²
    * shared-shingle self-join) is the expensive anchor — run it on a
    * SAMPLE slice to certify a config, then deploy the banding the gate
    * certified; the LSH side is the production cost. */
  def lshRecall(docs: DataFrame, n: Int = 5, numHashes: Int = 64, bands: Int = 16,
                threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val arrs = pinned(hashedShingleArrays(docs, n))
    val hsh = pinned(arrs.select(col("doc_id"), explode(col("harr")).as("h")))
    val card = arrs.select(col("doc_id"), size(col("harr")).cast("long").as("n_shingles"))
    // truth: every shingle-sharing pair, verified with exact hashed-set
    // Jaccard (the ngramJaccardPairs shape on the hashed representation)
    val a = hsh.select(col("doc_id").as("id1"), col("h"))
    val b = hsh.select(col("doc_id").as("id2"), col("h"))
    val truthCands = a.hint("merge").join(b, Seq("h"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val truth = candidateJaccardHashed(hsh, truthCands, card)
      .filter(col("jaccard") >= threshold)
    // LSH: banding candidates, same exact verification (sigs pinned —
    // the banding self-join reads them from BOTH sides, the minhashLsh
    // rule; unpinned, every run paid a second full signature pass)
    val sigs = pinned(minhashSignaturesArr(arrs, numHashes, seed))
    val cands = minhashLshCandidatesArr(sigs, numHashes, bands)
    val lsh = candidateJaccardHashed(hsh, cands, card)
      .filter(col("jaccard") >= threshold)
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
      .select(col("n_true"), col("n_lsh"),
        (col("n_true") - col("n_lsh")).as("n_missed"),
        when(col("n_true") > 0, graft.functions.StableRound.stableRound(
          col("n_lsh").cast("double") / col("n_true").cast("double") * 100, 4))
          .otherwise(lit(null).cast("double")).as("recall_pct"))
  }

  def lshRecallFromDir(spark: SparkSession, dir: String): DataFrame =
    lshRecall(Tables.documents(spark, dir))

  /** DuckDB twin: truth and LSH recomputed from scratch over the same
    * hashed-shingle relation (`hsh`/`hcard` materialized — each is read
    * by both pipelines), the minhash lanes from the SAME seeded
    * [[hashParams]] generator [[minhashLshOracle]] embeds. */
  def lshRecallOracle(n: Int = 5, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, seed: Long = 42L): String = {
    val p = 2147483647L
    val params = hashParams(numHashes, seed)
    val rows = numHashes / bands
    val minExprs = params.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((ha * ${a % p} + ${b % p}) % $p) AS mh_$i"
    }.mkString(",\n       |           ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => s"mh_$i").mkString(", ")
      s"($b, [$cols])"
    }.mkString(",\n       |             ")
    s"""WITH ${shingleCtesSql("documents", n)},
       |hsh AS MATERIALIZED (SELECT DISTINCT doc_id, ${hash60Sql("shingle")} AS h FROM sh),
       |hcard AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM hsh GROUP BY 1),
       |tinter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
       |           FROM hsh a JOIN hsh b ON a.h = b.h AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |truth AS (SELECT i.id1, i.id2 FROM tinter i
       |          JOIN hcard ca ON i.id1 = ca.doc_id
       |          JOIN hcard cb ON i.id2 = cb.doc_id
       |          WHERE CAST(i.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_common) >= $threshold),
       |ha AS (SELECT doc_id, h % $p AS ha FROM hsh),
       |sig AS (SELECT doc_id,
       |           $minExprs
       |        FROM ha GROUP BY doc_id),
       |banded AS (SELECT doc_id, v.band, v.bucket
       |           FROM sig, LATERAL (VALUES
       |             $bandRows) AS v(band, bucket)),
       |cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |         FROM banded l JOIN banded r
       |           ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
       |linter AS (SELECT c.id1, c.id2, COUNT(*) AS n_common
       |           FROM cand c
       |           JOIN hsh a ON a.doc_id = c.id1
       |           JOIN hsh b ON b.doc_id = c.id2 AND b.h = a.h
       |           GROUP BY 1, 2),
       |lsh AS (SELECT i.id1, i.id2 FROM linter i
       |        JOIN hcard ca ON i.id1 = ca.doc_id
       |        JOIN hcard cb ON i.id2 = cb.doc_id
       |        WHERE CAST(i.n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_common) >= $threshold),
       |t AS (SELECT COUNT(*) AS n_true FROM truth),
       |l AS (SELECT COUNT(*) AS n_lsh FROM lsh)
       |SELECT t.n_true, l.n_lsh, t.n_true - l.n_lsh AS n_missed,
       |       CASE WHEN t.n_true > 0
       |            THEN FLOOR(CAST(l.n_lsh AS DOUBLE) / CAST(t.n_true AS DOUBLE) * 100 * 1e4 + 0.5) / 1e4
       |            ELSE NULL END AS recall_pct
       |FROM t, l""".stripMargin
  }
}
