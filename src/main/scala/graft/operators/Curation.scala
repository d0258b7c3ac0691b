package graft.operators

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/quality: packing documents into token-budgeted training
  * shards, and scrubbing train/benchmark contamination.
  *
  * Scale design:
  *   - Shard assignment is a GLOBAL running total of token counts — the
  *     textbook "sequential" operator — computed distributed via
  *     [[ScalableCumsum]] (per-partition sums + broadcast offsets; no
  *     single-partition window anywhere).
  *   - Decontamination is an equi-join on shingles, never a text scan per
  *     pair: the benchmark side is tiny relative to the corpus, so its
  *     distinct shingles broadcast and the 100 TB train side never
  *     shuffles. For a benchmark set too big to broadcast, drop the hint
  *     and the same plan shuffle-joins on the shingle key; at extreme
  *     scale, hash the shingles first ([[Dedup.hashedShingles]]) so the
  *     join key is 8 bytes.
  */
object Curation {

  /** Assign documents (in doc_id order) to training shards of ~`capacity`
    * tokens: a document starts in the shard where its cumulative token
    * count before it landed. Deterministic, integer-exact, and streaming-
    * friendly (shard boundaries depend only on the prefix sums). */
  def shardByTokenBudget(docs: DataFrame, capacity: Long = 20000L): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    ScalableCumsum.withRunningTotal(toks, col("n_tokens"), "cum_tokens", col("doc_id"))
      .withColumn("shard_id", expr(s"(cum_tokens - n_tokens) DIV $capacity"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("shard_id"))
      .orderBy(col("doc_id"))
  }

  def shardOracle(capacity: Long = 20000L): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       |       CAST((cum - n_tokens) // $capacity AS BIGINT) AS shard_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** Remove training documents that share ANY word `n`-gram with the
    * benchmark/eval set — the standard exact-overlap decontamination pass.
    * Returns the surviving train docs. */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 8): DataFrame =
    train
      .join(contaminatedIds(train, eval, n), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** The shared overlap rule: ids of `train` docs sharing ANY word
    * `n`-gram with `eval` (eval shingles broadcast — benchmark suites are
    * small by definition). Single-sourced so [[decontaminate]] and
    * CurateE2e's composed pipeline cannot drift. */
  def contaminatedIds(train: DataFrame, eval: DataFrame, n: Int): DataFrame = {
    // per-doc-distinct kernel shingles on both sides: value-identical
    // (the eval set is corpus-distinct'd anyway; the train side's
    // duplicates were folded by the final DISTINCT doc_id) and the
    // in-row dedup shrinks the broadcast-join input for free
    val evalShingles = eval
      .select(explode(graft.functions.ShingleExprs
        .wordShinglesDistinct(col("text"), n)).as("shingle"))
      .distinct()
    train
      .select(col("doc_id"), explode(graft.functions.ShingleExprs
        .wordShinglesDistinct(col("text"), n)).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"))
      .select(col("doc_id")).distinct()
  }

  /** FUZZY decontamination — the near-dup complement of the exact-overlap
    * pass: a train doc is contaminated if it is MinHash-near-dup of ANY
    * eval doc (paraphrased or lightly-edited benchmark leakage that shares
    * no exact 8-gram). Rides the [[Dedup.minhashLsh]] pipeline verbatim
    * over train ∪ eval, keeping only CROSS pairs — candidate generation is
    * the band-bucket equi-join (never all-pairs), so this is the standard
    * "fuzzy dedup against benchmarks" pass at corpus scale; eval-internal
    * and train-internal pairs are never verified for this purpose.
    * Survivors: train docs in no cross pair. */
  def decontaminateFuzzy(train: DataFrame, eval: DataFrame,
                         threshold: Double = 0.5): DataFrame =
    train.join(fuzzyContaminatedIds(train, eval, threshold),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** The shared fuzzy-overlap rule: ids of `train` docs MinHash-near-dup
    * of ANY eval doc (shingle width `n` — a composed caller screening
    * paraphrase-grade leakage may want it below the dedup default).
    * Single-sourced so [[decontaminateFuzzy]] and CurateE2e's composed
    * pipeline cannot drift. */
  def fuzzyContaminatedIds(train: DataFrame, eval: DataFrame,
                           threshold: Double, n: Int = 5): DataFrame = {
    val tagged = train.select(col("doc_id"), col("text"))
      .unionByName(eval.select(col("doc_id"), col("text")))
    // membership derives from the PASSED eval frame, never an id
    // convention: eval is benchmark-sized by definition, so its id set
    // broadcasts to both pair-side probes (two |eval|-row broadcasts,
    // the 100 TB pair stream never shuffles for the tag)
    val evalIds = eval.select(col("doc_id")).distinct()
    val e1 = evalIds.select(col("doc_id").as("id1"), lit(true).as("ev1"))
    val e2 = evalIds.select(col("doc_id").as("id2"), lit(true).as("ev2"))
    Dedup.minhashLsh(tagged, n = n, threshold = threshold)
      .join(broadcast(e1), Seq("id1"), "left")
      .join(broadcast(e2), Seq("id2"), "left")
      .filter(coalesce(col("ev1"), lit(false)) =!= coalesce(col("ev2"), lit(false)))
      .select(
        when(coalesce(col("ev1"), lit(false)), col("id2")).otherwise(col("id1"))
          .as("doc_id"))
      .distinct()
  }

  /** Gated variant (`decontaminate_fuzzy`): the same every-20th-doc eval
    * split as the exact gate. */
  def decontaminateFuzzyFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminateFuzzy(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))
  }

  /** DuckDB twin: the full [[Dedup.minhashLshOracle]] pipeline as a
    * subquery, restricted to cross pairs by its pairFilter, the train
    * member of each pair dropped. */
  def decontaminateFuzzyOracle(threshold: Double = 0.5): String =
    s"""WITH bad AS (
       |  SELECT DISTINCT CASE WHEN id1 % 20 <> 0 THEN id1 ELSE id2 END AS doc_id
       |  FROM (
       |${Dedup.minhashLshOracle(threshold = threshold,
           pairFilter = Some("(i.id1 % 20 = 0) <> (i.id2 % 20 = 0)"))}
       |  )
       |)
       |SELECT d.doc_id, d.n_chars FROM documents d
       |LEFT JOIN bad b ON d.doc_id = b.doc_id
       |WHERE d.doc_id % 20 <> 0 AND b.doc_id IS NULL
       |ORDER BY d.doc_id""".stripMargin

  /** The decontamination AUDIT artifact — what a data team publishes
    * alongside the scrub: per benchmark doc, how many train docs share
    * an exact `n`-gram with it and how many distinct n-grams leak. Eval
    * docs with zero leakage stay visible (0 rows are the point of an
    * audit). Same join shape as [[contaminatedIds]]: eval shingles
    * broadcast, the corpus side never shuffles its text. */
  def decontaminationReport(train: DataFrame, eval: DataFrame,
                            n: Int = 8): DataFrame = {
    val esh = eval
      .select(col("doc_id").as("eval_id"),
        explode(TextFunctions.wordShingles(col("text"), n)).as("shingle"))
      .distinct()
    // NO distinct on the corpus side: the downstream countDistinct already
    // dedups, and a pre-join distinct would shuffle every (doc_id,
    // shingle) pair of the corpus before the broadcast join
    val tsh = train
      .select(col("doc_id"), explode(TextFunctions.wordShingles(col("text"), n))
        .as("shingle"))
    val stats = tsh.join(broadcast(esh), Seq("shingle"))
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("doc_id")).as("n_leaking_train_docs"),
        countDistinct(col("shingle")).as("n_leaked_shingles"))
    eval.select(col("doc_id").as("eval_id"))
      .join(stats, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_leaking_train_docs"), lit(0L)).as("n_leaking_train_docs"),
        coalesce(col("n_leaked_shingles"), lit(0L)).as("n_leaked_shingles"))
      .orderBy(col("eval_id"))
  }

  /** Gated variant: the decontaminate gate's %20 eval convention. */
  def reportFromDir(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminationReport(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), n)
  }

  /** DuckDB twin: the decontaminate oracle's shingle CTEs with eval_id
    * carried, grouped per eval doc, zero-leak docs kept via LEFT JOIN. */
  def reportOracle(n: Int = 8): String =
    s"""WITH evals AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
       |train AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
       |etoks AS (SELECT doc_id AS eval_id, string_split(text, ' ') AS a FROM evals),
       |esh AS (SELECT DISTINCT eval_id, ${Dedup.shingleSliceSql(n)} AS shingle
       |        FROM etoks, ${Dedup.shingleLateralSql(n)}),
       |ttoks AS (SELECT doc_id, string_split(text, ' ') AS a FROM train),
       |tsh AS (SELECT DISTINCT doc_id, ${Dedup.shingleSliceSql(n)} AS shingle
       |        FROM ttoks, ${Dedup.shingleLateralSql(n)}),
       |stats AS (
       |  SELECT e.eval_id, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_leaking_train_docs,
       |         CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_leaked_shingles
       |  FROM tsh t JOIN esh e ON t.shingle = e.shingle
       |  GROUP BY e.eval_id
       |)
       |SELECT ev.doc_id AS eval_id,
       |       COALESCE(s.n_leaking_train_docs, 0) AS n_leaking_train_docs,
       |       COALESCE(s.n_leaked_shingles, 0) AS n_leaked_shingles
       |FROM evals ev LEFT JOIN stats s ON ev.doc_id = s.eval_id
       |ORDER BY eval_id""".stripMargin

  /** Gated variant: every 20th doc_id plays the held-out benchmark set. */
  def decontaminateFromDir(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), n)
  }

  def decontaminateOracle(n: Int = 8): String =
    s"""WITH eval AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
       |train AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
       |etoks AS (SELECT string_split(text, ' ') AS a FROM eval),
       |esh AS (SELECT DISTINCT ${Dedup.shingleSliceSql(n)} AS shingle
       |        FROM etoks, ${Dedup.shingleLateralSql(n)}),
       |ttoks AS (SELECT doc_id, string_split(text, ' ') AS a FROM train),
       |tsh AS (SELECT DISTINCT doc_id, ${Dedup.shingleSliceSql(n)} AS shingle
       |        FROM ttoks, ${Dedup.shingleLateralSql(n)}),
       |bad AS (SELECT DISTINCT t.doc_id FROM tsh t JOIN esh e ON t.shingle = e.shingle)
       |SELECT tr.doc_id, tr.n_chars FROM train tr
       |LEFT JOIN bad b ON tr.doc_id = b.doc_id
       |WHERE b.doc_id IS NULL
       |ORDER BY tr.doc_id""".stripMargin

  def shardFromDir(spark: SparkSession, dir: String): DataFrame =
    shardByTokenBudget(Tables.documents(spark, dir))

  /** Per-source quota sampling: keep at most `k` documents per source,
    * picked by a STABLE content-hash rank — a deterministic "random"
    * sample (re-runs, retries, and both engines agree), the standard way
    * to cap an over-represented crawl source in a training mix.
    *
    * Scale: a per-source window with a rank-≤-k filter — Spark plans it as
    * `WindowGroupLimit`, so each partition keeps only its local top-k per
    * source BEFORE the window exchange (the same partial-top-k push-down
    * q3's rank join uses); state per task is O(k), never O(group). */
  def sourceQuota(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(Dedup.hash60(col("text")), col("doc_id"))
    docs
      .withColumn("qrank", row_number().over(w).cast("long"))
      .filter(col("qrank") <= k)
      .select(col("doc_id"), col("source"), col("qrank"))
      .orderBy(col("source"), col("qrank"))
  }

  def sourceQuotaOracle(k: Int = 10): String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |             ORDER BY ${Dedup.hash60Sql("text")}, doc_id) AS qrank
       |  FROM documents
       |)
       |SELECT doc_id, source, CAST(qrank AS BIGINT) AS qrank
       |FROM ranked WHERE qrank <= $k
       |ORDER BY source, qrank""".stripMargin

  def sourceQuotaFromDir(spark: SparkSession, dir: String): DataFrame =
    sourceQuota(Tables.documents(spark, dir))

  /** Weighted mixture sampling: keep each document with a per-source
    * probability, decided by its CONTENT hash against an integer
    * threshold — the deterministic Bernoulli that pretraining mixes use
    * for source weighting. Same doc → same verdict on every run, every
    * engine, every retry; changing one source's weight never reshuffles
    * another source's sample.
    *
    * `thresholds` maps source → keep-numerator out of 1e6. Scale: a
    * scan-fused filter (hash + one integer compare per row), zero
    * shuffles; the thresholds join is a broadcast of |sources| rows. */
  def mixtureSample(docs: DataFrame, thresholds: DataFrame): DataFrame =
    docs
      .join(broadcast(thresholds), Seq("source"))
      .filter(pmod(Dedup.hash60(col("text")), lit(1000000L)) < col("keep_ppm"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Gated variant: source "srcN" keeps ((N % 5) + 1) × 150000 ppm —
    * weights 15%..75% derived from the source name on both engines. */
  def mixtureSampleFromDir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val thresholds = docs.select(col("source")).distinct()
      .withColumn("keep_ppm",
        (substring(col("source"), 4, 10).cast("long") % 5L + 1L) * 150000L)
    mixtureSample(docs, thresholds)
  }

  def mixtureSampleOracle: String =
    s"""SELECT doc_id, source, n_chars
       |FROM documents
       |WHERE ${Dedup.hash60Sql("text")} % 1000000
       |      < (CAST(substr(source, 4) AS BIGINT) % 5 + 1) * 150000
       |ORDER BY doc_id""".stripMargin

  /** Separator between documents packed into one training sequence. */
  val DocSeparator = " <eod> "

  /** Pack each token-budget shard into ONE training sequence: the shard's
    * documents concatenated in doc_id order with [[DocSeparator]] — the
    * final assembly step after [[shardByTokenBudget]]. The gate surface
    * carries the packed text's 60-bit content hash rather than the text
    * itself (megabytes per shard at scale have no business in a result
    * row; the hash still pins every byte cross-engine).
    *
    * Scale: one shuffle on shard_id; each group is ≤ capacity tokens by
    * construction, so per-task assembly state is budget-bounded. */
  def packShards(docs: DataFrame, capacity: Long = 20000L): DataFrame = {
    val shards = shardByTokenBudget(docs, capacity)
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
    docs.select(col("doc_id"), col("text"))
      .join(shards, Seq("doc_id"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        // array_sort on (doc_id, text) structs orders by doc_id — a
        // deterministic concat regardless of shuffle arrival order
        Dedup.hash60(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text")),
          DocSeparator)).as("packed_h"))
      .orderBy(col("shard_id"))
  }

  def packShardsOracle(capacity: Long = 20000L): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t
       |), sh AS (
       |  SELECT doc_id, n_tokens, (cum - n_tokens) // $capacity AS shard_id FROM c
       |)
       |SELECT CAST(s.shard_id AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       |       CAST(SUM(s.n_tokens) AS BIGINT) AS shard_tokens,
       |       ${Dedup.hash60Sql(s"string_agg(d.text, '$DocSeparator' ORDER BY d.doc_id)")} AS packed_h
       |FROM sh s JOIN documents d USING (doc_id)
       |GROUP BY s.shard_id ORDER BY shard_id""".stripMargin

  def packShardsFromDir(spark: SparkSession, dir: String): DataFrame =
    packShards(Tables.documents(spark, dir))

  /** Deterministic training-order shuffle — the LAST step a data pipeline
    * runs before the trainer reads shards. Each doc's position key is the
    * 60-bit content hash of `seed || text` (ties → doc_id): a seeded
    * global permutation that is CONTENT-ADDRESSED (doc_id renumbering
    * cannot reorder the corpus), reproducible on both engines, and
    * source-INTERLEAVING by construction — the hash ignores `source`, so
    * consecutive positions mix sources instead of replaying crawl batches
    * as the doc_id order does (no shard is a single-source run; the gate
    * surface carries per-shard distinct-source counts as evidence).
    *
    * Composed with the [[packShards]] assembly: token-budget shards are
    * cut along the SHUFFLED order via the same distributed prefix sum
    * ([[ScalableCumsum]] — range exchange + broadcast offsets, no
    * single-partition sort anywhere), and each shard packs its docs in
    * shuffled order, pinned cross-engine by the packed content hash. */
  def corpusShuffle(docs: DataFrame, seed: Long = 13L,
                    capacity: Long = 20000L): DataFrame = {
    // the permutation + prefix sum run over NARROW rows (id, source, key,
    // tokens — text is hashed in the scan, never carried): the cumsum
    // machinery's range/pid exchanges move ~32 bytes/doc, and text is
    // shuffled exactly once, into the pack join — the packShards shape
    // (executed-plan check: the r13 first cut carried text through three
    // exchanges; at 100 TB that is the difference between shuffling the
    // corpus once and three times)
    val keyed = docs.select(col("doc_id"), col("source"),
      Dedup.hash60(concat(lit(s"shuffle_$seed|"), col("text"))).as("pos_key"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val sharded = ScalableCumsum.withRunningTotal(keyed, col("n_tokens"),
        "cum_tokens", col("pos_key"), col("doc_id"))
      .withColumn("shard_id", expr(s"(cum_tokens - n_tokens) DIV $capacity"))
      .select(col("doc_id"), col("source"), col("pos_key"),
        col("n_tokens"), col("shard_id"))
    docs.select(col("doc_id"), col("text"))
      .join(sharded, Seq("doc_id"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        countDistinct(col("source")).as("n_sources"),
        // struct sort on (pos_key, doc_id, text): deterministic shuffled
        // order within the shard regardless of shuffle arrival order
        Dedup.hash60(array_join(
          transform(array_sort(collect_list(
            struct(col("pos_key"), col("doc_id"), col("text")))),
            s => s.getField("text")),
          DocSeparator)).as("packed_h"))
      .orderBy(col("shard_id"))
  }

  def corpusShuffleFromDir(spark: SparkSession, dir: String): DataFrame =
    corpusShuffle(Tables.documents(spark, dir))

  /** DuckDB twin: one window over the same (pos_key, doc_id) permutation;
    * the packed hash aggregates in the same shuffled order. */
  def corpusShuffleOracle(seed: Long = 13L, capacity: Long = 20000L): String =
    s"""WITH t AS (
       |  SELECT doc_id, text, source,
       |         ${Dedup.hash60Sql(s"'shuffle_$seed|' || text")} AS pos_key,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, text, source, pos_key, n_tokens,
       |         SUM(n_tokens) OVER (ORDER BY pos_key, doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t
       |), sh AS (
       |  SELECT *, (cum - n_tokens) // $capacity AS shard_id FROM c
       |)
       |SELECT CAST(shard_id AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |       ${Dedup.hash60Sql(
             s"string_agg(text, '$DocSeparator' ORDER BY pos_key, doc_id)")} AS packed_h
       |FROM sh GROUP BY shard_id ORDER BY shard_id""".stripMargin
}
