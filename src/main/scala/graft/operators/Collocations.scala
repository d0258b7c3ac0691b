package graft.operators

import graft.functions.{StableRound, TextFunctions => TF}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram collocations by pointwise mutual information — the statistical
  * phrase detector (think "new york", "machine learning") behind
  * tokenizer-vocabulary decisions and phrase-aware dedup shingling.
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ), estimated from corpus counts:
  *
  *     pmi = ln( (c_ab · N_u · N_u) / (c_a · c_b · N_b) )
  *
  * computed as ONE ln over a ratio whose factors multiply in a fixed
  * written order on both engines — products and divisions are
  * IEEE-exactly-rounded, so the ln sees bit-identical input; the ln
  * itself may differ in the last ulp across libms, so the score rounds
  * to 9 dp BEFORE ranking (the tfidf idf precedent) and ties break by
  * bigram text.
  *
  * Scale: bigrams and unigrams generate IN-ROW from the one documents
  * scan (sliding windows over filtered tokens, no shuffle); each count
  * table is one partial-aggregated shuffle, collapsing to vocabulary
  * size before the wire; the unigram⋈bigram joins are vocab⋈vocab (AQE
  * picks the strategy from real sizes); the final top-k is a global
  * TakeOrderedAndProject — every partition keeps k rows. minCount
  * prunes the hapax tail before the joins, which at 100 TB is most of
  * the vocabulary.
  */
object Collocations {

  def pmiBigrams(docs: DataFrame, minCount: Int = 3, k: Int = 100): DataFrame = {
    // pinned: the token stage feeds four consumers (the two corpus
    // totals' actions + both count branches) — one scan, not four
    val toks = Pinned.pin(docs.select(TF.tokens(col("text")).as("ts")))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bi = toks.select(explode(TF.shinglesOfTokens(col("ts"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // SUM over zero rows is null — an empty/all-blank corpus must yield
    // an empty result, not an NPE (and not a divide-by-zero NaN rank)
    val nU = Option(uni.agg(sum(col("c_w"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val nB = Option(toks.select(
        sum(greatest(size(col("ts")) - 1, lit(0)).cast("long"))).first().get(0))
      .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
    val parts = split(col("bigram"), " ")
    val pmi = log(
      (col("c_ab").cast("double") * nU * nU) /
        (col("c_a").cast("double") * col("c_b") * nB))
    val base = if (nB > 0) bi else bi.limit(0)
    base.select(col("bigram"), col("c_ab"),
        element_at(parts, 1).as("w1"), element_at(parts, 2).as("w2"))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .select(col("bigram"), col("c_ab"),
        StableRound.stableRound(pmi, 9).as("pmi_r"))
      .orderBy(col("pmi_r").desc, col("bigram").asc)
      .limit(k)
  }

  def fromDir(spark: SparkSession, dir: String): DataFrame =
    pmiBigrams(Tables.documents(spark, dir))

  /** DuckDB twin: same filtered tokenization (the single-sourced rule),
    * same fixed multiply order into one ln, same 9-dp round and
    * tie-break. `w1 w2` splits are exact because tokens contain no
    * spaces by construction. */
  def oracle(minCount: Int = 3, k: Int = 100): String =
    s"""WITH toks AS (
       |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM documents
       |), uni AS (
       |  SELECT w, COUNT(*) AS c_w
       |  FROM toks, LATERAL unnest(ts) AS u(w) GROUP BY 1
       |), bi AS (
       |  SELECT ts[i.i] || ' ' || ts[i.i + 1] AS bigram, COUNT(*) AS c_ab
       |  FROM toks, LATERAL unnest(range(1, len(ts))) AS i(i)
       |  GROUP BY 1 HAVING COUNT(*) >= $minCount
       |), n AS (
       |  SELECT (SELECT CAST(SUM(c_w) AS DOUBLE) FROM uni) AS n_u,
       |         (SELECT CAST(SUM(GREATEST(len(ts) - 1, 0)) AS DOUBLE) FROM toks) AS n_b
       |)
       |SELECT b.bigram, b.c_ab,
       |       FLOOR(LN(((CAST(b.c_ab AS DOUBLE) * n.n_u) * n.n_u)
       |                 / ((CAST(ua.c_w AS DOUBLE) * ub.c_w) * n.n_b)) * 1e9 + 0.5) / 1e9 AS pmi_r
       |FROM bi b
       |CROSS JOIN n
       |JOIN uni ua ON ua.w = string_split(b.bigram, ' ')[1]
       |JOIN uni ub ON ub.w = string_split(b.bigram, ' ')[2]
       |ORDER BY pmi_r DESC, bigram ASC LIMIT $k""".stripMargin
}
