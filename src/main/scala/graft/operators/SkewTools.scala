package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles most
  * skew at runtime; explicit salting remains necessary when one build-side
  * key is hot enough that even a split partition overwhelms a task, or when
  * AQE is unavailable (streaming joins). Classic scheme:
  *
  *   left (large, skewed):  salt = pmod(rand-ish hash, S)  — one row keeps
  *                          one salt
  *   right (smaller):       exploded ×S, one copy per salt value
  *
  * so the hot key's rows spread across S tasks. The salt derives from a
  * deterministic hash of non-key columns (not `rand()` — retries/AQE replays
  * must see stable salts).
  */
object SkewTools {

  /** Salted inner equi-join of `left` and `right` on `key`. `salts` spreads
    * each key across that many shuffle partitions; `saltSource` picks the
    * deterministic per-row entropy on the left (default: the whole row). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 saltSource: Option[Column] = None): DataFrame = {
    val entropy = saltSource.getOrElse(struct(left.columns.map(col).toIndexedSeq: _*))
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(entropy), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe exact distinct count per key, as an explicit two-phase plan:
    * phase 1 dedups on (key, member) — the shuffle spreads a hot key across
    * partitions by member, the map-side partial agg collapses repeats —
    * and phase 2 counts survivors per key. This is the shape that stays
    * safe when ONE key holds most of the table (where a naive
    * `groupBy(key).agg(countDistinct)` would still work, but any
    * collect_set-style rewrite would not): no stage ever holds a hot key's
    * member set in one task. */
  def exactDistinctByKey(df: DataFrame, key: String, member: String,
                         resultName: String): DataFrame =
    // count(member) skips the NULL row a (key, NULL) pair leaves after the
    // dedup — matching SQL COUNT(DISTINCT member) exactly, INCLUDING a key
    // whose members are all NULL (it stays in the output with count 0; a
    // pre-dedup isNotNull filter would drop that key entirely)
    df.select(col(key), col(member))
      .distinct()
      .groupBy(col(key)).agg(count(col(member)).as(resultName))

  /** Gated query: distinct users per event type over the events table
    * (event_type has single-digit cardinality — exactly the hot-key shape
    * the two-phase plan is for). */
  def distinctUsersFromDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    exactDistinctByKey(graft.sources.Tables.events(spark, dir),
      "event_type", "user_id", "n_users")
      .orderBy(col("event_type"))

  val distinctUsersOracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
