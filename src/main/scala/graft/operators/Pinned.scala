package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared-stage pinning: persist a DataFrame that multiple plan branches
  * read, so the branches share ONE computation instead of each re-deriving
  * the stage from the raw input (ReuseExchange cannot be relied on for
  * this — per-branch column pruning makes the post-optimization subtrees
  * differ, so reuse rarely fires).
  *
  * Lifecycle: `persist(MEMORY_AND_DISK)`, LAZY and with full lineage — not
  * `localCheckpoint`, whose truncated lineage turns executor loss (e.g.
  * dynamic allocation) into a failed job and whose eager materialization
  * runs work before the consuming action. Every pinned stage is tracked per
  * session with a monotonic tag; callers release the blocks after the
  * action that consumed the result with [[release]] (Bench/Verify do
  * exactly that per query). Mid-computation releases SCOPE themselves with
  * a [[marker]] + [[releaseSince]] pair, so an operator frees exactly the
  * pins its own pipeline created and a composite caller's earlier pins
  * survive (pre-round-9 `releaseOthers` freed the whole session's pins —
  * correct for the gated queries, a silent multi-scan regression for any
  * caller composing around them). A released result stays valid — lineage
  * is intact, so a re-run simply recomputes. */
object Pinned {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession, java.util.concurrent.ConcurrentLinkedQueue[(Long, DataFrame)]]()

  def pin(stage: DataFrame): DataFrame = {
    val p = stage.persist(StorageLevel.MEMORY_AND_DISK)
    track(p)
  }

  /** Register an ALREADY-persisted frame for release without re-persisting
    * it (e.g. the surviving round of an iterative computation). */
  def track(stage: DataFrame): DataFrame = {
    registry.computeIfAbsent(
      stage.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[(Long, DataFrame)]())
      .add((seq.incrementAndGet(), stage))
    stage
  }

  /** A point-in-time token: pins created AFTER this call can be freed as a
    * group with [[releaseSince]], leaving earlier pins (a composite
    * caller's own stages) untouched. */
  def marker(spark: SparkSession): Long = seq.get()

  /** Unpersist every stage pinned in `spark` AFTER `m` except `keep`
    * (which stay tracked for the eventual [[release]]). For iterative
    * consumers that distill corpus-scale pinned upstream stages into a
    * small materialized one (e.g. connected components' edge list): once
    * the small stage's blocks exist, the upstream pins only crowd the
    * storage pool for the rest of the computation. A released stage stays
    * valid and recomputes from lineage if re-read. */
  def releaseSince(spark: SparkSession, m: Long, keep: Seq[DataFrame]): Int = {
    val buf = registry.get(spark)
    if (buf == null) 0
    else {
      var n = 0
      val it = buf.iterator()
      while (it.hasNext) {
        val (tag, df) = it.next()
        if (tag > m && !keep.exists(_ eq df)) {
          it.remove()
          df.unpersist(blocking = false)
          n += 1
        }
      }
      n
    }
  }

  /** Session-wide [[releaseSince]] (every pin regardless of age, except
    * `keep`) — for callers that own ALL the session's live pins, true for
    * the gated queries. Composite operators should scope with
    * [[marker]]/[[releaseSince]] instead. */
  def releaseOthers(spark: SparkSession, keep: Seq[DataFrame]): Int =
    releaseSince(spark, Long.MinValue, keep)

  /** Unpersist every stage pinned in `spark` since the last release; call
    * after the action consuming the result. Safe when nothing is pinned.
    * Returns the number of stages released. */
  def release(spark: SparkSession): Int = {
    val buf = registry.remove(spark)
    if (buf == null) 0
    else {
      var n = 0
      buf.forEach { case (_, df) => df.unpersist(blocking = false); n += 1 }
      n
    }
  }
}
