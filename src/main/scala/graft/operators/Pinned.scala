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
  * session; callers release the blocks after the action that consumed the
  * result with [[release]] (Bench/Verify do exactly that per query), so
  * long-lived sessions do not accumulate cached blocks across calls. A
  * released result stays valid — lineage is intact, so a re-run simply
  * recomputes. */
object Pinned {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[
      SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  def pin(stage: DataFrame): DataFrame = {
    val p = stage.persist(StorageLevel.MEMORY_AND_DISK)
    track(p)
  }

  /** Register an ALREADY-persisted frame for release without re-persisting
    * it (e.g. the surviving round of an iterative computation). */
  def track(stage: DataFrame): DataFrame = {
    registry.computeIfAbsent(
      stage.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(stage)
    stage
  }

  /** Unpersist every pinned stage EXCEPT `keep` (which stay tracked for
    * the eventual [[release]]). For iterative consumers that distill a
    * corpus-scale pinned stage into a small materialized one (e.g.
    * connected components' edge list): once the small stage's blocks
    * exist, the corpus-scale upstream pins only crowd the storage pool
    * for the rest of the computation. Session-scoped like [[release]] —
    * callers must own the session's live pins (true for the gated
    * queries, which release everything per query anyway); a released
    * stage stays valid and recomputes from lineage if re-read. */
  def releaseOthers(spark: SparkSession, keep: Seq[DataFrame]): Int = {
    val buf = registry.remove(spark)
    if (buf == null) 0
    else {
      var n = 0
      buf.forEach { df =>
        if (keep.exists(_ eq df)) track(df)
        else { df.unpersist(blocking = false); n += 1 }
      }
      n
    }
  }

  /** Unpersist every stage pinned in `spark` since the last release; call
    * after the action consuming the result. Safe when nothing is pinned.
    * Returns the number of stages released. */
  def release(spark: SparkSession): Int = {
    val buf = registry.remove(spark)
    if (buf == null) 0
    else {
      var n = 0
      buf.forEach { df => df.unpersist(blocking = false); n += 1 }
      n
    }
  }
}
