package graft.tools

import graft.GraftSession
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level wall profile of ClusterStore.append's delta-pair
  * discovery (the dominant lap of cluster_append / corpus_split_append /
  * corpus_diff_recurate) — guide §1 measurement before touching the join.
  *
  * Usage: runMain graft.tools.AppendProfile [sfDir] [reps]
  */
object AppendProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get("graft-append-profile")
    def time(label: String)(f: => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        f.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Pinned.release(spark)
        spark.sharedState.cacheManager.clearCache()
        println(f"[profile] $label%-28s rep$i $secs%7.2fs")
      }
    }
    val docs = Tables.documents(spark, dir)
    val oldDocs = docs.filter(col("doc_id") % DedupIndex.DeltaMod =!= 0)
    val newDocs = docs.filter(col("doc_id") % DedupIndex.DeltaMod === 0)
    def oldSh = Dedup.shingleArrays(oldDocs, 5)
      .select(col("doc_id"), explode(col("sharr")).as("shingle"))
    def newShOf(arrs: DataFrame) =
      arrs.select(col("doc_id"), explode(col("sharr")).as("shingle"))

    time("old_scan_only")(oldDocs.select(col("doc_id"), col("text")))
    time("old_token_explode") {
      oldDocs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    }
    time("old_shingles_no_distinct") {
      oldDocs.select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 5).as("sharr"))
    }
    time("old_shingle_arrays") {
      Dedup.shingleArrays(oldDocs, 5)
    }
    time("old_shingle_explode")(oldSh)
    time("new_shingle_explode")(newShOf(Dedup.shingleArrays(newDocs, 5)))
    time("cross_join") {
      val newArrs = Pinned.pin(Dedup.shingleArrays(newDocs, 5))
      oldSh.select(col("shingle"), col("doc_id").as("oid"))
        .join(newShOf(newArrs).select(col("shingle"), col("doc_id").as("nid")),
          Seq("shingle"))
        .filter(col("oid") =!= col("nid"))
        .select(least(col("oid"), col("nid")).as("id1"),
          greatest(col("oid"), col("nid")).as("id2"))
    }
    time("cross_join_semi_prefiltered") {
      val newArrs = Pinned.pin(Dedup.shingleArrays(newDocs, 5))
      val newSh = newShOf(newArrs)
      val deltaShingles = newSh.select(col("shingle")).distinct()
      oldSh.join(broadcast(deltaShingles), Seq("shingle"), "left_semi")
        .select(col("shingle"), col("doc_id").as("oid"))
        .join(newSh.select(col("shingle"), col("doc_id").as("nid")), Seq("shingle"))
        .filter(col("oid") =!= col("nid"))
        .select(least(col("oid"), col("nid")).as("id1"),
          greatest(col("oid"), col("nid")).as("id2"))
    }
    time("within_self_join") {
      val newArrs = Pinned.pin(Dedup.shingleArrays(newDocs, 5))
      val newSh = newShOf(newArrs)
      val l = newSh.select(col("shingle"), col("doc_id").as("id1"))
      val r = newSh.select(col("shingle"), col("doc_id").as("id2"))
      l.hint("merge").join(r, Seq("shingle"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
    }
    spark.stop()
  }
}
