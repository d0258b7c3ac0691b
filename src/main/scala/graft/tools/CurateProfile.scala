package graft.tools

import graft.GraftSession
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level wall profile of the curation DAG (corpus_curate_e2e and
  * siblings) — guide §1's "find where the time goes" loop, expressed as
  * separately-timed noop materializations of each stage prefix.
  *
  * Usage: runMain graft.tools.CurateProfile [sfDir] [reps]
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get("graft-curate-profile")
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
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)

    time("scan_only")(train.select(col("doc_id"), col("text")))
    time("quality_scored") {
      train.withColumn("quality_score",
          graft.functions.TextFunctions.qualityScore(col("text")))
        .filter(col("quality_score") >= 0.5)
    }
    time("canonical_groupby") {
      train.withColumn("quality_score",
          graft.functions.TextFunctions.qualityScore(col("text")))
        .filter(col("quality_score") >= 0.5)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("quality_score")).as("quality_score"))
    }
    time("ngram_pairs_of_canonical") {
      val canonical = train.withColumn("quality_score",
          graft.functions.TextFunctions.qualityScore(col("text")))
        .filter(col("quality_score") >= 0.5)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("quality_score")).as("quality_score"))
      Dedup.ngramJaccardPairs(canonical.select(col("doc_id"), col("text")), 5, 0.5)
    }
    time("corpus_clean_full")(CorpusClean(train))
    time("clean_join_text") {
      CorpusClean(train).join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    }
    time("decon_ids_only") {
      val cleaned = CorpusClean(train)
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      Curation.contaminatedIds(cleaned, eval, 8)
    }
    time("clean_and_decon") {
      val cleaned = CorpusClean(train)
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      cleaned.join(Curation.contaminatedIds(cleaned, eval, 8), Seq("doc_id"), "left_anti")
    }
    time("curate_e2e_full")(CurateE2e.curate(train, eval))
    spark.stop()
  }
}
