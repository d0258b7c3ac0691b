package graft

import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("token stats: counts are positive and distinct <= total") {
    val stats = TextAnalysis.tokenStats(docs)
    assert(stats.filter(col("n_tokens") <= 0).count() === 0)
    assert(stats.filter(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
  }

  test("quality score stays in [0,1]") {
    val q = TextAnalysis.quality(docs)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
  }

  test("langid identifies planted multilingual sentences") {
    val planted = Seq(
      (1L, "the cat sat on the mat and it was happy in the sun", "en"),
      (2L, "le chat est dans la maison et il est dans le jardin", "fr"),
      (3L, "der hund ist ein gutes tier und die katze ist nicht da", "de"),
      (4L, "el perro es un animal y la casa es de los padres que", "es"),
      (5L, "spark catalyst tungsten shuffle partition broadcast", "und"),
      (6L, "中文文本处理", "zh")
    ).toDF("doc_id", "text", "expected")
    val got = TextAnalysis.langId(planted.withColumn("lang", col("expected")))
    assert(got.filter(col("predicted_lang") =!= col("labeled_lang")).count() === 0)
  }

  test("multimodal: metadata is expression-level and md5 stable") {
    val meta = Multimodal.metaFromDir(spark, sf).cache()
    assert(meta.count() === docs.count())
    assert(meta.filter(length(col("content_md5")) =!= 32).count() === 0)
    assert(meta.filter(col("byte_length") <= 0).count() === 0)
  }

  test("multimodal: stub feature extraction is deterministic with fixed shape") {
    val f1 = Multimodal.extractFeatures(Multimodal.asBinaryPayloads(docs.limit(50)))
    val f2 = Multimodal.extractFeatures(Multimodal.asBinaryPayloads(docs.limit(50)))
    assert(f1.filter(size(col("features")) =!= Multimodal.featureDim).count() === 0)
    assert(f1.exceptAll(f2).count() === 0)
  }

  test("multimodal: identical payloads are exact feature near-dups") {
    val dup = docs.limit(5)
    val both = dup.union(dup.select(col("doc_id") + 5000, col("text"),
      col("lang"), col("source"), col("n_chars")))
    val nd = Multimodal.featureNearDups(both, threshold = 0.999999)
    // each of the 5 planted (orig, copy) pairs must appear
    assert(nd.filter(col("id2") === col("id1") + 5000).count() === 5)
  }
}
