package graft

import graft.functions.Fingerprint
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup: planted duplicates collapse to min doc_id") {
    val planted = docs.select("doc_id", "text")
      .union(docs.filter(col("doc_id") < 5).select(col("doc_id") + 10000, col("text")))
    val result = Dedup.exact(planted.withColumn("lang", lit("x"))
      .withColumn("source", lit("x")).withColumn("n_chars", length(col("text"))))
    assert(result.filter(col("dup_count") === 2).count() === 5)
    // canonical id is the ORIGINAL (min) id
    assert(result.filter(col("dup_count") === 2 && col("canonical_id") >= 10000).count() === 0)
  }

  test("ngram jaccard pairs are exact set math and symmetric-free") {
    val pairs = Dedup.ngramJaccardPairs(docs).cache()
    assert(pairs.filter(col("id1") >= col("id2")).count() === 0)
    assert(pairs.filter(col("jaccard") > 1.0 || col("jaccard") < 0.5).count() === 0)
  }

  test("minhash-LSH recall: finds every exact-Jaccard pair at threshold 0.5") {
    val exact = Dedup.ngramJaccardPairs(docs, 5, 0.5).select("id1", "id2")
    val lsh = Dedup.minhashLsh(docs).select("id1", "id2")
    val missed = exact.except(lsh).count()
    assert(missed === 0, s"LSH missed $missed of ${exact.count()} true pairs")
  }

  test("fast-hash flag: xxhash64 path keeps full LSH recall") {
    spark.conf.set(Dedup.FastHashConf, "true")
    try {
      // exact string-shingle Jaccard is hash-free, so it is the same truth
      // set under either hash family; the LSH pipeline must still find it
      val exact = Dedup.ngramJaccardPairs(docs, 5, 0.5).select("id1", "id2")
      val lsh = Dedup.minhashLsh(docs).select("id1", "id2")
      assert(exact.except(lsh).count() === 0)
      // and the fast hash is genuinely in effect: signatures differ from
      // the cross-engine hash60 signatures
      // orderBy before limit: an unordered limit(5) may pick DIFFERENT docs
      // on the two sides, proving nothing about the hash families
      val fast = Dedup.minhashSignatures(docs).orderBy("doc_id").limit(5)
        .collect().map(_.toSeq).toSet
      spark.conf.set(Dedup.FastHashConf, "false")
      val slow = Dedup.minhashSignatures(docs).orderBy("doc_id").limit(5)
        .collect().map(_.toSeq).toSet
      assert(fast != slow)
    } finally spark.conf.set(Dedup.FastHashConf, "false")
  }

  test("SimHash60 expression is bit-exact against an independent Scala evaluation") {
    val hashed = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.transform(
        graft.functions.TextFunctions.tokens(col("text")),
        t => Dedup.hash60(t)).as("th"))
      .filter(org.apache.spark.sql.functions.size(col("th")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = Dedup.simhash(docs).orderBy("doc_id").limit(25).collect()
    assert(sigs.nonEmpty)
    for (row <- sigs) {
      val th = hashed(row.getLong(0))
      val sums = new Array[Long](Dedup.SimhashBits)
      for (h <- th; i <- 0 until Dedup.SimhashBits)
        sums(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
      val expected = (0 until Dedup.SimhashBits)
        .filter(sums(_) > 0).map(1L << _).foldLeft(0L)(_ | _)
      assert(row.getLong(1) === expected,
        s"doc ${row.getLong(0)} simhash diverged from the reference math")
    }
  }

  test("MinHashAll expression is bit-exact against an independent Scala evaluation") {
    val p = 2147483647L
    val params = Dedup.hashParams(64, 42L)
    val arrs = Dedup.hashedShingleArrays(docs, 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = Dedup.minhashSignatures(docs).orderBy("doc_id").limit(25).collect()
    assert(sigs.nonEmpty)
    for (row <- sigs) {
      val harr = arrs(row.getLong(0))
      for (i <- 0 until 64) {
        val (a, b) = params(i)
        val expected = harr.map(h => (((h % p) + p) % p * (a % p) + (b % p)) % p).min
        assert(row.getLong(i + 1) === expected,
          s"doc ${row.getLong(0)} mh_$i diverged from the reference math")
      }
    }
  }

  test("pinned-stage lifecycle: releasePinned frees both stages, result survives release") {
    Dedup.releasePinned(spark) // clear anything pinned by earlier tests
    val res = Dedup.minhashLsh(docs)
    val before = res.collect().map(_.toSeq).toSet // action materializes the pinned stages
    // exactly the two shared stages (hashed shingles + signatures) were pinned
    assert(Dedup.releasePinned(spark) === 2)
    assert(Dedup.releasePinned(spark) === 0) // idempotent
    // persist (not localCheckpoint) keeps lineage: a released result is
    // still recomputable — executor loss degrades to recompute, not failure
    assert(res.collect().map(_.toSeq).toSet === before)
    Dedup.releasePinned(spark) // the recompute re-pins nothing new via res itself
  }

  test("simhash: identical docs at distance 0; near-dups at small distance") {
    val base = docs.limit(50)
    val copies = base.select((col("doc_id") + 20000).as("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    val sigs = Dedup.simhash(base.union(copies))
      .withColumn("orig", when(col("doc_id") >= 20000, col("doc_id") - 20000)
        .otherwise(col("doc_id")))
    val grouped = sigs.groupBy("orig").agg(countDistinct("simhash").as("n"))
    assert(grouped.filter(col("n") =!= 1).count() === 0) // identical text → identical sig
  }

  test("simhash near-dup pairs all within max hamming distance") {
    val nd = Dedup.simhashNearDups(docs, maxDistance = 3)
    assert(nd.filter(col("hamming") > 3).count() === 0)
    assert(nd.count() > 0) // the corpus has planted near-dups
  }

  test("hash60 equals the md5-prefix reference (ASCII, non-ASCII, empty)") {
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = d.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val inputs = Seq("hello world", "héllo wörld", "", "日本語 テキスト", "a b c d e")
    val got = inputs.toDF("s")
      .select(col("s"), Dedup.hash60(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) === ref(s), s"hash60 mismatch for '$s'"))
  }

  test("fingerprint expression matches the Scala reference implementation") {
    val sample = docs.limit(20)
      .select(col("text"), Fingerprint.docFingerprint(col("text")).as("fp"))
      .collect()
    sample.foreach { r =>
      assert(r.getLong(1) === Fingerprint.reference(r.getString(0)))
    }
  }

  test("fingerprint: equal text <=> equal fingerprint on this corpus") {
    val fp = docs.select(col("text"), Fingerprint.docFingerprint(col("text")).as("fp"))
    assert(fp.select("fp").distinct().count() === fp.select("text").distinct().count())
  }

  test("corpus_clean: survivors pass quality gate, are canonical, and non-near-dup") {
    val cleaned = graft.operators.CorpusClean(docs).cache()
    assert(cleaned.count() > 0 && cleaned.count() <= docs.count())
    assert(cleaned.filter(col("quality_score") < 0.5).count() === 0)
    // no surviving near-dup pairs among the survivors
    val survivors = docs.join(cleaned.select("doc_id"), Seq("doc_id"))
    val pairs = graft.operators.Dedup.ngramJaccardPairs(survivors, 5, 0.5)
    assert(pairs.count() === 0)
  }

  test("shingles of a doc shorter than n tokens are empty, not bogus") {
    val short = Seq((1L, "one two three", "x", "x", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.Dedup.shingles(short, n = 5).count() === 0)
    // and exactly-n tokens yields exactly one shingle
    val exact = Seq((2L, "a b c d e", "x", "x", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.Dedup.shingles(exact, n = 5).collect()
    assert(got.length === 1 && got(0).getString(1) === "a b c d e")
  }

  test("lsh recall gate: lsh pairs are a subset of truth; recall consistent and non-trivial") {
    val docs = Tables.documents(spark, sf)
    val r = graft.operators.Dedup.lshRecall(docs).collect() match {
      case Array(row) => row
      case other => fail(s"expected one row, got ${other.length}")
    }
    val (nTrue, nLsh) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_lsh"))
    assert(nTrue > 0, "the corpus plants near-dup pairs — truth cannot be empty")
    assert(r.getAs[Long]("n_missed") == nTrue - nLsh)
    assert(nLsh <= nTrue, "every verified LSH pair shares a shingle => lsh ⊆ truth")
    // analytic banding floor: P(detect | j) = 1-(1-j^4)^16 is ~0.65 at the
    // j=0.5 threshold boundary and ~1 above; realized recall on the
    // planted mix must clear the boundary value by a margin
    assert(r.getAs[Double]("recall_pct") >= 64.0,
      s"recall ${r.getAs[Double]("recall_pct")} below the analytic boundary floor")
    // and the n_lsh side must equal the standalone LSH gate's pair count
    assert(nLsh == graft.operators.Dedup.minhashLsh(docs).count())
  }

  test("embedding near-dups: cosine of a vector with itself is 1") {
    val e = Tables.embeddings(spark, sf).limit(10)
    val selfSim = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).first()
    assert(math.abs(selfSim.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(selfSim.getDouble(1) - 1.0) < 1e-12)
  }
}
