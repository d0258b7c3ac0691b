package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Settle the JVM between measurements so one query's residue doesn't
    // tax the next one's number. Round 6 proved this matters: the six
    // queries alphabetically before dedup_delta_lsh read 1.7–2.7× slower
    // in-suite than in isolation — residual state-store providers +
    // maintenance thread from the streaming replays and heap pressure from
    // the index build, not plan regressions. The settle is OUTSIDE the
    // timed window.
    def settle(): Unit = {
      graft.operators.Dedup.releasePinned(spark) // pinned persisted stages
      org.apache.spark.sql.graftshim.GraftShims.stopStateStores()
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
    }

    // a failed query reports -1.0 and is excluded from the total; it is
    // also listed under "failed" and fails the process — wall time of a
    // partial query set must not read as a valid (smaller!) measurement
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        // noop write, not count(): count() lets EliminateSorts drop each
        // query's final global sort, flattering DataFrame-native queries
        // while q3 (whose sort sits above an RDD boundary the optimizer
        // can't see through) paid it in full. The noop sink materializes
        // every output row uniformly.
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0
      } finally settle()
    }

    // SPARK_GRAFT_ONLY=q1_agg_orders,sessions narrows the run for local
    // iteration; the driver never sets it, so round benches stay complete.
    // Unknown names abort — a typo'd filter would otherwise measure ZERO
    // queries and print total=0 as if it were a (spectacular) result.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      require(o.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm-up pass: JIT + codegen compilation + file-listing caches; the
    // measured pass reflects steady-state throughput (set
    // SPARK_GRAFT_WARMUP=0 for cold numbers)
    (1 to warmups).foreach(_ => names.foreach(once))
    val results0 = names.map(n => n -> once(n))

    // dedup_delta_lsh's index build is memoized per JVM (DedupIndex.
    // buildIndexFor), so with a warmup pass the measured entry above times
    // the DELTA PATH alone — the number that shows the incremental index
    // earning its keep (round 6 bundled a 30 s build into it, hiding the
    // delta cost entirely). The one-time build is measured HERE as its own
    // phase against a fresh directory, so both costs stay visible. (With
    // SPARK_GRAFT_WARMUP=0 the delta entry is cold and includes the
    // memoized build — an honest cold number.)
    val results =
      if (!names.contains("dedup_delta_lsh")) results0
      else {
        val t0 = System.nanoTime()
        val buildT =
          try {
            val tmp = java.nio.file.Files.createTempDirectory("graft_bench_idx")
            try {
              graft.operators.DedupIndex.write(
                graft.sources.Tables.documents(spark, sfDir)
                  .filter(org.apache.spark.sql.functions.col("doc_id")
                    % graft.operators.DedupIndex.DeltaMod =!= 0),
                tmp.toString)
              (System.nanoTime() - t0) / 1e9
            } finally {
              java.nio.file.Files.walk(tmp)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(p => java.nio.file.Files.deleteIfExists(p))
            }
          } catch {
            case e: Throwable => System.err.println(s"[bench] dedup_index_build: $e"); -1.0
          } finally settle()
        results0 :+ ("dedup_index_build" -> buildT)
      }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // the driver greps the sbt tail for the metric JSON and rounds 1-2
    // failed to parse it out of sbt's [info]-prefixed log noise — persist
    // it to bench.json (best-effort: a read-only cwd must not void the
    // measurement), and emit the bare line LAST on BOTH stdout and stderr
    // (sbt prefixes stdout with "[info] "; stderr passes through bare)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
    catch { case e: java.io.IOException => System.err.println(s"[bench] bench.json write failed: $e") }
    spark.stop()
    println(json)
    System.err.println(json)
    if (failed.nonEmpty) sys.exit(1)
  }
}
