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

    // per-measurement GC/heap telemetry (stderr only): round 7 showed one
    // query absorbing ~16 s in-suite that vanished in isolation — these
    // lines make any future absorption attributable (GC debt vs plan cost)
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcStats(): (Long, Long) = {
      var c = 0L; var t = 0L
      gcBeans.forEach { b => c += b.getCollectionCount; t += b.getCollectionTime }
      (c, t)
    }

    // a failed query reports -1.0 and is excluded from the total; it is
    // also listed under "failed" and fails the process — wall time of a
    // partial query set must not read as a valid (smaller!) measurement
    def once(name: String): Double = {
      val (c0, g0) = gcStats()
      val t0 = System.nanoTime()
      try {
        // noop write, not count(): count() lets EliminateSorts drop each
        // query's final global sort, flattering DataFrame-native queries
        // while q3 (whose sort sits above an RDD boundary the optimizer
        // can't see through) paid it in full. The noop sink materializes
        // every output row uniformly.
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val (c1, g1) = gcStats()
        val rt = Runtime.getRuntime
        System.err.println(f"[bench] $name $secs%.2fs gc+${c1 - c0} " +
          f"${g1 - g0}ms heap ${(rt.totalMemory - rt.freeMemory) >> 20}MiB")
        secs
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
    // MemoryStream replay gates: their time is the replay harness (10+
    // sequential micro-batches through a stateful query), not a plan —
    // warming them or measuring them twice burns minutes of wall for no
    // regression signal, so they run exactly once, after warmup. The set
    // lives NEXT TO the query registration (SparkEntry) so a new replay
    // gate cannot be added without seeing it.
    val planNames = names.filterNot(SparkEntry.replayHarnessQueries)
    // warm-up pass: JIT + codegen compilation + file-listing caches; the
    // measured pass reflects steady-state throughput (set
    // SPARK_GRAFT_WARMUP=0 for cold numbers)
    (1 to warmups).foreach(_ => planNames.foreach(once))
    // TWO measured passes, per-query MIN: round 7's last attribution
    // artifact was the first heavy query after warmup absorbing ~16 s of
    // deferred JVM debt (in-suite 19.15 s vs 3.05 s isolated, identical
    // method) — a one-off absorption lands in one pass, not both, so the
    // min is the number that tracks the PLAN and stays regression-
    // sensitive. Cold mode keeps a single pass (the first run IS the
    // cold measurement).
    val passes =
      if (warmups == 0) 1
      else {
        val p = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2")
        require(p.toIntOption.exists(_ >= 1),
          s"SPARK_GRAFT_PASSES must be a positive integer, got '$p'")
        p.toInt
      }
    val byPass = (1 to passes).map { p =>
      val ns = if (p == 1) names else planNames
      val r = ns.map(n => n -> once(n)).toMap
      System.err.println(s"[bench] pass $p/$passes: " + ns.map(n =>
        f"$n=${r(n)}%.2f").mkString(" "))
      r
    }
    // a query that failed in ANY pass it ran in is reported failed — the
    // min must never paper over an intermittent crash (a pass-1 success +
    // pass-2 OOM is a real defect, not a measurement to keep)
    val results0 = names.map { n =>
      val vs = byPass.flatMap(_.get(n))
      n -> (if (vs.isEmpty || vs.exists(_ < 0)) -1.0 else vs.min)
    }

    // dedup_delta_lsh's index build is memoized per JVM (DedupIndex.
    // buildIndexFor), so with a warmup pass the measured entry above times
    // the DELTA PATH alone — the number that shows the incremental index
    // earning its keep (round 6 bundled a 30 s build into it, hiding the
    // delta cost entirely). The one-time build is measured HERE as its own
    // phase against a fresh directory, so both costs stay visible. With
    // SPARK_GRAFT_WARMUP=0 the delta entry is cold and already includes the
    // memoized build — an honest cold number — so the extra build phase is
    // SKIPPED there: measuring a second full build would double-count the
    // index cost in "total" and make cold and warm totals incomparable.
    val results =
      if (!names.contains("dedup_delta_lsh") || warmups == 0) results0
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
              // best-effort: cleanup failure must not void the measurement
              try java.nio.file.Files.walk(tmp)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(p => java.nio.file.Files.deleteIfExists(p))
              catch { case scala.util.control.NonFatal(_) => () }
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
