package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *   - [[bruteForceKnn]]: exact top-k by cosine — the correctness baseline.
  *     Cost |Q|·|N|; fine when the query set is small (broadcast) even if N
  *     is 100 TB, because it is a single pass over N with a per-query heap
  *     (here: window top-k after a broadcast cross join).
  *   - [[lshCosineCandidates]] / [[lshKnn]]: random-hyperplane LSH — sign
  *     bits of seeded hyperplane projections form bucket keys across
  *     several tables; only bucket-mates are scored. This is the scale
  *     path: candidate generation is an equi-join on bucket keys (shuffle
  *     on narrow keys, no cross product).
  *
  * The dot products run through `zip_with` + `aggregate` — codegen'd
  * builtins evaluating left-to-right, which makes the doubles bit-identical
  * to the DuckDB oracle's `list_cosine_similarity` over DOUBLE[].
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double via
    * the fused codegen'd dot product ([[graft.functions.FloatVecDot]] —
    * identical operation order to `aggregate(zip_with(...))`, so values are
    * bit-stable against the composed-builtin form and the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.FloatVecDot.dot(a, b)
    dot / (sqrt(graft.functions.FloatVecDot.dot(a, a)) *
      sqrt(graft.functions.FloatVecDot.dot(b, b)))
  }

  /** L2 norm column for precomputing per-row (norms are per-vector; compute
    * them |N| times before a pairwise join, not |N|² times inside it). */
  def l2norm(e: Column): Column = sqrt(graft.functions.FloatVecDot.dot(e, e))

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2norm(col("embedding")).as("qn"))
    val n = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
      l2norm(col("embedding")).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(n)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        graft.functions.FloatVecDot.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver-contract query: neighbors of the first `numQueries` vectors. */
  def knnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    bruteForceKnn(e, e.filter(col("vec_id") < numQueries), k)
  }

  def knnOracle(numQueries: Int = 8, k: Int = 10): String =
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(n.embedding AS DOUBLE[])) AS cosine
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------------ IVF

  /** IVF coarse quantizer trained with Lloyd iterations expressed as
    * DataFrame ops (assign = broadcast-centroid argmax, update = groupBy
    * sums) — no MLlib, no driver-side loops over data. Deterministic and
    * ORACLE-EXACT end-to-end (the BpeTrain / QualityClassifier iterative-
    * trainer discipline, promoted to the quantizer in round 13): init is
    * the md5 [[hashCentroids]] (both engines recompute it bit-for-bit),
    * assignment ties break to the LARGER cid (the [[centroidSimsCtesSql]]
    * companion rule), and each update sums micros-rounded components as
    * LONGS — float sums are partition-order-dependent and can never
    * hash-match an oracle; integer sums of rounded terms are exact on both
    * engines — before ONE double division s/(n·1e6) whose inputs are
    * exactly representable, so the new centroid components are
    * bit-identical to the DuckDB twin's. Gated by `kmeans_train`
    * ([[kmeansTrainOracle]] unrolls the T iterations as CTE chains) and
    * consumed trained by `ivf_ann_trained`. Returns the final centroids
    * collected to the driver (|centroids|·dim doubles — K-sized by
    * design; that is what makes IVF a coarse quantizer). */
  def trainCentroids(embeddings: DataFrame, k: Int, iterations: Int = 2,
                     dimOpt: Option[Int] = None): Array[(Int, Array[Double])] = {
    val dim = dimOpt.getOrElse(embeddingDim(embeddings))
    var centroids = hashCentroids(dim, k)
    for (_ <- 1 to iterations)
      centroids = lloydStepExact(embeddings, centroids, dim)
    centroids
  }

  /** One Lloyd update's exact stats: per cell, its size and the array of
    * per-dimension LONG sums of micros-rounded components — one row per
    * cell, map-side partial agg, NO explode on the corpus scan. Shared
    * verbatim by [[lloydStepExact]] and the `kmeans_train` gate so the
    * gated math IS the production math. */
  private[operators] def lloydUpdateStats(e: DataFrame,
      centroids: Array[(Int, Array[Double])], dim: Int): DataFrame =
    statsOfAssigned(assignToCentroids(e, centroids), dim)

  /** One exact Lloyd step: assignment (ties → larger cid) + integer-micros
    * update; un-hit cells keep their previous centroid (both engines'
    * rule). The collect is K·dim longs — driver-sized by construction. */
  private[graft] def lloydStepExact(e: DataFrame,
      centroids: Array[(Int, Array[Double])],
      dim: Int): Array[(Int, Array[Double])] = {
    val updated = lloydUpdateStats(e, centroids, dim).collect().map { r =>
      val n = r.getAs[Long]("n")
      (r.getAs[Int]("centroid_id"),
        r.getAs[Seq[Long]]("s").map(_.toDouble / (n * 1e6)).toArray)
    }.toMap
    centroids.map { case (id, c) => (id, updated.getOrElse(id, c)) }
  }

  /** The literal-argmax assignment EXPRESSION over an arbitrary vector
    * column (ties → larger cid, the rule every IVF oracle mirrors) —
    * [[assignToCentroids]] generalized so the IMI path can assign both
    * halves of a vector in ONE scan. */
  private[operators] def assignExpr(e: Column,
                                    centroids: Array[(Int, Array[Double])]): Column = {
    val dists = centroids.map { case (id, c) =>
      struct(litCosine(e, c).as("sim"), lit(id).as("id"))
    }
    greatest(dists.toIndexedSeq: _*).getField("id")
  }

  /** EUCLIDEAN argmin assignment (ties → larger cid): argmin ‖e − c‖²
    * over a fixed e is argmax ⟨e,c⟩ − ‖c‖²/2, so the comparison key
    * stays one fused dot per centroid. Residual sub-quantizers NEED L2
    * Lloyd (the FAISS k-means): residual MAGNITUDE carries the
    * reconstruction information, and a cosine quantizer — direction
    * only — reconstructs x̂ = c + d with arbitrarily mis-scaled d,
    * collapsing within-cell ranking to noise (measured: recall@10 of a
    * cosine-trained residual tier was ZERO where L2 training recovers
    * it). The ‖c‖²/2 constant is the same sequential fold
    * `list_inner_product(c, c) / 2` the SQL twin runs; halving is exact
    * in binary floating point. */
  private[operators] def assignL2Expr(e: Column,
                                      centroids: Array[(Int, Array[Double])]): Column = {
    val dists = centroids.map { case (id, c) =>
      struct((litDot(e, c) - lit(c.foldLeft(0.0)((a, x) => a + x * x) / 2.0)).as("sim"),
        lit(id).as("id"))
    }
    greatest(dists.toIndexedSeq: _*).getField("id")
  }

  /** Deterministic DATA-SAMPLED k-means init: the k rows with the
    * smallest md5('pqinit_' ‖ vec_id) hash, cids in (hash, vec_id)
    * order — the standard sample-the-data init, and the one L2 Lloyd
    * NEEDS: the md5-formula centroids have component scale ~[−1,1)
    * (norm ≈ √(dim/3)), so on small-norm data (residuals!) the
    * ‖c‖²/2 penalty sends EVERY row to the one smallest-norm centroid
    * and the training degenerates to a single cluster (measured: the
    * residual tier's within-cluster ranking collapsed to tie-break
    * noise). Copied values are exact cross-engine by construction —
    * no formula to reproduce, just the same k rows in the same order. */
  private[operators] def dataInitCentroids(e: DataFrame, k: Int): Array[(Int, Array[Double])] =
    e.select(col("vec_id"), col("embedding"),
        Dedup.hash60(concat(lit("pqinit_"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .collect().zipWithIndex.map { case (r, i) =>
        (i, r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      }

  /** [[trainCentroids]] under EUCLIDEAN assignment — data-sampled init
    * (see [[dataInitCentroids]]), the same tie rule and exact
    * integer-micros update; only the init and the argmax metric change. */
  def trainCentroidsL2(embeddings: DataFrame, k: Int, iterations: Int = 2,
                       dimOpt: Option[Int] = None): Array[(Int, Array[Double])] = {
    val dim = dimOpt.getOrElse(embeddingDim(embeddings))
    var centroids = dataInitCentroids(embeddings, k)
    for (_ <- 1 to iterations) {
      val updated = statsOfAssigned(
        embeddings.withColumn("centroid_id",
          assignL2Expr(col("embedding"), centroids)), dim)
        .collect().map { r =>
          val n = r.getAs[Long]("n")
          (r.getAs[Int]("centroid_id"),
            r.getAs[Seq[Long]]("s").map(_.toDouble / (n * 1e6)).toArray)
        }.toMap
      centroids = centroids.map { case (id, c) => (id, updated.getOrElse(id, c)) }
    }
    centroids
  }

  /** The update-stats aggregation over an already-assigned frame — the
    * metric-independent half of [[lloydUpdateStats]]. */
  private def statsOfAssigned(assigned: DataFrame, dim: Int): DataFrame =
    assigned
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(d =>
          sum(floor(element_at(col("embedding"), d + 1).cast("double") * 1e6 + 0.5)
            .cast("long"))): _*).as("s"))

  /** Nearest-centroid assignment: centroids ship as plan literals (they are
    * the broadcast side by construction); argmin over dot-distance. */
  def assignToCentroids(embeddings: DataFrame,
                        centroids: Array[(Int, Array[Double])]): DataFrame =
    embeddings.withColumn("centroid_id", assignExpr(col("embedding"), centroids))

  /** Per-query nProbe nearest centroids, with the query embedding carried.
    * Tie-break on centroid_id keeps the probe set deterministic (and
    * oracle-reproducible) even for exactly-equal centroid cosines. */
  private[graft] def queryProbes(queries: DataFrame, centroids: Array[(Int, Array[Double])],
                                 nProbe: Int): DataFrame = {
    val probeSims = centroids.map { case (id, c) =>
      struct(litCosine(col("qe"), c).as("sim"), lit(id).as("centroid_id"))
    }
    queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("probe", explode(sortArrayDesc(array(probeSims.toIndexedSeq: _*))))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("probe.sim").desc, col("probe.centroid_id").asc)))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qe"), col("probe.centroid_id").as("centroid_id"))
  }

  /** Score probed cells only and keep each query's top-k. */
  private def scoreProbed(probes: DataFrame, cells: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN top-k: score only vectors in the query's `nProbe` nearest
    * cells. For the persisted variant whose probe reads only the probed
    * cells' FILES, see [[writeIvfIndex]] / [[probeIvfIndex]]. */
  def ivfKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
             numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = trainCentroids(embeddings, numCentroids)
    val n = assignToCentroids(embeddings, centroids)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    scoreProbed(queryProbes(queries, centroids, nProbe), n, k)
  }

  /** Materialize the IVF index: the corpus written PARTITIONED BY
    * centroid_id (one directory per cell), so probes become partition
    * pruning — at 100 TB a probe lists and reads |probed cells| / |cells|
    * of the data, never the corpus. Returns the trained centroids, and
    * PERSISTS them (plus a health baseline) in underscore-prefixed
    * sidecars inside the index — Spark's file index treats `_`-paths as
    * hidden, so the data scan never sees them, and the index is
    * self-contained: a later session can append or probe without the
    * builder's driver state. */
  def writeIvfIndex(embeddings: DataFrame, dir: String, numCentroids: Int = 16,
                   ): Array[(Int, Array[Double])] = {
    val centroids = trainCentroids(embeddings, numCentroids)
    writeIvfIndexWith(embeddings, dir, centroids)
    centroids
  }

  // ------------------------------------------------------ IVF maintenance

  /** Index layout (since round 11, generation-versioned):
    *   dir/data_v<g>/centroid_id=<c>/   the corpus, partitioned by cell
    *   dir/_quantizer_v<g>/             the coarse centroids
    *   dir/_health_v<g>/                build-time health baseline
    *   dir/_manifest.properties         THE commit point: the live gen g
    *
    * Every whole-index rewrite — a rebuild, [[compactIvfIndex]], or
    * [[requantizeIvfIndex]] — stages a complete next generation beside
    * the live one and publishes it with ONE atomic manifest rename, then
    * deletes the retired generation: a reader resolves the manifest
    * first, so it sees a complete index before, during, and after, and a
    * crash mid-rewrite leaves only invisible residue that re-running the
    * op heals (the [[ClusterStore]] clusters-swap discipline, promoted
    * store-wide; rename atomicity is the filesystem's contract).
    * Appends land files INSIDE the live generation's cell dirs — a
    * single-table write under parquet's commit protocol, no cross-table
    * window to protect. */
  private def ivfManifestPath(dir: String) =
    java.nio.file.Paths.get(dir, "_manifest.properties")

  private[graft] def ivfGen(dir: String): Long = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(ivfManifestPath(dir))
    try p.load(in) finally in.close()
    p.getProperty("gen").toLong
  }

  private def commitIvfGen(dir: String, gen: Long): Unit = {
    val p = new java.util.Properties()
    p.setProperty("gen", gen.toString)
    val tmp = java.nio.file.Paths.get(dir, "_manifest.properties.staged")
    val out = java.nio.file.Files.newOutputStream(tmp)
    try p.store(out, "graft ivf index manifest") finally out.close()
    java.nio.file.Files.move(tmp, ivfManifestPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private[graft] def ivfDataDir(dir: String): String =
    s"$dir/data_v${ivfGen(dir)}"

  /** Write index data from PRE-TRAINED centroids. Assignment is a pure
    * per-vector function of the quantizer, so appending a batch and
    * rebuilding from the union with the same quantizer produce the same
    * logical content — the property the append path's spec pins down.
    *
    * In "overwrite" mode (a build or rebuild) this stages and promotes a
    * full next generation — data, quantizer, and health baseline (the
    * baseline rides the SAME write pass via `observe`: an
    * accumulator-backed aggregate, zero extra scans). In "append" mode
    * the new rows land inside the live generation's cell directories and
    * the build-time baseline stays, which is what drift is measured
    * against. */
  def writeIvfIndexWith(embeddings: DataFrame, dir: String,
                        centroids: Array[(Int, Array[Double])],
                        mode: String = "overwrite"): Unit =
    if (mode == "append")
      assignToCentroids(embeddings, centroids)
        .write.mode("append").partitionBy("centroid_id")
        .parquet(ivfDataDir(dir))
    else
      promoteGeneration(embeddings.sparkSession, dir, embeddings, centroids,
        preserveHealthBaseline = false, coalesceCells = false)

  /** Stage generation g+1 (data + quantizer + health) beside the live
    * one, commit with one manifest rename, delete the retired
    * generation. The shared primitive behind rebuild / compact /
    * requantize — they differ only in which rows, which centroids, and
    * whether the health baseline carries over (compaction preserves it:
    * content is unchanged, so drift measured against the ORIGINAL build
    * must keep accumulating; a requantize resets it — the new quantizer
    * is the new baseline). */
  private def promoteGeneration(spark: SparkSession, dir: String,
                                rows: DataFrame,
                                centroids: Array[(Int, Array[Double])],
                                preserveHealthBaseline: Boolean,
                                coalesceCells: Boolean): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val cur = if (java.nio.file.Files.exists(ivfManifestPath(dir)))
      Some(ivfGen(dir)) else None
    val next = cur.map(_ + 1).getOrElse(0L)
    // sweep every generation the manifest doesn't reference: residue of a
    // crashed earlier promote at gen `next` (the manifest never advanced)
    // AND retired generations whose post-commit delete crashed
    for (p <- Seq("data_v", "_quantizer_v", "_health_v"))
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p,
        g => cur.contains(g))
    val assigned = assignToCentroids(rows, centroids)
    val toWrite = if (coalesceCells)
      // one writer per cell → one file per cell dir, the compaction target
      assigned.repartition(col("centroid_id"))
    else assigned
    if (preserveHealthBaseline) {
      toWrite.write.partitionBy("centroid_id").parquet(s"$dir/data_v$next")
      spark.read.parquet(s"$dir/_health_v${cur.get}")
        .coalesce(1).write.parquet(s"$dir/_health_v$next")
    } else {
      val obs = org.apache.spark.sql.Observation(s"ivf_health_${obsSeq.incrementAndGet()}")
      toWrite.observe(obs, count(lit(1)).as("n"), avg(assignedSim(centroids)).as("mean_sim"))
        .write.partitionBy("centroid_id").parquet(s"$dir/data_v$next")
      import spark.implicits._
      Seq((obs.get("n").asInstanceOf[Long], obs.get("mean_sim").asInstanceOf[Double]))
        .toDF("n", "mean_sim")
        .coalesce(1).write.parquet(s"$dir/_health_v$next")
    }
    saveQuantizer(spark, s"$dir/_quantizer_v$next", centroids)
    commitIvfGen(dir, next)
    for (p <- Seq("data_v", "_quantizer_v", "_health_v"))
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p, _ == next)
  }

  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Append new vectors to an existing index: assign against the PERSISTED
    * quantizer, write only the new rows (appended files land in their
    * cells' partition directories — the old data is not rewritten, and at
    * 100 TB never re-read). Centroids are unchanged by design: recall
    * degrades only as the data DRIFTS from them, which [[indexHealth]]
    * measures and [[IvfHealth.shouldRecluster]] turns into the
    * [[maybeRequantize]] decision — the alternative (recluster on every
    * append) would make ingestion O(corpus) instead of O(batch). */
  def appendToIvfIndex(spark: SparkSession, dir: String, newVectors: DataFrame): Unit =
    writeIvfIndexWith(newVectors, dir, readQuantizer(spark, dir), mode = "append")

  /** Rewrite the live generation's cells coalesced — ONE file per cell —
    * and promote: N daily appends leave N file sets in every cell dir, so
    * probe cost grows with calendar time, not data size; compaction
    * returns it to O(1) files per probed cell. Same quantizer, same
    * logical content (the `ivf_index_compact` gate re-passes the SAME
    * oracle over a compacted index), original health baseline preserved.
    * At real scale "one file per cell" is the numCentroids sizing rule
    * (cells ≈ healthy parquet files); a size-tiered split within a cell
    * would change only the repartition key, not the promote mechanics. */
  def compactIvfIndex(spark: SparkSession, dir: String): Unit = {
    val centroids = readQuantizer(spark, dir)
    val rows = spark.read.parquet(ivfDataDir(dir)).drop("centroid_id")
    promoteGeneration(spark, dir, rows, centroids,
      preserveHealthBaseline = true, coalesceCells = true)
  }

  /** Re-quantize with caller-supplied centroids (typically at a
    * [[sizedCentroidCount]] after growth) and promote: the maintenance op
    * [[IvfHealth.shouldRecluster]]'s triggers exist for. A full rebuild
    * at the new C — by design: re-quantizing IS re-partitioning space, so
    * every row must re-assign; what stays O(batch) is the daily append,
    * and this pay-once rewrite is amortized across the appends that
    * triggered it. */
  def requantizeIvfIndex(spark: SparkSession, dir: String,
                         centroids: Array[(Int, Array[Double])]): Unit = {
    val rows = spark.read.parquet(ivfDataDir(dir)).drop("centroid_id")
    promoteGeneration(spark, dir, rows, centroids,
      preserveHealthBaseline = false, coalesceCells = true)
  }

  /** Remove vectors from the index — deletion, IVF edition. Assignment
    * is strictly per-vector, so removal is a FILTERED generation promote
    * under the SAME quantizer: one read of the live generation minus the
    * removed ids, rewritten cell-coalesced (the rewrite doubles as a
    * compaction) and published by the usual one-rename commit. The
    * health baseline refreshes, as a from-scratch build over the kept
    * rows would. Cost is O(index rewrite) — the [[compactIvfIndex]]
    * cost class — so takedowns batch on the compaction cadence; after
    * it the index is indistinguishable from a rebuild over the kept
    * vectors (`ivf_index_remove`). */
  def removeFromIvfIndex(spark: SparkSession, dir: String,
                         removedIds: DataFrame): Unit = {
    val centroids = readQuantizer(spark, dir)
    val kept = spark.read.parquet(ivfDataDir(dir)).drop("centroid_id")
      .join(removedIds.select(col("vec_id")), Seq("vec_id"), "left_anti")
    promoteGeneration(spark, dir, kept, centroids,
      preserveHealthBaseline = false, coalesceCells = true)
  }

  /** The measured quantizer sizing rule, C ∝ N: cells stay probe-sized
    * only while n stays within a constant factor of what C was chosen
    * for (SCALE.md: the pinned C=16 gate quantizer read 51.0 s at ×20
    * where C=320 — 16 scaled by the ×20 — read 14.6 s, 3.5× faster, via
    * tools/LabelNoiseProbe). */
  def sizedCentroidCount(currentC: Int, growth: Double): Int =
    math.max(currentC, math.ceil(currentC * growth).toInt)

  /** The automated maintenance decision: read [[indexHealth]] (one scan),
    * and when its growth/drift triggers fire, re-quantize with C sized by
    * the measured rule — centroids re-trained on the index's own rows.
    * Returns the new centroid count if a requantize ran. */
  def maybeRequantize(spark: SparkSession, dir: String,
                      maxDrift: Double = 0.05, maxGrowth: Double = 4.0,
                     ): Option[Int] = {
    val h = indexHealth(spark, dir)
    if (!h.shouldRecluster(maxDrift, maxGrowth)) None
    else {
      val newC = sizedCentroidCount(readQuantizer(spark, dir).length, h.growth)
      val rows = spark.read.parquet(ivfDataDir(dir)).drop("centroid_id")
      requantizeIvfIndex(spark, dir, trainCentroids(rows, newC))
      Some(newC)
    }
  }

  private def saveQuantizer(spark: SparkSession, quantizerDir: String,
                            centroids: Array[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    centroids.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(quantizerDir)
  }

  /** The persisted coarse quantizer of the live generation
    * (O(centroids·dim) — driver-sized by construction). */
  def readQuantizer(spark: SparkSession, dir: String): Array[(Int, Array[Double])] =
    readQuantizerPath(spark, s"$dir/_quantizer_v${ivfGen(dir)}")

  private def readQuantizerPath(spark: SparkSession,
                                path: String): Array[(Int, Array[Double])] = {
    def read() = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Int]("centroid_id"),
        r.getAs[Seq[Double]]("centroid").toArray))
      .sortBy(_._1)
    val first = read()
    // Empty-listing guard (observed once in a 162-query 8-worker verify
    // run): a freshly-committed sidecar read from another session can
    // transiently list ZERO files, and an empty quantizer silently
    // empties every downstream probe (probes -> isin() -> cells -> the
    // whole vector list) with no exception — the failure surfaced as a
    // hybrid-fusion gate returning single-list RRF. Refresh this
    // session's cached listing and retry once; if the sidecar is
    // genuinely empty, fail LOUDLY rather than serve an empty tier.
    val out = if (first.nonEmpty) first else {
      spark.catalog.refreshByPath(path)
      read()
    }
    require(out.nonEmpty, s"quantizer sidecar at $path listed empty twice")
    out
  }

  /** Per-row vector→assigned-centroid cosine — the quantity whose mean
    * decays as data drifts away from the centroids it was quantized
    * with. */
  private[graft] def assignedSim(centroids: Array[(Int, Array[Double])]): Column =
    coalesce(centroids.map { case (id, c) =>
      when(col("centroid_id") === id, litCosine(col("embedding"), c))
    }.toIndexedSeq: _*)

  /** One-pass (count, mean assigned-cosine) over index rows. */
  private def scanHealth(index: DataFrame,
                         centroids: Array[(Int, Array[Double])]): (Long, Double) = {
    val r = index.agg(count(lit(1)).as("n"),
      avg(assignedSim(centroids)).as("mean_sim")).first()
    (r.getAs[Long]("n"), r.getAs[Double]("mean_sim"))
  }

  /** Index fitness after appends: assignment-quality drift (build-time
    * mean assigned-cosine minus current) and size growth — the two
    * signals that should trigger reclustering. Reads the index once. */
  case class IvfHealth(nBuild: Long, nNow: Long,
                       simBuild: Double, simNow: Double) {
    def growth: Double = nNow.toDouble / nBuild
    def drift: Double = simBuild - simNow
    /** Recluster when assignment quality fell materially or the index
      * outgrew its quantizer (k chosen for nBuild keeps cells probe-sized
      * only while n stays within a constant factor). */
    def shouldRecluster(maxDrift: Double = 0.05, maxGrowth: Double = 4.0): Boolean =
      drift > maxDrift || growth > maxGrowth
  }

  def indexHealth(spark: SparkSession, dir: String): IvfHealth = {
    val centroids = readQuantizer(spark, dir)
    val base = spark.read.parquet(s"$dir/_health_v${ivfGen(dir)}").first()
    val (n, sim) = scanHealth(spark.read.parquet(ivfDataDir(dir)), centroids)
    IvfHealth(base.getAs[Long]("n"), n, base.getAs[Double]("mean_sim"), sim)
  }

  /** ANN over the materialized index: the union of all queries' probed
    * cells becomes a partition filter on the scan (`PartitionFilters` in
    * the plan — only those directories are listed/read); the per-query
    * cell join then keeps each query to its own nProbe cells. */
  def probeIvfIndex(spark: SparkSession, dir: String,
                    centroids: Array[(Int, Array[Double])], queries: DataFrame,
                    k: Int = 10, nProbe: Int = 4,
                    allowedOpt: Option[DataFrame] = None): DataFrame = {
    val probes = queryProbes(queries, centroids, nProbe)
    // the probed-cell union is O(|centroids|) driver values, never data
    val cells = semiJoinAllowed(
      prunedCellScan(spark, ivfDataDir(dir), probes), allowedOpt)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    scoreProbed(probes, cells, k)
  }

  /** The filtered-search candidate restriction: semi-join the caller's
    * allowed-id frame on the candidate rows (cell-bounded, before the
    * re-score) — a no-op when no predicate is given. */
  private def semiJoinAllowed(cells: DataFrame,
                              allowedOpt: Option[DataFrame]): DataFrame =
    allowedOpt.fold(cells)(a =>
      cells.join(a.select(col("vec_id")), Seq("vec_id"), "left_semi"))

  private def sortArrayDesc(a: Column): Column = reverse(array_sort(a))

  /** Seeded random unit-ish hyperplanes: `tables` independent LSH tables of
    * `bitsPerTable` planes each, as literal nested arrays (broadcast with
    * the plan — no closure capture). */
  def hyperplanes(dim: Int, tables: Int, bitsPerTable: Int, seed: Long = 7L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  /** Bucket key per (vector, table): the sign-bit string of the plane
    * projections. Vectors with equal keys in ANY table become candidates. */
  def lshBuckets(embeddings: DataFrame, planes: Array[Array[Array[Double]]]): DataFrame = {
    val tableExprs = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val bits = tablePlanes.map { plane =>
        when(litDot(col("embedding"), plane) >= 0, lit("1")).otherwise(lit("0"))
      }
      struct(lit(t).as("table"), concat(bits.toIndexedSeq: _*).as("bucket"))
    }
    embeddings
      .select(col("vec_id"), explode(array(tableExprs.toIndexedSeq: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
  }

  /** ANN top-k: score only same-bucket candidates, then per-query top-k. */
  /** Embedding width, read from the data (a hard-coded dim would silently
    * NULL-poison projections of narrower vectors into one giant bucket). */
  def embeddingDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).first().getInt(0)

  /** [[embeddingDim]] memoized per source dir (the width is a property
    * of the dataset, like the memoized index stores): the unmemoized
    * read ran an EAGER one-row job at query-CONSTRUCTION time in every
    * FromDir entry point — the recall composites paid it 4–5×
    * sequentially per call (guide §5: driver-side work in query paths).
    * Now one job per (JVM, dir). */
  private val dirDims = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[operators] def dimForDir(dir: String, e: DataFrame): Int =
    dirDims.computeIfAbsent(dir, _ => Integer.valueOf(embeddingDim(e))).intValue()

  /** Dot of an embedding column against a literal plan-side vector (plane /
    * centroid) — the shared projection primitive of the LSH and IVF paths. */
  private def litDot(e: Column, v: Array[Double]): Column =
    // codegen kernel == aggregate(zip_with(e, lit(v), *), 0d, +) — the
    // HOF form ran interpreted in the centroid-assignment hot loop
    // (C dots per row per Lloyd iteration / probe; r20)
    graft.functions.VecExprs.litDot(e, v)

  /** Cosine of an embedding column against a literal vector. */
  private def litCosine(e: Column, v: Array[Double]): Column =
    litDot(e, v) / (l2norm(e) * lit(math.sqrt(v.map(x => x * x).sum)))

  def lshKnn(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
             tables: Int = 8, bitsPerTable: Int = 6, seed: Long = 7L): DataFrame = {
    val dim = embeddingDim(embeddings)
    lshKnnPlanes(embeddings, queries, k, hyperplanes(dim, tables, bitsPerTable, seed))
  }

  /** md5-derived deterministic hyperplanes: component (t,b,d) is the 60-bit
    * md5 prefix of `plane_{t}_{b}_{d}` scaled to [-1, 1). Uniform per
    * component (not Gaussian — for sign-bucket LSH only the DIRECTION
    * distribution matters and component-iid uniform is symmetric enough),
    * and — the point — reproducible bit-for-bit inside DuckDB SQL, which
    * makes the FULL ANN pipeline (projections → sign buckets → candidate
    * join → exact re-score → top-k) oracle-checkable end-to-end. The same
    * md5-prefix construction as [[Dedup.hash60]]. */
  def hashPlanes(dim: Int, tables: Int, bitsPerTable: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bitsPerTable, dim) { (t, b, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"plane_${t}_${b}_${d}".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0
    }

  /** [[lshKnn]] with caller-supplied planes (seeded-random or [[hashPlanes]]). */
  def lshKnnPlanes(embeddings: DataFrame, queries: DataFrame, k: Int,
                   planes: Array[Array[Array[Double]]]): DataFrame = {
    val nb = lshBuckets(embeddings, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("neighbor_id"))
    val qb = lshBuckets(queries, planes)
      .select(col("table"), col("bucket"), col("vec_id").as("query_id"))
    val candidates = qb.join(nb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(n, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Gated ANN query: hyperplane-LSH top-k for the first `numQueries`
    * vectors, with [[hashPlanes]] so the oracle recomputes the identical
    * planes in SQL. Recall is a tunable (tables × bits), verified
    * separately by the recall spec; the GATE verifies the pipeline
    * mechanics are exact — same buckets, same candidates, same scores,
    * same ranks on both engines. */
  /** The embedding width [[lshAnnOracle]]'s plane formula is generated
    * for. The oracle SQL is built before any data is read, so it cannot
    * derive the width itself; [[lshAnnFromDir]] asserts the data agrees. */
  val LshOracleDim = 64

  def lshAnnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                    k: Int = 10, tables: Int = 4, bits: Int = 8): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = dimForDir(dir, e)
    // fail HERE with the cause, not downstream as an opaque oracle hash
    // mismatch: the gate's DuckDB twin hard-codes LshOracleDim planes
    require(dim == LshOracleDim,
      s"embeddings under $dir are $dim-wide but lshAnnOracle generates " +
        s"$LshOracleDim-dim planes — regenerate the oracle with dim=$dim")
    lshKnnPlanes(e, e.filter(col("vec_id") < numQueries), k,
      hashPlanes(dim, tables, bits))
  }

  // ------------------------------------------------- gated IVF pipeline

  /** md5-derived deterministic coarse quantizer — the same construction as
    * [[hashPlanes]]: component (t, d) is the 60-bit md5 prefix of
    * `centroid_{t}_{d}` scaled to [-1, 1). Not trained (for the GATE the
    * quantizer's job is to partition space reproducibly on both engines;
    * recall quality of the TRAINED quantizer is the recall spec's job) —
    * the point is that DuckDB recomputes the identical centroids in SQL,
    * which makes the FULL IVF pipeline (assignment → probe selection →
    * cell-bounded candidates → exact re-score → top-k) oracle-checkable
    * end-to-end, closing the last spec-only similarity path. */
  def hashCentroids(dim: Int, k: Int): Array[(Int, Array[Double])] =
    Array.tabulate(k) { t =>
      (t, Array.tabulate(dim) { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"centroid_${t}_${d}".getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0
      })
    }

  /** Gated ANN query: IVF top-k for the first `numQueries` vectors under
    * the [[hashCentroids]] quantizer. Assignment ties break to the LARGER
    * centroid id (Spark's `greatest` over (sim, id) structs — mirrored in
    * the oracle's ORDER BY sim DESC, cid DESC), probe-selection ties to
    * the SMALLER (the window's explicit tie-break). Same plan shape as the
    * production [[ivfKnn]]: one corpus scan for assignment, probes
    * broadcast, scoring bounded to probed cells. */
  def ivfAnnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                    k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = dimForDir(dir, e)
    // fail HERE with the cause, not downstream as an opaque oracle hash
    // mismatch: the gate's DuckDB twin hard-codes LshOracleDim centroids
    require(dim == LshOracleDim,
      s"embeddings under $dir are $dim-wide but ivfAnnOracle generates " +
        s"$LshOracleDim-dim centroids — regenerate the oracle with dim=$dim")
    val centroids = hashCentroids(dim, numCentroids)
    val cells = assignToCentroids(e, centroids)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"))
    scoreProbed(
      queryProbes(e.filter(col("vec_id") < numQueries), centroids, nProbe),
      cells, k)
  }

  /** DuckDB twin of [[ivfAnnFromDir]]: centroids from the same md5
    * formula, cosines via `list_cosine_similarity` (bit-equal to the
    * Spark side's literal-vector cosine — the pairing the semantic_quality
    * gate proves), assignment and probe windows with the matching
    * tie-breaks, candidate equi-join on cell, exact cosine re-score. */
  /** The md5 hash-quantizer + per-vector centroid cosines as SQL CTEs
    * (`centroids`, `sims`) — single-sourced across every IVF-family twin
    * ([[ivfAnnOracle]], [[indexHealthOracle]], [[LabelNoise.ivfOracle]],
    * [[SemanticDedup.oracle]]) so the quantizer formula cannot drift. */
  private[operators] def centroidSimsCtesSql(dim: Int, numCentroids: Int,
                                             relation: String = "embeddings",
                                             p: String = "",
                                             l2: Boolean = false): String =
    s"""${p}centroids AS MATERIALIZED (
       |  SELECT t AS cid,
       |         list_transform(range(0, $dim), d ->
       |           CAST('0x' || substr(md5('centroid_' || t || '_' || d), 1, 15) AS BIGINT)
       |             / 576460752303423488.0 - 1.0) AS c
       |  FROM (SELECT unnest(range(0, $numCentroids)) AS t)
       |), ${p}sims AS MATERIALIZED (
       |  SELECT e.vec_id, ct.cid,
       |         ${simMetricSql("CAST(e.embedding AS DOUBLE[])", "ct.c", l2)} AS sim
       |  FROM $relation e CROSS JOIN ${p}centroids ct
       |)""".stripMargin

  /** The argmax comparison key both engines share: cosine by default,
    * or the EUCLIDEAN key ⟨e,c⟩ − ‖c‖²/2 (argmin L2 distance — see
    * [[assignL2Expr]]). */
  private def simMetricSql(e: String, c: String, l2: Boolean): String =
    if (l2) s"list_inner_product($e, $c) - list_inner_product($c, $c) / 2"
    else s"list_cosine_similarity($e, $c)"

  /** The IVF probe chain (assignment → probe selection → cell-bounded
    * candidates → exact re-score → per-query rank) as SQL CTEs, ending in
    * `${p}ranked (query_id, neighbor_id, cosine, rank)`. Assumes
    * `centroids`/`sims` are in scope ([[centroidSimsCtesSql]]). `p`
    * prefixes every CTE so a composed oracle ([[HybridRetrieval]]'s IVF
    * twin) can place this chain beside the BM25 fragment (which also
    * defines a `scored`). */
  private[operators] def ivfRankedCtesSql(numQueries: Int, nProbe: Int,
                                          p: String = "",
                                          sims: String = "sims",
                                          relation: String = "embeddings",
                                          neRelOpt: Option[String] = None,
                                          neVecOpt: Option[String] = None,
                                          scoredSqlOpt: Option[String] = None,
                                          candWhereOpt: Option[String] = None): String = {
    // the re-score's NEIGHBOR side is swappable (the SQ8 gate scores
    // against the decoded `dec.dv` lists); assignment/probes stay on the
    // full-precision sims — exactly the Spark side's asymmetric shape.
    // `scoredSqlOpt` replaces the WHOLE `${p}scored` CTE (it must keep
    // that name and read `${p}cand`) for re-scores that are not a
    // list_cosine over one neighbor vector — the PQ tier's ADC sum of
    // per-subspace partial dots ([[pqScoredSql]]). `candWhereOpt` is an
    // extra predicate on the candidate rows (alias `a`) — the FILTERED
    // search twin: the index still covers everything, only candidates
    // that satisfy the predicate reach the re-score
    val neRel = neRelOpt.getOrElse(relation)
    val neVec = neVecOpt.getOrElse("CAST(ne.embedding AS DOUBLE[])")
    val candExtra = candWhereOpt.map(w => s" AND $w").getOrElse("")
    val scored = scoredSqlOpt.getOrElse(
      s"""${p}scored AS MATERIALIZED (
         |  SELECT c.query_id, c.neighbor_id,
         |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                $neVec) AS cosine
         |  FROM ${p}cand c JOIN $relation qe ON qe.vec_id = c.query_id
         |              JOIN $neRel ne ON ne.vec_id = c.neighbor_id
         |)""".stripMargin)
    s"""${p}assign AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM $sims
       |  ) WHERE rk = 1
       |), ${p}probes AS MATERIALIZED (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid ASC) AS rk
       |    FROM $sims WHERE vec_id < $numQueries
       |  ) WHERE rk <= $nProbe
       |), ${p}cand AS MATERIALIZED (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM ${p}probes p JOIN ${p}assign a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.query_id$candExtra
       |), $scored, ${p}ranked AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM ${p}scored
       |)""".stripMargin
  }

  def ivfAnnOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                   nProbe: Int = 4, dim: Int = LshOracleDim,
                   relation: String = "embeddings",
                   extraCtes: String = ""): String =
    s"""WITH $extraCtes${centroidSimsCtesSql(dim, numCentroids, relation)},
       |${ivfRankedCtesSql(numQueries, nProbe, relation = relation)}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ------------------------------------- scalar quantization (SQ8)

  /** Per-dimension (min, max) of the embedding corpus — the scalar-
    * quantization training stats: ONE aggregate (map-side partial
    * min/max, dim-sized shuffle), dim doubles of driver state. MIN/MAX
    * are order-independent and EXACT on floats, so unlike sums they need
    * no micros discipline — both engines recompute identical doubles. */
  def sq8Stats(e: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val r = e.agg(
      array((0 until dim).map(d =>
        min(element_at(col("embedding"), d + 1).cast("double"))): _*).as("mn"),
      array((0 until dim).map(d =>
        max(element_at(col("embedding"), d + 1).cast("double"))): _*).as("mx"))
      .first()
    (r.getAs[Seq[Double]]("mn").toArray, r.getAs[Seq[Double]]("mx").toArray)
  }

  /** SQ8 encode: code_d = clamp₀²⁵⁵ floor((x_d − mn_d) · 255/(mx_d − mn_d)
    * + 0.5) (0 for a degenerate dimension) — 4× fewer index bytes per
    * vector than float32, the standard memory-side ANN trade. The clamp
    * matters for the APPEND path: a batch value outside the build-time
    * range must still land in uint8 (saturating, like every production
    * quantizer) — without it appended codes could silently outgrow the
    * byte. Stats enter as plan literals; the transform is scan-fused,
    * zero shuffles. */
  def sq8Encode(e: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val scales = mn.indices.map(d =>
      if (mx(d) > mn(d)) 255.0 / (mx(d) - mn(d)) else 0.0).toArray
    // codegen kernel == the per-element transform (same floor/clamp/cast
    // order; r20 — the HOF form ran interpreted per vector)
    graft.functions.VecExprs.sq8Encode(e, mn, scales)
  }

  /** SQ8 decode (reconstruction): mn_d + code_d · (mx_d − mn_d)/255. */
  def sq8Decode(codes: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val inv = mn.indices.map(d =>
      if (mx(d) > mn(d)) (mx(d) - mn(d)) / 255.0 else 0.0).toArray
    graft.functions.VecExprs.sq8Decode(codes, mn, inv)
  }

  /** Cosine between a full-precision float vector and a decoded double
    * vector — the asymmetric-distance form (queries stay full precision,
    * the index stores codes). Composed builtins evaluating left-to-right:
    * bit-identical to DuckDB's `list_cosine_similarity` over DOUBLE[]. */
  private def mixedCosine(q: Column, dec: Column): Column =
    // fused kernels == the aggregate(zip_with(...)) composites, same
    // left-to-right accumulation (r20: the HOF form ran interpreted per
    // candidate pair)
    graft.functions.VecExprs.mixedDot(q, dec) /
      (sqrt(graft.functions.FloatVecDot.dot(q, q)) *
        sqrt(graft.functions.VecExprs.doubleDot(dec, dec)))

  /** Gated query `ann_sq8_topk`: brute top-k under asymmetric SQ8 —
    * full-precision queries against the quantized-then-decoded corpus.
    * The correctness anchor for the compressed index tier: at 100 TB the
    * codes (64 B/vector vs 256 B float32) are what the IVF cells would
    * store; the probe shape is unchanged (cell-bounded candidates,
    * re-score on decode), so this gate pins the encode/decode/score math
    * and the recall spec prices the approximation. */
  def sq8KnnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                    k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = requireOracleDim(e, dir)
    val (mn, mx) = sq8Stats(e, dim)
    val dec = e.select(col("vec_id").as("neighbor_id"),
      sq8Decode(sq8Encode(col("embedding"), mn, mx), mn, mx).as("dv"))
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(dec)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", mixedCosine(col("qe"), col("dv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The per-dim extrema + quantize-then-decode CTE chain, ending in
    * `dec (vec_id, dv DOUBLE[])` — single-sourced between
    * [[sq8KnnOracle]], [[ivfSq8Oracle]], and the append gate so the
    * quantization formulas cannot drift between the brute anchor and the
    * composed index gates. `statsRelation` lets the APPEND gate freeze
    * the extrema at the build corpus (production semantics: appended
    * batches encode under the STORED stats, which drift like the
    * quantizer and refresh on the same requantize cadence); `relation`
    * lets the REMOVE gate decode only the kept rows (while the stats
    * stay frozen at the build corpus — the same staleness rule). */
  private[operators] def sq8DecCtesSql(dim: Int,
                                       statsRelation: String = "embeddings",
                                       relation: String = "embeddings"): String =
    s"""sq8_comp AS (
       |  SELECT r.d, MIN(CAST(e.embedding[r.d + 1] AS DOUBLE)) AS mn,
       |         MAX(CAST(e.embedding[r.d + 1] AS DOUBLE)) AS mx
       |  FROM $statsRelation e CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) r
       |  GROUP BY r.d
       |), sq8_stats AS (
       |  SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM sq8_comp
       |), dec AS (
       |  SELECT e.vec_id,
       |         [ s.mns[i] + CAST(GREATEST(0, LEAST(255,
       |               FLOOR((CAST(e.embedding[i] AS DOUBLE) - s.mns[i])
       |               * (CASE WHEN s.mxs[i] > s.mns[i]
       |                       THEN 255.0 / (s.mxs[i] - s.mns[i]) ELSE 0.0 END) + 0.5))) AS DOUBLE)
       |             * (CASE WHEN s.mxs[i] > s.mns[i]
       |                     THEN (s.mxs[i] - s.mns[i]) / 255.0 ELSE 0.0 END)
       |           FOR i IN range(1, $dim + 1) ] AS dv
       |  FROM $relation e, sq8_stats s
       |)""".stripMargin

  /** DuckDB twin: per-dim MIN/MAX stats recomputed in SQL (exact — no
    * rounding discipline needed for extrema), the same encode/decode
    * formulas over list comprehensions, `list_cosine_similarity` against
    * the decoded lists. */
  def sq8KnnOracle(numQueries: Int = 8, k: Int = 10,
                   dim: Int = LshOracleDim): String =
    s"""WITH ${sq8DecCtesSql(dim)}, pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), n.dv) AS cosine
       |  FROM embeddings q JOIN dec n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // -------------------------------------- SQ8 × persisted IVF (composed)

  /** The compressed-tier index: cells store SQ8 CODES (64 B/vector, 4×
    * less than float32 — at 100 TB this is 4× more corpus per byte of
    * cell storage AND per byte of probe read), assignment runs on the
    * FULL-precision vectors at build time, and the per-dim stats persist
    * in an `_sq8_v<g>` sidecar beside the quantizer so a later session
    * probes without the builder's driver state. Same generation+manifest
    * commit discipline as the float index. */
  def writeIvfSq8Index(e: DataFrame, dir: String, numCentroids: Int = 16): Unit =
    stageSq8Generation(e, dir, numCentroids, gen = 0L)

  /** Stage one complete SQ8 generation (data + quantizer + stats
    * sidecars) from SOURCE float vectors and commit it — shared by the
    * initial build and [[requantizeIvfSq8Index]]. */
  private def stageSq8Generation(e: DataFrame, dir: String, numCentroids: Int,
                                 gen: Long): Unit = {
    val spark = e.sparkSession
    val dim = embeddingDim(e)
    val centroids = hashCentroids(dim, numCentroids)
    val (mn, mx) = sq8Stats(e, dim)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assignToCentroids(e, centroids)
      .select(col("vec_id"), sq8Encode(col("embedding"), mn, mx).as("codes"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/data_v$gen")
    saveQuantizer(spark, s"$dir/_quantizer_v$gen", centroids)
    import spark.implicits._
    Seq((mn.toSeq, mx.toSeq)).toDF("mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_sq8_v$gen")
    commitIvfGen(dir, gen)
  }

  /** Re-quantize the compressed tier: the stats-refresh op the
    * frozen-stats staleness rule defers to. Codes are LOSSY, so a real
    * requantize must re-read the SOURCE float vectors (the embeddings
    * table a deployment keeps upstream) — re-encoding decoded codes
    * would compound quantization error. Re-derives quantizer AND
    * extrema over the source, stages the full next generation, one
    * rename. After it the index is indistinguishable from a
    * from-scratch build at the new C (`ivf_sq8_requantize`). */
  def requantizeIvfSq8Index(spark: SparkSession, dir: String, source: DataFrame,
                            numCentroids: Int): Unit =
    promoteFreshGeneration(dir, Seq("_quantizer_v", "_sq8_v"))(
      stageSq8Generation(source, dir, numCentroids, _))

  /** Partition-pruned probe over the SQ8 index: list/read ONLY the probed
    * cells' directories, decode candidates with the sidecar stats, exact
    * asymmetric re-score (full-precision queries). */
  def probeIvfSq8Index(spark: SparkSession, dir: String, queries: DataFrame,
                       k: Int = 10, nProbe: Int = 4): DataFrame = {
    val centroids = readQuantizer(spark, dir)
    val g = ivfGen(dir)
    val (mn, mx) = readSq8Sidecar(spark, dir, g)
    val probes = queryProbes(queries, centroids, nProbe)
    val probedCells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cells = spark.read.parquet(ivfDataDir(dir))
      .filter(col("centroid_id").isin(probedCells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        sq8Decode(col("codes"), mn, mx).as("dv"))
    scoreProbedDecoded(probes, cells, k)
  }

  /** Score pruned DECODED cells (dv lists) asymmetrically against the
    * full-precision query vectors and keep each query's top-k — the
    * compressed-tier twin of [[scoreProbed]], shared by the flat SQ8 and
    * two-level IMI×SQ8 probe paths so the re-score/rank tail cannot
    * drift between them. */
  private def scoreProbedDecoded(probes: DataFrame, cells: DataFrame,
                                 k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", mixedCosine(col("qe"), col("dv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** O(batch) ingestion into the SQ8 index: encode the batch against the
    * PERSISTED quantizer AND the persisted stats (both frozen at build —
    * the quantizer-drift argument applies verbatim to the extrema, and
    * both refresh on the same requantize cadence), land files in the
    * cells' partition directories. Old data never re-read or re-encoded. */
  def appendToIvfSq8Index(spark: SparkSession, dir: String,
                          newVectors: DataFrame): Unit = {
    val centroids = readQuantizer(spark, dir)
    val (mn, mx) = readSq8Sidecar(spark, dir, ivfGen(dir))
    assignToCentroids(newVectors, centroids)
      .select(col("vec_id"), sq8Encode(col("embedding"), mn, mx).as("codes"),
        col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(ivfDataDir(dir))
  }

  /** Deletion for the COMPRESSED tier — the last serving surface without
    * it. A filtered generation rewrite of the CODES under the frozen
    * build-time quantizer and extrema: kept rows are rewritten verbatim
    * (codes are already encoded under the stored stats, so removal never
    * re-encodes), cell-coalesced (the rewrite doubles as a compaction),
    * and published by the same one-rename manifest commit as the float
    * store. Stats-staleness rule, mirroring append's: after a removal
    * the persisted extrema may be looser than the kept corpus's true
    * extrema — that is CORRECT for decoding the surviving codes (they
    * were encoded under those extrema), and both sidecars refresh on the
    * same requantize cadence. Cost is O(index rewrite) — the compact
    * cost class — so takedowns batch on the compaction cadence. */
  def removeFromIvfSq8Index(spark: SparkSession, dir: String,
                            removedIds: DataFrame): Unit =
    rewriteSq8Generation(spark, dir,
      _.join(removedIds.select(col("vec_id")), Seq("vec_id"), "left_anti"))

  /** Compaction for the compressed tier: N appends leave N file sets in
    * every cell dir (probe cost grows with calendar time); the
    * identity-filter generation rewrite returns it to ONE file per cell
    * under the unchanged frozen quantizer + stats — content-preserving
    * by construction (`ivf_sq8_compact` re-passes the append oracle). */
  def compactIvfSq8Index(spark: SparkSession, dir: String): Unit =
    rewriteSq8Generation(spark, dir, identity)

  /** The shared filtered-generation rewrite of the CODES under the
    * frozen build-time quantizer and extrema — codes move verbatim,
    * never re-encoded ([[removeFromIvfSq8Index]] filters,
    * [[compactIvfSq8Index]] keeps everything; both coalesce to one file
    * per cell and publish with the one-rename manifest commit). */
  private def rewriteSq8Generation(spark: SparkSession, dir: String,
                                   keep: DataFrame => DataFrame): Unit =
    rewriteGeneration(spark, dir, Seq("_quantizer_v", "_sq8_v"), keep)

  /** The persisted per-dim extrema sidecar of generation `g` — the ONE
    * decode point for `_sq8_v` shared by both compressed tiers' probe
    * and append paths (a sidecar schema change lands in one place). */
  private def readSq8Sidecar(spark: SparkSession, dir: String,
                             g: Long): (Array[Double], Array[Double]) = {
    val path = s"$dir/_sq8_v$g"
    // same empty-listing guard as readQuantizerPath (one refresh+retry,
    // then loud failure — head() on a transiently-empty listing would
    // otherwise throw an opaque NoSuchElementException)
    val rows = spark.read.parquet(path).collect()
    val r = (if (rows.nonEmpty) rows else {
      spark.catalog.refreshByPath(path)
      spark.read.parquet(path).collect()
    }).headOption.getOrElse(
      throw new IllegalStateException(s"sq8 sidecar at $path listed empty twice"))
    (r.getAs[Seq[Double]]("mn").toArray, r.getAs[Seq[Double]]("mx").toArray)
  }

  /** ONE generation-rewrite discipline for every tiered store: sweep
    * crashed-promote residue, stage the kept rows cell-coalesced into
    * data_v(g+1), carry the listed sidecars forward UNCHANGED (the
    * frozen-stats/frozen-codebook rule), one-rename commit, sweep the
    * retired generation. A new sidecar added to a tier changes exactly
    * one `sidecars` list — the commit/sweep skeleton cannot drift
    * between tiers. */
  private def rewriteGeneration(spark: SparkSession, dir: String,
                                sidecars: Seq[String],
                                keep: DataFrame => DataFrame): Unit = {
    val g = ivfGen(dir)
    val next = g + 1
    val prefixes = "data_v" +: sidecars
    // sweep residue of a crashed earlier promote (manifest never advanced)
    for (p <- prefixes)
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p, _ == g)
    keep(spark.read.parquet(s"$dir/data_v$g"))
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id").parquet(s"$dir/data_v$next")
    for (q <- sidecars)
      spark.read.parquet(s"$dir/$q$g").coalesce(1).write.parquet(s"$dir/$q$next")
    commitIvfGen(dir, next)
    for (p <- prefixes)
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p, _ == next)
  }

  /** The sweep/stage/sweep skeleton of a FULL-rebuild promote (the two
    * requantize ops): residue swept, a complete next generation staged
    * and committed by `stage`, the retired generation swept. */
  private def promoteFreshGeneration(dir: String, sidecars: Seq[String])
                                    (stage: Long => Unit): Unit = {
    val g = ivfGen(dir)
    val next = g + 1
    val prefixes = "data_v" +: sidecars
    for (p <- prefixes)
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p, _ == g)
    stage(next)
    for (p <- prefixes)
      ClusterStore.sweepOrphans(java.nio.file.Paths.get(dir), p, _ == next)
  }

  /** One memoized temp-dir store per (JVM, memo key) — the build-once
    * economics every indexed gate shares. The KEY must carry every build
    * parameter (source dir + C/iterations/...): keyed on the dir alone, a
    * second caller with different params would silently receive an index
    * built with the first caller's params. */
  private def memoStore(map: java.util.concurrent.ConcurrentHashMap[String, String],
                        key: String, prefix: String)(build: String => Unit): String =
    map.computeIfAbsent(key, _ => {
      val tmp = java.nio.file.Files.createTempDirectory(prefix)
      ClusterStore.deleteRecursivelyOnExit(tmp)
      val p = tmp.resolve("index").toString
      build(p)
      p
    })

  private val ivfSq8Stores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ivfSq8Backlogs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized full-corpus SQ8 index for `dir` (one per JVM — the
    * build-once economics every indexed gate uses). */
  private def sq8StoreFor(spark: SparkSession, dir: String, e: DataFrame,
                          numCentroids: Int): String =
    memoStore(ivfSq8Stores, s"$dir#c$numCentroids", "graft_ivf_sq8")(
      writeIvfSq8Index(e, _, numCentroids))

  /** Gated query `ivf_sq8_remove`: takedown proven on the compressed
    * tier — copy the memoized full-corpus SQ8 index,
    * [[removeFromIvfSq8Index]] the DeltaMod residue class, probe with
    * the surviving low-id queries. The oracle is [[ivfSq8Oracle]]'s
    * chain with assignment/probes/decode restricted to the KEPT relation
    * while the extrema stay frozen at the BUILD corpus: removed vectors
    * must vanish from cells and candidate sets with nothing else moving
    * — in particular, no code may re-encode (kept-relation stats would
    * shift the decoded values and hash-mismatch). */
  def ivfSq8RemoveProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                               k: Int = 10, numCentroids: Int = 16,
                               nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val full = sq8StoreFor(spark, dir, e, numCentroids)
    val idx = ClusterStore.copyStore(full, "graft_ivf_sq8_remove")
    removeFromIvfSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0).select(col("vec_id")))
    probeIvfSq8Index(spark, idx,
      e.filter(col("vec_id") < numQueries &&
        col("vec_id") % DedupIndex.DeltaMod =!= 0), k, nProbe)
  }

  /** DuckDB twin of [[ivfSq8RemoveProbeFromDir]]: [[ivfSq8Oracle]] over
    * the kept relation, stats frozen at the full build corpus. */
  def ivfSq8RemoveOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                         nProbe: Int = 4, dim: Int = LshOracleDim): String =
    s"""WITH kept_vecs AS (
       |  SELECT * FROM embeddings WHERE vec_id % ${DedupIndex.DeltaMod} <> 0
       |), ${centroidSimsCtesSql(dim, numCentroids, relation = "kept_vecs")},
       |${sq8DecCtesSql(dim, statsRelation = "embeddings", relation = "kept_vecs")},
       |${ivfRankedCtesSql(numQueries, nProbe, "s_", relation = "kept_vecs",
           neRelOpt = Some("dec"), neVecOpt = Some("ne.dv"))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM s_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Gated query `ivf_sq8_append`: build the SQ8 index over the BACKLOG
    * (stats and quantizer frozen there), append the DeltaMod delta, probe.
    * The oracle freezes the stats at the backlog relation too — append +
    * probe must equal a probe over the union encoded under BUILD-time
    * stats, which is exactly what the production path produces (a
    * from-scratch rebuild would re-derive stats over the union; that is
    * the REQUANTIZE operation, not the append). */
  /** The memoized BACKLOG SQ8 index (every vector except the DeltaMod
    * residue class — the split all incremental gates share). */
  private def sq8BacklogFor(dir: String, e: DataFrame, numCentroids: Int): String =
    memoStore(ivfSq8Backlogs, s"$dir#c$numCentroids", "graft_ivf_sq8_backlog")(
      writeIvfSq8Index(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, numCentroids))

  def ivfSq8AppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                               k: Int = 10, numCentroids: Int = 16,
                               nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val backlog = sq8BacklogFor(dir, e, numCentroids)
    val idx = ClusterStore.copyStore(backlog, "graft_ivf_sq8_append")
    appendToIvfSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeIvfSq8Index(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_sq8_compact`: the probe-cost maintenance op on the
    * compressed tier proven content-preserving — backlog + append (cell
    * dirs now hold one file set per batch) + [[compactIvfSq8Index]] +
    * probe must re-pass the SAME append oracle (backlog-frozen stats,
    * codes verbatim). */
  def ivfSq8CompactProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                k: Int = 10, numCentroids: Int = 16,
                                nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      sq8BacklogFor(dir, e, numCentroids), "graft_ivf_sq8_compact")
    appendToIvfSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    compactIvfSq8Index(spark, idx)
    probeIvfSq8Index(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_sq8_requantize`: the stats-refresh op — backlog +
    * append + [[requantizeIvfSq8Index]] from the full SOURCE vectors at
    * newC + probe must equal a from-scratch SQ8 build at newC
    * ([[ivfSq8Oracle]] at numCentroids = newC: quantizer AND extrema
    * re-derived over the union — the operation the frozen-stats
    * staleness rule defers to). */
  def ivfSq8RequantizeProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                   k: Int = 10, numCentroids: Int = 16,
                                   newC: Int = 32, nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      sq8BacklogFor(dir, e, numCentroids), "graft_ivf_sq8_requant")
    appendToIvfSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    requantizeIvfSq8Index(spark, idx, e, newC)
    probeIvfSq8Index(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** DuckDB twin of [[ivfSq8AppendProbeFromDir]]: [[ivfSq8Oracle]]'s
    * chain with the stats CTE frozen at the backlog slice. */
  def ivfSq8AppendOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                         nProbe: Int = 4, dim: Int = LshOracleDim): String =
    s"""WITH backlog AS (
       |  SELECT * FROM embeddings WHERE vec_id % ${DedupIndex.DeltaMod} <> 0
       |), ${centroidSimsCtesSql(dim, numCentroids)},
       |${sq8DecCtesSql(dim, statsRelation = "backlog")},
       |${ivfRankedCtesSql(numQueries, nProbe, "s_",
           neRelOpt = Some("dec"), neVecOpt = Some("ne.dv"))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM s_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Gated query `ivf_sq8_probe`: the composed compressed tier end-to-end
    * — build (full-precision assignment, SQ8 cells, stats sidecar), probe
    * (pruned cell read → decode → asymmetric re-score) — under an oracle
    * whose probe chain is [[ivfRankedCtesSql]] with ONLY the re-score's
    * neighbor side swapped to the shared decoded lists. */
  def ivfSq8ProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                         k: Int = 10, numCentroids: Int = 16,
                         nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = sq8StoreFor(spark, dir, e, numCentroids)
    probeIvfSq8Index(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** DuckDB twin of [[ivfSq8ProbeFromDir]]: hash-quantizer sims +
    * [[sq8DecCtesSql]] (single-sourced with `ann_sq8_topk`) + the
    * standard probe chain re-scoring against `dec.dv`. */
  def ivfSq8Oracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                   nProbe: Int = 4, dim: Int = LshOracleDim): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)},
       |${sq8DecCtesSql(dim)},
       |${ivfRankedCtesSql(numQueries, nProbe, "s_",
           neRelOpt = Some("dec"), neVecOpt = Some("ne.dv"))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM s_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ------------------------------- two-level (IMI) coarse quantizer

  /** The inverted multi-index (IMI-style) coarse quantizer — the
    * retirement of the measured O(N·C) scale-killer: the flat
    * literal-centroid argmax sweeps C·dim flops per row, and C must grow
    * ∝ N to keep cells probe-sized (the [[sizedCentroidCount]] rule), so
    * flat assignment cost per ROW creeps up with corpus size (SCALE.md's
    * CScaledProbe: the ×20/C=320 per-row uptick) — and C plan-literal
    * structs hit codegen limits long before wall-clock dies (C=10⁵
    * literal doubles would not even compile a method).
    *
    * Construction (after Babenko & Lempitsky, "The Inverted Multi-Index",
    * CVPR 2012): split each vector into two halves; train an INDEPENDENT
    * codebook of C₁ (resp C₂) centroids per half with the EXISTING exact
    * integer-micros Lloyd machinery ([[trainCentroids]] over the sliced
    * halves — same md5 init, same tie and update rules, so the same
    * unrolled-CTE oracle discipline gates it); a vector's cell is the
    * PAIR (argmax₁, argmax₂). C₁·C₂ effective cells for C₁+C₂ half-width
    * sweeps: per-row assignment is O(√C·dim) instead of O(C·dim), and
    * the plan carries (C₁+C₂)·dim/2 literal doubles instead of C·dim —
    * at C=10⁴ that is 100 cells' worth of literals for 10⁴ cells.
    * Probes are the product of the two per-half probe lists
    * (nProbe₁·nProbe₂ cells per query).
    *
    * Store mechanics are UNCHANGED from the flat index: the combined
    * cell id cid₁·C₂+cid₂ is the partition column, so data layout,
    * partition-pruned probes, manifest commit, append/compact/remove all
    * work on the same shapes. */
  def trainImi(e: DataFrame, c1: Int, c2: Int, iterations: Int, dim: Int)
      : (Array[(Int, Array[Double])], Array[(Int, Array[Double])]) = {
    require(dim % 2 == 0, s"IMI splits the vector in half; dim $dim is odd")
    val h = dim / 2
    (trainCentroids(halfView(e, 1, h), c1, iterations, Some(h)),
      trainCentroids(halfView(e, h + 1, h), c2, iterations, Some(h)))
  }

  /** (vec_id, embedding=the [lo, lo+len) slice) — the half-space view
    * both training and the oracle's `half1`/`half2` CTEs run over. */
  private def halfView(e: DataFrame, lo: Int, len: Int): DataFrame =
    e.select(col("vec_id"), slice(col("embedding"), lo, len).as("embedding"))

  /** Both half-assignments in ONE corpus scan — no join between the
    * halves, the point of [[assignExpr]]. */
  def assignImi(e: DataFrame, cents1: Array[(Int, Array[Double])],
                cents2: Array[(Int, Array[Double])], halfDim: Int): DataFrame =
    e.withColumn("cid1", assignExpr(slice(col("embedding"), 1, halfDim), cents1))
      .withColumn("cid2", assignExpr(slice(col("embedding"), halfDim + 1, halfDim), cents2))

  /** Per-query probed cells: the PRODUCT of the two per-half nProbe
    * lists (query-sized × nProbe₁ × nProbe₂ rows — driver/broadcast
    * scale by construction). Tie-breaks per half mirror [[queryProbes]]
    * (smaller cid). */
  private def imiQueryCells(queries: DataFrame,
                            cents1: Array[(Int, Array[Double])],
                            cents2: Array[(Int, Array[Double])],
                            halfDim: Int, nProbe1: Int, nProbe2: Int): DataFrame = {
    val p1 = queryProbes(halfView(queries, 1, halfDim), cents1, nProbe1)
      .select(col("query_id"), col("centroid_id").as("cid1"))
    val p2 = queryProbes(halfView(queries, halfDim + 1, halfDim), cents2, nProbe2)
      .select(col("query_id"), col("centroid_id").as("cid2"))
    p1.join(p2, Seq("query_id"))
  }

  /** Persist the IMI index: data partitioned by the COMBINED cell id
    * (cid₁·C₂+cid₂ — one directory per (cid₁, cid₂) pair, so probes are
    * partition pruning exactly as in the flat store), both half
    * codebooks in `_quantizer1_v`/`_quantizer2_v` sidecars, same
    * one-rename manifest commit. */
  def writeImiIndex(e: DataFrame, dir: String, c1: Int = 8, c2: Int = 8,
                    iterations: Int = 2): Unit =
    stageImiGeneration(e, dir, c1, c2, iterations, gen = 0L)

  /** Stage one complete IMI generation (combined-cell data + both half
    * codebooks) from SOURCE vectors and commit — shared by the build
    * and [[requantizeImiIndex]]. */
  private def stageImiGeneration(e: DataFrame, dir: String, c1: Int, c2: Int,
                                 iterations: Int, gen: Long): Unit = {
    val spark = e.sparkSession
    val dim = embeddingDim(e)
    val (cents1, cents2) = trainImi(e, c1, c2, iterations, dim)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assignImi(e, cents1, cents2, dim / 2)
      .withColumn("centroid_id", col("cid1") * c2 + col("cid2"))
      .drop("cid1", "cid2")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/data_v$gen")
    saveQuantizer(spark, s"$dir/_quantizer1_v$gen", cents1)
    saveQuantizer(spark, s"$dir/_quantizer2_v$gen", cents2)
    commitIvfGen(dir, gen)
  }

  /** Re-quantize the IMI tier: retrain BOTH half codebooks on the
    * source at the new (C₁, C₂) and stage a complete next generation —
    * the growth-maintenance op, amortized across the appends whose
    * drift triggered it (a re-quantize IS a re-partition of space, so
    * every row must re-assign). */
  def requantizeImiIndex(spark: SparkSession, dir: String, source: DataFrame,
                         c1: Int, c2: Int, iterations: Int = 2): Unit =
    promoteFreshGeneration(dir, Seq("_quantizer1_v", "_quantizer2_v"))(
      stageImiGeneration(source, dir, c1, c2, iterations, _))

  /** Partition-pruned probe over the persisted IMI index: quantizers
    * reload from the sidecars, each query's nProbe₁×nProbe₂ cell pairs
    * map to combined ids, the union of probed ids prunes the scan, exact
    * full-precision re-score. */
  def probeImiIndex(spark: SparkSession, dir: String, queries: DataFrame,
                    k: Int = 10, nProbe1: Int = 2, nProbe2: Int = 2): DataFrame = {
    val g = ivfGen(dir)
    val cents1 = readQuantizerPath(spark, s"$dir/_quantizer1_v$g")
    val cents2 = readQuantizerPath(spark, s"$dir/_quantizer2_v$g")
    val probes = imiProbeFrame(queries, cents1, cents2, nProbe1, nProbe2)
    val cells = prunedCellScan(spark, s"$dir/data_v$g", probes)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"))
    scoreProbed(probes, cells, k)
  }

  /** (query_id, qe, centroid_id) per probed COMBINED cell — the
    * nProbe₁×nProbe₂ product cells with the query vector carried, shared
    * by the float-IMI and IMI×SQ8 probe paths. */
  private def imiProbeFrame(queries: DataFrame,
                            cents1: Array[(Int, Array[Double])],
                            cents2: Array[(Int, Array[Double])],
                            nProbe1: Int, nProbe2: Int): DataFrame =
    imiQueryCells(queries, cents1, cents2, cents1.head._2.length,
        nProbe1, nProbe2)
      .withColumn("centroid_id", col("cid1") * cents2.length + col("cid2"))
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), Seq("query_id"))
      .select(col("query_id"), col("qe"), col("centroid_id"))

  /** The partition-pruned cell read every probe path shares: collect the
    * O(|probed cells|) distinct cell ids (driver-sized by construction)
    * and push them as a partition filter on the scan — only those cells'
    * directories are listed and read. */
  private def prunedCellScan(spark: SparkSession, dataDir: String,
                             probes: DataFrame): DataFrame = {
    val probedCells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    // queries and quantizers are both non-empty by construction (the
    // sidecar reads above guard their listings), so an empty probe set
    // can only be a silent upstream emptiness — fail loudly instead of
    // serving an empty vector tier (the readQuantizerPath guard's story)
    require(probedCells.nonEmpty,
      s"no probed cells for $dataDir — empty probe frame upstream")
    spark.read.parquet(dataDir)
      .filter(col("centroid_id").isin(probedCells.map(Integer.valueOf).toIndexedSeq: _*))
  }

  /** Both persisted half-codebooks of the live generation. */
  private def readImiQuantizers(spark: SparkSession, dir: String)
      : (Array[(Int, Array[Double])], Array[(Int, Array[Double])]) = {
    val g = ivfGen(dir)
    (readQuantizerPath(spark, s"$dir/_quantizer1_v$g"),
      readQuantizerPath(spark, s"$dir/_quantizer2_v$g"))
  }

  /** O(batch) ingestion into the IMI index: assign the batch against the
    * PERSISTED half-codebooks (frozen at build — the quantizer-drift
    * argument applies per half), land files in the combined-cell
    * partition directories. Old data never re-read or re-assigned —
    * assignment is a pure per-vector function of the two codebooks, so
    * append + probe equals a same-codebook rebuild over the union. */
  def appendToImiIndex(spark: SparkSession, dir: String,
                       newVectors: DataFrame): Unit = {
    val (cents1, cents2) = readImiQuantizers(spark, dir)
    assignImi(newVectors, cents1, cents2, cents1.head._2.length)
      .withColumn("centroid_id", col("cid1") * cents2.length + col("cid2"))
      .drop("cid1", "cid2")
      .write.mode("append").partitionBy("centroid_id").parquet(ivfDataDir(dir))
  }

  /** Deletion on the IMI index: the filtered generation rewrite under
    * the frozen half-codebooks (rows move verbatim, cell-coalesced —
    * doubles as a compaction), sidecars carried forward, one-rename
    * commit — the same takedown mechanics as every other store. */
  def removeFromImiIndex(spark: SparkSession, dir: String,
                         removedIds: DataFrame): Unit =
    rewriteImiGeneration(spark, dir,
      _.join(removedIds.select(col("vec_id")), Seq("vec_id"), "left_anti"))

  /** Compaction for the IMI tier: N appends leave N file sets per cell
    * dir; the identity-filter generation rewrite returns every cell to
    * ONE file under the unchanged frozen codebooks — content-preserving
    * (`ivf_imi_compact` re-passes the append oracle). */
  def compactImiIndex(spark: SparkSession, dir: String): Unit =
    rewriteImiGeneration(spark, dir, identity)

  private def rewriteImiGeneration(spark: SparkSession, dir: String,
                                   keep: DataFrame => DataFrame): Unit =
    rewriteGeneration(spark, dir, Seq("_quantizer1_v", "_quantizer2_v"), keep)

  private val imiStores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val imiBacklogs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized BACKLOG IMI index (codebooks trained on every vector
    * except the DeltaMod residue class). */
  private def imiBacklogFor(dir: String, e: DataFrame, c1: Int, c2: Int,
                            iterations: Int): String =
    memoStore(imiBacklogs, s"$dir#${c1}x$c2#i$iterations", "graft_imi_backlog")(
      writeImiIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, c1, c2, iterations))

  /** Gated query `ivf_imi_append`: the O(batch) path on the two-level
    * index — codebooks TRAINED on the backlog, the DeltaMod delta
    * appended under them, probe. The oracle trains its unrolled Lloyd
    * chains over the backlog slice only (`trainWhere`) while final
    * assignment/probing cover the union — exactly the production
    * frozen-quantizer semantics. */
  def imiAppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, c1: Int = 8, c2: Int = 8,
                            nProbe1: Int = 2, nProbe2: Int = 2,
                            iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiBacklogFor(dir, e, c1, c2, iterations), "graft_imi_append")
    appendToImiIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeImiIndex(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `ivf_imi_compact`: backlog + append (cell dirs now
    * hold one file set per batch) + [[compactImiIndex]] + probe — must
    * re-pass the append oracle (content-preserving under the
    * backlog-frozen codebooks). */
  def imiCompactProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                             k: Int = 10, c1: Int = 8, c2: Int = 8,
                             nProbe1: Int = 2, nProbe2: Int = 2,
                             iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiBacklogFor(dir, e, c1, c2, iterations), "graft_imi_compact")
    appendToImiIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    compactImiIndex(spark, idx)
    probeImiIndex(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `ivf_imi_requantize`: backlog + append +
    * [[requantizeImiIndex]] from the full source at the new (C₁, C₂) +
    * probe — must equal a from-scratch IMI build at the new codebook
    * sizes (both Lloyd chains re-trained over the union). */
  def imiRequantizeProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                k: Int = 10, c1: Int = 8, c2: Int = 8,
                                newC1: Int = 16, newC2: Int = 16,
                                nProbe1: Int = 2, nProbe2: Int = 2,
                                iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiBacklogFor(dir, e, c1, c2, iterations), "graft_imi_requant")
    appendToImiIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    requantizeImiIndex(spark, idx, e, newC1, newC2, iterations)
    probeImiIndex(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `ivf_imi_remove`: takedown on the two-level index —
    * copy the memoized full-corpus-trained index, remove the DeltaMod
    * residue class, probe with the surviving low-id queries. The oracle
    * keeps training on the FULL corpus (where the index was built) and
    * restricts assignment/probing/scoring to the kept rows
    * (`keepWhere`). */
  def imiRemoveProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, c1: Int = 8, c2: Int = 8,
                            nProbe1: Int = 2, nProbe2: Int = 2,
                            iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val full = imiStoreFor(dir, e, c1, c2, iterations)
    val idx = ClusterStore.copyStore(full, "graft_imi_remove")
    removeFromImiIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0).select(col("vec_id")))
    probeImiIndex(spark, idx,
      e.filter(col("vec_id") < numQueries &&
        col("vec_id") % DedupIndex.DeltaMod =!= 0), k, nProbe1, nProbe2)
  }

  /** Gated query `ivf_ann_imi`: the full two-level pipeline — train both
    * half codebooks (T exact Lloyd iterations each), build the persisted
    * combined-cell index, reload the sidecar quantizers, partition-pruned
    * probe, exact re-score — under an oracle that unrolls BOTH training
    * chains via [[kmeansIterCtesSql]] over the half relations. */
  def imiAnnFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                    k: Int = 10, c1: Int = 8, c2: Int = 8, nProbe1: Int = 2,
                    nProbe2: Int = 2, iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = imiStoreFor(dir, e, c1, c2, iterations)
    probeImiIndex(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  private val imiHashBacklogs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val imiHealthStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gated query `ivf_imi_health`: the drift scan on the two-level tier,
    * in exact integers — per row, quality = the SUM of the two half-space
    * assigned cosines (each micros-rounded BEFORE the long sum, the
    * `ivf_index_health` discipline), split into build/now populations by
    * the DeltaMod backlog predicate (appends never rewrite old rows).
    * The store is a hash-codebook backlog (iterations = 0 — the health
    * rule must be oracle-reproducible; trained health is the same scan
    * over trained codebooks) with the delta appended — the post-lifecycle
    * state health is read from. Growth/drift are one division away
    * ([[IvfHealth]]); the triggers and the [[requantizeImiIndex]] they
    * fire are the same maintenance loop as the float tier's. */
  def imiHealthGateFromDir(spark: SparkSession, dir: String,
                           c1: Int = 8, c2: Int = 8): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val backlog = memoStore(imiHashBacklogs, s"$dir#${c1}x$c2#i0",
        "graft_imi_hash_backlog")(
      writeImiIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, c1, c2, iterations = 0))
    val idx = imiHealthStores.computeIfAbsent(s"$dir#${c1}x$c2", _ => {
      val c = ClusterStore.copyStore(backlog, "graft_imi_health")
      appendToImiIndex(spark, c,
        e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
      c
    })
    val (cents1, cents2) = readImiQuantizers(spark, idx)
    val halfDim = cents1.head._2.length
    val cid1 = expr(s"centroid_id DIV ${cents2.length}")
    val cid2 = pmod(col("centroid_id"), lit(cents2.length))
    def assignedHalf(cents: Array[(Int, Array[Double])], cid: Column,
                     lo: Int): Column =
      coalesce(cents.map { case (id, c) =>
        when(cid === id, litCosine(slice(col("embedding"), lo, halfDim), c))
      }.toIndexedSeq: _*)
    val micro =
      floor(assignedHalf(cents1, cid1, 1) * 1e6 + 0.5).cast("long") +
        floor(assignedHalf(cents2, cid2, halfDim + 1) * 1e6 + 0.5).cast("long")
    val isBuild = col("vec_id") % DedupIndex.DeltaMod =!= 0
    spark.read.parquet(ivfDataDir(idx)).agg(
      count(when(isBuild, lit(1))).as("n_build"),
      count(lit(1)).as("n_now"),
      sum(when(isBuild, micro)).as("sim_build_micros"),
      sum(micro).as("sim_now_micros"))
  }

  /** DuckDB twin of [[imiHealthGateFromDir]]: per-half md5 codebooks +
    * argmax assignment (ties → larger cid, as everywhere), per-half
    * micros rounding, one integer sum. */
  def imiHealthOracle(c1: Int = 8, c2: Int = 8,
                      dim: Int = LshOracleDim): String = {
    val h = dim / 2
    def assign(p: String) =
      s"""${p}a AS (
         |  SELECT vec_id, sim FROM (
         |    SELECT vec_id, sim, ROW_NUMBER() OVER (PARTITION BY vec_id
         |             ORDER BY sim DESC, cid DESC) AS rk
         |    FROM ${p}sims
         |  ) WHERE rk = 1
         |)""".stripMargin
    s"""WITH half1 AS (SELECT vec_id, embedding[1:$h] AS embedding FROM embeddings),
       |half2 AS (SELECT vec_id, embedding[${h + 1}:$dim] AS embedding FROM embeddings),
       |${centroidSimsCtesSql(h, c1, "half1", "h1_")},
       |${centroidSimsCtesSql(h, c2, "half2", "h2_")},
       |${assign("h1_")},
       |${assign("h2_")},
       |m AS (
       |  SELECT a1.vec_id,
       |         CAST(FLOOR(a1.sim * 1e6 + 0.5) AS BIGINT)
       |           + CAST(FLOOR(a2.sim * 1e6 + 0.5) AS BIGINT) AS micro
       |  FROM h1_a a1 JOIN h2_a a2 ON a1.vec_id = a2.vec_id
       |)
       |SELECT CAST(COUNT(CASE WHEN vec_id % ${DedupIndex.DeltaMod} <> 0 THEN 1 END) AS BIGINT) AS n_build,
       |       CAST(COUNT(*) AS BIGINT) AS n_now,
       |       CAST(SUM(CASE WHEN vec_id % ${DedupIndex.DeltaMod} <> 0 THEN micro END) AS BIGINT) AS sim_build_micros,
       |       CAST(SUM(micro) AS BIGINT) AS sim_now_micros
       |FROM m""".stripMargin
  }

  /** The memoized full-corpus trained IMI index (one per JVM, per
    * (dir, build params)) — `private[operators]` so the SemDeDup gate can
    * prune over the SAME persisted assignment a probe serves from. */
  private[operators] def imiStoreFor(dir: String, e: DataFrame, c1: Int, c2: Int,
                                     iterations: Int): String =
    memoStore(imiStores, s"$dir#${c1}x$c2#i$iterations", "graft_imi_index")(
      writeImiIndex(e, _, c1, c2, iterations))

  /** DuckDB twin of [[imiAnnFromDir]]: `half1`/`half2` slice CTEs, two
    * md5-init + unrolled-Lloyd chains (prefixes `h1_`/`h2_` — the
    * [[kmeansTrainOracle]] fragments over the half relations), per-half
    * argmax assignment (ties → larger cid) and probe windows (ties →
    * smaller cid), candidates on the (cid₁, cid₂) PAIR, exact
    * full-precision re-score. A vector's pair is unique and each probe
    * list holds distinct cids, so candidates need no DISTINCT.
    *
    * Lifecycle params: `trainWhere` restricts TRAINING to a slice while
    * assignment/probing/scoring cover the full corpus (the APPEND
    * semantics — codebooks frozen at the backlog build, batch assigned
    * under them); `keepWhere` restricts assignment/probing/scoring to
    * the kept rows while training stays where the index was built (the
    * REMOVE semantics). Final sims are re-derived in `f*_sims` over the
    * serving relation against the trained codebooks, so the two scopes
    * are independent. */
  def imiAnnOracle(numQueries: Int = 8, k: Int = 10, c1: Int = 8, c2: Int = 8,
                   nProbe1: Int = 2, nProbe2: Int = 2, iterations: Int = 2,
                   dim: Int = LshOracleDim,
                   trainWhere: Option[String] = None,
                   keepWhere: Option[String] = None,
                   extraCtes: String = "",
                   neRelOpt: Option[String] = None,
                   neVecOpt: Option[String] = None): String = {
    // the re-score's NEIGHBOR side is swappable — the IMI×SQ8 gate scores
    // against `dec.dv` decoded lists injected via `extraCtes`; assignment
    // and probes stay on the full-precision half sims (the asymmetric
    // shape, exactly the ivfRankedCtesSql substitution)
    val neRel = neRelOpt.getOrElse("kept")
    val neVec = neVecOpt.getOrElse("CAST(ne.embedding AS DOUBLE[])")
    val h = dim / 2
    // iterations = 0 degrades to the hash-codebook chain: no Lloyd CTEs,
    // final codebooks are the md5 init (a bare "$iters," with empty
    // fragments would be a SQL syntax error, and h*_k_cent0 never exists)
    def trainCtes(p: String, rel: String): String =
      if (iterations == 0) "" else (0 until iterations)
        .map(i => kmeansIterCtesSql(i, h, p, rel)).mkString(",\n") + ",\n"
    def finalCent(p: String): String =
      if (iterations == 0) s"${p}centroids" else s"${p}k_cent$iterations"
    val trainW = trainWhere.map(w => s" WHERE $w").getOrElse("")
    val keepW = keepWhere.map(w => s" WHERE $w").getOrElse("")
    s"""WITH half1 AS (SELECT vec_id, embedding[1:$h] AS embedding FROM embeddings$keepW),
       |half2 AS (SELECT vec_id, embedding[${h + 1}:$dim] AS embedding FROM embeddings$keepW),
       |bhalf1 AS (SELECT vec_id, embedding[1:$h] AS embedding FROM embeddings$trainW),
       |bhalf2 AS (SELECT vec_id, embedding[${h + 1}:$dim] AS embedding FROM embeddings$trainW),
       |kept AS (SELECT * FROM embeddings$keepW),
       |$extraCtes${centroidSimsCtesSql(h, c1, "bhalf1", "h1_")},
       |${trainCtes("h1_", "bhalf1")}${centroidSimsCtesSql(h, c2, "bhalf2", "h2_")},
       |${trainCtes("h2_", "bhalf2")}f1_sims AS (
       |  SELECT e.vec_id, ct.cid,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ct.c) AS sim
       |  FROM half1 e CROSS JOIN ${finalCent("h1_")} ct
       |), f2_sims AS (
       |  SELECT e.vec_id, ct.cid,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ct.c) AS sim
       |  FROM half2 e CROSS JOIN ${finalCent("h2_")} ct
       |),
       |a1 AS (
       |  SELECT vec_id, cid AS cid1 FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM f1_sims
       |  ) WHERE rk = 1
       |), a2 AS (
       |  SELECT vec_id, cid AS cid2 FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM f2_sims
       |  ) WHERE rk = 1
       |), p1 AS (
       |  SELECT vec_id AS query_id, cid AS cid1 FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid ASC) AS rk
       |    FROM f1_sims WHERE vec_id < $numQueries
       |  ) WHERE rk <= $nProbe1
       |), p2 AS (
       |  SELECT vec_id AS query_id, cid AS cid2 FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid ASC) AS rk
       |    FROM f2_sims WHERE vec_id < $numQueries
       |  ) WHERE rk <= $nProbe2
       |), imi_cand AS (
       |  SELECT p1.query_id, a1.vec_id AS neighbor_id
       |  FROM p1 JOIN p2 ON p1.query_id = p2.query_id
       |       JOIN a1 ON a1.cid1 = p1.cid1
       |       JOIN a2 ON a2.vec_id = a1.vec_id AND a2.cid2 = p2.cid2
       |  WHERE a1.vec_id <> p1.query_id
       |), imi_scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                $neVec) AS cosine
       |  FROM imi_cand c JOIN kept qe ON qe.vec_id = c.query_id
       |                  JOIN $neRel ne ON ne.vec_id = c.neighbor_id
       |), imi_ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM imi_scored
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM imi_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------- IMI × SQ8: two-level cells, uint8 codes

  /** The tier a 100 TB deployment actually serves: the two-level IMI
    * quantizer (O(√C·dim) assignment, C₁·C₂ partition-pruned cells —
    * retiring the flat O(N·C) sweep) COMPOSED with SQ8 compression
    * (cells store uint8 CODES, 4× less storage AND 4× less probe read
    * than float32). Build = both half assignments + the encode in ONE
    * corpus scan; probe = pruned combined-cell read → decode →
    * asymmetric re-score against full-precision queries; lifecycle =
    * the shared [[rewriteGeneration]] discipline over exactly one
    * sidecar list (`_quantizer1_v`, `_quantizer2_v`, `_sq8_v`).
    * Codebooks AND extrema freeze at build and refresh together on the
    * requantize cadence — the staleness rule of both parent tiers,
    * unchanged by the composition. */
  def writeImiSq8Index(e: DataFrame, dir: String, c1: Int = 8, c2: Int = 8,
                       iterations: Int = 2): Unit =
    stageImiSq8Generation(e, dir, c1, c2, iterations, gen = 0L)

  /** Stage one complete IMI×SQ8 generation (combined-cell CODES + both
    * half codebooks + extrema) from SOURCE float vectors and commit —
    * shared by the build and [[requantizeImiSq8Index]]. Assignment and
    * encode fuse into one scan projection (both half argmaxes + the
    * per-dim quantize are expression-level). */
  private def stageImiSq8Generation(e: DataFrame, dir: String, c1: Int, c2: Int,
                                    iterations: Int, gen: Long): Unit = {
    val spark = e.sparkSession
    val dim = embeddingDim(e)
    val (cents1, cents2) = trainImi(e, c1, c2, iterations, dim)
    val (mn, mx) = sq8Stats(e, dim)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assignImi(e, cents1, cents2, dim / 2)
      .withColumn("centroid_id", col("cid1") * cents2.length + col("cid2"))
      .select(col("vec_id"), sq8Encode(col("embedding"), mn, mx).as("codes"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/data_v$gen")
    saveQuantizer(spark, s"$dir/_quantizer1_v$gen", cents1)
    saveQuantizer(spark, s"$dir/_quantizer2_v$gen", cents2)
    import spark.implicits._
    Seq((mn.toSeq, mx.toSeq)).toDF("mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_sq8_v$gen")
    commitIvfGen(dir, gen)
  }

  /** Partition-pruned probe over the composed tier: reload both half
    * codebooks + extrema from the sidecars, map each query's
    * nProbe₁×nProbe₂ cell pairs to combined ids, read ONLY those cells'
    * code files, decode, asymmetric re-score ([[scoreProbedDecoded]] —
    * the same tail as the flat SQ8 probe). */
  def probeImiSq8Index(spark: SparkSession, dir: String, queries: DataFrame,
                       k: Int = 10, nProbe1: Int = 2, nProbe2: Int = 2): DataFrame = {
    val g = ivfGen(dir)
    val cents1 = readQuantizerPath(spark, s"$dir/_quantizer1_v$g")
    val cents2 = readQuantizerPath(spark, s"$dir/_quantizer2_v$g")
    val (mn, mx) = readSq8Sidecar(spark, dir, g)
    val probes = imiProbeFrame(queries, cents1, cents2, nProbe1, nProbe2)
    val cells = prunedCellScan(spark, s"$dir/data_v$g", probes)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        sq8Decode(col("codes"), mn, mx).as("dv"))
    scoreProbedDecoded(probes, cells, k)
  }

  /** O(batch) ingestion into the composed tier: assign the batch under
    * the PERSISTED half codebooks and encode under the PERSISTED extrema
    * (all frozen at build — saturating clamp for out-of-range values,
    * as in the flat tier), land code files in the combined-cell
    * partition directories. Old codes never re-read or re-encoded. */
  def appendToImiSq8Index(spark: SparkSession, dir: String,
                          newVectors: DataFrame): Unit = {
    val (cents1, cents2) = readImiQuantizers(spark, dir)
    val (mn, mx) = readSq8Sidecar(spark, dir, ivfGen(dir))
    assignImi(newVectors, cents1, cents2, cents1.head._2.length)
      .withColumn("centroid_id", col("cid1") * cents2.length + col("cid2"))
      .select(col("vec_id"), sq8Encode(col("embedding"), mn, mx).as("codes"),
        col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(ivfDataDir(dir))
  }

  /** Deletion on the composed tier: the filtered generation rewrite
    * under ALL frozen sidecars — kept codes move verbatim (they were
    * encoded under the stored extrema; re-encoding would shift decoded
    * values), cell-coalesced, one-rename commit. */
  def removeFromImiSq8Index(spark: SparkSession, dir: String,
                            removedIds: DataFrame): Unit =
    rewriteImiSq8Generation(spark, dir,
      _.join(removedIds.select(col("vec_id")), Seq("vec_id"), "left_anti"))

  /** Compaction: identity-filter generation rewrite — one code file per
    * combined cell, codebooks/extrema unchanged, content-preserving
    * (`imi_sq8_compact` re-passes the append oracle). */
  def compactImiSq8Index(spark: SparkSession, dir: String): Unit =
    rewriteImiSq8Generation(spark, dir, identity)

  private def rewriteImiSq8Generation(spark: SparkSession, dir: String,
                                      keep: DataFrame => DataFrame): Unit =
    rewriteGeneration(spark, dir,
      Seq("_quantizer1_v", "_quantizer2_v", "_sq8_v"), keep)

  /** Re-quantize the composed tier: codes are LOSSY, so the refresh
    * re-reads the SOURCE float vectors — BOTH half codebooks retrained
    * and the extrema re-derived at the new (C₁, C₂), full next
    * generation staged, one rename. After it the index is
    * indistinguishable from a from-scratch composed build at the new
    * sizes (`imi_sq8_requantize`). */
  def requantizeImiSq8Index(spark: SparkSession, dir: String, source: DataFrame,
                            c1: Int, c2: Int, iterations: Int = 2): Unit =
    promoteFreshGeneration(dir, Seq("_quantizer1_v", "_quantizer2_v", "_sq8_v"))(
      stageImiSq8Generation(source, dir, c1, c2, iterations, _))

  private val imiSq8Stores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val imiSq8Backlogs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized full-corpus composed index (one per JVM, per
    * (dir, build params)). */
  private def imiSq8StoreFor(dir: String, e: DataFrame, c1: Int, c2: Int,
                             iterations: Int): String =
    memoStore(imiSq8Stores, s"$dir#${c1}x$c2#i$iterations", "graft_imi_sq8")(
      writeImiSq8Index(e, _, c1, c2, iterations))

  /** The memoized BACKLOG composed index (codebooks AND extrema derived
    * from every vector except the DeltaMod residue class — the shared
    * incremental-gate split). */
  private def imiSq8BacklogFor(dir: String, e: DataFrame, c1: Int, c2: Int,
                               iterations: Int): String =
    memoStore(imiSq8Backlogs, s"$dir#${c1}x$c2#i$iterations", "graft_imi_sq8_backlog")(
      writeImiSq8Index(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, c1, c2, iterations))

  /** Gated query `imi_sq8_probe`: the composed serving tier end-to-end —
    * train both half codebooks, build the combined-cell CODE index,
    * reload all three sidecars, pruned probe, decode, asymmetric
    * re-score — under [[imiSq8Oracle]]: the trained-IMI chain with ONLY
    * the re-score's neighbor side swapped to the shared decoded lists
    * (the `ivf_sq8_probe` substitution lifted onto the two-level
    * chain). */
  def imiSq8ProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                         k: Int = 10, c1: Int = 8, c2: Int = 8,
                         nProbe1: Int = 2, nProbe2: Int = 2,
                         iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = imiSq8StoreFor(dir, e, c1, c2, iterations)
    probeImiSq8Index(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `imi_sq8_append`: the O(batch) path — codebooks and
    * extrema frozen at the backlog build, the DeltaMod delta assigned
    * and encoded under them, probe. Oracle trains AND derives stats on
    * the backlog slice only while serving covers the union — the
    * production frozen-sidecar semantics. */
  def imiSq8AppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                               k: Int = 10, c1: Int = 8, c2: Int = 8,
                               nProbe1: Int = 2, nProbe2: Int = 2,
                               iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiSq8BacklogFor(dir, e, c1, c2, iterations), "graft_imi_sq8_append")
    appendToImiSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeImiSq8Index(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `imi_sq8_stream_append`: the STREAMING ingestion path
    * on the tier a 100 TB deployment serves — the delta arrives as
    * watermark-deduped micro-batches ([[graft.streaming.IndexIngest]],
    * plants and all) and each surviving batch lands through the SAME
    * [[appendToImiSq8Index]] the batch gate proves. Encode is a pure
    * per-vector function of the frozen codebooks + extrema, so the
    * stream lands exactly what the one-shot batch append lands: the
    * SAME oracle as `imi_sq8_append` — which is the point of the
    * callback-sink design: ONE ingest transform serves every tier. */
  def imiSq8StreamAppendProbeFromDir(spark: SparkSession, dir: String,
                                     numQueries: Int = 8,
                                     k: Int = 10, c1: Int = 8, c2: Int = 8,
                                     nProbe1: Int = 2, nProbe2: Int = 2,
                                     iterations: Int = 2,
                                     nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiSq8BacklogFor(dir, e, c1, c2, iterations), "graft_imi_sq8_stream")
    val delta = e.filter(col("vec_id") % DedupIndex.DeltaMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .as[(Long, Seq[Float])].collect()
    graft.streaming.IndexIngest.replayVectors(spark, delta,
      b => appendToImiSq8Index(spark, idx, b), nBatches)
    probeImiSq8Index(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `imi_sq8_remove`: takedown on the composed tier — copy
    * the memoized full-corpus index, remove the DeltaMod residue class
    * (codes rewritten verbatim under the frozen sidecars), probe with
    * the surviving low-id queries. Oracle: training and stats stay at
    * the full corpus (where the index was built), serving restricted to
    * kept rows. */
  def imiSq8RemoveProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                               k: Int = 10, c1: Int = 8, c2: Int = 8,
                               nProbe1: Int = 2, nProbe2: Int = 2,
                               iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiSq8StoreFor(dir, e, c1, c2, iterations), "graft_imi_sq8_remove")
    removeFromImiSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0).select(col("vec_id")))
    probeImiSq8Index(spark, idx,
      e.filter(col("vec_id") < numQueries &&
        col("vec_id") % DedupIndex.DeltaMod =!= 0), k, nProbe1, nProbe2)
  }

  /** Gated query `imi_sq8_compact`: backlog + append + identity rewrite
    * + probe — must re-pass the append oracle (codes verbatim under the
    * frozen sidecars; calendar time changes file counts, not content). */
  def imiSq8CompactProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                k: Int = 10, c1: Int = 8, c2: Int = 8,
                                nProbe1: Int = 2, nProbe2: Int = 2,
                                iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiSq8BacklogFor(dir, e, c1, c2, iterations), "graft_imi_sq8_compact")
    appendToImiSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    compactImiSq8Index(spark, idx)
    probeImiSq8Index(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** Gated query `imi_sq8_requantize`: backlog + append +
    * [[requantizeImiSq8Index]] from the full source at the new (C₁, C₂)
    * + probe — must equal a from-scratch composed build at the new
    * sizes (codebooks AND extrema re-derived over the union). */
  def imiSq8RequantizeProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                   k: Int = 10, c1: Int = 8, c2: Int = 8,
                                   newC1: Int = 16, newC2: Int = 16,
                                   nProbe1: Int = 2, nProbe2: Int = 2,
                                   iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      imiSq8BacklogFor(dir, e, c1, c2, iterations), "graft_imi_sq8_requant")
    appendToImiSq8Index(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    requantizeImiSq8Index(spark, idx, e, newC1, newC2, iterations)
    probeImiSq8Index(spark, idx, e.filter(col("vec_id") < numQueries),
      k, nProbe1, nProbe2)
  }

  /** DuckDB twin of the composed tier: [[imiAnnOracle]]'s trained
    * two-level chain with [[sq8DecCtesSql]] injected (stats over
    * `sq8src` — the staleness scope — decoding the SERVED relation) and
    * the re-score's neighbor side swapped to `dec.dv`. The three
    * lifecycle scopes are independent, exactly as on the Spark side:
    * `trainWhere` freezes the codebooks, `statsWhere` freezes the
    * extrema, `keepWhere` restricts serving. */
  def imiSq8Oracle(numQueries: Int = 8, k: Int = 10, c1: Int = 8, c2: Int = 8,
                   nProbe1: Int = 2, nProbe2: Int = 2, iterations: Int = 2,
                   dim: Int = LshOracleDim,
                   trainWhere: Option[String] = None,
                   keepWhere: Option[String] = None,
                   statsWhere: Option[String] = None): String = {
    val statsW = statsWhere.map(w => s" WHERE $w").getOrElse("")
    val extra =
      s"""sq8src AS (SELECT * FROM embeddings$statsW),
         |${sq8DecCtesSql(dim, statsRelation = "sq8src", relation = "kept")},
         |""".stripMargin
    imiAnnOracle(numQueries, k, c1, c2, nProbe1, nProbe2, iterations, dim,
      trainWhere, keepWhere, extraCtes = extra,
      neRelOpt = Some("dec"), neVecOpt = Some("ne.dv"))
  }

  // ------------------------------------------------- gated ANN recall

  /** Gated query `ann_recall`: recall@k of the four UNCODED serving
    * tiers — the persisted float IVF index (`ivf_probe_indexed`), the
    * SQ8 compressed tier (`ivf_sq8_probe`), the two-level IMI index
    * (`ivf_ann_imi`), and the composed IMI×SQ8 tier (`imi_sq8_probe`)
    * — against brute-force ground truth (`knn_cosine_topk`), at the
    * gates' fixed probe fractions. The PQ code family gates separately
    * under `ann_recall_pq` ([[annRecallPqFromDir]]) — the r15/r16 ask:
    * the 7-tier monolith was the #2 line item in BOTH driver budgets
    * (20.2 s Spark, 50 s oracle, 64.9 KB SQL), and the split halves
    * each gate's cost while keeping the same absolute hit floors. The
    * surface is EXACT integer hit counts per query (id-set intersection
    * of the top-k lists), so approximation quality gates
    * deterministically on the driver instead of living only in specs: a
    * quantizer or probe regression that silently costs recall now fails
    * the round even when each path stays self-consistent (each path's
    * own gate only pins that it equals ITS oracle — not that it still
    * finds the true neighbors).
    *
    * Scale: both probe inputs are the memoized persisted indexes (built
    * once per JVM); ground truth is the same broadcast-query brute scan
    * as the knn anchor — query-bounded, one corpus pass. The joins are
    * k·|Q|-row id lists. */
  def annRecallFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                       k: Int = 10, numCentroids: Int = 16,
                       nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val truth = bruteForceKnn(e, e.filter(col("vec_id") < numQueries), k)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = ivfProbeIndexedFromDir(spark, dir, numQueries, k, numCentroids, nProbe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_ivf"))
    val sq8 = ivfSq8ProbeFromDir(spark, dir, numQueries, k, numCentroids, nProbe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_sq8"))
    // probe-fraction-fair: IVF reads nProbe/C = 4/16 = 25% of cells, so
    // the two-level tiers probe 4×4 = 16 of their 64 cells — the same
    // 25% — or the comparison would just measure probe budgets, not
    // quantizers
    val imi = imiAnnFromDir(spark, dir, numQueries, k,
      nProbe1 = 4, nProbe2 = 4)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_imi"))
    // the fourth tier: the composed IMI×SQ8 serving configuration — its
    // recall now gates alongside the tiers it composes
    val imisq8 = imiSq8ProbeFromDir(spark, dir, numQueries, k,
      nProbe1 = 4, nProbe2 = 4)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_imisq8"))
    truth
      .join(ivf, Seq("query_id", "neighbor_id"), "left")
      .join(sq8, Seq("query_id", "neighbor_id"), "left")
      .join(imi, Seq("query_id", "neighbor_id"), "left")
      .join(imisq8, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_truth"),
        coalesce(sum(col("in_ivf")), lit(0L)).as("hits_ivf"),
        coalesce(sum(col("in_sq8")), lit(0L)).as("hits_sq8"),
        coalesce(sum(col("in_imi")), lit(0L)).as("hits_imi"),
        coalesce(sum(col("in_imisq8")), lit(0L)).as("hits_imisq8"))
      .orderBy(col("query_id"))
  }

  /** Gated query `ann_recall_pq`: recall@k of the PQ CODE family —
    * the PQ tier both RAW (`hits_pq` — the honest 12-bit ADC number)
    * and through its serving path (`hits_pqr` — shortlist + exact
    * refine; the difference on the record IS what the refine pass buys
    * back), plus the RESIDUAL-encoded PQ tier (`hits_pqres` — same
    * bits, same probe budget; the gap over `hits_pq` prices the FAISS
    * residual encoding) — the [[annRecallFromDir]] surface over the
    * coded tiers, split out per the r15/r16 budget ask. All three
    * probes share the same coarse quantizer and nProbe (the same 25%
    * probe fraction), so hit deficits price exactly the
    * code-approximation, never a probe-budget difference. */
  def annRecallPqFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                         k: Int = 10, numCentroids: Int = 16,
                         nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val truth = bruteForceKnn(e, e.filter(col("vec_id") < numQueries), k)
      .select(col("query_id"), col("neighbor_id"))
    val pq = ivfPqProbeFromDir(spark, dir, numQueries, k, numCentroids, nProbe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_pq"))
    val pqr = ivfPqRerankFromDir(spark, dir, numQueries, k, numCentroids, nProbe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_pqr"))
    val pqres = ivfPqResProbeFromDir(spark, dir, numQueries, k, numCentroids, nProbe)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_pqres"))
    truth
      .join(pq, Seq("query_id", "neighbor_id"), "left")
      .join(pqr, Seq("query_id", "neighbor_id"), "left")
      .join(pqres, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_truth"),
        coalesce(sum(col("in_pq")), lit(0L)).as("hits_pq"),
        coalesce(sum(col("in_pqr")), lit(0L)).as("hits_pqr"),
        coalesce(sum(col("in_pqres")), lit(0L)).as("hits_pqres"))
      .orderBy(col("query_id"))
  }

  /** The shared brute-truth CTE tail both recall oracles open with. */
  private def truthCtesSql(numQueries: Int, k: Int): String =
    s"""b_pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(n.embedding AS DOUBLE[])) AS cosine
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), b_ranked AS (
       |  SELECT query_id, neighbor_id,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM b_pairs
       |), truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM b_ranked WHERE rank <= $k)""".stripMargin

  /** DuckDB twin of [[annRecallFromDir]]: the brute pairs CTE beside the
    * float-IVF chain (prefix `i_`), the SQ8 chain (prefix `s_`), and the
    * full trained-IMI twins nested as CTEs — all the existing
    * single-sourced fragments — intersected as id sets.
    *
    * Scope rule (the materialized-fragment constraint, see CurateE2e's
    * oracle doc): the nested imi/imisq8 subqueries are SIBLINGS, whose
    * repeated internal names (the h1_ and h2_ chains, half1, half2,
    * dec) are legal even materialized; only the outer scope must avoid
    * redefining a name a
    * nested scope also declares. The outer chain here uses the
    * unprefixed `centroids` and `sims` which neither IMI twin declares, and
    * the sq8 fragment's names are declared outer-only (the imisq8 twin's
    * copies live in its own scope, both plain). */
  def annRecallOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                      nProbe: Int = 4, dim: Int = LshOracleDim): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)},
       |${ivfRankedCtesSql(numQueries, nProbe, "i_")},
       |${sq8DecCtesSql(dim)},
       |${ivfRankedCtesSql(numQueries, nProbe, "s_",
           neRelOpt = Some("dec"), neVecOpt = Some("ne.dv"))},
       |imi AS (
       |${imiAnnOracle(numQueries, k, nProbe1 = 4, nProbe2 = 4, dim = dim)}
       |),
       |imisq8 AS (
       |${imiSq8Oracle(numQueries, k, nProbe1 = 4, nProbe2 = 4, dim = dim)}
       |),
       |${truthCtesSql(numQueries, k)},
       |i_top AS (SELECT query_id, neighbor_id FROM i_ranked WHERE rank <= $k),
       |s_top AS (SELECT query_id, neighbor_id FROM s_ranked WHERE rank <= $k),
       |m_top AS (SELECT query_id, neighbor_id FROM imi),
       |c_top AS (SELECT query_id, neighbor_id FROM imisq8)
       |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS k_truth,
       |       CAST(COALESCE(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_ivf,
       |       CAST(COALESCE(SUM(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_sq8,
       |       CAST(COALESCE(SUM(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_imi,
       |       CAST(COALESCE(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_imisq8
       |FROM truth t
       |LEFT JOIN i_top i ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
       |LEFT JOIN s_top s ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
       |LEFT JOIN m_top m ON m.query_id = t.query_id AND m.neighbor_id = t.neighbor_id
       |LEFT JOIN c_top c ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  /** DuckDB twin of [[annRecallPqFromDir]]: the three PQ-family twins
    * nested as SIBLING CTEs (each a full single-sourced oracle; their
    * repeated internal names — the pqt, pq-subspace, pq_codes, and p_
    * chains — are legal
    * across sibling scopes even materialized) against the shared brute
    * truth. The outer scope declares nothing any nested scope names. */
  def annRecallPqOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                        nProbe: Int = 4, dim: Int = LshOracleDim): String =
    s"""WITH pq AS (
       |${ivfPqOracle(numQueries, k, numCentroids, nProbe, dim = dim)}
       |),
       |pqr AS (
       |${ivfPqRerankOracle(numQueries, k, numCentroids, nProbe, dim = dim)}
       |),
       |pqres AS (
       |${ivfPqResOracle(numQueries, k, numCentroids, nProbe, dim = dim)}
       |),
       |${truthCtesSql(numQueries, k)},
       |p_top AS (SELECT query_id, neighbor_id FROM pq),
       |r_top AS (SELECT query_id, neighbor_id FROM pqr),
       |e_top AS (SELECT query_id, neighbor_id FROM pqres)
       |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS k_truth,
       |       CAST(COALESCE(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_pq,
       |       CAST(COALESCE(SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_pqr,
       |       CAST(COALESCE(SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_pqres
       |FROM truth t
       |LEFT JOIN p_top p ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
       |LEFT JOIN r_top r ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
       |LEFT JOIN e_top e ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  // ------------------------------------------- gated k-means training

  /** One exact Lloyd iteration as DuckDB CTEs — the trainer's loop
    * UNROLLED (the BpeTrain discipline): given the iteration-i per-vector
    * centroid cosines (named `sims` for i = 0, [[centroidSimsCtesSql]]'s
    * output over the md5-init `centroids`; else `k_sims$i`), emits
    *   k_assign$i   argmax assignment (ties → larger cid, the
    *                [[ivfRankedCtesSql]] assign rule verbatim),
    *   k_comp$i     per (cid, d) exact update stats: COUNT + long sum of
    *                micros-rounded components,
    *   k_cent${i}+1 the new centroid list — un-hit cells keep the old one,
    *   k_sims${i}+1 cosines against the new centroids.
    * Trailing unreferenced CTEs cost nothing (DuckDB inlines CTEs), so a
    * caller selects from whichever stage its gate pins. */
  private[operators] def kmeansIterCtesSql(i: Int, dim: Int, p: String = "",
                                           relation: String = "embeddings",
                                           l2: Boolean = false): String = {
    val sims = if (i == 0) s"${p}sims" else s"${p}k_sims$i"
    val cent = if (i == 0) s"${p}centroids" else s"${p}k_cent$i"
    s"""${p}k_assign$i AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM $sims
       |  ) WHERE rk = 1
       |), ${p}k_comp$i AS MATERIALIZED (
       |  SELECT a.cid, r.d, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(CAST(FLOOR(CAST(e.embedding[r.d + 1] AS DOUBLE) * 1e6 + 0.5)
       |                       AS BIGINT)) AS BIGINT) AS s_micros
       |  FROM ${p}k_assign$i a JOIN $relation e USING (vec_id)
       |       CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) r
       |  GROUP BY a.cid, r.d
       |), ${p}k_cent${i + 1} AS MATERIALIZED (
       |  SELECT c0.cid, COALESCE(u.c, c0.c) AS c
       |  FROM $cent c0 LEFT JOIN (
       |    SELECT cid, list(CAST(s_micros AS DOUBLE) / (n * 1e6) ORDER BY d) AS c
       |    FROM ${p}k_comp$i GROUP BY cid
       |  ) u ON u.cid = c0.cid
       |), ${p}k_sims${i + 1} AS MATERIALIZED (
       |  SELECT e.vec_id, ct.cid,
       |         ${simMetricSql("CAST(e.embedding AS DOUBLE[])", "ct.c", l2)} AS sim
       |  FROM $relation e CROSS JOIN ${p}k_cent${i + 1} ct
       |)""".stripMargin
  }

  /** Gated query `kmeans_train`: the FINAL Lloyd update's exact stats —
    * per (cid, d): cell size and the long micros sum — after running the
    * first T−1 iterations of [[trainCentroids]]. Integer-only output, so
    * the gate is float-free end to end; every earlier iteration's
    * assignment and centroid update is pinned transitively (iteration T's
    * stats depend on iteration T−1's centroids, which depend on T−2's
    * assignment, ... back to the md5 init both engines recompute). */
  def kmeansTrainFromDir(spark: SparkSession, dir: String,
                         numCentroids: Int = 16, iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = requireOracleDim(e, dir)
    var cents = hashCentroids(dim, numCentroids)
    for (_ <- 1 until iterations) cents = lloydStepExact(e, cents, dim)
    lloydUpdateStats(e, cents, dim)
      .select(col("centroid_id").cast("long").as("cid"), col("n"),
        posexplode(col("s")).as(Seq("d", "s_micros")))
      .select(col("cid"), col("d").cast("long").as("d"), col("n"), col("s_micros"))
      .orderBy(col("cid"), col("d"))
  }

  /** DuckDB twin of [[kmeansTrainFromDir]]: T iterations unrolled via
    * [[kmeansIterCtesSql]], selecting the last iteration's update stats. */
  def kmeansTrainOracle(numCentroids: Int = 16, iterations: Int = 2,
                        dim: Int = LshOracleDim): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)},
       |${(0 until iterations).map(i => kmeansIterCtesSql(i, dim)).mkString(",\n")}
       |SELECT cid, d, n, s_micros FROM k_comp${iterations - 1}
       |ORDER BY cid, d""".stripMargin

  /** Gated query `ivf_ann_trained`: the full IVF probe pipeline under the
    * TRAINED quantizer — [[trainCentroids]]' T exact Lloyd iterations from
    * the md5 init — instead of the raw hash quantizer every other IVF gate
    * substitutes. Same output surface as `ivf_ann_topk`. This is the ask
    * round 12 ranked first: production ANN quality rides the trained
    * quantizer, so the trained path itself must be oracle-gated, not only
    * its update stats. */
  def ivfAnnTrainedFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                           k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                           iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = requireOracleDim(e, dir)
    val centroids = trainCentroids(e, numCentroids, iterations, Some(dim))
    val cells = assignToCentroids(e, centroids)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"))
    scoreProbed(
      queryProbes(e.filter(col("vec_id") < numQueries), centroids, nProbe),
      cells, k)
  }

  /** DuckDB twin of [[ivfAnnTrainedFromDir]]: the unrolled training CTEs
    * feed [[ivfRankedCtesSql]] verbatim, reading `k_sims$T` instead of the
    * hash-quantizer `sims` — the probe chain itself CANNOT drift from the
    * `ivf_ann_topk` twin. */
  def ivfAnnTrainedOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                          nProbe: Int = 4, iterations: Int = 2,
                          dim: Int = LshOracleDim): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)},
       |${(0 until iterations).map(i => kmeansIterCtesSql(i, dim)).mkString(",\n")},
       |${ivfRankedCtesSql(numQueries, nProbe, "t_", s"k_sims$iterations")}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM t_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ------------------------------------- gated persisted-index lifecycle

  /** One persisted hash-quantizer IVF index per (JVM, source dir) — the
    * same memoize-the-build economics as [[ClusterStore.buildStoreFor]]:
    * a production deployment writes the index once and every probe reads
    * it, so the gate's warm passes time the PROBE path alone. Temp dirs
    * are removed on JVM exit. */
  private val ivfIndexStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized hash-quantizer persisted index for (dir, C) — shared
    * by every gate that probes it (the memoStore key rule: params in
    * the key, so a caller at a different C gets its own build). */
  private def hashIndexStoreFor(dir: String, e: DataFrame,
                                numCentroids: Int): String =
    ivfIndexStores.computeIfAbsent(s"$dir#c$numCentroids", _ =>
      buildHashIndex(e, "graft_ivf_index",
        requireOracleDim(e, dir), numCentroids))

  private[operators] def requireOracleDim(e: DataFrame, dir: String): Int = {
    val dim = dimForDir(dir, e)
    require(dim == LshOracleDim,
      s"embeddings under $dir are $dim-wide but the DuckDB oracle generates " +
        s"$LshOracleDim-dim centroids — regenerate the oracle with dim=$dim")
    dim
  }

  private def buildHashIndex(e: DataFrame, prefix: String, dim: Int,
                             numCentroids: Int): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    ClusterStore.deleteRecursivelyOnExit(tmp)
    val idx = tmp.resolve("index").toString
    writeIvfIndexWith(e, idx, hashCentroids(dim, numCentroids))
    idx
  }

  /** Gated query `ivf_probe_indexed`: ANN over the PERSISTED IVF index —
    * [[writeIvfIndex]]'s partitioned layout probed via partition pruning,
    * under the [[hashCentroids]] quantizer so the oracle is the SAME
    * [[ivfAnnOracle]] as the in-memory `ivf_ann_topk` gate. Probing reads
    * the quantizer back from the index's `_quantizer` sidecar (the
    * self-containment a later session relies on), so the gate proves the
    * full persisted path: save → reload → probe ≡ in-memory IVF ≡ DuckDB. */
  def ivfProbeIndexedFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                             k: Int = 10, numCentroids: Int = 16,
                             nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val idx = hashIndexStoreFor(dir, e, numCentroids)
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** One TRAINED persisted index per (JVM, source dir) for
    * `ivf_probe_trained`. */
  private val ivfTrainedStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gated query `ivf_probe_trained`: the full production configuration —
    * index built with the TRAINED quantizer ([[trainCentroids]]' exact
    * Lloyd iterations), quantizer round-tripped through the sidecar,
    * partition-pruned probe — under [[ivfAnnTrainedOracle]]: save →
    * reload → pruned probe must equal the in-memory trained pipeline,
    * the `ivf_probe_indexed` proof lifted onto the trained path. */
  def ivfProbeTrainedFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                             k: Int = 10, numCentroids: Int = 16,
                             nProbe: Int = 4, iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = requireOracleDim(e, dir)
    val idx = ivfTrainedStores.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_trained")
      ClusterStore.deleteRecursivelyOnExit(tmp)
      val p = tmp.resolve("index").toString
      writeIvfIndexWith(e, p, trainCentroids(e, numCentroids, iterations, Some(dim)))
      p
    })
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_index_remove`: deletion proven end-to-end — copy
    * the memoized full-corpus index, [[removeFromIvfIndex]] the DeltaMod
    * residue class, probe with the surviving low-id queries. The oracle
    * is [[ivfAnnOracle]] over the KEPT vectors: removed vectors must
    * vanish from cells AND from candidate/neighbor sets, with nothing
    * else moving. */
  def ivfRemoveProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, numCentroids: Int = 16,
                            nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val full = hashIndexStoreFor(dir, e, numCentroids)
    val idx = ClusterStore.copyStore(full, "graft_ivf_remove")
    removeFromIvfIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0).select(col("vec_id")))
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries &&
        col("vec_id") % DedupIndex.DeltaMod =!= 0), k, nProbe)
  }

  /** DuckDB twin of [[ivfRemoveProbeFromDir]]: the standard IVF oracle
    * over the kept-vector relation (queries are the surviving low ids —
    * the same `vec_id < numQueries` window evaluated over kept rows). */
  def ivfRemoveOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                      nProbe: Int = 4, dim: Int = LshOracleDim): String =
    ivfAnnOracle(numQueries, k, numCentroids, nProbe, dim,
      relation = "kept_vecs",
      extraCtes = "kept_vecs AS (SELECT * FROM embeddings " +
        s"WHERE vec_id % ${DedupIndex.DeltaMod} <> 0), ")

  /** One BACKLOG index per (JVM, source dir): every vector except the
    * [[DedupIndex.DeltaMod]] residue class — the same split the other
    * incremental gates use, so the paths are directly comparable. */
  private val ivfBacklogStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gated query `ivf_index_append`: the O(batch) ingestion path proven
    * end-to-end — append the delta to a copy of the memoized backlog index
    * ([[appendToIvfIndex]]: assign against the persisted quantizer, land
    * files in the cells' partition directories, never rewrite or re-read
    * old data), then probe the appended index. Assignment is a pure
    * per-vector function of the quantizer, so append + probe must equal a
    * same-quantizer rebuild over the union — i.e. the full-corpus
    * [[ivfAnnOracle]], the SAME oracle as `ivf_ann_topk`. The store copy
    * is gate scaffolding (timed separately, see
    * [[ClusterStore.copyStore]]); a production append mutates in place. */
  def ivfAppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, numCentroids: Int = 16,
                            nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val backlogIdx = ivfBacklogStores.computeIfAbsent(dir, _ =>
      buildHashIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        "graft_ivf_backlog", requireOracleDim(e, dir), numCentroids))
    val idx = ClusterStore.copyStore(backlogIdx, "graft_ivf_append")
    appendToIvfIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_stream_append`: STREAMING ingestion into the float
    * serving store — the delta arrives as MemoryStream micro-batches with
    * planted re-deliveries (same vec_id AND embedding, one batch behind),
    * [[graft.streaming.IndexIngest.dedupArrivals]] drops the plants
    * within the watermark, and each surviving micro-batch lands through
    * the SAME [[appendToIvfIndex]] the batch gate proves. The appended
    * content is then exactly the plant-free delta, and assignment is a
    * pure per-vector function of the frozen quantizer, so stream-append
    * in any batch order equals a same-quantizer rebuild over the union —
    * i.e. the full-corpus [[ivfAnnOracle]], the SAME oracle as
    * `ivf_index_append`. A plant that survived dedup would append a
    * duplicate row, surface as a duplicate neighbor at adjacent ranks,
    * and shift every rank below it — the oracle cannot hash-match that. */
  def ivfStreamAppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                  k: Int = 10, numCentroids: Int = 16,
                                  nProbe: Int = 4, nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val backlogIdx = ivfBacklogStores.computeIfAbsent(dir, _ =>
      buildHashIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        "graft_ivf_backlog", requireOracleDim(e, dir), numCentroids))
    val idx = ClusterStore.copyStore(backlogIdx, "graft_ivf_stream")
    val delta = e.filter(col("vec_id") % DedupIndex.DeltaMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .as[(Long, Seq[Float])].collect()
    graft.streaming.IndexIngest.replayVectors(spark, delta,
      b => appendToIvfIndex(spark, idx, b), nBatches)
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_index_compact`: the probe-cost maintenance op
    * proven content-preserving — build backlog + append delta (the state
    * whose cell dirs hold one file set per batch) + [[compactIvfIndex]]
    * (rewrite coalesced, promote the next generation) + probe, under the
    * SAME full-corpus [[ivfAnnOracle]] as the other IVF gates. The
    * one-file-per-cell claim is asserted by the lifecycle spec; the gate
    * pins that compaction changed no content. */
  def ivfCompactProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                             k: Int = 10, numCentroids: Int = 16,
                             nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val backlogIdx = ivfBacklogStores.computeIfAbsent(dir, _ =>
      buildHashIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        "graft_ivf_backlog", requireOracleDim(e, dir), numCentroids))
    val idx = ClusterStore.copyStore(backlogIdx, "graft_ivf_compact")
    appendToIvfIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    compactIvfIndex(spark, idx)
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_requantize`: the growth-maintenance op proven
    * end-to-end — build backlog at C, append the delta, then
    * [[requantizeIvfIndex]] to `newC` cells and probe. The oracle is
    * [[ivfAnnOracle]] AT newC over the full corpus: a re-quantized index
    * must be indistinguishable from one built from scratch at the new C
    * (assignment is a pure function of the quantizer, and requantize
    * re-assigns every row). The gate re-quantizes with the deterministic
    * [[hashCentroids]] so DuckDB reproduces the new quantizer;
    * [[maybeRequantize]] — the trained-centroid trigger path over the
    * same primitive — is spec-covered (trained centroids are
    * float-sum-order sensitive, so they cannot be oracle-hashed). */
  def ivfRequantizeProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                k: Int = 10, numCentroids: Int = 16,
                                newC: Int = 32, nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = requireOracleDim(e, dir)
    val backlogIdx = ivfBacklogStores.computeIfAbsent(dir, _ =>
      buildHashIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        "graft_ivf_backlog", dim, numCentroids))
    val idx = ClusterStore.copyStore(backlogIdx, "graft_ivf_requant")
    appendToIvfIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    requantizeIvfIndex(spark, idx, hashCentroids(dim, newC))
    probeIvfIndex(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** One APPENDED index per (JVM, source dir) for the health gate: the
    * backlog index (shared memo) copied once, delta appended once — the
    * post-lifecycle state health is meant to be read from. */
  private val ivfHealthStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gated query `ivf_index_health`: the [[indexHealth]] SCAN math,
    * value-gated over an index that went through the full lifecycle
    * (build + append). Emits the exact-integer form of IvfHealth's four
    * signals — build/now row counts and build/now assigned-cosine mass —
    * with the per-row cosine rounded to micros BEFORE a long sum (the
    * [[graft.operators.UnigramLm]] discipline: float SUMS are
    * partition-order-dependent and can never hash-match an oracle;
    * integer sums of rounded terms are exact on both engines). The
    * "build" slice is the [[DedupIndex.DeltaMod]] backlog predicate —
    * appends never rewrite old rows, so the backlog slice of the appended
    * index IS the build-time population. Growth/drift are one division
    * away for a consumer; the gate pins the scan. */
  def indexHealthGateFromDir(spark: SparkSession, dir: String,
                             numCentroids: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val backlogIdx = ivfBacklogStores.computeIfAbsent(dir, _ =>
      buildHashIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        "graft_ivf_backlog", requireOracleDim(e, dir), numCentroids))
    val idx = ivfHealthStores.computeIfAbsent(dir, _ => {
      val c = ClusterStore.copyStore(backlogIdx, "graft_ivf_health")
      appendToIvfIndex(spark, c,
        e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
      c
    })
    val centroids = readQuantizer(spark, idx)
    val micro = floor(assignedSim(centroids) * 1e6 + 0.5).cast("long")
    val isBuild = col("vec_id") % DedupIndex.DeltaMod =!= 0
    spark.read.parquet(ivfDataDir(idx)).agg(
      count(when(isBuild, lit(1))).as("n_build"),
      count(lit(1)).as("n_now"),
      sum(when(isBuild, micro)).as("sim_build_micros"),
      sum(micro).as("sim_now_micros"))
  }

  /** DuckDB twin of [[indexHealthGateFromDir]]: same md5 quantizer, same
    * argmax assignment (ties to the larger centroid id, as everywhere in
    * the IVF gates), same micros rounding, same integer sums. */
  def indexHealthOracle(numCentroids: Int = 16, dim: Int = LshOracleDim): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)}, assign AS (
       |  SELECT vec_id, sim FROM (
       |    SELECT vec_id, sim, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM sims
       |  ) WHERE rk = 1
       |), m AS (
       |  SELECT vec_id, CAST(FLOOR(sim * 1e6 + 0.5) AS BIGINT) AS micro FROM assign
       |)
       |SELECT CAST(COUNT(CASE WHEN vec_id % ${DedupIndex.DeltaMod} <> 0 THEN 1 END) AS BIGINT) AS n_build,
       |       CAST(COUNT(*) AS BIGINT) AS n_now,
       |       CAST(SUM(CASE WHEN vec_id % ${DedupIndex.DeltaMod} <> 0 THEN micro END) AS BIGINT) AS sim_build_micros,
       |       CAST(SUM(micro) AS BIGINT) AS sim_now_micros
       |FROM m""".stripMargin

  // ------------------------------------------------- semantic quality

  /** Embedding-prototype quality scoring — the semantic corpus filter
    * (score every document by its best cosine against a small curated
    * "high-quality" prototype set, keep what clears a threshold). The
    * classifier-based variants of this dominate modern corpus curation;
    * the prototype-cosine form is the classifier-free baseline and the
    * exact shape a learned-embedding filter runs at inference.
    *
    * Scale: prototypes are collected to the driver (O(K), the same
    * adjudicated pattern as IVF's centroids) and enter the plan as
    * LITERAL vectors, so scoring is K codegen'd dot products fused into
    * the ONE embeddings scan — zero shuffles, zero joins, no state. The
    * per-row norm subexpression is shared across the K cosines by
    * whole-stage codegen subexpression elimination.
    *
    * Exactness: each cosine is the same dot/(norm·norm) shape the knn
    * gate proves bit-equal to DuckDB's `list_cosine_similarity`; MAX of
    * bit-equal doubles is bit-equal, and the surface rounds to 8 dp. */
  def semanticQuality(embeddings: DataFrame, prototypes: Array[(Long, Array[Double])],
                      threshold: Double): DataFrame = {
    require(prototypes.nonEmpty, "need at least one prototype vector")
    val e = col("embedding")
    val cosines = prototypes.toIndexedSeq.map { case (_, p) => litCosine(e, p) }
    val best = if (cosines.size == 1) cosines.head else greatest(cosines: _*)
    val score = graft.functions.StableRound.stableRound(best, 8)
    embeddings
      .select(col("vec_id"), score.as("score_r"))
      .withColumn("keep", col("score_r") >= threshold)
      .orderBy(col("vec_id"))
  }

  /** Gated query: the first `numProtos` vectors play the curated set. */
  def semanticQualityFromDir(spark: SparkSession, dir: String,
                             numProtos: Int = 8,
                             threshold: Double = 0.25): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val protos = e.filter(col("vec_id") < numProtos)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    semanticQuality(e, protos, threshold)
  }

  /** DuckDB twin: same prototype set, same max-cosine, same 8-dp round,
    * same threshold compare against the ROUNDED score. */
  def semanticQualityOracle(numProtos: Int = 8, threshold: Double = 0.25): String =
    s"""WITH p AS (
       |  SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pe
       |  FROM embeddings WHERE vec_id < $numProtos
       |), s AS (
       |  SELECT e.vec_id,
       |         MAX(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pe)) AS score
       |  FROM embeddings e CROSS JOIN p
       |  GROUP BY e.vec_id
       |)
       |SELECT vec_id, FLOOR(score * 1e8 + 0.5) / 1e8 AS score_r,
       |       FLOOR(score * 1e8 + 0.5) / 1e8 >= $threshold AS keep
       |FROM s ORDER BY vec_id""".stripMargin

  /** DuckDB twin of [[lshAnnFromDir]]: planes from the same md5 formula,
    * projections via `list_inner_product` (a sequential fold — bit-equal
    * to the Spark side's `aggregate(zip_with(...))`), buckets as ordered
    * sign-bit strings, candidate equi-join, exact cosine re-score. */
  def lshAnnOracle(numQueries: Int = 8, k: Int = 10, tables: Int = 4,
                   bits: Int = 8, dim: Int = LshOracleDim): String =
    s"""WITH planes AS (
       |  SELECT t, b,
       |         list_transform(range(0, $dim), d ->
       |           CAST('0x' || substr(md5('plane_' || t || '_' || b || '_' || d), 1, 15) AS BIGINT)
       |             / 576460752303423488.0 - 1.0) AS plane
       |  FROM (SELECT unnest(range(0, $tables)) AS t), (SELECT unnest(range(0, $bits)) AS b)
       |), buckets AS (
       |  SELECT e.vec_id, p.t,
       |         string_agg(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
       |                         THEN '1' ELSE '0' END, '' ORDER BY p.b) AS bucket
       |  FROM embeddings e, planes p GROUP BY e.vec_id, p.t
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
       |  FROM buckets q JOIN buckets n ON q.t = n.t AND q.bucket = n.bucket
       |  WHERE q.vec_id < $numQueries AND q.vec_id <> n.vec_id
       |), scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cosine
       |  FROM cand c JOIN embeddings qe ON qe.vec_id = c.query_id
       |              JOIN embeddings ne ON ne.vec_id = c.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ----------------- IVF × PQ: product quantization, ADC scoring

  /** Product-quantization defaults: m subspaces of dim/m dims, each with
    * its own kpq-codebook. m·log₂(kpq) bits per vector (4 codes of 3
    * bits here ≈ 12 bits vs 2048 for float32 — the most aggressive
    * compression tier) and, the scale point, O(m) score cost per
    * candidate instead of O(dim): a probe precomputes one m×kpq
    * lookup table per QUERY and every candidate costs m table reads. */
  val PqM = 4
  val PqK = 8
  val PqIterations = 2

  /** Train the m per-subspace codebooks (after Jégou, Douze & Schmid,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
    * spherical variant: each subspace reuses the EXISTING exact
    * integer-micros Lloyd machinery ([[trainCentroids]] over slice
    * views, the [[trainImi]] construction generalized from 2 halves to
    * m slices), so the same md5 init / tie / update rules gate it with
    * the same unrolled-CTE oracle discipline. */
  def trainPq(e: DataFrame, dim: Int, m: Int = PqM, kpq: Int = PqK,
              iterations: Int = PqIterations): Array[Array[(Int, Array[Double])]] = {
    require(dim % m == 0, s"PQ splits the vector into $m slices; dim $dim is not divisible")
    val sub = dim / m
    Array.tabulate(m)(s =>
      trainCentroids(halfView(e, s * sub + 1, sub), kpq, iterations, Some(sub)))
  }

  /** All m code assignments in ONE corpus scan (the [[assignImi]]
    * shape): code s = cosine-argmax of slice s against codebook s (ties
    * → larger cid, [[assignExpr]]'s rule — encode mirrors assignment). */
  private def pqEncodeExpr(cbs: Array[Array[(Int, Array[Double])]]): Column = {
    val sub = cbs(0)(0)._2.length
    array(cbs.zipWithIndex.map { case (cb, s) =>
      assignExpr(slice(col("embedding"), s * sub + 1, sub), cb)
    }.toIndexedSeq: _*)
  }

  /** The PQ-compressed IVF tier: cells store m-int CODE rows (m·log₂kpq
    * information bits per vector — at 100 TB the whole index is smaller
    * than the SQ8 tier's by another ~20×, small enough that probed
    * cells live in executor memory), coarse assignment on the
    * full-precision vectors at build, the m codebooks persisted in a
    * `_pq_v<g>` sidecar. Same generation+manifest commit discipline as
    * every other tier. */
  def writeIvfPqIndex(e: DataFrame, dir: String, numCentroids: Int = 16,
                      kpq: Int = PqK, iterations: Int = PqIterations): Unit =
    stagePqGeneration(e, dir, numCentroids, kpq, iterations, gen = 0L)

  /** Stage one complete PQ generation (coded cells + coarse quantizer +
    * codebook sidecar) from SOURCE float vectors and commit — shared by
    * the initial build and [[requantizeIvfPqIndex]]. */
  private def stagePqGeneration(e: DataFrame, dir: String, numCentroids: Int,
                                kpq: Int, iterations: Int, gen: Long): Unit = {
    val spark = e.sparkSession
    val dim = embeddingDim(e)
    val coarse = hashCentroids(dim, numCentroids)
    val cbs = trainPq(e, dim, PqM, kpq, iterations)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    assignToCentroids(e, coarse)
      .select(col("vec_id"), pqEncodeExpr(cbs).as("codes"), col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/data_v$gen")
    saveQuantizer(spark, s"$dir/_quantizer_v$gen", coarse)
    savePqCodebooks(spark, s"$dir/_pq_v$gen", cbs)
    commitIvfGen(dir, gen)
  }

  /** The m codebooks as one sidecar: rows (s, cid, c DOUBLE[]) —
    * m·kpq·(dim/m) doubles, driver-sized by construction. */
  private def savePqCodebooks(spark: SparkSession, path: String,
                              cbs: Array[Array[(Int, Array[Double])]]): Unit = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (cb, s) =>
      cb.map { case (cid, c) => (s, cid, c.toSeq) }
    }.toSeq.toDF("s", "cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** The persisted PQ codebook sidecar of generation `g` — the one
    * decode point for `_pq_v` (the [[readSq8Sidecar]] rule). */
  private def readPqSidecar(spark: SparkSession, dir: String,
                            g: Long): Array[Array[(Int, Array[Double])]] =
    spark.read.parquet(s"$dir/_pq_v$g").collect()
      .map(r => (r.getAs[Int]("s"), r.getAs[Int]("cid"),
        r.getAs[Seq[Double]]("c").toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.map(t => (t._2, t._3)).sortBy(_._1))

  /** Partition-pruned ADC probe: read ONLY the probed cells' code rows,
    * score each candidate in O(m) via the per-query lookup tables —
    * never touching a float vector on the neighbor side. The 100 TB
    * shape: probe reads shrink by the code/float ratio (~20× vs SQ8's
    * 4×) AND per-candidate score cost drops from O(dim) to O(m). */
  def probeIvfPqIndex(spark: SparkSession, dir: String, queries: DataFrame,
                      k: Int = 10, nProbe: Int = 4,
                      allowedOpt: Option[DataFrame] = None): DataFrame = {
    val coarse = readQuantizer(spark, dir)
    val g = ivfGen(dir)
    val cbs = readPqSidecar(spark, dir, g)
    val probes = queryProbes(queries, coarse, nProbe)
    val cells = semiJoinAllowed(
      prunedCellScan(spark, s"$dir/data_v$g", probes), allowedOpt)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("codes"))
    adcScore(probes, cells, cbs, k)
  }

  /** Asymmetric-distance (ADC) scoring: per probe row (query-sized ×
    * nProbe — broadcast by construction) precompute lut_s[j] =
    * ⟨q_s, c_{s,j}⟩ for every subspace s and code j (O(nProbe·kpq·dim)
    * per query — the LUT fold is a row expression on the probe frame,
    * so it evaluates once per probe row; still query-bounded and
    * independent of the candidate count, which is the scale point),
    * plus ⟨q, q⟩; a candidate with codes (j₀…j_{m−1}) then
    * scores cos = (Σ_s lut_s[j_s]) / (√⟨q,q⟩ · √(Σ_s ‖c_{s,j_s}‖²)) in
    * O(m) lookups. Association is per-subspace-then-across (left to
    * right) on BOTH engines — the oracle sums m `list_inner_product`
    * partials in the same order ([[pqScoredSql]]), so the doubles are
    * bit-identical (litDot ↔ list_inner_product is the proven pair of
    * the LSH twin). Codebook norms ship as plan literals, computed by
    * the same sequential fold DuckDB's list_inner_product(c, c) runs. */
  private def adcScore(probes: DataFrame, cells: DataFrame,
                       cbs: Array[Array[(Int, Array[Double])]], k: Int): DataFrame = {
    val m = cbs.length
    val sub = cbs(0)(0)._2.length
    val n2 = cbs.map(_.map { case (_, c) => c.foldLeft(0.0)((a, x) => a + x * x) })
    val lutted = (0 until m).foldLeft(
      probes.withColumn("qq", aggregate(zip_with(col("qe"), col("qe"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v))
    )((df, s) => df.withColumn(s"lut$s", array(cbs(s).map { case (_, c) =>
      litDot(slice(col("qe"), s * sub + 1, sub), c)
    }.toIndexedSeq: _*)))
    val num = (0 until m).map(s => element_at(col(s"lut$s"),
      element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
    val rn2 = (0 until m).map(s => element_at(
      array(n2(s).map(lit).toIndexedSeq: _*),
      element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(lutted).join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", num / (sqrt(col("qq")) * sqrt(rn2)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** O(batch) ingestion into the PQ tier: encode the batch under the
    * PERSISTED coarse quantizer and codebooks (frozen at build — the
    * staleness rule of every tier), land files in cell dirs. */
  def appendToIvfPqIndex(spark: SparkSession, dir: String,
                         newVectors: DataFrame): Unit = {
    val coarse = readQuantizer(spark, dir)
    val cbs = readPqSidecar(spark, dir, ivfGen(dir))
    assignToCentroids(newVectors, coarse)
      .select(col("vec_id"), pqEncodeExpr(cbs).as("codes"), col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(ivfDataDir(dir))
  }

  /** Takedown on the PQ tier: filtered generation rewrite of the CODE
    * rows under the frozen coarse quantizer + codebooks (codes move
    * verbatim — removal never re-encodes). */
  def removeFromIvfPqIndex(spark: SparkSession, dir: String,
                           removedIds: DataFrame): Unit =
    rewritePqGeneration(spark, dir,
      _.join(removedIds.select(col("vec_id")), Seq("vec_id"), "left_anti"))

  /** PQ-tier compaction: identity-filter rewrite back to one file per
    * cell, content-preserving (re-passes the append oracle). */
  def compactIvfPqIndex(spark: SparkSession, dir: String): Unit =
    rewritePqGeneration(spark, dir, identity)

  private def rewritePqGeneration(spark: SparkSession, dir: String,
                                  keep: DataFrame => DataFrame): Unit =
    rewriteGeneration(spark, dir, Seq("_quantizer_v", "_pq_v"), keep)

  /** Re-quantize the PQ tier: codes are LOSSY, so the rebuild re-reads
    * the SOURCE float vectors, re-trains the m codebooks, re-derives the
    * coarse quantizer at the new C, and stages a complete next
    * generation — after it the index equals a from-scratch build. */
  def requantizeIvfPqIndex(spark: SparkSession, dir: String, source: DataFrame,
                           numCentroids: Int, kpq: Int = PqK,
                           iterations: Int = PqIterations): Unit =
    promoteFreshGeneration(dir, Seq("_quantizer_v", "_pq_v"))(
      stagePqGeneration(source, dir, numCentroids, kpq, iterations, _))

  private val ivfPqStores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ivfPqBacklogs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqStoreFor(spark: SparkSession, dir: String, e: DataFrame,
                         numCentroids: Int, kpq: Int, iterations: Int): String =
    memoStore(ivfPqStores, s"$dir#c$numCentroids#k$kpq#i$iterations", "graft_ivf_pq")(
      writeIvfPqIndex(e, _, numCentroids, kpq, iterations))

  /** The memoized BACKLOG PQ index (every vector except the DeltaMod
    * residue class — the split all incremental gates share). */
  private def pqBacklogFor(dir: String, e: DataFrame, numCentroids: Int,
                           kpq: Int, iterations: Int): String =
    memoStore(ivfPqBacklogs, s"$dir#c$numCentroids#k$kpq#i$iterations",
      "graft_ivf_pq_backlog")(
      writeIvfPqIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, numCentroids, kpq, iterations))

  /** Gated query `ivf_pq_probe`: the PQ tier end-to-end — trained
    * codebooks, coded cells, pruned probe, O(m)-per-candidate ADC
    * re-score — under an oracle whose probe chain is [[ivfRankedCtesSql]]
    * with ONLY the scored CTE swapped for the ADC sum. */
  def ivfPqProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                        k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                        kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = pqStoreFor(spark, dir, e, numCentroids, kpq, iterations)
    probeIvfPqIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pq_append`: build over the BACKLOG (codebooks
    * frozen there), append the DeltaMod delta under the persisted
    * codebooks, probe — oracle trains the codebooks on the backlog
    * relation and encodes the full corpus under them. */
  def ivfPqAppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                              k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                              kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      pqBacklogFor(dir, e, numCentroids, kpq, iterations), "graft_ivf_pq_append")
    appendToIvfPqIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeIvfPqIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pq_remove`: takedown on the PQ tier — codes of the
    * removed ids vanish from cells with nothing else moving (codebooks
    * stay frozen at the full build; the oracle trains on the full corpus
    * and serves the kept relation). */
  def ivfPqRemoveProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                              k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                              kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val full = pqStoreFor(spark, dir, e, numCentroids, kpq, iterations)
    val idx = ClusterStore.copyStore(full, "graft_ivf_pq_remove")
    removeFromIvfPqIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0).select(col("vec_id")))
    probeIvfPqIndex(spark, idx,
      e.filter(col("vec_id") < numQueries &&
        col("vec_id") % DedupIndex.DeltaMod =!= 0), k, nProbe)
  }

  /** Gated query `ivf_pq_compact`: backlog + append + identity rewrite
    * to one file per cell — content-preserving (re-passes the append
    * oracle, codes verbatim). */
  def ivfPqCompactProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                               k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                               kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      pqBacklogFor(dir, e, numCentroids, kpq, iterations), "graft_ivf_pq_compact")
    appendToIvfPqIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    compactIvfPqIndex(spark, idx)
    probeIvfPqIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pq_requantize`: backlog + append +
    * [[requantizeIvfPqIndex]] from the full SOURCE at newC + probe must
    * equal a from-scratch PQ build at newC (codebooks AND coarse
    * quantizer re-derived over the union). */
  def ivfPqRequantizeProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                  k: Int = 10, numCentroids: Int = 16, newC: Int = 32,
                                  nProbe: Int = 4, kpq: Int = PqK,
                                  iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      pqBacklogFor(dir, e, numCentroids, kpq, iterations), "graft_ivf_pq_requant")
    appendToIvfPqIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    requantizeIvfPqIndex(spark, idx, e, newC, kpq, iterations)
    probeIvfPqIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pq_rerank`: the SERVING configuration of the PQ
    * tier — ADC shortlists `shortlist` candidates per query in O(m) per
    * candidate (never touching a float on the neighbor side), then ONLY
    * those R ids re-score exactly against the full-precision vectors
    * (the FAISS IVFPQ+refine shape). At 100 TB the economics: the probe
    * reads codes (~20× less than SQ8, ~80× less than float32), and the
    * refine is an R-row point-lookup equi-join per query against the
    * primary float store — R·numQueries rows, not a corpus scan. The
    * recall deficit of raw 12-bit ADC top-k (the honest `hits_pq`
    * number in `ann_recall`) is what the shortlist buys back: the
    * shortlist bounds recall, and R ≫ k recovers most of it. */
  def ivfPqRerankFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                         k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                         kpq: Int = PqK, iterations: Int = PqIterations,
                         shortlist: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = pqStoreFor(spark, dir, e, numCentroids, kpq, iterations)
    exactRefine(e, probeIvfPqIndex(spark, idx,
      e.filter(col("vec_id") < numQueries), shortlist, nProbe)
      .select(col("query_id"), col("neighbor_id")), k)
  }

  /** Exact full-precision re-score of a (query_id, neighbor_id)
    * shortlist against the primary float store — the ONE refine tail
    * every shortlist+refine serving path shares (PQ, residual PQ, MRL):
    * an R·|Q|-row broadcast point-lookup join, never a corpus scan. */
  private def exactRefine(e: DataFrame, short: DataFrame, k: Int): DataFrame = {
    val qv = e.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val nv = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(short.join(qv, Seq("query_id")))
      .join(nv, Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB twin of [[ivfPqRerankFromDir]]: [[ivfPqOracle]]'s chain with
    * the final top-k replaced by an ADC-ranked R-shortlist CTE and an
    * exact full-precision re-score over it. */
  def ivfPqRerankOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                        nProbe: Int = 4, kpq: Int = PqK,
                        iterations: Int = PqIterations,
                        dim: Int = LshOracleDim, shortlist: Int = 50): String =
    s"""WITH pq_kept AS MATERIALIZED (SELECT * FROM embeddings),
       |pq_train AS MATERIALIZED (SELECT * FROM embeddings),
       |${centroidSimsCtesSql(dim, numCentroids, "pq_kept")},
       |${pqCtesSql(dim, PqM, kpq, iterations, "pq_train", "pq_kept")},
       |${ivfRankedCtesSql(numQueries, nProbe, "p_", relation = "pq_kept",
           scoredSqlOpt = Some(pqScoredSql("p_", dim, PqM, iterations, "pq_kept")))},
       |rr_short AS (
       |  SELECT query_id, neighbor_id FROM p_ranked WHERE rank <= $shortlist
       |), rr_scored AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cosine
       |  FROM rr_short s JOIN embeddings qe ON qe.vec_id = s.query_id
       |                  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |), rr_ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM rr_scored
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM rr_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The PQ training + encode CTE chain: per subspace s a slice CTE over
    * the TRAIN relation, the md5-init + unrolled-Lloyd chain (prefix
    * `pq{s}_` — [[kmeansTrainOracle]]'s fragments over the slice), final
    * sims over the ENCODE relation's slices, an argmax code window (ties
    * → larger cid, mirroring [[assignExpr]]), joined into
    * `pq_codes (vec_id, code0..code{m−1})`. Train and encode scopes are
    * independent — the append gate trains on the backlog and encodes the
    * full corpus. */
  private[operators] def pqCtesSql(dim: Int, m: Int = PqM, kpq: Int = PqK,
                                   iterations: Int = PqIterations,
                                   trainRelation: String = "embeddings",
                                   encodeRelation: String = "embeddings",
                                   l2: Boolean = false,
                                   dataInit: Boolean = false): String = {
    val sub = dim / m
    def finalCent(s: Int) =
      if (iterations == 0) s"pq${s}_centroids" else s"pq${s}_k_cent$iterations"
    val slices = (0 until m).map { s =>
      val lo = s * sub + 1; val hi = (s + 1) * sub
      s"""pqt$s AS MATERIALIZED (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM $trainRelation),
         |pqe$s AS MATERIALIZED (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM $encodeRelation)""".stripMargin
    }.mkString(",\n")
    // the data-sampled init twin of [[dataInitCentroids]]: the same k
    // rows in the same (md5, vec_id) order, values copied not computed
    def dataInitSims(p: String, rel: String): String =
      s"""${p}centroids AS MATERIALIZED (
         |  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cid, c FROM (
         |    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS c,
         |           CAST('0x' || substr(md5('pqinit_' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |    FROM $rel
         |  ) ORDER BY h, vec_id LIMIT $kpq
         |), ${p}sims AS MATERIALIZED (
         |  SELECT e.vec_id, ct.cid,
         |         ${simMetricSql("CAST(e.embedding AS DOUBLE[])", "ct.c", l2)} AS sim
         |  FROM $rel e CROSS JOIN ${p}centroids ct
         |)""".stripMargin
    val chains = (0 until m).map { s =>
      val p = s"pq${s}_"
      val lloyd = if (iterations == 0) "" else ",\n" + (0 until iterations)
        .map(i => kmeansIterCtesSql(i, sub, p, s"pqt$s", l2)).mkString(",\n")
      (if (dataInit) dataInitSims(p, s"pqt$s")
       else centroidSimsCtesSql(sub, kpq, s"pqt$s", p, l2)) + lloyd
    }.mkString(",\n")
    val codes = (0 until m).map { s =>
      s"""pqf$s AS MATERIALIZED (
         |  SELECT e.vec_id, ct.cid,
         |         ${simMetricSql("CAST(e.embedding AS DOUBLE[])", "ct.c", l2)} AS sim
         |  FROM pqe$s e CROSS JOIN ${finalCent(s)} ct
         |), pqc$s AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |             ORDER BY sim DESC, cid DESC) AS rk
         |    FROM pqf$s
         |  ) WHERE rk = 1
         |)""".stripMargin
    }.mkString(",\n")
    val joinChain = (1 until m).map(s => s"JOIN pqc$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"pqc$s.cid AS code$s").mkString(", ")
    s"""$slices,
       |$chains,
       |$codes,
       |pq_codes AS MATERIALIZED (
       |  SELECT pqc0.vec_id, $codeCols
       |  FROM pqc0 $joinChain
       |)""".stripMargin
  }

  /** The ADC `scored` CTE ([[ivfRankedCtesSql]]'s `scoredSqlOpt`): m
    * `list_inner_product` partials over the query's slices against the
    * candidate's code centroids, summed LEFT TO RIGHT — the exact
    * association [[adcScore]]'s lookup sum uses — normalized by
    * √⟨q,q⟩ · √(Σ_s ‖c_s‖²) in the same shape. */
  private def pqScoredSql(p: String, dim: Int, m: Int, iterations: Int,
                          queryRelation: String): String = {
    val sub = dim / m
    def finalCent(s: Int) =
      if (iterations == 0) s"pq${s}_centroids" else s"pq${s}_k_cent$iterations"
    val num = (0 until m).map { s =>
      val lo = s * sub + 1; val hi = (s + 1) * sub
      s"list_inner_product(CAST(qe.embedding AS DOUBLE[])[$lo:$hi], t$s.c)"
    }.mkString("\n          + ")
    val rn2 = (0 until m).map(s => s"list_inner_product(t$s.c, t$s.c)")
      .mkString(" + ")
    val joins = (0 until m).map(s =>
      s"JOIN ${finalCent(s)} t$s ON t$s.cid = pc.code$s").mkString("\n       ")
    s"""${p}scored AS MATERIALIZED (
       |  SELECT c.query_id, c.neighbor_id,
       |        ($num)
       |        / (sqrt(list_inner_product(CAST(qe.embedding AS DOUBLE[]),
       |                                   CAST(qe.embedding AS DOUBLE[])))
       |           * sqrt($rn2)) AS cosine
       |  FROM ${p}cand c JOIN $queryRelation qe ON qe.vec_id = c.query_id
       |       JOIN pq_codes pc ON pc.vec_id = c.neighbor_id
       |       $joins
       |)""".stripMargin
  }

  /** DuckDB twin of the PQ gates: coarse hash-quantizer sims over the
    * serving relation, [[pqCtesSql]]'s per-subspace training + encode
    * chains, [[ivfRankedCtesSql]]'s probe chain with the scored CTE
    * swapped for [[pqScoredSql]]'s ADC sum. `trainWhere` restricts
    * codebook TRAINING to a slice while encode/probing/scoring cover
    * the serving relation (APPEND semantics); `keepWhere` restricts the
    * serving relation while training stays at the build corpus (REMOVE
    * semantics). */
  def ivfPqOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                  nProbe: Int = 4, kpq: Int = PqK, iterations: Int = PqIterations,
                  dim: Int = LshOracleDim,
                  trainWhere: Option[String] = None,
                  keepWhere: Option[String] = None): String = {
    val trainW = trainWhere.map(w => s" WHERE $w").getOrElse("")
    val keepW = keepWhere.map(w => s" WHERE $w").getOrElse("")
    s"""WITH pq_kept AS (SELECT * FROM embeddings$keepW),
       |pq_train AS (SELECT * FROM embeddings$trainW),
       |${centroidSimsCtesSql(dim, numCentroids, "pq_kept")},
       |${pqCtesSql(dim, PqM, kpq, iterations, "pq_train", "pq_kept")},
       |${ivfRankedCtesSql(numQueries, nProbe, "p_", relation = "pq_kept",
           scoredSqlOpt = Some(pqScoredSql("p_", dim, PqM, iterations, "pq_kept")))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM p_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  // ------------------- IVF×PQ, RESIDUAL encoding (the FAISS IVFPQ shape)

  /** The coarse centroids as one literal array-of-arrays, indexed by
    * cid + 1 — the plan-side lookup residual math selects per row. */
  private def centsLit(coarse: Array[(Int, Array[Double])]): Column =
    array(coarse.sortBy(_._1).map { case (_, c) =>
      array(c.map(lit).toIndexedSeq: _*)
    }.toIndexedSeq: _*)

  /** The residual frame under a coarse quantizer: r = x − c_assigned,
    * computed in double and rounded back to FLOAT32 (the FAISS
    * convention — and the cross-engine anchor: double subtraction of a
    * float and a micros-exact centroid component is IEEE-exact, and both
    * engines round it to the identical float). Carries `centroid_id`,
    * so build fuses coarse assignment, residual, and the m encode
    * argmaxes into ONE scan projection. */
  private def pqResidualFrame(e: DataFrame,
                              coarse: Array[(Int, Array[Double])]): DataFrame =
    assignToCentroids(e, coarse).select(col("vec_id"),
      zip_with(col("embedding"), element_at(centsLit(coarse), col("centroid_id") + 1),
        (x, c) => (x.cast("double") - c).cast("float")).as("embedding"),
      // the EXACT norm of the original vector, stored beside the codes:
      // the cosine denominator the probe uses (estimating it from the
      // reconstruction instead injects per-candidate noise — measured,
      // see adcScoreResidual). One double per row; FAISS IVFPQ stores
      // norms the same way for reconstruction-free distances.
      l2norm(col("embedding")).as("norm"),
      col("centroid_id"))

  /** The residual-encoded PQ tier (Jégou et al. §IV: encode x − c, not
    * x): residuals concentrate near the origin of each cell, so the SAME
    * m·log₂(kpq) bits quantize a much smaller volume — the reconstruction
    * x̂ = c + decode(codes) is strictly more faithful than raw-vector PQ
    * at equal bits, which is why FAISS's IVFPQ ships this encoding. Same
    * store layout and sidecars as the raw tier (`_quantizer_v` +
    * `_pq_v`), same generation/manifest discipline. */
  def writeIvfPqResIndex(e: DataFrame, dir: String, numCentroids: Int = 16,
                         kpq: Int = PqK, iterations: Int = PqIterations): Unit =
    stagePqResGeneration(e, dir, numCentroids, kpq, iterations, gen = 0L)

  private def stagePqResGeneration(e: DataFrame, dir: String, numCentroids: Int,
                                   kpq: Int, iterations: Int, gen: Long): Unit = {
    val spark = e.sparkSession
    val dim = embeddingDim(e)
    // residuals are only small — and residual encoding only pays — under
    // a coarse quantizer that FITS the data, so this tier trains its
    // coarse centroids (exact Lloyd, the ivf_ann_trained machinery)
    // instead of substituting the hash quantizer the other gates use
    val coarse = trainCentroids(e, numCentroids, iterations, Some(dim))
    val resid = pqResidualFrame(e, coarse)
    val cbs = trainPqL2(resid.select(col("vec_id"), col("embedding")),
      dim, PqM, kpq, iterations)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    resid
      .select(col("vec_id"), pqEncodeL2Expr(cbs).as("codes"), col("norm"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/data_v$gen")
    saveQuantizer(spark, s"$dir/_quantizer_v$gen", coarse)
    savePqCodebooks(spark, s"$dir/_pq_v$gen", cbs)
    commitIvfGen(dir, gen)
  }

  /** [[trainPq]] under the EUCLIDEAN metric — required for residual
    * codebooks (see [[assignL2Expr]]'s rationale). */
  def trainPqL2(e: DataFrame, dim: Int, m: Int = PqM, kpq: Int = PqK,
                iterations: Int = PqIterations): Array[Array[(Int, Array[Double])]] = {
    require(dim % m == 0, s"PQ splits the vector into $m slices; dim $dim is not divisible")
    val sub = dim / m
    Array.tabulate(m)(s =>
      trainCentroidsL2(halfView(e, s * sub + 1, sub), kpq, iterations, Some(sub)))
  }

  /** [[pqEncodeExpr]] under the EUCLIDEAN metric — encode must mirror
    * the training assignment, as everywhere. */
  private def pqEncodeL2Expr(cbs: Array[Array[(Int, Array[Double])]]): Column = {
    val sub = cbs(0)(0)._2.length
    array(cbs.zipWithIndex.map { case (cb, s) =>
      assignL2Expr(slice(col("embedding"), s * sub + 1, sub), cb)
    }.toIndexedSeq: _*)
  }

  /** O(batch) ingestion into the residual tier: coarse-assign, form the
    * residual, and m-encode the batch under the PERSISTED coarse
    * quantizer and codebooks — all frozen at build (the staleness rule
    * of every tier), all fused in one scan projection. */
  def appendToIvfPqResIndex(spark: SparkSession, dir: String,
                            newVectors: DataFrame): Unit = {
    val coarse = readQuantizer(spark, dir)
    val cbs = readPqSidecar(spark, dir, ivfGen(dir))
    pqResidualFrame(newVectors, coarse)
      .select(col("vec_id"), pqEncodeL2Expr(cbs).as("codes"), col("norm"),
        col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(ivfDataDir(dir))
  }

  /** Partition-pruned ADC probe over the residual tier. Reconstruction
    * is x̂ = c_cell + d with d = the code centroids, so the numerator is
    *   ⟨q, x̂⟩ = ⟨q, c⟩ + Σ_s lut_s[j_s]   (one per-probe-row dot + the
    *                                        raw per-subspace LUTs)
    * and the denominator uses the EXACT stored ‖x‖ — never a
    * reconstructed norm: estimating ‖x̂‖ from ‖c‖²+2⟨c,d⟩+‖d‖² was
    * measured to DOUBLE the cosine MAE (0.23 vs 0.11) and halve recall,
    * because k-means shrinkage biases ‖d‖ low per candidate while the
    * numerator error stays centered. This is the FAISS IVFPQ shape for
    * IP/cosine metrics: codes estimate the inner product, stored norms
    * make it a cosine. Scoring stays O(m) lookups per candidate. */
  def probeIvfPqResIndex(spark: SparkSession, dir: String, queries: DataFrame,
                         k: Int = 10, nProbe: Int = 4,
                         allowedOpt: Option[DataFrame] = None): DataFrame = {
    val coarse = readQuantizer(spark, dir)
    val g = ivfGen(dir)
    val cbs = readPqSidecar(spark, dir, g)
    val probes = queryProbes(queries, coarse, nProbe)
    val cells = semiJoinAllowed(
      prunedCellScan(spark, s"$dir/data_v$g", probes), allowedOpt)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("codes"), col("norm"))
    adcScoreResidual(probes, cells, coarse, cbs, k)
  }

  /** [[adcScore]] with the residual numerator and the exact-norm
    * denominator (see [[probeIvfPqResIndex]]); every sum keeps the
    * left-to-right association its SQL twin writes. */
  private def adcScoreResidual(probes: DataFrame, cells: DataFrame,
                               coarse: Array[(Int, Array[Double])],
                               cbs: Array[Array[(Int, Array[Double])]],
                               k: Int): DataFrame = {
    val m = cbs.length
    val sub = cbs(0)(0)._2.length
    val qc = aggregate(zip_with(col("qe"),
      element_at(centsLit(coarse), col("centroid_id") + 1),
      (x, c) => x.cast("double") * c), lit(0.0), (a, v) => a + v)
    val lutted = (0 until m).foldLeft(
      probes
        .withColumn("qq", aggregate(zip_with(col("qe"), col("qe"),
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v))
        .withColumn("qc", qc)
    )((df, s) => df.withColumn(s"lut$s", array(cbs(s).map { case (_, c) =>
      litDot(slice(col("qe"), s * sub + 1, sub), c)
    }.toIndexedSeq: _*)))
    val num = (col("qc") +: (0 until m).map(s => element_at(col(s"lut$s"),
      element_at(col("codes"), s + 1) + 1))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(lutted).join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", num / (sqrt(col("qq")) * col("norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.StableRound.stableRound(col("cosine"), 8).as("cosine_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val ivfPqResStores = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ivfPqResBacklogs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqResStoreFor(dir: String, e: DataFrame, numCentroids: Int,
                            kpq: Int, iterations: Int): String =
    memoStore(ivfPqResStores, s"$dir#c$numCentroids#k$kpq#i$iterations",
      "graft_ivf_pqr")(
      writeIvfPqResIndex(e, _, numCentroids, kpq, iterations))

  private def pqResBacklogFor(dir: String, e: DataFrame, numCentroids: Int,
                              kpq: Int, iterations: Int): String =
    memoStore(ivfPqResBacklogs, s"$dir#c$numCentroids#k$kpq#i$iterations",
      "graft_ivf_pqr_backlog")(
      writeIvfPqResIndex(e.filter(col("vec_id") % DedupIndex.DeltaMod =!= 0),
        _, numCentroids, kpq, iterations))

  /** Gated query `ivf_pqr_probe`: the residual tier end-to-end —
    * codebooks trained on residuals, coded cells, pruned probe, O(m)
    * ADC re-score with the reconstruction terms. */
  def ivfPqResProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                           k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                           kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = pqResStoreFor(dir, e, numCentroids, kpq, iterations)
    probeIvfPqResIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pqr_append`: build over the BACKLOG (coarse
    * quantizer is data-independent, codebooks frozen at the backlog's
    * residuals), append the delta under the persisted sidecars, probe —
    * oracle trains the residual codebooks on the backlog relation and
    * encodes the full corpus under them. */
  def ivfPqResAppendProbeFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                                 k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                                 kpq: Int = PqK, iterations: Int = PqIterations): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = ClusterStore.copyStore(
      pqResBacklogFor(dir, e, numCentroids, kpq, iterations), "graft_ivf_pqr_append")
    appendToIvfPqResIndex(spark, idx,
      e.filter(col("vec_id") % DedupIndex.DeltaMod === 0))
    probeIvfPqResIndex(spark, idx, e.filter(col("vec_id") < numQueries), k, nProbe)
  }

  /** Gated query `ivf_pqr_rerank`: the residual tier's SERVING path —
    * residual-ADC shortlist, exact refine of the R survivors (the
    * [[ivfPqRerankFromDir]] shape on the more faithful codes). */
  def ivfPqResRerankFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                            kpq: Int = PqK, iterations: Int = PqIterations,
                            shortlist: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = pqResStoreFor(dir, e, numCentroids, kpq, iterations)
    exactRefine(e, probeIvfPqResIndex(spark, idx,
      e.filter(col("vec_id") < numQueries), shortlist, nProbe)
      .select(col("query_id"), col("neighbor_id")), k)
  }

  // --------------------- Matryoshka (MRL) truncated-prefix serving

  /** The dPrime-dim PREFIX view of the corpus — a Matryoshka embedding's
    * nested sub-embedding (Kusupati et al. 2022: MRL-trained vectors are
    * valid embeddings at every prefix length). */
  private def mrlTruncate(e: DataFrame, dPrime: Int): DataFrame =
    e.select(col("vec_id"), slice(col("embedding"), 1, dPrime).as("embedding"))

  /** Gated query `ann_mrl_rerank`: Matryoshka two-stage serving — brute
    * shortlist on the dPrime-dim prefix (dim/4 of the flops and, in the
    * deployment that stores the prefix copy, dim/4 of the scan bytes),
    * then the shared exact full-dim refine. The brute anchor of the MRL
    * family; the indexed production path is `ivf_mrl_rerank`. */
  def mrlRerankFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                       k: Int = 10, dPrime: Int = 16,
                       shortlist: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val trunc = mrlTruncate(e, dPrime)
    exactRefine(e,
      bruteForceKnn(trunc, trunc.filter(col("vec_id") < numQueries), shortlist)
        .select(col("query_id"), col("neighbor_id")), k)
  }

  private val mrlIndexStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gated query `ivf_mrl_rerank`: the MRL deployment shape — the IVF
    * index is built over the TRUNCATED prefix copy (a store dPrime/dim
    * the size of the primary: at 100 TB the coarse-search tier shrinks
    * 4× in bytes AND flops before any code compression), probed with
    * truncated queries for an R-shortlist, then the shared exact refine
    * against the full-precision primary store. Composes the proven
    * persisted-IVF probe with the proven refine tail — only the store's
    * CONTENT (prefixes) is new. */
  def ivfMrlRerankFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                          k: Int = 10, dPrime: Int = 16, numCentroids: Int = 16,
                          nProbe: Int = 4, shortlist: Int = 50): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val trunc = mrlTruncate(e, dPrime)
    val idx = memoStore(mrlIndexStores, s"$dir#d$dPrime#c$numCentroids", "graft_mrl")(
      writeIvfIndexWith(trunc, _, hashCentroids(dPrime, numCentroids)))
    exactRefine(e,
      probeIvfIndex(spark, idx, readQuantizer(spark, idx),
        trunc.filter(col("vec_id") < numQueries), shortlist, nProbe)
        .select(col("query_id"), col("neighbor_id")), k)
  }

  /** DuckDB twin of [[mrlRerankFromDir]]: prefix-sliced brute pairs →
    * R-shortlist → the exact-refine tail. */
  def mrlRerankOracle(numQueries: Int = 8, k: Int = 10, dPrime: Int = 16,
                      shortlist: Int = 50): String =
    s"""WITH tp AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[])[1:$dPrime],
       |                                CAST(n.embedding AS DOUBLE[])[1:$dPrime]) AS tcos
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $numQueries
       |), shortl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY tcos DESC, neighbor_id ASC) AS rank
       |    FROM tp
       |  ) WHERE rank <= $shortlist
       |),
       |${refineTailSql("shortl", k)}""".stripMargin

  /** DuckDB twin of [[ivfMrlRerankFromDir]]: the standard IVF probe
    * chain over a truncated-prefix relation (same md5 quantizer formula
    * at dPrime dims) shortlisted at R, then the exact-refine tail. */
  def ivfMrlRerankOracle(numQueries: Int = 8, k: Int = 10, dPrime: Int = 16,
                         numCentroids: Int = 16, nProbe: Int = 4,
                         shortlist: Int = 50): String =
    s"""WITH trunc AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[])[1:$dPrime] AS embedding
       |  FROM embeddings
       |),
       |${centroidSimsCtesSql(dPrime, numCentroids, "trunc")},
       |${ivfRankedCtesSql(numQueries, nProbe, "m_", relation = "trunc")},
       |shortl AS (
       |  SELECT query_id, neighbor_id FROM m_ranked WHERE rank <= $shortlist
       |),
       |${refineTailSql("shortl", k)}""".stripMargin

  /** The exact-refine SQL tail every shortlist oracle shares: refine the
    * given (query_id, neighbor_id) relation against the full-precision
    * table, re-rank, emit the gate surface. */
  private def refineTailSql(shortRel: String, k: Int): String =
    s"""refined AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cosine
       |  FROM $shortRel s JOIN embeddings qe ON qe.vec_id = s.query_id
       |       JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |), rranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM refined
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM rranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The residual CTE chain: serving/train relations, the TRAINED
    * coarse quantizer (T unrolled exact-Lloyd iterations over the train
    * relation — the `ivf_ann_trained` chains), serving-side sims
    * against the final centroids, coarse assignment, FLOAT32 residuals
    * (the exact double subtraction rounded to float —
    * [[pqResidualFrame]]'s anchor), residual-sliced L2 [[pqCtesSql]].
    * Ends with `pq_codes` in scope plus `pqr_assign`/`pqr_cent` (the
    * final coarse centroids) and `srv_sims` for the probe chain. */
  private def pqrCtesSql(dim: Int, numCentroids: Int, kpq: Int,
                         iterations: Int, trainW: String, keepW: String): String = {
    // conditional separator: at iterations = 0 the Lloyd fragment is
    // empty and a bare ",\n,\n" would be malformed SQL (the pqCtesSql
    // guard, mirrored)
    val lloyd = if (iterations == 0) "" else (0 until iterations)
      .map(i => kmeansIterCtesSql(i, dim, "", "pqr_train")).mkString(",\n") + ",\n"
    val cent = if (iterations == 0) "centroids" else s"k_cent$iterations"
    s"""pqr_kept AS MATERIALIZED (SELECT * FROM embeddings$keepW),
       |pqr_train AS MATERIALIZED (SELECT * FROM embeddings$trainW),
       |${centroidSimsCtesSql(dim, numCentroids, "pqr_train")},
       |${lloyd}pqr_cent AS MATERIALIZED (SELECT cid, c FROM $cent),
       |srv_sims AS MATERIALIZED (
       |  SELECT e.vec_id, ct.cid,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ct.c) AS sim
       |  FROM pqr_kept e CROSS JOIN pqr_cent ct
       |),
       |pqr_assign AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid DESC) AS rk
       |    FROM srv_sims
       |  ) WHERE rk = 1
       |), pqr_de AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM pqr_kept
       |), pqr_resid AS MATERIALIZED (
       |  SELECT d.vec_id,
       |         [CAST(d.de[x] - ct.c[x] AS FLOAT) FOR x IN range(1, ${dim + 1})] AS embedding
       |  FROM pqr_de d JOIN pqr_assign a USING (vec_id)
       |       JOIN pqr_cent ct ON ct.cid = a.cid
       |), pqr_train_resid AS MATERIALIZED (
       |  SELECT r.* FROM pqr_resid r JOIN pqr_train t USING (vec_id)
       |),
       |${pqCtesSql(dim, PqM, kpq, iterations, "pqr_train_resid", "pqr_resid",
           l2 = true, dataInit = true)}""".stripMargin
  }

  /** The residual-ADC `scored` CTE: ⟨q,c⟩ + the m LUT partials over the
    * EXACT neighbor norm (recomputed in SQL by the same sequential fold
    * the Spark side persisted at build), every sum in
    * [[adcScoreResidual]]'s left-to-right association. */
  private def pqrScoredSql(p: String, dim: Int, m: Int, iterations: Int,
                           queryRelation: String): String = {
    val sub = dim / m
    def finalCent(s: Int) =
      if (iterations == 0) s"pq${s}_centroids" else s"pq${s}_k_cent$iterations"
    val num = (s"list_inner_product(CAST(qe.embedding AS DOUBLE[]), cc.c)" +:
      (0 until m).map { s =>
        val lo = s * sub + 1; val hi = (s + 1) * sub
        s"list_inner_product(CAST(qe.embedding AS DOUBLE[])[$lo:$hi], t$s.c)"
      }).mkString("\n          + ")
    val joins = (0 until m).map(s =>
      s"JOIN ${finalCent(s)} t$s ON t$s.cid = pc.code$s").mkString("\n       ")
    s"""${p}scored AS MATERIALIZED (
       |  SELECT c.query_id, c.neighbor_id,
       |        ($num)
       |        / (sqrt(list_inner_product(CAST(qe.embedding AS DOUBLE[]),
       |                                   CAST(qe.embedding AS DOUBLE[])))
       |           * sqrt(list_inner_product(CAST(ne.embedding AS DOUBLE[]),
       |                                     CAST(ne.embedding AS DOUBLE[])))) AS cosine
       |  FROM ${p}cand c JOIN $queryRelation qe ON qe.vec_id = c.query_id
       |       JOIN $queryRelation ne ON ne.vec_id = c.neighbor_id
       |       JOIN pq_codes pc ON pc.vec_id = c.neighbor_id
       |       JOIN pqr_assign na ON na.vec_id = c.neighbor_id
       |       JOIN pqr_cent cc ON cc.cid = na.cid
       |       $joins
       |)""".stripMargin
  }

  /** DuckDB twin of the residual-PQ gates ([[ivfPqOracle]]'s parameter
    * surface on the residual chain). */
  def ivfPqResOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                     nProbe: Int = 4, kpq: Int = PqK,
                     iterations: Int = PqIterations,
                     dim: Int = LshOracleDim,
                     trainWhere: Option[String] = None,
                     keepWhere: Option[String] = None): String = {
    val trainW = trainWhere.map(w => s" WHERE $w").getOrElse("")
    val keepW = keepWhere.map(w => s" WHERE $w").getOrElse("")
    s"""WITH ${pqrCtesSql(dim, numCentroids, kpq, iterations, trainW, keepW)},
       |${ivfRankedCtesSql(numQueries, nProbe, "p_", sims = "srv_sims",
           relation = "pqr_kept",
           scoredSqlOpt = Some(pqrScoredSql("p_", dim, PqM, iterations, "pqr_kept")))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM p_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[ivfPqResRerankFromDir]]: the residual chain's
    * top-k replaced by an ADC-ranked R-shortlist + exact re-score (the
    * [[ivfPqRerankOracle]] tail verbatim). */
  def ivfPqResRerankOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                           nProbe: Int = 4, kpq: Int = PqK,
                           iterations: Int = PqIterations,
                           dim: Int = LshOracleDim, shortlist: Int = 50): String =
    s"""WITH ${pqrCtesSql(dim, numCentroids, kpq, iterations, "", "")},
       |${ivfRankedCtesSql(numQueries, nProbe, "p_", sims = "srv_sims",
           relation = "pqr_kept",
           scoredSqlOpt = Some(pqrScoredSql("p_", dim, PqM, iterations, "pqr_kept")))},
       |shortl AS (
       |  SELECT query_id, neighbor_id FROM p_ranked WHERE rank <= $shortlist
       |), refined AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cosine
       |  FROM shortl s JOIN pqr_kept qe ON qe.vec_id = s.query_id
       |       JOIN pqr_kept ne ON ne.vec_id = s.neighbor_id
       |), rranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM refined
       |)
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM rranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  // ----------------------------- filtered (predicate-constrained) ANN

  /** Filtered vector search — "top-k neighbors among documents WHERE
    * <predicate>", the constrained-search surface every production
    * vector store exposes (FAISS IDSelector, the filter clause of
    * Qdrant/Milvus/pgvector). The index is NOT rebuilt per predicate:
    * the probe is unchanged (same pruned cell read), and the caller's
    * allowed-id frame semi-joins the candidates BEFORE the re-score —
    * at 100 TB the filter costs one equi-join on the probed cells'
    * candidate rows (cell-bounded, never corpus-sized), and the re-score
    * only pays for surviving candidates. Post-filtering the top-k would
    * instead return FEWER than k under selective predicates; filtering
    * candidates keeps k results whenever the probed cells hold them. */
  def probeIvfIndexFiltered(spark: SparkSession, dir: String,
                            centroids: Array[(Int, Array[Double])],
                            queries: DataFrame, allowed: DataFrame,
                            k: Int = 10, nProbe: Int = 4): DataFrame =
    probeIvfIndex(spark, dir, centroids, queries, k, nProbe, Some(allowed))

  /** The PQ tier's filtered probe: same semi-join on the candidate CODE
    * rows — the filter composes with the compressed tier, so a 100 TB
    * deployment filters WITHOUT touching float vectors either. */
  def probeIvfPqIndexFiltered(spark: SparkSession, dir: String,
                              queries: DataFrame, allowed: DataFrame,
                              k: Int = 10, nProbe: Int = 4): DataFrame =
    probeIvfPqIndex(spark, dir, queries, k, nProbe, Some(allowed))

  /** Gated query `ivf_ann_filtered`: filtered search on the persisted
    * float index — the allowed set is the English documents (the
    * doc_id↔vec_id alignment of the corpus), so the gate pins that
    * every returned neighbor satisfies the predicate AND the ranks are
    * exactly the constrained top-k. */
  def ivfAnnFilteredFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                            k: Int = 10, numCentroids: Int = 16,
                            nProbe: Int = 4, lang: String = "en"): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = hashIndexStoreFor(dir, e, numCentroids)
    val allowed = Tables.documents(spark, dir)
      .filter(col("lang") === lang).select(col("doc_id").as("vec_id"))
    probeIvfIndexFiltered(spark, idx, readQuantizer(spark, idx),
      e.filter(col("vec_id") < numQueries), allowed, k, nProbe)
  }

  /** Gated query `ivf_pq_filtered`: the same predicate on the PQ tier —
    * `candWhereOpt` composes with `scoredSqlOpt` in the shared probe
    * chain, exactly as the Spark semi-join composes with ADC scoring. */
  def ivfPqFilteredFromDir(spark: SparkSession, dir: String, numQueries: Int = 8,
                           k: Int = 10, numCentroids: Int = 16, nProbe: Int = 4,
                           kpq: Int = PqK, iterations: Int = PqIterations,
                           lang: String = "en"): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    requireOracleDim(e, dir)
    val idx = pqStoreFor(spark, dir, e, numCentroids, kpq, iterations)
    val allowed = Tables.documents(spark, dir)
      .filter(col("lang") === lang).select(col("doc_id").as("vec_id"))
    probeIvfPqIndexFiltered(spark, idx,
      e.filter(col("vec_id") < numQueries), allowed, k, nProbe)
  }

  private def langCandWhere(lang: String): String =
    s"a.vec_id IN (SELECT doc_id FROM documents WHERE lang = '$lang')"

  /** DuckDB twin of [[ivfAnnFilteredFromDir]]: the standard IVF chain
    * with the candidate predicate injected — index/assignment/probes
    * untouched, only candidates that satisfy the filter reach the
    * re-score (the Spark semi-join's position exactly). */
  def ivfAnnFilteredOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                           nProbe: Int = 4, dim: Int = LshOracleDim,
                           lang: String = "en"): String =
    s"""WITH ${centroidSimsCtesSql(dim, numCentroids)},
       |${ivfRankedCtesSql(numQueries, nProbe,
           candWhereOpt = Some(langCandWhere(lang)))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of [[ivfPqFilteredFromDir]]: [[ivfPqOracle]]'s chain
    * with the same candidate predicate. */
  def ivfPqFilteredOracle(numQueries: Int = 8, k: Int = 10, numCentroids: Int = 16,
                          nProbe: Int = 4, kpq: Int = PqK,
                          iterations: Int = PqIterations,
                          dim: Int = LshOracleDim, lang: String = "en"): String =
    s"""WITH pq_kept AS MATERIALIZED (SELECT * FROM embeddings),
       |pq_train AS MATERIALIZED (SELECT * FROM embeddings),
       |${centroidSimsCtesSql(dim, numCentroids, "pq_kept")},
       |${pqCtesSql(dim, PqM, kpq, iterations, "pq_train", "pq_kept")},
       |${ivfRankedCtesSql(numQueries, nProbe, "p_", relation = "pq_kept",
           scoredSqlOpt = Some(pqScoredSql("p_", dim, PqM, iterations, "pq_kept")),
           candWhereOpt = Some(langCandWhere(lang)))}
       |SELECT query_id, rank, neighbor_id, FLOOR(cosine * 1e8 + 0.5) / 1e8 AS cosine_r
       |FROM p_ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
}
