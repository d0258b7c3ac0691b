package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Config choices (scale rationale in README §Scale):
  *   - `spark.sql.shuffle.partitions` defaults to 32 to match local[32];
  *     on a real cluster this is overridden (or left to AQE coalescing).
  *   - AQE on: runtime re-plan (skew-join splitting, partition coalescing,
  *     broadcast demotion/promotion) is the main defense at 100 TB where
  *     static stats lie.
  *   - `spark.sql.ansi.enabled=false`: the reference ingests raw CSV as
  *     all-VARCHAR and applies CAST in queries; a malformed value becomes
  *     NULL, not an error (reference dags/pipeline.py:331-360,410-418).
  *     Non-ANSI CAST reproduces that cast-to-null contract.
  *   - UTC session timezone so date/timestamp functions match the oracle.
  */
object GraftSession {
  def builder(appName: String = "graft", cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // defaults to the thread count; SPARK_GRAFT_SHUFFLE overrides it
      // independently (the SCALE.md knob experiment: volume grows, threads
      // stay fixed, partitions must scale)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's reader
      // rejects; read as long and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .withExtraConfs

  /** SPARK_GRAFT_CONF="k=v;k=v" applies ad-hoc session confs — the knob
    * for A/B experiments through the unmodified Bench/ScaleBench harnesses
    * (e.g. aggregate fast-map sizing for the pmi knee) without a code
    * change per hypothesis. Applied last, so it can override the
    * defaults above. */
  private implicit class ExtraConfs(val b: SparkSession.Builder) {
    def withExtraConfs: SparkSession.Builder = {
      extraConfs.foreach { case (k, v) => b.config(k, v) }
      b
    }
  }

  private def extraConfs: Seq[(String, String)] =
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        (kv.substring(0, i).trim, kv.substring(i + 1).trim)
      }

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft configs to an externally-created session (Verify/Bench or
    * tests own the lifecycle; queries only rely on these runtime confs). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // runtime-settable subset of the SPARK_GRAFT_CONF experiment knob
    extraConfs.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf: builder-only
    }
    spark
  }
}
