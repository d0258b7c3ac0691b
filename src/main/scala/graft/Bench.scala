package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query reports -1.0 and is excluded from the total — wall
    // time of a crash must not masquerade as a fast measurement
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0
      }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up pass: JIT + codegen compilation + file-listing caches; the
    // measured pass reflects steady-state throughput (set
    // SPARK_GRAFT_WARMUP=0 for cold numbers)
    (1 to warmups).foreach(_ => names.foreach(once))
    val results = names.map(n => n -> once(n))

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
