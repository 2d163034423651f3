package graft

/** Benchmark main: times every registry query flagged `bench` on the
  * SPARK_GRAFT_SF_DIR tables and prints one JSON line. Each query is
  * fully evaluated through a `noop`-format write — `.count()` would let
  * Catalyst prune unreferenced projections and time a near-empty plan
  * for pure-projection queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name filter for isolating queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    var failed = List.empty[String]
    val results = SparkEntry.registry.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name))).map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          failed ::= q.name
          false
        }
      // queries persist intermediates (GlobalRank, shingle frames);
      // drop them so later queries aren't measured under GC pressure
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      if (ok) System.err.println(f"[bench] ${q.name}%-28s $dt%8.2f s")
      q.name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
