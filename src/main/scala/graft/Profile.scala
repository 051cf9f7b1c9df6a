package graft

/** Dev utility: time individual registered queries (or every query
  * matching a substring) with the same pass discipline as [[Bench]] —
  * Caches.clear() before each pass, noop-write materialization —
  * printing every pass time instead of just the min, so cache-build vs
  * steady-state and codegen-compile vs data cost are visible while
  * iterating on one operator without paying a full bench run.
  *
  * Usage: sbt "runMain graft.Profile dedup_clusters dedup_embedding"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = GraftSession.local(cpus, appName = "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
    wanted.foreach { case (name, fn) =>
      val ts = (1 to passes).map { _ =>
        Caches.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%7.3f  passes=${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    Caches.clear()
    spark.stop()
  }
}
