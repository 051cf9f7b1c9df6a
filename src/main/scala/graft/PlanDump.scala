package graft

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a NAMED subset of registered
  * queries to per-key files — the before/after plan evidence an
  * optimization round commits under plans/r<N>/. Complements
  * [[Plans]] (which regenerates the full PLANS.md).
  *
  * Run: `sbt "runMain graft.PlanDump plans/r22 before key1 key2 ..."`
  * → writes plans/r22/<key>_before.txt for each key.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <tag> <key> [key ...]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val keys = args.drop(2).toSeq
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8, appName = "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
      Caches.clear()
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
