package graft

// Throwaway dump harness (not part of the library; removed before
// round close): writes the per-round physical plan of the iterative
// graph loops under adaptive (before) and static (after) round confs.
object Scratch {
  def main(args: Array[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, appName = "graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val out = Paths.get("plans/r22")
    Files.createDirectories(out)
    import org.apache.spark.sql.functions._
    val (nodes, edgesDeg) = operators.GraphOps.pageRankInputs(spark, sfDir)
    def roundPlan(): String = {
      val ranks0 = Caches.roundCheckpoint(
        nodes.select(col("node"), lit(1000000000000L).as("rank")), reliable = false)
      val round = operators.GraphOps.pageRankRound(edgesDeg, nodes, ranks0, 150000000000L)
      round.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
    Files.writeString(out.resolve("graph_pagerank_round_before.txt"), roundPlan())
    val after = Caches.staticRounds(spark)(roundPlan())
    Files.writeString(out.resolve("graph_pagerank_round_after.txt"), after)
    println("wrote pagerank round plans")
    Caches.clear()
    spark.stop()
  }
}
