package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, EtlOps, Views}

/** Machine-checked plan quality: the properties SURVEY §4 claims
  * (pushdown, pruning, broadcast dims, partial aggregation, window
  * group limits) asserted on the actual physical plans, so a
  * regression that silently de-optimizes a plan fails the suite.
  */
class PlanQualitySpec extends AnyFunSuite with SparkFixture {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan with a pruned schema") {
    val p = plan(Analytics.filterPushdown(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_returnflag)"),
      s"filters not pushed:\n$p")
    // projection pruned to the selected + filter columns, nothing else
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
      .split("ReadSchema: ").last
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment")
      && !readSchema.contains("l_shipdate"), s"schema not pruned: $readSchema")
  }

  test("q3 broadcasts the customer dim and takes top-10 without a global sort") {
    val p = plan(Analytics.q3TopUnshipped(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan(Views.topActors(spark, sf))
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("top-N per group uses WindowGroupLimit pruning") {
    val p = plan(EtlOps.capTopNPerGroup(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"window limit not inserted:\n$p")
  }

  test("events loader preserves predicate pushdown under the ns-timestamp rewrite") {
    val p = plan(Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select("event_id", "user_id"))
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"event_type filter not pushed:\n$p")
  }
}
