package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Joins, Views}

/** Join-operator invariants (as-of ordering, range bounds, salted ==
  * plain) and view sanity on sf0.001.
  */
class JoinsViewsSpec extends AnyFunSuite with SparkFixture {

  test("asof join: matched signup is never after the purchase") {
    val out = Joins.asofJoinEvents(spark, sf)
    assert(out.filter(col("last_signup_ts_s") > col("purchase_ts_s")).count() == 0)
  }

  test("range join: every pair is within (0, 3600] seconds") {
    val out = Joins.rangeJoinBuckets(spark, sf)
    assert(out.filter(col("diff_s") <= 0 || col("diff_s") > 3600).count() == 0)
  }

  test("salted join result equals the unsalted plain join") {
    val salted = Joins.saltedJoinSkew(spark, sf)
    val e = Tables.events(spark, sf)
    val c = Tables.customer(spark, sf)
    val plain = e.join(c, e("user_id") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
           graft.functions.OracleSafe.sum2(col("value")).as("sum_value"))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("driver entry point returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has rows at sf0.001") {
    // cheap structural guard: no key in the contract silently breaks
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).limit(1).count() == 1, s"$name returned no rows")
    }
  }

  test("v_top_actors ranks by distinct order count, descending") {
    val out = Views.topActors(spark, sf).collect()
    val counts = out.map(_.getAs[Long]("movie_count"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }
}
