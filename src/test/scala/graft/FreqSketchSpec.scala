package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** The Misra-Gries frequency sketch (graft_freq_sketch): exactness in
  * the ≤k-cardinality regime, the deterministic MG guarantee in the
  * approximation regime, and the distributed partial/merge path.
  */
class FreqSketchSpec extends AnyFunSuite with SparkFixture {

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] = {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    df.agg(call_function("graft_freq_sketch", col("item"), lit(k)).as("s"))
      .select(explode(col("s")).as(Seq("item", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime (cardinality <= k): sketch == groupBy counts under any partitioning") {
    import spark.implicits._
    val items = (0 until 500).map(i => s"item_${i % 7}")
    val truth = items.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    // single partition and many partials must agree bit-for-bit: with
    // 7 distinct items and k=16 no decrement ever fires, so the
    // sketch IS the count map regardless of update/merge order
    Seq(1, 13).foreach { parts =>
      val got = sketchOf(items.toDF("item").repartition(parts), k = 16)
      assert(got == truth, s"at $parts partitions")
    }
  }

  test("approximation regime honors the MG guarantee on an adversarial stream") {
    import spark.implicits._
    val k = 3
    // one true heavy hitter buried in 10 light decoys
    val items = Seq.fill(400)("hot") ++
      (0 until 10).flatMap(i => Seq.fill(30)(s"light_$i"))
    val n = items.size // 700; error bound n/(k+1) = 175
    val truth = items.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    Seq(1, 8).foreach { parts =>
      val got = sketchOf(items.toDF("item").repartition(parts), k)
      assert(got.size <= k, "summary must never exceed k counters")
      // estimates never exceed truth; undercount bounded by n/(k+1)
      got.foreach { case (item, est) =>
        assert(est <= truth(item), s"$item overestimated: $est > ${truth(item)}")
        assert(truth(item) - est <= n / (k + 1), s"$item undercount past the bound")
      }
      // any item with true count > n/(k+1) must be present
      truth.filter(_._2 > n / (k + 1)).keys.foreach { heavy =>
        assert(got.contains(heavy), s"guaranteed heavy hitter $heavy missing")
      }
    }
  }

  test("nulls are ignored; k=1 degenerates to the majority-candidate sketch") {
    import spark.implicits._
    val df = (Seq.fill(60)(Some("maj")) ++ Seq.fill(25)(Some("min")) ++
      Seq.fill(5)(Option.empty[String])).toDF("item")
    val got = sketchOf(df, k = 1)
    // Boyer-Moore majority vote: the strict majority item must survive
    assert(got.keySet == Set("maj"))
    assert(got("maj") <= 60L)
  }

  test("topk_heavy_hitters equals the exact event-type counts and partial-aggregates") {
    val got = Analytics.topkHeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    val p = Analytics.topkHeavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"sketch not on the object-hash path:\n$p")
    assert(p.contains("partial_graft_freq_sketch"),
      s"sketch not partial-aggregated before the exchange:\n$p")
  }
}
