package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EtlOps

/** ETL-core semantics on the sf0.001 fixtures: the reference's
  * transform/load behaviors (dedupe-keep-latest, top-N cap, idempotent
  * upsert, junction distinct).
  */
class EtlOpsSpec extends AnyFunSuite with SparkFixture {

  test("dedup_latest_by_key keeps exactly one row per key, the latest") {
    val ev = Tables.events(spark, sf)
    val out = EtlOps.dedupLatestByKey(spark, sf).cache()
    val keys = ev.select("user_id", "event_type").distinct().count()
    assert(out.count() == keys)
    // the kept event carries the max ts_ns of its key group
    val maxTs = ev.groupBy("user_id", "event_type").agg(max("ts_ns").as("max_ts"))
    val joined = out
      .join(ev.select(col("event_id").as("latest_event_id"), col("ts_ns")), "latest_event_id")
      .join(maxTs, Seq("user_id", "event_type"))
    assert(joined.filter(col("ts_ns") =!= col("max_ts")).count() == 0)
    out.unpersist()
  }

  test("cap_topn_per_group emits at most 3 rows per group, ranked by price desc") {
    val out = EtlOps.capTopNPerGroup(spark, sf).cache()
    assert(out.groupBy("l_orderkey").count().filter(col("count") > 3).count() == 0)
    val bad = out.groupBy("l_orderkey")
      .agg(max(struct(col("rank_in_order"), col("l_extendedprice"))).as("worst"),
           min(struct(col("rank_in_order"), col("l_extendedprice"))).as("best"))
      .filter(col("worst.l_extendedprice") > col("best.l_extendedprice")
              && col("worst.rank_in_order") < col("best.rank_in_order"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("upsert_merge is idempotent: one row per user, latest wins") {
    val out = EtlOps.upsertMerge(spark, sf).cache()
    assert(out.select("user_id").distinct().count() == out.count())
    assert(out.count() == Tables.events(spark, sf).select("user_id").distinct().count())
    out.unpersist()
  }

  test("junction_build emits distinct pairs only") {
    val out = EtlOps.junctionBuild(spark, sf)
    assert(out.count() == out.distinct().count())
  }

  test("dup_report only reports keys with >1 occurrence") {
    val out = EtlOps.dupReport(spark, sf)
    assert(out.filter(col("occurrences") <= 1).count() == 0)
  }
}
