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

  test("applyChanges: latest-wins upsert, tombstone delete, insert of novel keys") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    // key 1: update then delete (latest D wins -> dropped)
    // key 2: delete then update (latest U wins -> kept, updated)
    // key 4: novel, latest U  -> inserted
    // key 5: novel, latest D  -> tombstone of an unseen key, never emitted
    val log = Seq(
      (1L, 10L, 100L, "U", 1.0), (1L, 20L, 101L, "D", 2.0),
      (2L, 10L, 102L, "D", 3.0), (2L, 20L, 103L, "U", 4.0),
      (4L, 10L, 104L, "U", 5.0),
      (5L, 10L, 105L, "D", 6.0)).toDF("k", "v", "id", "op", "value")
    val out = EtlOps.applyChanges(base, log, "k", "v", "id", "op")
      .select(col("k"), col("payload"), col("op"), col("value"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)), Option(r.get(3)))).toMap
    assert(out.keySet == Set(2L, 3L, 4L))
    assert(out(2L) == (("b", Some("U"), Some(4.0)))) // latest wins, base payload kept
    assert(out(3L) == (("c", None, None)))           // untouched base row
    assert(out(4L)._1 == null && out(4L)._3 == Some(5.0)) // inserted: no base payload
  }

  test("cdc_apply exercises all three merge paths and never emits a deleted key") {
    val out = EtlOps.cdcApply(spark, sf).cache()
    val sources = out.select("row_source").distinct().collect().map(_.getString(0)).toSet
    assert(sources == Set("base", "updated", "inserted"))
    // deleted = users whose LATEST event is an error; none may survive
    val ev = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
    val deleted = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("event_type") === "error").select("user_id")
    assert(out.join(deleted, "user_id").count() == 0)
    // every surviving touched key carries its latest event id
    val latestKept = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("exp_event_id"))
    val mism = out.filter(col("last_event_id").isNotNull)
      .join(latestKept, "user_id")
      .filter(col("last_event_id") =!= col("exp_event_id"))
    assert(mism.count() == 0)
    out.unpersist()
  }

  test("cascadeDelete: tags per-side, both-sides, and live rows; filter equals double anti-join") {
    import spark.implicits._
    val junction = Seq(
      (1L, 10L, "a"),                   // both sides hit
      (1L, 20L, "b"),                   // parent-1 delete only
      (2L, 10L, "c"),                   // parent-2 delete only
      (1L, 99L, "d"),                   // both sides hit
      (3L, 30L, "e"), (4L, 40L, "f"))   // live
      .toDF("fk1", "fk2", "payload")
    val del1 = Seq(1L).toDF("k")        // deletes fk1=1
    val del2 = Seq(10L, 99L).toDF("k")  // deletes fk2 in {10, 99}
    val out = EtlOps.cascadeDelete(junction,
      Seq("fk1" -> del1, "fk2" -> del2)).cache()
    val byRow = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(3), Option(r.getString(4)))).toMap
    assert(byRow((1L, 20L)) == ((false, Some("fk1"))))          // side 1 only
    assert(byRow((2L, 10L)) == ((false, Some("fk2"))))          // side 2 only
    assert(byRow((1L, 10L)) == ((false, Some("fk1,fk2"))))      // both sides
    assert(byRow((1L, 99L)) == ((false, Some("fk1,fk2"))))      // both sides
    assert(byRow((3L, 30L)) == ((true, None)))                  // live
    assert(byRow((4L, 40L)) == ((true, None)))                  // live
    // the delete itself (filter is_live) == composing two anti-joins
    val viaAnti = junction
      .join(del1.select(col("k").as("fk1")), Seq("fk1"), "left_anti")
      .join(del2.select(col("k").as("fk2")), Seq("fk2"), "left_anti")
    assert(out.filter(col("is_live")).count() == viaAnti.count())
    out.unpersist()
  }

  test("cdc_cascade_delete preserves the junction rowset and cascades both FK sides") {
    val out = EtlOps.cdcCascadeDelete(spark, sf).cache()
    val junction = EtlOps.junctionBuild(spark, sf)
    assert(out.count() == junction.count())
    // no tagged row has neither FK in a tombstone batch, and vice versa
    val bad = out.filter(
      (col("l_orderkey") % 10 === 7 || col("l_partkey") % 10 === 3) === col("is_live"))
    assert(bad.count() == 0)
    // cascade_source names exactly the matching sides
    val wrongSource = out.filter(!col("is_live")).filter(
      col("cascade_source") =!=
        concat_ws(",",
          when(col("l_orderkey") % 10 === 7, lit("l_orderkey")),
          when(col("l_partkey") % 10 === 3, lit("l_partkey"))))
    assert(wrongSource.count() == 0)
    out.unpersist()
  }

  test("scd2_build: exactly one current version per user, ranges chain without gaps") {
    val out = EtlOps.scd2Build(spark, sf).cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.filter(col("is_current")).count() == users)
    // within a user, versions are contiguous and valid_to == next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version_seq")
    val chained = out
      .withColumn("next_from", lead(col("valid_from_s"), 1).over(w))
      .withColumn("next_seq", lead(col("version_seq"), 1).over(w))
    assert(chained.filter(col("next_from").isNotNull &&
      (col("valid_to_s") =!= col("next_from") ||
       col("next_seq") =!= col("version_seq") + 1)).count() == 0)
    // non-current rows all have an upper bound
    assert(out.filter(!col("is_current") && col("valid_to_s").isNull).count() == 0)
    out.unpersist()
  }

  test("agg_incremental merge of partial states equals the direct full aggregate bit-for-bit") {
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
           sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
             .cast("double").as("sum_qty"),
           min("l_extendedprice").as("min_price"),
           max("l_extendedprice").as("max_price"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val inc = EtlOps.aggIncremental(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(inc.keySet == direct.keySet)
    inc.foreach { case (flag, (n, q, mn, mx, nPartials)) =>
      val (dn, dq, dmn, dmx) = direct(flag)
      assert(n == dn && q == dq && mn == dmn && mx == dmx, s"flag $flag diverges")
      assert(nPartials >= 1)
    }
  }

  test("dup_report only reports keys with >1 occurrence") {
    val out = EtlOps.dupReport(spark, sf)
    assert(out.filter(col("occurrences") <= 1).count() == 0)
  }

  test("scd2_point_in_time snapshot equals the latest-change collapse of the truncated log") {
    val snap = EtlOps.scd2PointInTime(spark, sf).cache()
    assert(snap.count() > 0)
    // time travel == CDC state at T: per user, the latest event with
    // ts <= T (seconds grain, the version bound grain) is the version
    // the snapshot must surface
    val asofS = snap.select("asof_s").head().getLong(0)
    val ev = Tables.events(spark, sf)
      .filter(expr("ts_ns div 1000000000") <= asofS)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"))
    assert(snap.count() == latest.count())
    assert(snap.select("user_id", "event_id").exceptAll(latest).isEmpty)
    // at most one version per user, and it genuinely covers T
    assert(snap.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(snap.filter(col("valid_from_s") > col("asof_s")).count() == 0)
    snap.unpersist()
  }

  test("ingest_quarantine routes exactly the mangled rows, loses none") {
    val out = EtlOps.ingestQuarantine(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    val expect = ev.groupBy("event_type")
      .agg(count(lit(1)).as("e_rows"),
           sum(when(col("event_id") % 7 === 0, 1L).otherwise(0L)).as("e_bad"))
    val j = out.join(expect, "event_type").cache()
    assert(j.count() == out.count())
    assert(j.filter(col("n_rows") =!= col("e_rows")).count() == 0)
    assert(j.filter(col("n_quarantined") =!= col("e_bad")).count() == 0)
    assert(j.filter(col("n_ok") + col("n_quarantined") =!= col("n_rows")).count() == 0)
    // the audit pointers land on genuinely mangled ids
    out.collect().foreach { r =>
      if (!r.isNullAt(4)) assert(r.getLong(4) % 7 == 0 && r.getLong(5) % 7 == 0)
    }
    j.unpersist(); out.unpersist()
  }

  test("backfill fills only delta keys, preserves NULLs and other columns, idempotent") {
    import spark.implicits._
    val base = Seq(
      (1L, "x", Option.empty[Double]),   // awaiting enrichment, delta has it
      (2L, "y", Option.empty[Double]),   // awaiting enrichment, no delta row
      (3L, "z", Some(5.0)),              // already loaded; delta overrides (UPDATE-by-id)
      (4L, "w", Some(7.0))               // untouched
    ).toDF("k", "other", "v")
    val delta = Seq((1L, Some(1.5)), (3L, Some(9.0)), (5L, Some(2.0)))
      .toDF("k", "v") // key 5 is absent from base: left join must drop it
    val once = EtlOps.backfill(base, delta, Seq("k"), "v", Some("filled"))
    val rows = once.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq ==
      Seq(Some(1.5), None, Some(9.0), Some(7.0)))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true, false))
    // other columns stream through untouched
    assert(rows.map(_.getString(1)).toSeq == Seq("x", "y", "z", "w"))
    // idempotent: re-applying the same delta changes nothing
    val twice = EtlOps.backfill(once.drop("filled"), delta, Seq("k"), "v")
    assert(twice.exceptAll(once.drop("filled")).count() == 0)
    assert(once.drop("filled").exceptAll(twice).count() == 0)
  }

  test("backfill: a delta row carrying NULL provides nothing and is not a fill") {
    import spark.implicits._
    val base  = Seq((1L, Some(3.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val delta = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double])).toDF("k", "v")
    val out = EtlOps.backfill(base, delta, Seq("k"), "v", Some("filled"))
      .orderBy("k").collect()
    assert(!out(0).isNullAt(1) && out(0).getDouble(1) == 3.0) // base value survives
    assert(out(1).isNullAt(1))                                // still awaiting enrichment
    assert(out.map(_.getBoolean(2)).toSeq == Seq(false, false))
  }
}
