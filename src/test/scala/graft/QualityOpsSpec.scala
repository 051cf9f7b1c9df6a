package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, QualityOps, TextOps, TrainingOps, Analytics}

/** Data-quality operator semantics: diff classification, orphan audit
  * reconstruction, profile stats vs a driver-side recount, and the
  * binning/histogram invariants.
  */
class QualityOpsSpec extends AnyFunSuite with SparkFixture {

  test("snapshotDiff classifies all four statuses and is null-safe on payload") {
    import spark.implicits._
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]), (4L, Some("gone")))
      .toDF("k", "payload")
    val cur = Seq((1L, Some("a")), (2L, Some("B")), (3L, Option.empty[String]), (5L, Some("new")))
      .toDF("k", "payload")
    val got = QualityOps.snapshotDiff(old, cur, "k", Seq("payload"))
      .select("k", "status").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
                      3L -> "unchanged", // null <=> null payload is UNCHANGED, not changed
                      4L -> "removed", 5L -> "added"))
  }

  test("profile_columns_approx: same plan shape, exact on low-cardinality, banded on the rest") {
    val exact = QualityOps.profileColumns(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = QualityOps.profileColumnsApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (col, e) =>
      val a = approx(col)
      // everything but the distinct estimate is shared plan output
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2) &&
             a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5),
        s"$col non-distinct stats must match the exact profile")
      val (de, da) = (e.getLong(3), a.getLong(3))
      if (de <= 64)
        // HLL++ answers small cardinalities exactly (sparse mode)
        assert(da == de, s"$col: approx $da != exact $de at low cardinality")
      else
        // default rsd 0.05 — band generously so the spec pins the
        // contract, not the estimator's luck
        assert(math.abs(da - de).toDouble / de < 0.15,
          s"$col: approx $da vs exact $de out of band")
    }
  }

  test("table_diff statuses match the modular presence rules and payload equality") {
    val rows = QualityOps.tableDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uid, status) = (r.getLong(0), r.getString(1))
      status match {
        case "added" =>
          assert(uid % 11 == 3 && uid % 13 != 5)
          assert(r.isNullAt(2) && !r.isNullAt(3))
        case "removed" =>
          assert(uid % 13 == 5 && uid % 11 != 3)
          assert(!r.isNullAt(2) && r.isNullAt(3))
        case "unchanged" =>
          assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == r.getDouble(5))
        case "changed" =>
          assert(r.getLong(2) != r.getLong(3))
        case other => fail(s"unknown status $other")
      }
    }
    // The presence slices guarantee added+removed exist at every sf.
    val statuses = rows.map(_.getString(1)).toSet
    assert(Set("added", "removed", "changed").subsetOf(statuses))
  }

  test("fk_orphans matches an independent per-relation recount") {
    val got = QualityOps.fkOrphans(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 5)
    // Independent recount of the deliberately-dirty relation.
    val users = Tables.events(spark, sf).select("user_id").collect().map(_.getLong(0))
    val custs = Tables.customer(spark, sf).select("c_custkey").collect().map(_.getLong(0)).toSet
    val orphanRows = users.count(u => !custs.contains(u)).toLong
    val orphanKeys = users.filter(u => !custs.contains(u)).distinct.length.toLong
    assert(got("events.user_id->customer") == ((users.length.toLong, orphanRows, orphanKeys)))
    // TPC-H's referential integrity holds on the generated star schema.
    Seq("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier", "orders.o_custkey->customer").foreach { rel =>
      assert(got(rel)._2 == 0L && got(rel)._3 == 0L, s"$rel should have no orphans")
    }
  }

  test("profile_columns matches a driver-side recount of events") {
    val got = QualityOps.profileColumns(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("event_id", "event_type", "ts_s", "user_id", "value_x100"))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
              expr("ts_ns div 1000000000").as("ts_s")).collect()
    val n = ev.length.toLong
    got.values.foreach(r => assert(r.getLong(1) == n && r.getLong(2) == 0L))
    assert(got("event_id").getLong(3) == ev.map(_.getLong(0)).distinct.length)
    assert(got("user_id").getLong(3) == ev.map(_.getLong(1)).distinct.length)
    assert(got("event_type").getLong(3) == ev.map(_.getString(2)).distinct.length)
    assert(got("event_type").getString(4) == ev.map(_.getString(2)).min)
    assert(got("event_type").getString(5) == ev.map(_.getString(2)).max)
    assert(got("value_x100").getString(4).toLong ==
      math.floor(100.0 * ev.map(_.getDouble(3)).min).toLong)
    assert(got("value_x100").getString(5).toLong ==
      math.floor(100.0 * ev.map(_.getDouble(3)).max).toLong)
    assert(got("ts_s").getString(4).toLong == ev.map(_.getLong(4)).min)
  }

  test("quantile_bins: equal-count fill, ordered non-overlapping ranges") {
    val rows = Analytics.quantileBins(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, bins) =>
      val byBin = bins.sortBy(_.getLong(1))
      assert(byBin.map(_.getLong(1)).toSeq == (1L to byBin.length))
      val counts = byBin.map(_.getLong(2))
      // ntile: sizes differ by at most 1, larger bins first.
      assert(counts.max - counts.min <= 1)
      assert(counts.sameElements(counts.sortBy(-_)))
      // Equi-depth: bin value ranges are ordered and non-overlapping
      // (boundary equality allowed when a value straddles bins).
      byBin.sliding(2).foreach {
        case Array(lo, hi) => assert(lo.getLong(4) <= hi.getLong(3))
        case _ =>
      }
    }
    // Total rows preserved.
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
  }

  test("seq_len_histogram matches a recount from text_token_count") {
    val toks = TextOps.textTokenCount(spark, sf)
      .select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(n: Long): Long = if (n <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = toks.toSeq
      .groupBy { case (id, n) => (src(id), bucket(n)) }
      .map { case (k, docs) =>
        k -> ((docs.size.toLong, docs.map(_._2).sum, docs.map(_._2).min, docs.map(_._2).max)) }
    val got = TrainingOps.seqLenHistogram(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
  }

  test("dedup_containment: bounds, threshold flag, and containment >= jaccard per doc") {
    val cont = Dedup.dedupContainment(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    cont.values.foreach { r =>
      val c = r.getLong(2)
      assert(c >= 0 && c <= 1000)
      assert(r.getBoolean(3) == (c >= 900))
      if (!r.isNullAt(1)) assert(c >= 500,
        "a verified partner implies J >= 500, and containment >= jaccard")
    }
    // Per-pair containment >= Jaccard, and both operators maximize over
    // the same J >= 0.5 scope — so each doc's best containment must
    // dominate its best Jaccard.
    Dedup.dedupNgramJaccard(spark, sf).collect().foreach { r =>
      val best = cont(r.getLong(0)).getLong(2)
      assert(best >= r.getLong(2),
        s"doc ${r.getLong(0)}: best containment $best < best jaccard ${r.getLong(2)}")
    }
    // Exact duplicates are mutually containing at 1000.
    val dupGroups = Dedup.dedupExactHash(spark, sf).filter(col("n_copies") > 1).count()
    if (dupGroups > 0) {
      assert(cont.values.exists(r => r.getLong(2) == 1000L && r.getBoolean(3)))
    }
  }

  test("dq_expectations: blocking rules pass, the business bound reports exact violations") {
    val out = QualityOps.dqExpectations(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val ev = Tables.events(spark, sf)
    // the reference-schema constraints (PK, NOT NULL, domain) hold
    Seq("event_id_unique", "user_id_not_null", "ts_not_null",
        "event_type_in_domain", "value_non_negative").foreach { rule =>
      assert(out(rule) == ((0L, true)), s"$rule: ${out(rule)}")
    }
    // the warn-level bound fails with the independently-counted number
    val expected = ev.filter(col("value") > 100.0).count()
    assert(expected > 0 && out("value_le_100") == ((expected, false)))
    // rule count and n_rows are stable
    assert(out.size == 6)
  }

  test("profile_drift fails loudly when the pivot leaves one side empty") {
    import graft.operators.QualityOps
    val ex = intercept[Exception] {
      QualityOps.profileDrift(spark, sf, pivot = "1900-01-01").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("profile_drift")),
      s"expected the loud empty-side error, got: ${msgs(ex)}")
  }

  test("profile_drift: micro-unit TVD matches a plain-Scala recompute per column") {
    import graft.operators.QualityOps
    val pivotTs = java.time.LocalDateTime.of(1998, 1, 1, 0, 0)
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderdate"), col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
    def dist(buckets: Seq[String]): Map[String, Long] = {
      val total = buckets.size.toLong
      buckets.groupBy(identity).map { case (b, g) => b -> g.size * 1000000L / total }
    }
    def tvd(colName: String, f: org.apache.spark.sql.Row => String): (Map[String, Long], Map[String, Long], Long) = {
      val (base, cur) = rows.partition(
        _.getAs[java.time.LocalDateTime](0).isBefore(pivotTs))
      val (pb, pc) = (dist(base.map(f).toSeq), dist(cur.map(f).toSeq))
      val keys = pb.keySet ++ pc.keySet
      (pb, pc, keys.toSeq.map(k => math.abs(pc.getOrElse(k, 0L) - pb.getOrElse(k, 0L))).sum / 2)
    }
    val expected = Map(
      "o_orderstatus"    -> tvd("o_orderstatus", _.getString(1)),
      "o_orderpriority"  -> tvd("o_orderpriority", _.getString(2)),
      "o_totalprice_bin" -> tvd("o_totalprice_bin",
        r => math.floor(r.getDouble(3) / 50000.0).toLong.toString))
    val out = QualityOps.profileDrift(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pb, pc, t) = expected(r.getString(0))
      assert(r.getLong(4) == pb.getOrElse(r.getString(1), 0L), s"${r.getString(0)}/${r.getString(1)} p_base")
      assert(r.getLong(5) == pc.getOrElse(r.getString(1), 0L), s"${r.getString(0)}/${r.getString(1)} p_cur")
      assert(r.getLong(6) == t, s"${r.getString(0)} tvd")
    }
    // every (column, bucket) that occurs anywhere is present
    assert(out.length == expected.values.map { case (pb, pc, _) => (pb.keySet ++ pc.keySet).size }.sum)
  }

  test("dq_freshness: watermark type has zero lag; staleness matches the lag arithmetic") {
    val out = graft.operators.QualityOps.dqFreshness(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(out.length == types)
    // the corpus watermark is some type's own max -> at least one zero lag
    assert(out.exists(_.getLong(3) == 0L), "no type carries the corpus watermark")
    val corpusUs = out.map(_.getLong(2)).max
    out.foreach { r =>
      assert(r.getLong(3) == (corpusUs - r.getLong(2)) / 1000000,
        s"${r.getString(0)}: lag_s inconsistent with last_ts_us")
      assert(r.getBoolean(4) == (r.getLong(3) > 7L * 86400),
        s"${r.getString(0)}: is_stale inconsistent with lag_s")
    }
  }
}
