package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LayoutOps
import graft.plans.GraftFunctions

/** z-order expression semantics (interpreted == codegen == known
  * values, loud range failure) and the layout property the key exists
  * for: range-partitioning by z bounds BOTH dimensions per partition.
  */
class LayoutOpsSpec extends AnyFunSuite with SparkFixture {

  test("graft_zorder2 known values: bit interleave, x even positions, y odd") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), ((1L << 21) - 1, (1L << 21) - 1))
      .toDF("x", "y")
      .select(call_function("graft_zorder2", col("x"), col("y"), lit(21)).as("z"))
      .collect().map(_.getLong(0))
    // 5=101b, 3=011b -> x bits at even, y bits at odd: z = 1*1 + 1*2 + 0*4 + 1*8 + 1*16 + 0*32 = 27
    assert(vals.toSeq == Seq(0L, 1L, 2L, 3L, 27L, (1L << 42) - 1))
  }

  test("graft_zorder2 interpreted evaluation matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.InterleaveBits
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = rnd.nextLong().abs % (1L << 21)
      val y = rnd.nextLong().abs % (1L << 21)
      val interp = InterleaveBits(Literal(x), Literal(y), 21).eval(null).asInstanceOf[Long]
      // reference reconstruction
      var exp = 0L
      (0 until 21).foreach { i =>
        exp |= ((x >> i) & 1L) << (2 * i); exp |= ((y >> i) & 1L) << (2 * i + 1)
      }
      assert(interp == exp)
    }
    // codegen path over a DataFrame agrees with interpreted on a sample
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = (1 to 100).map(_ => (rnd.nextLong().abs % (1L << 21), rnd.nextLong().abs % (1L << 21)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), call_function("graft_zorder2", col("x"), col("y"), lit(21)).as("z"))
      .collect()
    got.foreach { r =>
      val interp = InterleaveBits(Literal(r.getLong(0)), Literal(r.getLong(1)), 21)
        .eval(null).asInstanceOf[Long]
      assert(r.getLong(2) == interp)
    }
  }

  test("graft_zorder2 fails loudly on out-of-range operands (no silent masking)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val ex = intercept[Exception] {
      Seq((1L << 21, 0L)).toDF("x", "y")
        .select(call_function("graft_zorder2", col("x"), col("y"), lit(21))).collect()
    }
    assert(ex.getMessage.contains("graft_zorder2") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("graft_zorder2")))
  }

  test("graft_hilbert2 is a bijection with unit-step adjacency (the property Morton lacks)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.HilbertIndex
    // exhaustive over the order-5 curve: 32x32 = 1024 cells
    val bits = 5
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n } yield
      (HilbertIndex(Literal(x.toLong), Literal(y.toLong), bits)
        .eval(null).asInstanceOf[Long], (x, y))
    val byD = cells.toMap
    assert(byD.size == n * n, "hilbert index must be a bijection on the grid")
    assert(cells.map(_._1).min == 0L && cells.map(_._1).max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"cells at d=$d and ${d + 1} must be grid-adjacent, got ($x0,$y0)->($x1,$y1)")
    }
  }

  test("graft_hilbert2 codegen path agrees with interpreted; loud range failure") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.HilbertIndex
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(_ => (rnd.nextLong().abs % (1L << 21), rnd.nextLong().abs % (1L << 21)))
    rows.toDF("x", "y")
      .select(col("x"), col("y"), call_function("graft_hilbert2", col("x"), col("y"), lit(21)).as("h"))
      .collect()
      .foreach { r =>
        val interp = HilbertIndex(Literal(r.getLong(0)), Literal(r.getLong(1)), 21)
          .eval(null).asInstanceOf[Long]
        assert(r.getLong(2) == interp)
      }
    val ex = intercept[Exception] {
      Seq((1L << 21, 0L)).toDF("x", "y")
        .select(call_function("graft_hilbert2", col("x"), col("y"), lit(21))).collect()
    }
    assert(ex.getMessage.contains("graft_hilbert2") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("graft_hilbert2")))
  }

  test("hilbert ranges cover no-wider rectangles than z-order ranges (locality at equal splits)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{HilbertIndex, InterleaveBits}
    // On the full order-5 grid, split each curve into 16 equal index
    // ranges and measure each range's bounding-box half-perimeter; the
    // summed Hilbert extent must not exceed the summed Morton extent
    // (the continuity advantage that makes equal-width key ranges map
    // to tighter min/max footer rectangles).
    val bits = 5; val n = 1 << bits; val ranges = 16; val per = n * n / ranges
    def extent(key: (Long, Long) => Long): Long = {
      val cells = for { x <- 0 until n; y <- 0 until n } yield (key(x.toLong, y.toLong), x, y)
      cells.groupBy(_._1 / per).values.map { g =>
        (g.map(_._2).max - g.map(_._2).min).toLong + (g.map(_._3).max - g.map(_._3).min).toLong
      }.sum
    }
    val h = extent((x, y) => HilbertIndex(Literal(x), Literal(y), bits).eval(null).asInstanceOf[Long])
    val z = extent((x, y) => InterleaveBits(Literal(x), Literal(y), bits).eval(null).asInstanceOf[Long])
    assert(h <= z, s"hilbert summed extent $h must be <= morton $z")
  }

  test("clusterByHilbert bounds BOTH key dimensions per partition") {
    val ev = Tables.events(spark, sf)
    val clustered = LayoutOps.clusterByHilbert(spark, ev,
      col("event_id"), col("user_id"), bits = 21, numFiles = 8)
    val spans = clustered
      .select(col("event_id"), col("user_id"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg((max("event_id") - min("event_id")).as("ev_span"),
           (max("user_id") - min("user_id")).as("u_span"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect()
    val evGlobal = ev.agg(max("event_id") - min("event_id")).head().getLong(0)
    assert(spans.nonEmpty)
    spans.foreach { r =>
      assert(r.getLong(1) <= (evGlobal * 2) / 3,
        s"partition ${r.getInt(0)} event_id span ${r.getLong(1)} vs global $evGlobal")
    }
  }

  test("clusterByZorder bounds BOTH key dimensions per partition (the skipping property)") {
    val ev = Tables.events(spark, sf)
    val clustered = LayoutOps.clusterByZorder(spark, ev,
      col("event_id"), col("user_id"), bits = 21, numFiles = 8)
    // Per output partition (= output file), measure each dimension's
    // min/max span. Under z-clustering every partition's span must be a
    // small fraction of the global span for BOTH columns — that is
    // exactly what parquet footer stats need to prune either predicate.
    val spans = clustered
      .select(col("event_id"), col("user_id"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg((max("event_id") - min("event_id")).as("ev_span"),
           (max("user_id") - min("user_id")).as("u_span"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect()
    val evGlobal = ev.agg(max("event_id") - min("event_id")).head().getLong(0)
    assert(spans.nonEmpty)
    // 8 z-range partitions of a 2-D grid: each covers ~1/8 of the
    // z-range => about 1/2..1/4 of each single dimension's span in the
    // worst case; assert a conservative 0.67 bound that arrival-order
    // or single-column layouts (span ~= global for the other column)
    // would fail.
    spans.foreach { r =>
      assert(r.getLong(1) <= (evGlobal * 2) / 3,
        s"partition ${r.getInt(0)} event_id span ${r.getLong(1)} vs global $evGlobal")
    }
  }

  test("compaction_plan: lossless, order-preserving, target-bounded bins") {
    val target = 500L
    val out = LayoutOps.compactionPlan(spark, sf, targetRows = target).collect()
    assert(out.nonEmpty)
    // lossless: every event row is in exactly one planned file
    val evTotal = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == evTotal)
    // cluster order preserved: bins are contiguous, nondecreasing runs
    // over the day-ordered manifest (never interleaved like FFD would)
    val bins = out.sortBy(_.getLong(0)).map(_.getLong(2))
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"bin order broken: $a after $b")
      case _ => ()
    }
    // bin id recomputed from the exclusive prefix — the planner's contract
    var before = 0L
    out.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(2) == before / target,
        s"day ${r.getLong(0)}: bin ${r.getLong(2)} != ${before / target}")
      before += r.getLong(1)
    }
    // per-bin rollups agree with the per-file rows
    out.groupBy(_.getLong(2)).foreach { case (_, fs) =>
      assert(fs.head.getLong(3) == fs.length)
      assert(fs.head.getLong(4) == fs.map(_.getLong(1)).sum)
    }
    // every bin except the last reaches the target minus at most one
    // straddling file (no premature cut): bin b's first file starts at
    // most one predecessor-file past b·target, and its last crosses
    // (b+1)·target, so total ≥ target − max file size
    val maxFile = out.map(_.getLong(1)).max
    val totals = out.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(1)).sum)
      .toSeq.sortBy(_._1)
    totals.dropRight(1).foreach { case (b, t) =>
      assert(t >= target - maxFile,
        s"bin $b undersized at $t without a straddling file")
    }
  }

  test("vacuum_plan: expiry = age vs the table's own watermark, reclaim total telescopes") {
    val retention = 10L
    val out = graft.operators.LayoutOps.vacuumPlan(spark, sf, retentionDays = retention)
      .collect()
    assert(out.nonEmpty)
    val watermark = out.map(_.getLong(0)).max
    var running = 0L
    out.foreach { r =>
      val age = (watermark - r.getLong(0)) / 86400
      assert(r.getLong(2) == age, s"day ${r.getLong(0)} age")
      assert(r.getBoolean(3) == (age > retention), s"day ${r.getLong(0)} expiry")
      if (r.getBoolean(3)) running += r.getLong(1)
      assert(r.getLong(4) == running, s"day ${r.getLong(0)} running reclaim")
    }
    // the newest file is never expired; with a 30-day corpus and a
    // 10-day retention something IS reclaimed
    assert(!out.last.getBoolean(3))
    assert(running > 0)
    graft.Caches.clear()
  }

  test("partition_stats: arrival-order layout shows total zone overlap, shares sum to ~1e6") {
    val out = graft.operators.LayoutOps.partitionStats(spark, sf).collect()
    val nFiles = out.length
    assert(nFiles > 1)
    // day buckets tile the corpus
    val ev = Tables.events(spark, sf)
    assert(out.map(_.getLong(1)).sum == ev.count())
    // arrival-order ingest: every day file spans ~the whole user-id
    // domain, so every pair of zone maps overlaps — the metric that
    // justifies clustering rewrites (clusterByZorder's property test
    // shows the bounded-range counterpart)
    out.foreach { r =>
      assert(r.getLong(5) == nFiles - 1,
        s"day ${r.getLong(0)}: expected full overlap on unclustered data, got ${r.getLong(5)}")
      assert(r.getLong(3) <= r.getLong(4), "zone map min > max")
    }
    // ppm shares: each row's trunc-div share, off by at most nFiles ppm in total
    val ppmSum = out.map(_.getLong(2)).sum
    assert(ppmSum <= 1000000 && ppmSum > 1000000 - nFiles, s"ppm sum $ppmSum")
  }

  test("partition_stats: sweep overlap counts == the quadratic recompute on partial overlaps and boundary ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // crafted zone maps, one per day: partial overlaps, a touching
    // boundary (day1.min == day0.max — counts as overlap), a disjoint
    // range, a point range, and a domain-spanning range. The r19
    // order-statistics sweep must reproduce the literal pairwise
    // definition bit-for-bit on exactly these edge shapes.
    val ranges = Seq(
      (0, 0L, 10L), (1, 10L, 20L), (2, 21L, 30L),
      (3, 5L, 25L), (4, 31L, 31L), (5, 0L, 100L))
    val dir = java.nio.file.Files.createTempDirectory("graft_pstats").toString
    ranges.flatMap { case (d, lo, hi) =>
      val day = f"2024-01-${d + 1}%02d"
      Seq((d * 2L, s"$day 00:00:00", lo, "a", 1.0, "{}"),
          (d * 2L + 1, s"$day 00:01:00", hi, "a", 1.0, "{}"))
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.LayoutOps.partitionStats(spark, dir).collect()
      .map(r => (r.getLong(3), r.getLong(4)) -> r.getLong(5)).toMap
    val expected = ranges.map { case (_, lo, hi) =>
      (lo, hi) -> ranges.count { case (_, olo, ohi) =>
        (olo, ohi) != (lo, hi) && lo <= ohi && olo <= hi
      }.toLong
    }.toMap
    assert(got == expected, s"sweep diverged from quadratic:\ngot $got\nexp $expected")
    graft.Caches.clear()
  }

  test("partition_stats: physical plan has NO pairwise interval join (conditioned BNLJ/cartesian)") {
    val plan = graft.operators.LayoutOps.partitionStats(spark, sf)
      .queryExecution.executedPlan.toString
    // The 1-row totals crossJoin legitimately plans as an
    // unconditioned BNLJ (the broadcast-1-row-totals idiom); what must
    // never return is a RANGE-conditioned nested-loop over the file
    // manifest — a BNLJ line carrying a comparison predicate.
    val pairwise = plan.linesIterator.filter(l =>
      (l.contains("BroadcastNestedLoopJoin") && (l.contains("<=") || l.contains(">=") ||
        l.contains("< ") || l.contains("> "))) || l.contains("CartesianProduct")).toSeq
    assert(pairwise.isEmpty,
      s"partition_stats regressed to a pairwise interval join:\n${pairwise.mkString("\n")}\n$plan")
    graft.Caches.clear()
  }
}
