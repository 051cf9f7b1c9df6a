package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Property-based checks of the pure column semantics: scalacheck
  * generators (seeded — fully reproducible), each property evaluated
  * as ONE batched Spark plan over all generated cases.
  */
class PropertySpec extends AnyFunSuite with SparkFixture {

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokenList: Gen[List[String]] = Gen.nonEmptyListOf(token)

  private def cases[A](g: Gen[A], n: Int = 24): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("fingerprintKey is invariant under duplication, reordering, and case") {
    import spark.implicits._
    val rows = cases(tokenList).map { toks =>
      (toks.mkString(" "),
       (toks ++ toks).reverse.mkString(" "),
       toks.map(_.toUpperCase).mkString("  "))
    }
    val bad = rows.toDF("a", "b", "c").select(
      TextFunctions.fingerprintKey(col("a")).as("ka"),
      TextFunctions.fingerprintKey(col("b")).as("kb"),
      TextFunctions.fingerprintKey(col("c")).as("kc"))
      .filter(col("ka") =!= col("kb") || col("ka") =!= col("kc"))
    assert(bad.count() == 0)
  }

  test("z-order key is monotonic per dimension and round-trips its operands") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val coord: Gen[Long] = Gen.chooseNum(0L, (1L << 21) - 1)
    val rows = cases(Gen.zip(coord, coord, coord), n = 64)
    val bits = 21
    def z(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      call_function("graft_zorder2", x, y, lit(bits))
    // fixing one dimension, z preserves the other's order (each x-bit
    // occupies a higher z position than all lower x-bits AND lower
    // y-bits can ever outweigh within the interleave) — the property
    // that makes z-range partitions contiguous per dimension
    val bad = rows.map { case (x1, x2, y) => (math.min(x1, x2), math.max(x1, x2), y) }
      .toDF("x1", "x2", "y")
      .filter(col("x1") < col("x2"))
      .filter(!(z(col("x1"), col("y")) < z(col("x2"), col("y"))) ||
              !(z(col("y"), col("x1")) < z(col("y"), col("x2"))))
    assert(bad.count() == 0)
    // bit-exact round trip: de-interleaving recovers both operands
    val extracted = rows.toDF("x", "y", "ignore")
      .select(col("x"), col("y"), z(col("x"), col("y")).as("zv"))
      .withColumn("rx", (0 until bits).map(i =>
        shiftright(col("zv"), 2 * i).bitwiseAND(lit(1L)) * lit(1L << i)).reduce(_ + _))
      .withColumn("ry", (0 until bits).map(i =>
        shiftright(col("zv"), 2 * i + 1).bitwiseAND(lit(1L)) * lit(1L << i)).reduce(_ + _))
      .filter(col("rx") =!= col("x") || col("ry") =!= col("y"))
    assert(extracted.count() == 0)
  }

  test("jaccardX1000 is symmetric and exactly 1000 on equal sets") {
    import spark.implicits._
    val rows = cases(Gen.zip(tokenList, tokenList))
    val bad = rows.toDF("a", "b").select(
      Dedup.jaccardX1000(col("a"), col("b")).as("ab"),
      Dedup.jaccardX1000(col("b"), col("a")).as("ba"),
      Dedup.jaccardX1000(col("a"), col("a")).as("aa"))
      .filter(col("ab") =!= col("ba") || col("aa") =!= 1000L)
    assert(bad.count() == 0)
  }

  test("minhash signature entries only decrease when shingles are added") {
    import spark.implicits._
    val rows = cases(Gen.zip(tokenList, tokenList)).map { case (a, extra) => (a, a ++ extra) }
    val bad = rows.toDF("a", "sup").select(
      Dedup.minhashSignature(col("a"), 8).as("sa"),
      Dedup.minhashSignature(col("sup"), 8).as("ssup"))
      .filter(exists(zip_with(col("sa"), col("ssup"), (x, y) => y > x), identity))
    assert(bad.count() == 0)
  }

  private val intervalSets: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 100L), Gen.chooseNum(0L, 20L)))
      .map(_.map { case (s, len) => (s, s + len) })

  /** Brute-force interval union: sort, sweep, merge touching/overlapping. */
  private def bruteMerge(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    iv.sorted.foldLeft(Vector.empty[(Long, Long, Long)]) {
      case (acc, (s0, e0)) =>
        acc.lastOption match {
          case Some((ps, pe, pn)) if s0 <= pe =>
            acc.init :+ ((ps, math.max(pe, e0), pn + 1))
          case _ => acc :+ ((s0, e0, 1L))
        }
    }

  test("mergeIntervalsOver equals the brute-force sweep on seeded random intervals") {
    import spark.implicits._
    val byKey = cases(intervalSets, n = 8).zipWithIndex
      .map { case (iv, k) => (k.toLong, iv) }
    val df = byKey.flatMap { case (k, iv) => iv.map { case (s, e) => (k, s, e) } }
      .toDF("key", "start_day", "end_day")
    val got = operators.Analytics.mergeIntervalsOver(df, "key")
      .select("key", "episode_start_day", "episode_end_day", "n_intervals")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = byKey.map { case (k, iv) => k -> bruteMerge(iv) }.toMap
    assert(got == want)
  }

  test("backlogOver open_orders equals the brute coverage count at every change day") {
    import spark.implicits._
    val iv = cases(intervalSets, n = 1).head
    val df = iv.map { case (s, e) => (s, e) }.toDF("start_day", "end_day")
    val got = operators.Analytics.backlogOver(df)
      .select("day", "open_orders").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (day, open) =>
      val expect = iv.count { case (s, e) => s <= day && day <= e }
      assert(open == expect, s"day $day: open=$open, brute=$expect")
    }
  }

  /** Generated purchase histories for the windowed-spend properties:
    * per user a nonempty list of (ts_ns, cents) with ts drawn from a
    * SMALL range so tied timestamps (the event_id tie-break seam) are
    * common, fed to the engine in a seeded-shuffled row order so the
    * properties also pin input-order independence. event_id = the
    * per-user position index, unique by construction. `tickNs` sets
    * the clock grain: 1e9 models the original ns-grain data (ties at
    * whole seconds), 1000 models the regenerated µs-grain data, where
    * EVERY ts_ns is a multiple of 1000 and ties collide at exactly
    * the grain the loader now derives from TIMESTAMP files.
    */
  private def purchaseRows(nUsers: Int, tickNs: Long): Seq[(Long, Long, Long, Long)] = {
    val seqGen: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 100000L)))
    val rows = cases(seqGen, nUsers).zipWithIndex.flatMap { case (hist, u) =>
      hist.zipWithIndex.map { case ((ts, cents), i) =>
        (u.toLong, (i + 1).toLong, ts * tickNs, cents)
      }
    }
    new scala.util.Random(99L).shuffle(rows)
  }

  private val grains = Seq("second" -> 1000000000L, "micro" -> 1000L)

  test("rolling median == single-node sliding lower-median at every frame edge, both clock grains") {
    import spark.implicits._
    val win = 5
    for ((grain, tick) <- grains) {
      val rows = purchaseRows(24, tick)
      val got = graft.operators.Analytics
        .rollingMedianOver(rows.toDF("user_id", "event_id", "ts_ns", "cents"), win)
        .select("user_id", "event_id", "n_in_frame", "median_cents")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._2))
        ordered.zipWithIndex.map { case (r, i) =>
          val frame = ordered.slice(math.max(0, i - win + 1), i + 1).map(_._4).sorted
          // lower median = 1-based element (n+1)/2 of the sorted frame
          (u, r._2) -> (frame.size.toLong, frame((frame.size + 1) / 2 - 1))
        }
      }
      assert(got == expected, s"grain=$grain")
    }
  }

  test("user EWMA == single-node integral fold regardless of input order, both clock grains") {
    import spark.implicits._
    for ((grain, tick) <- grains) {
      val rows = purchaseRows(24, tick)
      val got = graft.operators.Analytics
        .ewmaOver(rows.map { case (u, e, ts, c) => (u, ts, e, c) }
          .toDF("user_id", "ts_ns", "event_id", "cents"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val expected = rows.groupBy(_._1).map { case (u, rs) =>
        val cents = rs.sortBy(r => (r._3, r._2)).map(_._4)
        val ewma = cents.tail.foldLeft(cents.head)((acc, x) => (30L * x + 70L * acc) / 100L)
        u -> (cents.size.toLong, cents.last, ewma)
      }
      assert(got == expected, s"grain=$grain")
    }
  }

  test("lag features == single-node recompute on tied µs-grain timestamps") {
    import spark.implicits._
    for ((grain, tick) <- grains) {
      val rows = purchaseRows(24, tick)
      val got = graft.operators.Analytics
        .lagFeaturesOver(rows.toDF("user_id", "event_id", "ts_ns", "cents"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4),
           Option(r.get(5)).map(_.asInstanceOf[Long]),
           Option(r.get(6)).map(_.asInstanceOf[Long]),
           Option(r.get(7)).map(_.asInstanceOf[Long]))).toMap
      val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._2))
        ordered.zipWithIndex.map { case (r, i) =>
          val prev = if (i == 0) None else Some(ordered(i - 1))
          (u, r._2) -> (r._3 / 1000000000L, r._4, (i + 1).toLong,
            prev.map(_._4), prev.map(r._4 - _._4),
            prev.map(p => (r._3 - p._3) / 1000000000L))
        }
      }
      assert(got == expected, s"grain=$grain")
    }
  }

  test("attribution credits == single-node last-touch replay on tied, shuffled histories") {
    import spark.implicits._
    val types = Seq("view", "click", "purchase")
    val evGen: Gen[List[(Long, Int, Long)]] =
      Gen.nonEmptyListOf(Gen.zip(
        Gen.chooseNum(0L, 20L), Gen.chooseNum(0, 2), Gen.chooseNum(0L, 10000L)))
    for ((grain, tick) <- grains) {
      val lookbackNs = 5L * tick // tight window so boundary cases abound
      val rows = cases(evGen, 24).zipWithIndex.flatMap { case (hist, u) =>
        hist.zipWithIndex.map { case ((ts, ti, cents), i) =>
          (u.toLong, (i + 1).toLong, ts * tick, types(ti), cents)
        }
      }
      val shuffled = new scala.util.Random(41L).shuffle(rows)
      val got = graft.operators.Analytics.attributionCreditsOver(
        shuffled.toDF("user_id", "event_id", "ts_ns", "event_type", "cents"), lookbackNs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(3), r.getLong(4)))).toMap
      val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._2))
        var lt: Option[(String, Long)] = None
        ordered.flatMap { r =>
          if (r._4 == "purchase") {
            val ch = lt.filter(_._2 >= r._3 - lookbackNs).map(_._1).getOrElse("none")
            Some((u, r._2) -> ((ch, r._5)))
          } else { lt = Some((r._4, r._3)); None }
        }
      }
      assert(got == expected, s"grain=$grain")
    }
  }

  test("BFS core == single-node BFS on seeded random graphs (chains, cliques, isolates)") {
    import spark.implicits._
    import graft.operators.GraphOps
    // few cases, each a full iterative Spark run — generative coverage
    // of shapes the corpus graph can't produce on demand: disconnected
    // islands, long chains (hop-cap truncation), empty seed sets
    val graphGen = for {
      n <- Gen.chooseNum(2, 16)
      edgeCount <- Gen.chooseNum(0, n * 2)
      edges <- Gen.listOfN(edgeCount,
        Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
      seedCount <- Gen.chooseNum(0, 3)
      seeds <- Gen.listOfN(seedCount, Gen.chooseNum(0, n - 1))
    } yield (edges.collect { case (a, b) if a != b =>
               (math.min(a, b).toLong, math.max(a, b).toLong) }.distinct, seeds.map(_.toLong))
    // a deterministic worst case: an 8-chain seeded at one end with
    // maxHops=4 — the far half must stay null
    val chain = ((0L to 6L).map(i => (i, i + 1)).toList, List(0L))
    (cases(graphGen, n = 5) :+ chain).zipWithIndex.foreach { case ((edges, seeds), i) =>
      if (edges.nonEmpty) {
        val maxHops = 4
        val nodesSet = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
        val nodesDf = nodesSet.toSeq.toDF("part_key")
        val edgesDf = edges.toDF("a", "b")
        val seedsDf = seeds.toDF("part_key")
        val got = GraphOps.bfsHops(nodesDf, edgesDf, seedsDf, maxHops).collect()
          .map(r => r.getLong(0) ->
            Option(r.getAs[java.lang.Long]("hops")).map(_.longValue)).toMap
        // single-node replay
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toSet }
        val distMap = scala.collection.mutable.Map(
          seeds.toSet.intersect(nodesSet).map(_ -> 0L).toSeq: _*)
        var frontier = distMap.keySet.toSet
        var h = 0L
        while (h < maxHops && frontier.nonEmpty) {
          h += 1
          frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
            .diff(distMap.keySet)
          frontier.foreach(distMap(_) = h)
        }
        val expect = nodesSet.map(n => n -> distMap.get(n)).toMap
        assert(got == expect, s"case $i: edges=$edges seeds=$seeds")
        graft.Caches.clear()
      }
    }
  }

  test("kcore equals the single-node peel fixpoint on random graphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.chooseNum(2, 14)
      edgeCount <- Gen.chooseNum(0, n * 3)
      edges <- Gen.listOfN(edgeCount,
        Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield edges.collect { case (a, b) if a != b =>
      (math.min(a, b).toLong, math.max(a, b).toLong) }.distinct
    // deterministic shapes: a triangle with a tail (core = the
    // triangle), and a 6-cycle (2-core = everything)
    val triangleTail = List((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6)).toList
    (cases(graphGen, n = 5) ++ Seq(triangleTail, cycle)).zipWithIndex.foreach {
      case (edges, i) =>
        if (edges.nonEmpty) {
          val k = 2
          val got = graft.operators.GraphOps.kcore(edges.toDF("a", "b"), k)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          // single-node peel to fixpoint
          var adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
            .map { case (n, vs) => n -> vs.map(_._2).toSet }
          var done = false
          while (!done) {
            val drop = adj.collect { case (n, nb) if nb.size < k => n }.toSet
            if (drop.isEmpty) done = true
            else adj = adj.collect {
              case (n, nb) if !drop(n) => n -> nb.diff(drop)
            }
          }
          val expect = adj.map { case (n, nb) => n -> nb.size.toLong }
          assert(got == expect, s"case $i: edges=$edges")
          // the survivors really are a ≥k-degree subgraph (fixpoint)
          got.values.foreach(d => assert(d >= k))
          graft.Caches.clear()
        }
    }
  }

  test("isqrt is exactly floor(sqrt) across the boundary-adversarial range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // perfect squares and their neighbors are where floor(sqrt(double))
    // misrounds (m^2 - 1 near 2^52 rounds UP to m); the +/-1 correction
    // must fix every one of them
    val roots = cases(Gen.chooseNum(0L, (1L << 31) - 1), 64)
    val adversarial = roots.flatMap { m =>
      val sq = m * m
      Seq(sq - 1, sq, sq + 1).filter(v => v >= 0 && v < (1L << 62))
    } ++ cases(Gen.chooseNum(0L, (1L << 62) - 1), 64) ++
      Seq(0L, 1L, 2L, 3L, 4L, (1L << 62) - 1)
    val got = adversarial.toDF("a")
      .select(col("a"), graft.operators.TrainingOps.isqrt(col("a")).as("r"))
      .collect()
    got.foreach { row =>
      val (a, r) = (row.getLong(0), row.getLong(1))
      assert(BigInt(r).pow(2) <= BigInt(a) && BigInt(r + 1).pow(2) > BigInt(a),
        s"isqrt($a) = $r is not the integer square root")
    }
  }
}
