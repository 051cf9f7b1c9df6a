package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Dedup-family semantics: building-block units on crafted rows plus
  * whole-operator invariants on the sf0.001 corpus.
  */
class DedupSpec extends AnyFunSuite with SparkFixture {

  test("hashed-shingle substrate memo: parquet table equals the in-line derivation; survives Caches.clear") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val fromPlan = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Dedup.wordNgrams(col("toks"), 3).as("sh"))
      .select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    val first = Dedup.hashedShingles(spark, sf, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(first.length == fromPlan.length)
    first.zip(fromPlan).foreach { case (a, b) => assert(a == b,
      "parquet-materialized shingle table must be bit-identical to its derivation") }
    val misses = Caches.modelMissCount
    Caches.clear()
    // the memo deliberately survives the per-query clear (on-disk
    // derived signature table, not block-manager state)
    Dedup.hashedShingles(spark, sf, 3).head()
    assert(Caches.modelMissCount == misses,
      "substrate must survive Caches.clear without re-deriving")
    Caches.clear()
  }

  test("wordNgrams produces n-1 fewer shingles; short docs fall back to one") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("text")
      .select(size(Dedup.wordNgrams(tokens(col("text")), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 1))
  }

  test("graft_set_overlap equals the array_intersect/union road, including duplicate elements") {
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(2L, 2L, 3L)),          // duplicates count once
      (Seq(5L), Seq(5L)),
      (Seq(-9L, 0L, 7L), Seq(8L, 9L)),             // disjoint
      (Seq.empty[Long], Seq(1L, 2L))).toDF("x", "y")
    val got = rows.select(
        call_function("graft_set_overlap", col("x"), col("y")).as("ov"),
        size(array_intersect(col("x"), col("y"))).cast("long").as("i2"),
        size(array_union(col("x"), col("y"))).cast("long").as("u2"))
      .select(col("ov.inter"), col("ov.uni"), col("ov.j_x1000"), col("i2"), col("u2"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(3), "inter must match array_intersect")
      assert(r.getLong(1) == r.getLong(4), "uni must match array_union")
      assert(r.getLong(2) ==
        math.floor(1000.0 * r.getLong(0) / r.getLong(1)).toLong, "J arithmetic")
    }
    // both-empty: kernel defines 0 where the builtin road would NaN
    val empty = spark.sql(
      "SELECT graft_set_overlap(array(), array()).j_x1000 AS j").head.getLong(0)
    assert(empty == 0L)
  }

  test("jaccardX1000: identical sets 1000, disjoint 0, half-overlap computed exactly") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccardX1000(col("x"), col("y")).as("j"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1000L, 0L, 500L))
  }

  test("minhash signatures of identical shingle sets are identical") {
    import spark.implicits._
    val df = Seq("x y z w", "x y z w").toDF("text")
      .select(Dedup.minhashSignature(Dedup.wordNgrams(tokens(col("text")), 2), 16).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
  }

  test("dedup_exact_hash partitions the corpus: n_copies sums to corpus size") {
    val docs = Tables.documents(spark, sf).count()
    val out = Dedup.dedupExactHash(spark, sf)
    assert(out.agg(sum("n_copies")).head().getLong(0) == docs)
  }

  test("dedup_minhash_lsh: one verdict per doc; reps are smaller ids; dup pairs verified") {
    val out = Dedup.dedupMinhashLsh(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("is_dup") && col("rep_doc_id") >= col("doc_id")).count() == 0)
    assert(out.filter(!col("is_dup") && col("rep_doc_id") =!= col("doc_id")).count() == 0)
    out.unpersist()
  }

  test("dedup_simhash: near-identical docs collide, distinct docs don't explode") {
    val out = Dedup.dedupSimhash(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    // exact duplicates (same normalized text) must be simhash-dups too
    val exact = Dedup.dedupExactHash(spark, sf).filter(col("n_copies") > 1)
    if (exact.count() > 0) assert(out.filter(col("is_dup")).count() > 0)
    out.unpersist()
  }

  test("dedup_simhash equals the all-pairs hamming road — the 4-band cover of d<=3 is LOSSLESS") {
    // The DuckDB gate can't check this key (the oracle reads only the
    // input parquet and DuckDB has no xxhash64 to re-derive the
    // signature), so the full-strength check lives here: unlike
    // MinHash banding (probabilistic recall), 4 bands over 64 bits
    // cover hamming <= 3 DETERMINISTICALLY (pigeonhole: 4 mismatched
    // bits can't touch all 4 bands), so the banded operator must equal
    // plain all-pairs exactly — verdict for verdict, not just recall.
    import graft.functions.TextFunctions.tokens
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"), call_function("graft_simhash", tokens(col("text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = sigs.map { case (d, sd) =>
      val smaller = sigs.iterator
        .filter { case (a, sa) => a < d && java.lang.Long.bitCount(sa ^ sd) <= 3 }
        .map(_._1)
      if (smaller.hasNext) { val rep = smaller.min; (d, rep, true) } else (d, d, false)
    }.toSeq
    val got = Dedup.dedupSimhash(spark, sf)
      .select("doc_id", "rep_doc_id", "is_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sortBy(_._1)
    assert(got == expected)
    assert(expected.count(_._3) > 0, "corpus must exercise the dup path for this to mean anything")
  }

  test("dedup_ngram_jaccard: OPH banding yields the identical verified output") {
    val classic = graft.operators.Dedup.dedupNgramJaccard(spark, sf)
    val oph = graft.operators.Dedup.dedupNgramJaccard(spark, sf, useOph = true)
    assert(classic.exceptAll(oph).count() == 0 && oph.exceptAll(classic).count() == 0)
    graft.Caches.clear()
  }

  test("dedup_substring: exact copies always share windows; counts bounded by n_windows") {
    val out = graft.operators.Dedup.dedupSubstring(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("n_shared_windows") > col("n_windows")).count() == 0)
    // any doc with an exact duplicate shares ALL its windows
    val exactGroups = graft.operators.Dedup.dedupExactHash(spark, sf)
      .filter(col("n_copies") > 1)
    if (exactGroups.count() > 0) {
      val dupDocs = exactGroups.select(col("keep_doc_id").as("doc_id"))
      val bad = out.join(dupDocs, "doc_id")
        .filter(!col("has_shared") || col("n_shared_windows") =!= col("n_windows"))
      assert(bad.count() == 0)
    }
    graft.Caches.clear()
    out.unpersist()
  }

  test("dedup_embedding_cosine verdicts cover every vector") {
    val out = Dedup.dedupEmbeddingCosine(spark, sf)
    assert(out.count() == Tables.embeddings(spark, sf).count())
  }

  test("dedup_semantic_clusters matches an independent union-find over exact all-pairs cosine") {
    // Plain-Scala oracle: cosine in the SAME accumulation order as
    // graft_cosine (sequential double over floats), union-find over
    // all ~n²/2 pairs at sf0.001, min id per component.
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        val xi = x(i).toDouble; val yi = y(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      if (den == 0.0) 0.0 else dot / den
    }
    val idx = vecs.map(_._1).zipWithIndex.toMap
    val parent = Array.tabulate(vecs.length)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); r }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (cos(vecs(i)._2, vecs(j)._2) >= 0.9) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    val expected = vecs.map { case (id, _) =>
      val rep = vecs(find(idx(id)))._1
      id -> (rep, rep != id)
    }.toMap
    val got = Dedup.dedupSemanticClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == expected)
    // The synthetic embeddings have NO pairs at cosine >= 0.9 (max is
    // ~0.48 at sf0.001), so this agreement is over all-singletons; the
    // crafted-chain test below exercises the merge path.
    graft.Caches.clear()
  }

  test("dedup_semantic_clusters merges a transitive chain a pair-verdict cannot") {
    import spark.implicits._
    // 2-D rotations embedded in dim 8: cos(16°)=0.961 links 1-2 and
    // 2-3; cos(32°)=0.848 keeps 1-3 below tau — only transitive
    // closure puts all three in one cluster. 40 is orthogonal noise.
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sem").toString
    Seq(
      (1L, v(0)), (2L, v(16)), (3L, v(32)),
      (40L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    // Wide banding (16×2) so LSH candidate recall is ~1 even at
    // cos 0.96; the exact-cosine verify removes any false candidates.
    val out = Dedup.dedupSemanticClusters(spark, dir, nBands = 16, bitsPerBand = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, true), 40L -> (40L, false)))
    // The pair verdict on the same corpus leaves 3 attached to 2, not 1
    // (and 1 un-flagged) — the semantic-clusters contract is strictly
    // stronger.
    val pairs = Dedup.dedupEmbeddingCosine(spark, dir, nBands = 16, bitsPerBand = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs(3L) == 2L)
    graft.Caches.clear()
  }

  test("semdedup_keep_central keeps the centroid-closest member, not the min id") {
    import spark.implicits._
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_semc").toString
    Seq(
      (1L, v(0)), (2L, v(16)), (3L, v(32)),
      (40L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val out = Dedup.semdedupKeepCentral(spark, dir, nBands = 16, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(out.filter(_._2 == 1L).map(_._1).toSet == Set(1L, 2L, 3L))
    // the angular middle (16°) is the centroid-closest representative —
    // min-id labeling would keep 1
    assert(byId(2L)._4 && !byId(1L)._4 && !byId(3L)._4)
    // singleton: kept, centroid is itself, distance exactly 0
    assert(byId(40L)._4 && byId(40L)._3 == 0L)
    // independent plain-Scala micro-unit recompute of every distance
    val vecs = Map(1L -> v(0), 2L -> v(16), 3L -> v(32))
    val micro = vecs.map { case (k, a) => k -> a.map(x => math.floor(1e6 * x).toLong) }
    val cen = Array.tabulate(8)(i => micro.values.map(_(i)).sum / 3)
    micro.foreach { case (k, mv) =>
      val dist = mv.zip(cen).map { case (x, c) => (x - c) * (x - c) }.sum
      assert(byId(k)._3 == dist, s"center_dist of $k")
    }
    graft.Caches.clear()
    // real corpus: exactly one kept member per component
    val real = Dedup.semdedupKeepCentral(spark, sf)
    val perComp = real.filter(col("is_kept")).groupBy("component")
      .agg(count(lit(1)).as("k"))
    assert(perComp.filter(col("k") =!= 1).count() == 0)
    assert(real.select("component").distinct().count() == perComp.count())
    graft.Caches.clear()
  }

  test("dedup_keep_best keeps the argmax-quality member per cluster, not the min id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_best").toString
    val base = "the quick brown fox jumps over a lazy dog and then runs back to " +
      "the old barn where a second dog is waiting for the first one to return home"
    Seq(
      (1L, base + " 999 777 444 222"), // near-dup of 2, junk digits lower its quality
      (2L, base),                      // cleanest copy, LARGER... wait id 2 > 1: argmax must beat min-id
      (7L, "completely different text about astronomy and the motion of planets")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupKeepBest(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // 1 and 2 cluster (shared 3-gram shingles >= 0.8 Jaccard); the
    // min-label rep is 1 but the cleaner copy is 2 — keep-best must
    // pick 2 where dedupClusters' rep would say 1.
    assert(out(1L) == (2L, false), s"junky copy must lose to the cleaner one: $out")
    assert(out(2L) == (2L, true))
    assert(out(7L) == (7L, true), "singletons keep themselves")
    graft.Caches.clear()
  }

  test("dedup_soft_weight: one row per doc, weight = floor(1000/size), sizes count the dedupClusters components") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = clusters.values.groupBy(identity).map { case (rep, g) => rep -> g.size.toLong }
    val got = Dedup.dedupSoftWeight(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == clusters.keys.toSeq.sorted, "one row per doc, ordered")
    got.foreach { case (doc, rep, size, wx) =>
      assert(rep == clusters(doc), s"rep drifted from dedupClusters for $doc")
      assert(size == sizes(rep), s"cluster_size wrong for $doc")
      assert(wx == math.floor(1000.0 / size).toLong, s"weight arithmetic for $doc")
    }
    // the unbiasedness identity: per-cluster weights sum within 1/1000
    // rounding of exactly 1 document's weight-mass
    got.groupBy(_._2).foreach { case (_, members) =>
      val sum = members.map(_._4).sum
      assert(sum <= 1000L && sum > 1000L - members.length,
        s"cluster weight mass $sum out of range for size ${members.length}")
    }
    assert(got.filter(_._3 == 1L).forall(_._4 == 1000L), "singletons keep full weight")
    graft.Caches.clear()
  }

  test("split_leakage: matrix equals a driver-side all-pairs recompute, complete with zero cells") {
    import graft.operators.TrainingOps
    val sh = Dedup.hashedShingles(spark, sf, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val splits = TrainingOps.sampleSplitHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val ids = sh.keys.toSeq.sorted
    val pairs = for {
      i <- ids; j <- ids if i < j
      inter = (sh(i) & sh(j)).size; uni = (sh(i) | sh(j)).size
      if uni > 0 && math.floor(1000.0 * inter / uni).toLong >= 800L
    } yield (i, j)
    val byCombo = pairs.groupBy { case (i, j) =>
      val (x, y) = (splits(i), splits(j))
      if (x <= y) (x, y) else (y, x)
    }
    val combos = for {
      x <- splits.values.toSeq.distinct.sorted
      y <- splits.values.toSeq.distinct.sorted if x <= y
    } yield (x, y)
    val expected = combos.map { c =>
      val ps = byCombo.getOrElse(c, Seq.empty)
      (c._1, c._2, ps.size.toLong,
       ps.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }
    val got = Dedup.splitLeakage(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    graft.Caches.clear()
  }

  test("dedup_keep_best on the corpus: one winner per cluster, winner maximizes (quality, -doc_id)") {
    import graft.operators.TextOps
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextOps.textQualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val expected = clusters.groupBy(_._2).flatMap { case (_, members) =>
      val best = members.keys.minBy(id => (-quality(id), id))
      members.keys.map(id => id -> ((best, id == best)))
    }
    val got = Dedup.dedupKeepBest(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == expected)
    graft.Caches.clear()
  }

  test("graft_minhash_bands: identical shingle sets collide on every band, order-invariant") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      Seq("a b", "b c", "c d"),
      Seq("c d", "a b", "b c"),   // same set, different order
      Seq("x y", "y z", "z w"))   // different set
      .toDF("sh")
      .select(call_function("graft_minhash_bands", col("sh"), lit(64), lit(16)).as("bands"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 16)
    assert(rows(0) == rows(1))           // MinHash is set-based
    assert(rows(0) != rows(2))
    // non-divisible banding rejected at construction
    intercept[IllegalArgumentException](
      graft.functions.MinHashBands(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq("a"), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), 60, 16))
  }

  test("non-divisible nPerms/nBands is rejected, not silently truncated") {
    intercept[IllegalArgumentException](Dedup.dedupMinhashLsh(spark, sf, nPerms = 60, nBands = 16))
    intercept[IllegalArgumentException](Dedup.dedupNgramJaccard(spark, sf, nPerms = 60, nBands = 32))
  }

  test("graft_minhash / graft_simhash skip null array elements instead of NPEing") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Seq[String]("a", null, "b"), Seq[String]("a", "b")),
      (Seq[String](null), Seq[String]())).toDF("with_nulls", "clean")
    val rows = df.select(
      Dedup.minhashSignature(col("with_nulls"), 8).as("m1"),
      Dedup.minhashSignature(col("clean"), 8).as("m2"),
      call_function("graft_simhash", col("with_nulls")).as("s1"),
      call_function("graft_simhash", col("clean")).as("s2")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("connectedComponents collapses chained clusters to the smallest id") {
    import spark.implicits._
    // chain 1-2-3 plus standalone 5
    val ids = Seq(1L, 2L, 3L, 5L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val closed = graft.operators.Dedup.connectedComponents(ids, edges, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(closed(1L) == ((1L, false)))
    assert(closed(2L) == ((1L, true)))
    assert(closed(3L) == ((1L, true)))   // chained: 3 ~ 2 ~ 1
    assert(closed(5L) == ((5L, false)))
    graft.Caches.clear()
  }

  test("connectedComponents merges docs linked only through a shared LARGER neighbor") {
    import spark.implicits._
    // Edges (1,3),(2,3): an a<b min-parent pointer chase yields {1,3}
    // and {2} — true undirected components must yield {1,2,3}.
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    val closed = graft.operators.Dedup.connectedComponents(ids, edges, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(closed(1L) == ((1L, false)))
    assert(closed(2L) == ((1L, true)))
    assert(closed(3L) == ((1L, true)))
    assert(closed(4L) == ((4L, false)))
    graft.Caches.clear()
  }

  test("connectedComponents handles long chains within the iteration budget") {
    import spark.implicits._
    // 0-1-2-...-63: diameter 63, must converge in O(log) rounds thanks
    // to the pointer-jump step (well under the default maxIters = 20).
    val n = 64L
    val ids = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val closed = graft.operators.Dedup.connectedComponents(ids, edges, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(closed.values.toSet == Set(0L))
    graft.Caches.clear()
  }

  test("connectedComponents empty edge set short-circuits to singleton components") {
    import spark.implicits._
    val ids = Seq(7L, 8L, 9L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val closed = graft.operators.Dedup.connectedComponents(ids, edges, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(closed == Map(7L -> ((7L, false)), 8L -> ((8L, false)), 9L -> ((9L, false))))
    graft.Caches.clear()
  }

  test("connectedComponents reliable-checkpoint path matches the local-checkpoint result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    // Chain + the shared-larger-neighbor counter-example in one graph.
    val ids = (0L until 16L).toDF("doc_id")
    val edges = ((0L until 9L).map(i => (i, i + 1)) ++ Seq((11L, 13L), (12L, 13L)))
      .toDF("a", "b")
    val closed = graft.operators.Dedup
      .connectedComponents(ids, edges, "doc_id", reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(closed(i) == 0L))
    Seq(11L, 12L, 13L).foreach(i => assert(closed(i) == 11L))
    Seq(10L, 14L, 15L).foreach(i => assert(closed(i) == i))
    graft.Caches.clear()
  }

  test("dedup_edit_distance: same dup set as the jaccard verdict, sane distances") {
    import org.apache.spark.sql.functions._
    val lev = Dedup.dedupEditDistance(spark, sf).cache()
    val jac = Dedup.dedupNgramJaccard(spark, sf)
    // identical candidate contract + threshold → identical dup SETS
    // (only the ranking metric differs)
    val a = lev.filter(col("is_dup")).select("doc_id")
    val b = jac.filter(col("is_dup")).select("doc_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // dup docs carry a real distance, non-dups exactly the -1 sentinel
    assert(lev.filter(col("is_dup") && col("best_lev") < 0).count() == 0)
    assert(lev.filter(!col("is_dup") && col("best_lev") =!= -1L).count() == 0)
    lev.unpersist()
    graft.Caches.clear()
  }

  test("dedup_incremental_minhash equals the brute-force delta x base scoring") {
    val out = Dedup.dedupIncrementalMinhash(spark, sf).cache()
    // brute force in-engine: every delta doc scored against every base
    // doc on the same hashed shingles, no LSH, no bucket cap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.wordNgrams(col("toks"), 3).as("sh"))
      .select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs")).cache()
    val delta = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("hs").as("sh_d"))
    val base = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("base_id"), col("hs").as("sh_b"))
    val scored = delta.crossJoin(base)
      .select(col("doc_id"), col("base_id"),
        floor(lit(1000.0) * size(array_intersect(col("sh_d"), col("sh_b")))
          / size(array_union(col("sh_d"), col("sh_b")))).cast("long").as("jac"))
      .filter(col("jac") >= 800)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("jac").desc, col("base_id"))
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val brute = delta.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("base_id").isNotNull.as("is_near_dup"),
              col("base_id").as("best_base_id"), col("jac").as("best_jaccard_x1000"))
    assert(out.exceptAll(brute).count() == 0 && brute.exceptAll(out).count() == 0)
    // partners always come from the base partition, never the delta
    assert(out.filter(col("best_base_id").isNotNull &&
                      col("best_base_id") % 10 === 0).count() == 0)
    out.unpersist(); docs.unpersist()
    graft.Caches.clear()
  }

  test("dedup_incremental_embedding equals brute-force delta x base cosine; partners from base only") {
    import graft.plans.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val out = Dedup.dedupIncrementalEmbedding(spark, sf).cache()
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).cache()
    val delta = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").as("emb_d"))
    val base = emb.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("base_id"), col("embedding").as("emb_b"))
    val best = delta.crossJoin(base)
      .filter(call_function("graft_cosine", col("emb_d"), col("emb_b")) >= 0.9)
      .groupBy("vec_id").agg(min("base_id").as("rep_base_id"))
    val brute = delta.select("vec_id").join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("rep_base_id").isNotNull.as("is_near_dup"),
              col("rep_base_id"))
    assert(out.exceptAll(brute).count() == 0 && brute.exceptAll(out).count() == 0)
    // representatives always come from the base partition, never the delta
    assert(out.filter(col("rep_base_id").isNotNull &&
                      col("rep_base_id") % 10 === 0).count() == 0)
    // every delta vector gets exactly one verdict row
    assert(out.count() == delta.count())
    out.unpersist(); emb.unpersist()
    graft.Caches.clear()
  }

  test("dedup_incremental_embedding catches threshold-GRAZING pairs (cosine 0.900-0.905)") {
    // The oracle-parity exposure this pins (SparkEntry scaladoc on the
    // dedup_incremental_embedding oracle): the engine's SRP banding has
    // ~2% per-pair miss probability for pairs sitting ON the tau=0.9
    // threshold, while the DuckDB oracle is exact — the testdata's
    // crafted pairs sit well above tau, so a hash mismatch has never
    // been possible, but a REGENERATED fixture with grazing pairs
    // could flag one. This spec builds 12 pairs at cosine ≈ 0.902
    // (inside the [0.90, 0.905] grazing strip after float32 rounding)
    // in 12 independent directions and asserts the engine equals the
    // exact brute-force verdict — any banding miss on any pair fails
    // loudly. Collision under the FIXED deterministic plane matrix is
    // deterministic, so this pins the current recall behavior: a
    // change to the SRP seed, plane matrix, band slicing, or bucket
    // valve that degrades grazing recall breaks here, not in the
    // driver's oracle gate.
    import spark.implicits._
    import graft.plans.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val dim = 64
    val rng = new scala.util.Random(20260814L)
    def unit(): Array[Double] = {
      val a = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    val target = 0.902
    val rows = (0 until 12).flatMap { i =>
      val u = unit()
      val raw = unit()
      val proj = raw.zip(u).map { case (r, b) => r * b }.sum
      val wRaw = raw.zip(u).map { case (r, b) => r - proj * b }
      val wn = math.sqrt(wRaw.map(x => x * x).sum)
      val w = wRaw.map(_ / wn)
      val v = u.zip(w).map { case (b, ww) =>
        target * b + math.sqrt(1 - target * target) * ww }
      val baseId = 10L * i + 1          // base partition: id % 10 != 0
      val deltaId = 10L * (i + 100)     // delta partition: id % 10 == 0
      Seq(baseId -> u.map(_.toFloat), deltaId -> v.map(_.toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-graze").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    // every pair really is inside the grazing strip after f32 rounding
    val emb = Tables.embeddings(spark, dir).cache()
    val cosines = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").as("emb_d"))
      .join(emb.filter(col("vec_id") % 10 =!= 0)
              .select(col("vec_id").as("base_id"), col("embedding").as("emb_b")),
            col("base_id") === col("vec_id") - 999) // deltaId 10(i+100) ↔ baseId 10i+1
      .select(call_function("graft_cosine", col("emb_d"), col("emb_b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(cosines.length == 12 && cosines.forall(c => c >= 0.900 && c <= 0.905),
      s"fixture drifted out of the grazing strip: ${cosines.mkString(", ")}")
    val out = Dedup.dedupIncrementalEmbedding(spark, dir).cache()
    // exact brute-force (the oracle's form) over the same fixture
    val brute = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").as("emb_d"))
      .crossJoin(emb.filter(col("vec_id") % 10 =!= 0)
                   .select(col("vec_id").as("base_id"), col("embedding").as("emb_b")))
      .filter(call_function("graft_cosine", col("emb_d"), col("emb_b")) >= 0.9)
      .groupBy("vec_id").agg(min("base_id").as("rep_base_id"))
    val expect = emb.select("vec_id").filter(col("vec_id") % 10 === 0)
      .join(brute, Seq("vec_id"), "left")
      .select(col("vec_id"), col("rep_base_id").isNotNull.as("is_near_dup"),
              col("rep_base_id"))
    assert(out.exceptAll(expect).count() == 0 && expect.exceptAll(out).count() == 0,
      "banding missed a grazing pair the exact oracle catches")
    // and the grazing pairs ARE the dup set: all 12 deltas flagged
    assert(out.filter(col("is_near_dup")).count() == 12)
    out.unpersist(); emb.unpersist()
    graft.Caches.clear()
  }

  test("dedup_paragraphs strips the shared unit, keeps unique units in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-para").toString
    // windowTokens=3: each doc splits into exact 3-token units
    Seq(
      (1L, "nav bar menu alpha beta gamma"),   // boiler + unique
      (2L, "nav bar menu delta epsilon zeta"), // boiler + unique
      (3L, "eta theta iota kappa lambda mu"),  // fully unique
      (4L, "nav bar menu")                     // boiler ONLY -> empty clean text
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupParagraphs(spark, dir, windowTokens = 3, minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "alpha beta gamma")))
    assert(out(2L) == ((2L, 1L, "delta epsilon zeta")))
    assert(out(3L) == ((2L, 0L, "eta theta iota kappa lambda mu")))
    assert(out(4L) == ((1L, 1L, "")))
  }

  test("dedup_paragraphs on the corpus: unit counts tile each doc, drops only cross-doc units") {
    import graft.functions.TextFunctions.tokens
    val out = Dedup.dedupParagraphs(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    // single-node recompute of the same chunking + df>=2 rule
    val units = docs.map { case (id, ts) =>
      id -> ts.grouped(10).map(_.mkString(" ")).toSeq }
    val dfm = units.flatMap { case (id, us) => us.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    units.foreach { case (id, us) =>
      val kept = us.filter(dfm(_) < 2)
      val (n, dropped, clean) = out(id)
      assert(n == us.length, s"doc $id unit count")
      assert(dropped == us.count(dfm(_) >= 2), s"doc $id dropped")
      assert(clean == kept.mkString(" "), s"doc $id clean text")
    }
  }

  test("dedup_lsh_eval: count algebra holds and banding recalls the fixture's true pairs") {
    val r = Dedup.dedupLshEval(spark, sf).head()
    val (nTrue, nCand, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue > 0, "fixture must contain sample-touching true near-dup pairs")
    assert(nHits <= nTrue && nHits <= nCand, "hits bounded by both sides")
    assert(r.getLong(3) == nHits * 1000000L / nTrue)
    assert(r.getLong(4) == nHits * 1000000L / nCand)
    // 86 bands × 3 rows at tau=0.5 collide with probability ≈ 1 — on
    // the crafted fixture the banding must surface essentially every
    // true pair (the property the continuous monitor exists to watch)
    assert(r.getLong(3) >= 900000L, s"candidate recall ${r.getLong(3)} collapsed")
    graft.Caches.clear()
  }

  test("corpus_overlap_matrix: complete upper triangle, set-algebra bounds, exact recompute") {
    val out = Dedup.corpusOverlapMatrix(spark, sf).collect()
    val sources = Tables.documents(spark, sf)
      .select("source").distinct().collect().map(_.getString(0)).sorted
    // one row per unordered pair, none missing, none diagonal
    assert(out.length == sources.length * (sources.length - 1) / 2)
    out.foreach { r =>
      val (a, b, shared, na, nb, j) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b)
      assert(shared <= math.min(na, nb), s"($a,$b): shared $shared exceeds a side")
      assert(j >= 0 && j <= 1000000)
      assert(j == shared * 1000000 / (na + nb - shared))
    }
    // exact recompute of one pair from raw shingle sets (string-level,
    // independent of the engine's hashed grouping)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)))
    def shingles(texts: Seq[String]): Set[String] = texts.flatMap { t =>
      val toks = t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    }.toSet
    val (sa, sb) = (sources.head, sources.last)
    val (setA, setB) = (shingles(docs(sa).toSeq), shingles(docs(sb).toSeq))
    val row = out.find(r => r.getString(0) == sa && r.getString(1) == sb).get
    assert(row.getLong(2) == setA.intersect(setB).size.toLong)
    assert(row.getLong(3) == setA.size.toLong && row.getLong(4) == setB.size.toLong)
    graft.Caches.clear()
  }

  test("dedup_bloom_probe: sound (no false negatives), exact verdict matches, FP bounded") {
    import graft.operators.Dedup
    val out = Dedup.dedupBloomProbe(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    graft.Caches.clear()
    // the unfiltered exact verdict on the same split
    val exact = Dedup.dedupIncremental(spark, sf).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(2)).toMap // is_dup = !is_new
    graft.Caches.clear()
    assert(out.keySet == exact.keySet, "same delta")
    out.foreach { case (id, (maybe, isDup)) =>
      assert(isDup == exact(id), s"doc $id exact verdict drifted through the prefilter")
      if (isDup) assert(maybe, s"doc $id: a true dup escaped the bloom — false negative")
    }
    // realized FP rate within 3x the analytic ceiling (plus an absolute
    // floor for the tiny-sample regime)
    val fps = out.values.count { case (maybe, isDup) => maybe && !isDup }
    val nBase = Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 0).count()
    val bound = math.pow(1 - math.exp(-5.0 * nBase / (1 << 17)), 5)
    assert(fps <= math.max(1.0, 3 * bound * out.size),
      s"$fps false positives exceeds the (1-e^-kn/m)^k ceiling $bound over ${out.size} probes")
  }

  test("dedup_rate_by_source reconciles with the clusters it audits") {
    val out = Dedup.dedupRateBySource(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val clusters = Dedup.dedupClusters(spark, sf).cache()
    // every source reported once, with its exact doc count
    val wantCounts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotRows = out.collect()
    assert(gotRows.map(_.getString(0)).toSet == wantCounts.keySet)
    gotRows.foreach { r =>
      assert(r.getLong(1) == wantCounts(r.getString(0)))
      // ppm is the integral floor of the drop rate
      assert(r.getLong(4) == 1000000L * r.getLong(2) / r.getLong(1))
      // cross-source docs and drops are both bounded by the source size
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
    // drop totals reconcile with the cluster verdicts
    assert(gotRows.map(_.getLong(2)).sum == clusters.filter(col("is_dup")).count())
    // cross-source totals reconcile with an independent cluster-span count
    val span = clusters.join(docs, "doc_id")
      .groupBy("rep_doc_id").agg(countDistinct(col("source")).as("ns"), count(lit(1)).as("sz"))
    val wantCross = span.filter(col("ns") > 1).agg(sum("sz")).head().getLong(0)
    assert(gotRows.map(_.getLong(3)).sum == wantCross)
    clusters.unpersist(); out.unpersist()
  }
}
