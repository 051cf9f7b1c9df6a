package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** The codegen'd Catalyst expressions agree with the higher-order-
  * function formulations, through both registration routes.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkFixture {

  test("graft_cosine is registered by the session extension and matches the HOF cosine") {
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.crossJoin(
      emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))).limit(500)
    val diff = pairs.select(
      abs(call_function("graft_cosine", col("embedding"), col("e2"))
        - VectorFunctions.cosine(col("embedding"), col("e2"))).as("d"))
    assert(diff.agg(max("d")).head().getDouble(0) < 1e-9)
  }

  test("graft_cosine known values: orthogonal 0, parallel 1, zero-vector 0") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(2f, 3f), Seq(2f, 3f)),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")).as("c"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals(0) == 0.0 && math.abs(vals(1) - 1.0) < 1e-12 && vals(2) == 0.0)
  }

  test("graft_srp_sig: deterministic, in range, identical vectors collide") {
    import spark.implicits._
    val df = Seq(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f), Seq(-1f, -2f, -3f)).toDF("v")
      .select(GraftFunctions.srpSignature(spark, col("v"), 16).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(sigs.forall(s => s >= 0 && s < (1L << 16)))
    // antipodal vectors flip every projection sign
    assert((sigs(0) ^ sigs(2)) == (1L << 16) - 1)
  }

  test("graft_srp_sig fails loudly (not silent truncation) past maxDim; explicit maxDim raises it") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val wide = Seq(Seq.tabulate(8)(_.toFloat)).toDF("v")
    val ex = intercept[Exception] {
      wide.select(call_function("graft_srp_sig", col("v"), lit(8), lit(4))).collect()
    }
    assert(ex.getMessage.contains("graft_srp_sig") || ex.getCause != null)
    // same vector, maxDim covering it: succeeds
    val ok = wide.select(call_function("graft_srp_sig", col("v"), lit(8), lit(8))).head().getLong(0)
    assert(ok >= 0 && ok < (1L << 8))
    // interpreted path throws the same way
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val litVec = Literal.create(Seq.tabulate(8)(_.toFloat), ArrayType(FloatType))
    intercept[IllegalArgumentException] {
      graft.functions.SrpSignature(litVec, 8, maxDim = 4).eval(null)
    }
  }

  test("vec_sum_micro aggregate equals the explode road, at any partitioning") {
    import graft.operators.Similarity
    val out = Similarity.embeddingCentroids(spark, sf)
    // independent road: explode to (label, pos, component), sum scaled ints
    val viaExplode = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
        floor(col("col").cast("double") * lit(1e6)).cast("long").as("micro"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n_vectors"), sum("micro").as("sum_micro"))
      .select(col("label"), col("pos"), col("n_vectors"), col("sum_micro"),
        expr("sum_micro div n_vectors").as("centroid_micro"))
    assert(out.exceptAll(viaExplode).count() == 0 &&
           viaExplode.exceptAll(out).count() == 0)
    // exactness claim: repartitioning changes which partials merge,
    // the long sums must not move
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      assert(Similarity.embeddingCentroids(spark, sf).collect().toSeq ==
             out.collect().toSeq)
    } finally conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("vec_sum_micro locks the dimension — mixed widths fail loudly") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val mixed = Seq((1L, Seq(1f, 2f)), (1L, Seq(1f, 2f, 3f))).toDF("k", "v")
    val e = intercept[Exception] {
      mixed.groupBy("k").agg(call_function("graft_vec_sum_micro", col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("vec_sum_micro rejects null and non-finite elements instead of reading them as 0") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(call_function("graft_vec_sum_micro", col("v"))).collect()
    val withNull = Seq((1L, Seq(Some(1f), None)), (1L, Seq(Some(2f), Some(3f))))
      .toDF("k", "v")
    assert(intercept[Exception](agg(withNull)).getMessage.contains("null element"))
    val withNaN = Seq((1L, Seq(1f, Float.NaN))).toDF("k", "v")
    assert(intercept[Exception](agg(withNaN)).getMessage.contains("non-finite"))
    val withInf = Seq((1L, Seq(Float.PositiveInfinity, 1f))).toDF("k", "v")
    assert(intercept[Exception](agg(withInf)).getMessage.contains("non-finite"))
    // a NULL VECTOR (whole row) still skips cleanly — only elements fail
    val nullRow = Seq((1L, Some(Seq(1f, 2f))), (1L, None)).toDF("k", "v")
    assert(agg(nullRow).head.getSeq[Long](1) == Seq(1000000L, 2000000L))
  }

  test("interpreted eval agrees with codegen on the corpus") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    import graft.functions.{CosineSim, SrpSignature}
    val rows = Tables.embeddings(spark, sf).limit(20)
      .select("vec_id", "embedding").collect()
    val viaCodegen = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"),
        GraftFunctions.srpSignature(spark, col("embedding"), 36).as("sig"),
        call_function("graft_cosine", col("embedding"), col("embedding")).as("self_cos"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.foreach { r =>
      val vec = r.getSeq[Float](1)
      val litVec = Literal.create(vec, ArrayType(FloatType))
      val (sig, selfCos) = viaCodegen(r.getLong(0))
      assert(SrpSignature(litVec, 36).eval(null) == sig)
      assert(math.abs(CosineSim(litVec, litVec).eval(null).asInstanceOf[Double] - selfCos) < 1e-12)
    }
  }

  test("graft_l2sq is bit-identical to the transform/zip_with/aggregate HOF it replaced") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf).limit(200)
    // crafted per-row centroid: the micro-scaled reverse of the vector
    // (guaranteed same length, exercises negative deltas)
    val withCent = emb.select(col("vec_id"), col("embedding"),
      expr("""transform(reverse(embedding),
                x -> CAST(FLOOR(1000000.0 * CAST(x AS DOUBLE)) AS BIGINT))""")
        .as("centroid_micro"))
    val both = withCent.select(col("vec_id"),
      call_function("graft_l2sq", col("embedding"), col("centroid_micro")).as("fused"),
      expr("""aggregate(
                zip_with(
                  transform(embedding,
                            x -> CAST(FLOOR(1000000.0 * CAST(x AS DOUBLE)) AS BIGINT)),
                  centroid_micro,
                  (e, c) -> (e - c) * (e - c)),
                0L, (acc, d) -> acc + d)""").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: fused ${r.getLong(1)} != hof ${r.getLong(2)}"))
    // interpreted eval path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val vec = Seq(0.5f, -1.25f, 0.0f)
    val cent = Seq(400000L, -1250000L, 7L)
    val fused = graft.functions.L2SqMicro(
      Literal.create(vec, ArrayType(FloatType)),
      Literal.create(cent, ArrayType(LongType))).eval(null)
    assert(fused == (100000L * 100000L + 0L + 49L))
    // length mismatch fails loudly rather than null-padding
    intercept[Exception] {
      spark.range(1).select(call_function("graft_l2sq",
        typedLit(Seq(0.5f, 1.0f)), typedLit(Seq(1L)))).collect()
    }
  }

  test("graft_kmeans_assign matches the array_min HOF argmin, ties to lowest cid") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val seedCol = array(seeds.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit(_)): _*).as("c"))
    }: _*)
    val both = emb.limit(300).select(col("vec_id"),
        call_function("graft_kmeans_assign", col("embedding"),
          typedLit(seeds.map(_._1).toSeq),
          typedLit(seeds.map(_._2.toSeq).toSeq)).as("fused"),
        array_min(transform(seedCol, sd => struct(
          aggregate(
            zip_with(col("embedding"), sd.getField("c"),
              (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
            lit(0.0), (acc, t) => acc + t).as("d2"),
          sd.getField("cid").as("cid")))).getField("cid").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: fused assign ${r.getLong(1)} != hof ${r.getLong(2)}"))
    // tie case: two identical seeds — the LOWEST cid must win (the
    // struct-ordering contract of the array_min form)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val tied = graft.functions.KmeansAssign(
      Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType)),
      Array(3L, 7L), Array(Array(1.0, 2.0), Array(1.0, 2.0))).eval(null)
    assert(tied == 3L, "equal distances must keep the lowest cid")
  }

  test("PqEncode equality is structural over the codebook, not reference-based") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    import graft.functions.PqEncode
    // two DISTINCT array instances with identical contents — under
    // case-class (reference) equality these would never compare
    // equal, defeating canonicalization / common-subexpression
    // elimination of repeated graft_pq_encode calls
    def book() = Array.tabulate(2, 3, 2)((m, c, j) => (m * 6 + c * 2 + j).toFloat)
    val child = Literal.create(Seq.fill(4)(0.5f), ArrayType(FloatType))
    val a = PqEncode(child, book())
    val b = PqEncode(child, book())
    assert(a == b, "structurally equal codebooks must compare equal")
    assert(a.hashCode == b.hashCode, "equal expressions must hash equal")
    val mutated = book(); mutated(1)(2)(1) += 1f
    assert(a != PqEncode(child, mutated), "different codebooks must differ")
    assert(a != PqEncode(Literal.create(Seq.fill(4)(0.25f), ArrayType(FloatType)), book()))
  }
}
