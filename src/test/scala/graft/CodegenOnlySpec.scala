package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every custom expression must COMPILE under whole-stage codegen —
  * with fallback enabled (the default), a Janino compile error would
  * silently drop the plan to interpreted mode and deoptimize every
  * query using the expression. These tests pin the shared session to
  * CODEGEN_ONLY with fallback disabled (both are runtime-settable
  * SQLConfs, restored in finally) so such a regression fails loudly.
  */
class CodegenOnlySpec extends AnyFunSuite with SparkFixture {

  private def codegenOnly[T](body: => T): T = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("all custom expressions compile and evaluate under CODEGEN_ONLY") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    codegenOnly {
      val srp = Seq(Seq.tabulate(8)(_.toFloat)).toDF("v")
        .select(call_function("graft_srp_sig", col("v"), lit(8), lit(8))).head().getLong(0)
      assert(srp >= 0 && srp < (1L << 8))
      assert(Seq(Seq("a", "b")).toDF("sh")
        .select(call_function("graft_minhash", col("sh"), lit(8))).head().getSeq[Long](0).length == 8)
      assert(Seq(Seq("a", "b")).toDF("sh")
        .select(call_function("graft_minhash_bands", col("sh"), lit(8), lit(4))).head().getSeq[Long](0).length == 4)
      assert(Seq(Seq(1L, 2L)).toDF("hs")
        .select(call_function("graft_minhash_bands", col("hs"), lit(8), lit(4))).head().getSeq[Long](0).length == 4)
      Seq(Seq("a", "b")).toDF("t")
        .select(call_function("graft_simhash", col("t"))).head().getLong(0)
      val cos = Seq((Seq(1f, 2f), Seq(1f, 2f))).toDF("a", "b")
        .select(call_function("graft_cosine", col("a"), col("b"))).head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      assert(Seq(Seq(1L, 2L)).toDF("hs")
        .select(call_function("graft_minhash_oph", col("hs"), lit(8), lit(4)))
        .head().getSeq[Long](0).length == 4)
      assert(Seq(Seq("a", "b")).toDF("sh")
        .select(call_function("graft_minhash_oph", col("sh"), lit(8), lit(4)))
        .head().getSeq[Long](0).length == 4)
      val z = Seq((5L, 3L)).toDF("x", "y")
        .select(call_function("graft_zorder2", col("x"), col("y"), lit(21))).head().getLong(0)
      assert(z == 27L)
      // order-1 hilbert quadrant order is (0,0)->(0,1)->(1,1)->(1,0)
      val h = Seq((1L, 0L)).toDF("x", "y")
        .select(call_function("graft_hilbert2", col("x"), col("y"), lit(1))).head().getLong(0)
      assert(h == 3L)
    }
  }

  test("the srp dim guard is reachable from generated code (static forwarder resolves)") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    codegenOnly {
      val ex = intercept[Exception] {
        Seq(Seq.tabulate(8)(_.toFloat)).toDF("v")
          .select(call_function("graft_srp_sig", col("v"), lit(8), lit(4))).head()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("graft_srp_sig")), s"unexpected: $ex")
    }
  }
}
