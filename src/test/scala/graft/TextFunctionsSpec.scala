package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

/** Unit checks for the codegen'd text primitives on crafted literals. */
class TextFunctionsSpec extends AnyFunSuite with SparkFixture {

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(colExpr).head().get(0)
  }

  test("normText lowercases, trims, collapses whitespace") {
    assert(one(normText(col("text")), "  Hello   WORLD\t x ") == "hello world x")
  }

  test("wsTokenCount counts whitespace tokens after normalization") {
    assert(one(wsTokenCount(col("text")), "a  b\tc") == 3L)
  }

  test("bpeTokenCount splits letter runs, digit runs, single punct") {
    // "ab12,cd" -> [ab][12][,][cd] = 4
    assert(one(bpeTokenCount(col("text")), "ab12,cd") == 4L)
  }

  test("markerCount counts only listed tokens") {
    assert(one(markerCount(col("text"), Seq("the", "a")), "The a THE b c") == 3L)
  }

  test("fingerprintKey collides for same token multiset, any order/dup/case") {
    val a = one(fingerprintKey(col("text")), "b a  a C")
    val b = one(fingerprintKey(col("text")), "c B a")
    assert(a == b && a == "a b c")
  }

  test("ratioX100 floors toward zero") {
    import spark.implicits._
    val r = Seq((1L, 3L)).toDF("a", "b")
      .select(ratioX100(col("a"), col("b"))).head().getLong(0)
    assert(r == 33L)
  }

  test("topNgrams: document frequency of distinct-per-doc bigrams, deterministic top-k") {
    val out = graft.operators.TextOps.topNgrams(spark, sf).collect()
    assert(out.length == 100)
    // counts non-increasing; ties broken ascending on the n-gram
    out.sliding(2).foreach { case Array(a, b) =>
      val (fa, fb) = (a.getLong(1), b.getLong(1))
      assert(fa > fb || (fa == fb && a.getString(0) < b.getString(0)))
    }
    // doc frequency, not term frequency: no count can exceed the corpus size
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.forall(_.getLong(1) <= nDocs))
    // every bigram is two tokens
    assert(out.forall(_.getString(0).split(" ").length == 2))
  }
}
