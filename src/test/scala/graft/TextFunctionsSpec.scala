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

  test("piiPatterns redact emails, phones, digit runs in sequence on crafted text") {
    import spark.implicits._
    import graft.operators.TextOps
    // Apply the operator's exact stage sequence to crafted strings.
    val stages = TextOps.piiPatterns.zipWithIndex.foldLeft(
      Seq(
        "mail me at Bob.Smith+x@Example.co.uk or call +44 20 7946 0958 ref 1234567",
        "no pii here, just 42 and 007",
        "two mails a@b.io c@d.org and digits 55555").toDF("text")
        .select(graft.functions.TextFunctions.normText(col("text")).as("red0"))
    ) { case (df, ((pat, repl), i)) =>
      df.withColumn(s"n$i", size(regexp_extract_all(col(s"red$i"), lit(pat), lit(0))).cast("long"))
        .withColumn(s"red${i + 1}", regexp_replace(col(s"red$i"), pat, repl))
    }
    val rows = stages.select("n0", "n1", "n2", "red3").collect()
    assert(rows(0).getLong(0) == 1 && rows(0).getLong(1) == 1 && rows(0).getLong(2) == 1)
    assert(rows(0).getString(3) == "mail me at <email> or call <phone> ref <num>")
    assert(rows(1).getLong(0) == 0 && rows(1).getLong(1) == 0 && rows(1).getLong(2) == 0)
    assert(rows(1).getString(3) == "no pii here, just 42 and 007")
    assert(rows(2).getLong(0) == 2 && rows(2).getLong(2) == 1)
    assert(rows(2).getString(3) == "two mails <email> <email> and digits <num>")
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
