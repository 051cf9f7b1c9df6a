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
}
