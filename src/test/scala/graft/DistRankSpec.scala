package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistRank

/** Exactness + determinism of the distributed prefix helper against
  * the single-task window it replaces, plus the NTILE arithmetic.
  * The determinism tests run at the suite's 4 shuffle partitions —
  * the exact configuration where RangePartitioner's reservoir
  * sampling is NOT exhaustive, i.e. the regime that exposed the
  * original fork-the-range-exchange nondeterminism (two executions of
  * the same repartitionByRange can draw different boundaries; the
  * helper must not care).
  */
class DistRankSpec extends AnyFunSuite with SparkFixture {

  private def skewed = {
    import spark.implicits._
    // 3 groups with very unequal sizes, duplicate-heavy sort values —
    // partition-boundary stress: many equal keys, tie-break required.
    (0 until 2000).map { i =>
      val g = if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "small"
      (g, (i * 7919) % 13, i.toLong)
    }.toDF("g", "v", "id")
  }

  test("grouped prefix count == row_number window, group total == count window") {
    val got = DistRank.withPrefix(skewed, Seq("g"), Seq(col("v"), col("id")),
      lit(1L), "rk", groupTotalOut = Some("n"))
    val exp = skewed
      .withColumn("erk", row_number()
        .over(Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("en", count(lit(1)).over(Window.partitionBy("g")))
    val j = got.join(exp, Seq("g", "v", "id"))
    assert(j.filter(col("rk") =!= col("erk") || col("n") =!= col("en")).count() == 0)
    assert(got.count() == 2000)
  }

  test("global (ungrouped) prefix sum == running-sum window over a total order") {
    val vals = skewed.withColumn("w", (col("id") % 5).cast("long"))
    val got = DistRank.withPrefix(vals, Nil, Seq(col("v"), col("id")), col("w"), "cum")
    val exp = vals.withColumn("ecum", sum("w").over(Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val j = got.join(exp, Seq("g", "v", "id"))
    assert(j.filter(col("cum") =!= col("ecum")).count() == 0)
  }

  test("descending sort direction is honored end to end") {
    val got = DistRank.withPrefix(skewed, Seq("g"), Seq(col("v").desc, col("id")),
      lit(1L), "rk")
    val exp = skewed.withColumn("erk", row_number()
      .over(Window.partitionBy("g").orderBy(col("v").desc, col("id"))).cast("long"))
    val j = got.join(exp, Seq("g", "v", "id"))
    assert(j.filter(col("rk") =!= col("erk")).count() == 0)
  }

  test("bit-stable across repeated materializations at non-exhaustive sample sizes") {
    def run() = DistRank.withPrefix(skewed, Seq("g"), Seq(col("v"), col("id")),
      lit(1L), "rk", groupTotalOut = Some("n"))
      .select("g", "v", "id", "rk", "n")
      .collect().map(_.toSeq).sortBy(_.toString)
    val a = run()
    (1 to 3).foreach { _ =>
      assert(run().sameElements(a), "prefix must not depend on range sampling draws")
    }
  }

  test("degenerate frames: empty input yields empty output, one row ranks 1 of 1") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "id")
    assert(DistRank.withPrefix(empty, Seq("g"), Seq(col("id")), lit(1L), "rk",
      groupTotalOut = Some("n")).count() == 0)
    val one = Seq(("g1", 7L)).toDF("g", "id")
    val row = DistRank.withPrefix(one, Seq("g"), Seq(col("id")), lit(1L), "rk",
      groupTotalOut = Some("n")).select("rk", "n").head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 1L)
  }

  test("ntileCol matches Spark's ntile for ragged and exact-fill sizes") {
    import spark.implicits._
    for (n <- Seq(1, 3, 5, 7); rows <- Seq(1, 4, 5, 23, 100)) {
      val df = (1 to rows).map(_.toLong).toDF("id")
        .withColumn("rk", col("id")) // id IS the rank over orderBy(id)
        .withColumn("tot", lit(rows.toLong))
      val got = df.withColumn("b", DistRank.ntileCol("rk", "tot", n))
      val exp = df.withColumn("eb",
        ntile(n).over(Window.orderBy("id")).cast("long"))
      val j = got.join(exp, "id")
      assert(j.filter(col("b") =!= col("eb")).count() == 0,
        s"ntile($n) over $rows rows diverged")
    }
  }

  test("corpus-scaling GROUP key fails loudly on the executor, not as a driver OOM") {
    import spark.implicits._
    // every row its own group: the driver sync would hold one cell per
    // row — exactly the misuse the cardinality contract forbids
    val perRow = (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("g", "id")
    val e = intercept[org.apache.spark.SparkException] {
      DistRank.withPrefix(perRow, Seq("g"), Seq(col("id")), lit(1L), "rk",
        maxCells = 100).count()
    }
    assert(e.getMessage.contains("distinct group cells"),
      s"expected the cap's domain error, got: ${e.getMessage.take(200)}")
    // the same frame under the default budget still computes exactly
    val ok = DistRank.withPrefix(perRow, Seq("g"), Seq(col("id")), lit(1L), "rk")
    assert(ok.filter(col("rk") =!= 1L).count() == 0)
  }
}
