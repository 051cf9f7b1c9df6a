package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Source/sink round-trips and partition pruning on temp dirs. */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("partitioned parquet round-trips and prunes partitions") {
    val dir = tmp("part")
    val nation = Tables.nation(spark, sf)
    Sources.writePartitionedParquet(nation, dir, Seq("n_regionkey"))
    val back = Sources.readParquet(spark, dir)
    assert(back.count() == nation.count())
    // partition pruning: only matching directories are listed in the scan
    val pruned = back.filter(col("n_regionkey") === 0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == nation.filter(col("n_regionkey") === 0).count())
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"))
  }

  test("bucketed tables join without a shuffle exchange") {
    // disable auto-broadcast so the join would otherwise be a
    // shuffled sort-merge join — bucketing must remove the exchanges
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Sources.writeBucketedTable(orders, "b_orders", "o_orderkey", 4)
    Sources.writeBucketedTable(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("CSV round-trip with explicit schema preserves values") {
    val dir = tmp("csv")
    val region = Tables.region(spark, sf).select("r_regionkey", "r_name")
    Sources.writeCsv(region, dir)
    val schema = StructType(Seq(
      StructField("r_regionkey", LongType), StructField("r_name", StringType)))
    val back = Sources.readCsv(spark, dir, schema)
    assert(back.exceptAll(region).count() == 0 && region.exceptAll(back).count() == 0)
  }

  test("JSONL round-trip preserves nested-free rows exactly") {
    val dir = tmp("jsonl")
    val supplier = Tables.supplier(spark, sf).select("s_suppkey", "s_name", "s_nationkey")
    Sources.writeJsonl(supplier, dir)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", LongType)))
    val back = Sources.readJsonl(spark, dir, schema)
    assert(back.exceptAll(supplier).count() == 0 && supplier.exceptAll(back).count() == 0)
  }
}
