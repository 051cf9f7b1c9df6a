package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-provided testdata star schema
  * (see TESTDATA.md). Every operator reads through these so column
  * pruning / predicate pushdown always start from a plain parquet
  * scan the optimizer can reason about.
  *
  * Mirrors the reference's normalized relational model
  * (/root/reference/sql/01_schema.sql:9-59) — movies/actors/genres +
  * junctions — onto the TPC-H-ish tables per SURVEY.md §1.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). Read it as a
    * nanosecond long (legacy nanosAsLong), keep the exact value as `ts_ns`
    * (all orderings use it — µs truncation could reorder ties), and expose
    * `ts` as a proper µs timestamp for date/window functions. `div` keeps
    * the arithmetic integral: a double division of an ~1.7e18 ns value
    * would lose precision (53-bit mantissa).
    *
    * The conf is REQUIRED of the session, not set here: a loader that
    * mutates session state at plan-build time changes the semantics of
    * every other parquet read on the session as a side effect, and
    * whether nanos decode as long is a session-construction decision
    * the builder owns (all graft entrypoints set it).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet stores TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (see graft.Verify/Bench builders)")
    s.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
