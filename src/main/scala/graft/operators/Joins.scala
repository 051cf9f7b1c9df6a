package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.OracleSafe._

/** Join operators beyond plain equi-join: as-of, banded range join,
  * and skew-salted join. Each is built to shuffle once and never
  * explode rows beyond the true match set.
  */
object Joins {

  /** As-of join: for every purchase, the latest signup of the same user
    * at-or-before the purchase timestamp.
    *
    * Implementation is the union+window trick: tag both sides, sort
    * once on (user_id, ts, side, id), carry the last-seen signup
    * forward with last(ignoreNulls). ONE sort-shuffle, zero row
    * explosion — at 100 TB this beats any join-based formulation, which
    * would either cross-join per user or range-explode.
    */
  def asofJoinEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("event_type").isin("signup", "purchase"))
    // side=0 for signup so that at equal ts the signup sorts first and
    // is visible to a same-instant purchase ("at or before").
    val tagged = ev.select(
      col("user_id"), col("ts"), col("ts_ns"), col("event_id"), col("event_type"),
      when(col("event_type") === "signup", lit(0)).otherwise(lit(1)).as("side"),
      when(col("event_type") === "signup", epochS(col("ts"))).as("sig_ts_s"),
      when(col("event_type") === "signup", col("event_id")).as("sig_id"))
    // ts_ns: the oracle's `s.ts <= p.ts` compares full ns precision.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_signup_id", last(col("sig_id"), ignoreNulls = true).over(w))
      .withColumn("last_signup_ts_s", last(col("sig_ts_s"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_event_id"),
        col("user_id"),
        epochS(col("ts")).as("purchase_ts_s"),
        col("last_signup_ts_s"), col("last_signup_id"))
      .orderBy("purchase_event_id")
  }

  /** Banded range join: signup→purchase conversions within one hour,
    * joined via hour buckets (each signup probes its own and the next
    * bucket) then filtered to the exact interval. The join is a plain
    * equi-join on (user_id, bucket) — candidate set is O(events/bucket),
    * not O(n²); the band count is constant so it scales linearly.
    */
  def rangeJoinBuckets(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ts_s", epochS(col("ts")))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"), col("user_id"),
              col("ts_s").as("signup_ts_s"),
              explode(array(floor(col("ts_s") / 3600), floor(col("ts_s") / 3600) + 1))
                .as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"),
              col("user_id").as("p_user_id"),
              col("ts_s").as("purchase_ts_s"),
              floor(col("ts_s") / 3600).as("p_bucket"))
    signups.join(purchases,
        signups("user_id") === purchases("p_user_id") &&
        signups("bucket") === purchases("p_bucket"))
      .withColumn("diff_s", col("purchase_ts_s") - col("signup_ts_s"))
      .filter(col("diff_s") > 0 && col("diff_s") <= 3600)
      .select("signup_event_id", "purchase_event_id", "user_id", "diff_s")
      .orderBy("signup_event_id", "purchase_event_id")
  }

  /** Skew-salted join: fact side gets a deterministic salt, the dim
    * side is replicated salt-ways, so one hot key spreads over
    * `salts` reducers. Result is identical to the plain join (the
    * oracle checks exactly that). AQE skew handling is the runtime
    * safety net; explicit salting is the plan-level guarantee.
    */
  def saltedJoinSkew(s: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
    val cust = Tables.customer(s, dir)
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
    ev.join(cust, ev("user_id") === cust("c_custkey") && ev("salt") === cust("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum2(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
  }
}
