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

  /** NEAREST-neighbor as-of join — [[asofJoinEvents]]'s two-sided
    * sibling: for every purchase, the signup of the same user nearest
    * in time in EITHER direction (sensor alignment, feature joins
    * where "most recent" is wrong half the time). Same union+window
    * formulation, ONE sort-shuffle, zero row explosion: the shared
    * (user, ts, side, id) sort carries the last at-or-before signup
    * forward (`last ignoreNulls`, unbounded-preceding frame) AND the
    * first strictly-after signup backward (`first ignoreNulls`,
    * unbounded-following frame) — two frames over one exchange+sort —
    * then a row-local pick of the closer side. Ties: equal distance
    * prefers the before side; equal-ts signups sort before the
    * purchase (side tag), so same-instant is "before" at distance 0,
    * and within a side the before branch keeps the highest, the
    * after branch the lowest event_id (mirrored in the oracle's
    * rank ordering). All distances integral ns, printed as `div 1e9`
    * seconds. A join-based nearest would range-explode per user; at
    * 100 TB this stays one shuffle of the event slice.
    */
  def asofJoinNearest(s: SparkSession, dir: String): DataFrame =
    asofNearestOver(
      Tables.events(s, dir).filter(col("event_type").isin("signup", "purchase")))
      .orderBy("purchase_event_id")

  /** [[asofJoinNearest]]'s core over an explicit (user_id, ts_ns,
    * event_id, event_type) frame — factored for crafted tie/edge
    * specs. */
  def asofNearestOver(ev: DataFrame): DataFrame = {
    val tagged = ev.select(
      col("user_id"), col("ts_ns"), col("event_id"), col("event_type"),
      when(col("event_type") === "signup", lit(0)).otherwise(lit(1)).as("side"),
      when(col("event_type") === "signup", col("ts_ns")).as("sig_ns"),
      when(col("event_type") === "signup", col("event_id")).as("sig_id"))
    val wB = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wA = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("side"), col("event_id"))
      .rowsBetween(0, Window.unboundedFollowing)
    tagged
      .withColumn("b_ns", last(col("sig_ns"), ignoreNulls = true).over(wB))
      .withColumn("b_id", last(col("sig_id"), ignoreNulls = true).over(wB))
      .withColumn("a_ns", first(col("sig_ns"), ignoreNulls = true).over(wA))
      .withColumn("a_id", first(col("sig_id"), ignoreNulls = true).over(wA))
      .filter(col("event_type") === "purchase")
      .withColumn("use_b", col("b_ns").isNotNull &&
        (col("a_ns").isNull ||
         (col("ts_ns") - col("b_ns")) <= (col("a_ns") - col("ts_ns"))))
      .select(
        col("event_id").as("purchase_event_id"),
        col("user_id"),
        expr("ts_ns div 1000000000").as("purchase_ts_s"),
        when(col("use_b"), col("b_id")).otherwise(col("a_id")).as("nearest_signup_id"),
        when(col("use_b"), expr("b_ns div 1000000000"))
          .otherwise(expr("a_ns div 1000000000")).as("nearest_signup_ts_s"),
        when(col("use_b"), expr("(ts_ns - b_ns) div 1000000000"))
          .otherwise(expr("(a_ns - ts_ns) div 1000000000")).as("dist_s"))
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

  /** Point-in-time join onto an SCD2 dimension — the CONSUMER side of
    * [[EtlOps.scd2Build]]'s historization: every purchase picks up the
    * user's state-version row (latest non-purchase event) whose
    * [valid_from, valid_to) interval contains the purchase timestamp,
    * or nulls when the purchase predates any state (LEFT semantics).
    * This is the warehouse "as-was" query — report each fact against
    * the dimension attributes that were true WHEN IT HAPPENED, not the
    * ones true today (the distinction the reference's DO-UPDATE
    * loaders erase, 02_etl.py:84-105).
    *
    * Implementation deliberately does NOT join on the interval: like
    * [[asofJoinEvents]], version-start rows and fact rows are unioned
    * and sorted once per key, and last(ignoreNulls) carries the
    * in-effect version onto each fact — ONE sort-shuffle, zero row
    * expansion, at any version cardinality. The oracle independently
    * takes the interval-join road (valid_from ≤ ts < valid_to over the
    * windowed version table), so the hash-compare doubles as a proof
    * that the SCD2 intervals really partition each key's timeline:
    * both formulations agree on every fact, including same-instant
    * version ties, where the zero-length [x, x) interval matches
    * nothing and the carried last() resolves to the highest
    * version_seq — the same row.
    *
    * Comparisons and ordering run on full ns precision (`ts_ns`);
    * reported timestamps are µs (`div 1000`) because the oracle's
    * parquet reader truncates TIMESTAMP(NANOS) to µs at scan time —
    * the same precision contract as [[EtlOps.scd2Build]], and
    * lossless for the comparison because no two same-user events
    * share a microsecond in this data.
    */
  def temporalJoinScd2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val vw = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    val versions = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .withColumn("version_seq", row_number().over(vw).cast("long"))
      .select(col("user_id"), col("ts_ns"), lit(0).as("side"),
              col("version_seq"),
              col("event_id").as("state_event_id"),
              col("event_type").as("state_type"),
              lit(null).cast("long").as("purchase_event_id"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), lit(1).as("side"),
              lit(null).cast("long").as("version_seq"),
              lit(null).cast("long").as("state_event_id"),
              lit(null).cast("string").as("state_type"),
              col("event_id").as("purchase_event_id"))
    // At an exact ts_ns tie the version (side 0) sorts before the fact,
    // so a purchase at a version's start instant sees it ("valid from").
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("side"),
               coalesce(col("version_seq"), lit(0L)),
               coalesce(col("purchase_event_id"), lit(0L)))
      .rowsBetween(Window.unboundedPreceding, 0)
    versions.unionAll(facts)
      .withColumn("v_seq", last(col("version_seq"), ignoreNulls = true).over(w))
      .withColumn("v_event_id", last(col("state_event_id"), ignoreNulls = true).over(w))
      .withColumn("v_type", last(col("state_type"), ignoreNulls = true).over(w))
      .withColumn("v_from_ns",
        last(when(col("side") === 0, col("ts_ns")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_event_id"), col("user_id"),
              expr("ts_ns div 1000").as("purchase_ts_us"),
              col("v_event_id").as("state_event_id"),
              col("v_type").as("state_type"),
              col("v_seq").as("version_seq"),
              expr("v_from_ns div 1000").as("valid_from_us"))
      .orderBy("purchase_event_id")
  }
}
