package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / table-lifecycle audits — the checks a warehouse runs
  * around the reference's load stage (/root/reference/02_etl.py:84-105
  * writes into an FK-constrained schema, sql/01_schema.sql:9-59; a
  * Spark lakehouse has no DB to enforce those constraints, so the
  * audits become queries).
  *
  * All three operators follow the same scale shape: the big table is
  * reduced to per-key or global AGGREGATES first (partial, map-side
  * combined), and only slim aggregate frames join or union afterwards —
  * nothing here ever shuffles a payload column of the fact table.
  */
object QualityOps {

  /** Generic snapshot diff by key: classify every key across two
    * snapshots of the same table as `added` (new only), `removed` (old
    * only), `changed` (both, payload differs) or `unchanged`. The
    * payload comparison is null-safe per column (`<=>`), row-local on
    * top of ONE full-outer join on the key — both snapshots arrive
    * already partitioned by the key when they come out of a latest-wins
    * window, so at 100 TB the join reuses that exchange; nothing
    * shuffles twice. This is the audit twin of [[EtlOps.applyChanges]]:
    * CDC applies a delta, diff EXPLAINS one.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame, key: String,
                   payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "snapshotDiff needs at least one payload column")
    val o = old.select(col(key) +: payload.map(c => col(c).as(s"old_$c")): _*)
    val n = cur.select(col(key) +: payload.map(c => col(c).as(s"new_$c")): _*)
    val samePayload = payload.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    // Presence is tracked with explicit flags, not payload-null checks:
    // a legitimately-null payload column must not masquerade as absence.
    o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), Seq(key), "full")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(samePayload, "unchanged")
          .otherwise("changed"))
      .drop("__in_old", "__in_new")
  }

  /** [[snapshotDiff]] demonstration on the testdata: the "old" snapshot
    * is each user's latest event as of `cutNs` (yesterday's
    * latest-state table), the "new" snapshot is the same collapse over
    * the full stream (today's). Because every test-data user is active
    * all month, presence changes are simulated with deterministic key
    * slices — users with `user_id % 11 == 3` are absent from the old
    * snapshot (signed up since → `added`), users with
    * `user_id % 13 == 5` are absent from the new one (deleted since →
    * `removed`); everyone else is `changed` or `unchanged` by whether
    * they have events after the cut. Cuts compare `ts_ns` (the exact
    * stored value): a µs-truncated comparison could classify an event
    * landing within 1 µs after the boundary differently than the
    * ns-exact oracle.
    */
  def tableDiff(s: SparkSession, dir: String,
                cutNs: Long = 1706616000000000000L /* 2024-01-30 12:00 UTC */): DataFrame = {
    val ev = Tables.events(s, dir)
    def latest(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("user_id", "event_id", "value")
    }
    val old = latest(ev.filter(col("ts_ns") < cutNs && col("user_id") % 11 =!= 3))
    val cur = latest(ev.filter(col("user_id") % 13 =!= 5))
    snapshotDiff(old, cur, "user_id", Seq("event_id", "value"))
      .select(col("user_id"), col("status"),
              col("old_event_id"), col("new_event_id"),
              col("old_value"), col("new_value"))
      .orderBy("user_id")
  }

  /** One foreign-key relation's orphan audit: rows of `child` whose
    * `fk` has no match in `parent.pk`. The child collapses to
    * (key, count) FIRST — a partial-aggregated shuffle on the key, the
    * only pass the fact table pays — then the per-key frame left-joins
    * the parent's key set ([[Hints.maybeBroadcast]]: dims broadcast
    * while they fit, AQE decides beyond that) and one conditional
    * aggregate emits the relation's single audit row. Null FKs can
    * never match and therefore count as orphans, same as the SQL
    * LEFT-JOIN-IS-NULL form.
    */
  def orphanAudit(child: DataFrame, fk: String, parent: DataFrame, pk: String,
                  relation: String): DataFrame = {
    val keyed = child.groupBy(col(fk).as("__k")).agg(count(lit(1)).as("__cnt"))
    val keys = Hints.maybeBroadcast(
      parent.select(col(pk).as("__k")).distinct().withColumn("__hit", lit(true)))
    keyed.join(keys, Seq("__k"), "left")
      .agg(
        coalesce(sum("__cnt"), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__hit").isNull, col("__cnt")).otherwise(0L)), lit(0L)).as("n_orphans"),
        // Distinct NON-null orphan keys (a null FK is counted in
        // n_orphans but is not a key — COUNT(DISTINCT CASE ...) drops
        // it too, so both engines agree).
        count(when(col("__hit").isNull && col("__k").isNotNull, lit(1))).as("n_orphan_keys"))
      .select(lit(relation).as("relation"), col("n_rows"), col("n_orphans"),
              col("n_orphan_keys"))
  }

  /** Referential-integrity audit of the star schema — every FK relation
    * the reference's PostgreSQL DDL enforces with constraints
    * (sql/01_schema.sql REFERENCES clauses), re-checked as a query.
    * One row per relation; `events.user_id -> customer` is the
    * deliberately-dirty one (the event stream references users the dim
    * hasn't loaded yet — the classic late-arriving-dimension gap).
    */
  def fkOrphans(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val audits = Seq(
      orphanAudit(li, "l_orderkey", Tables.orders(s, dir), "o_orderkey",
        "lineitem.l_orderkey->orders"),
      orphanAudit(li, "l_partkey", Tables.part(s, dir), "p_partkey",
        "lineitem.l_partkey->part"),
      orphanAudit(li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey",
        "lineitem.l_suppkey->supplier"),
      orphanAudit(Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey",
        "orders.o_custkey->customer"),
      orphanAudit(Tables.events(s, dir), "user_id", Tables.customer(s, dir), "c_custkey",
        "events.user_id->customer"))
    audits.reduce(_ unionByName _).orderBy("relation")
  }

  /** Column profile of the events table — the per-column dataset card
    * (row/null/distinct counts, canonical min/max) a quality gate
    * diffs between loads. ONE aggregate pass over the table computes
    * every column's stats (Spark plans the multi-distinct via a single
    * expand — still one scan, partial-aggregated); the per-column
    * layout is a row-local posexplode of the 1-row aggregate.
    *
    * min/max are emitted as canonical STRINGS so heterogeneous column
    * types fit one schema: integers and epoch-seconds print as-is,
    * doubles as floor(100·x) (engine-exact integer — no float-format
    * drift), strings verbatim. Exact COUNT(DISTINCT) is the
    * oracle-mandated choice; the 100 TB swap is approx_count_distinct
    * (HLL, mergeable) in the same single-pass plan.
    */
  def profileColumns(s: SparkSession, dir: String): DataFrame =
    profileColumnsWith(s, dir, c => countDistinct(c))

  /** The 100 TB form of [[profileColumns]] the exact key's scaladoc
    * promises: the SAME single-pass one-Expand plan with
    * `approx_count_distinct` (HLL++, mergeable partial state) in place
    * of exact COUNT(DISTINCT) — the swap that turns the profile's
    * per-column distinct from a full-cardinality Expand shuffle into
    * fixed-width sketch merges. Hash-verified since r18: the DuckDB
    * oracle replays the per-column HLL++ registers bit-for-bit (the
    * [[graft.SparkEntry]] approx_distinct_users replay generalized to
    * long/string/double hash inputs). QualityOpsSpec additionally
    * pins exact agreement on the low-cardinality columns and a
    * relative-error band on the high-cardinality ones.
    */
  def profileColumnsApprox(s: SparkSession, dir: String): DataFrame =
    profileColumnsWith(s, dir, c => approx_count_distinct(c))

  private def profileColumnsWith(s: SparkSession, dir: String,
                                 distinctAgg: Column => Column): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("ts_s", expr("ts_ns div 1000000000"))
    val agged = ev.agg(
      count(lit(1)).as("n"),
      // event_id
      count(when(col("event_id").isNull, 1)).as("eid_null"),
      distinctAgg(col("event_id")).as("eid_dist"),
      min("event_id").as("eid_min"), max("event_id").as("eid_max"),
      // user_id
      count(when(col("user_id").isNull, 1)).as("uid_null"),
      distinctAgg(col("user_id")).as("uid_dist"),
      min("user_id").as("uid_min"), max("user_id").as("uid_max"),
      // event_type
      count(when(col("event_type").isNull, 1)).as("ety_null"),
      distinctAgg(col("event_type")).as("ety_dist"),
      min("event_type").as("ety_min"), max("event_type").as("ety_max"),
      // value (double → floor(100x) canonical form)
      count(when(col("value").isNull, 1)).as("val_null"),
      distinctAgg(col("value")).as("val_dist"),
      floor(lit(100.0) * min("value")).cast("long").as("val_min"),
      floor(lit(100.0) * max("value")).cast("long").as("val_max"),
      // ts (epoch seconds)
      count(when(col("ts_s").isNull, 1)).as("ts_null"),
      distinctAgg(col("ts_s")).as("ts_dist"),
      min("ts_s").as("ts_min"), max("ts_s").as("ts_max"))
    agged.select(explode(array(
        struct(lit("event_id").as("col_name"), col("n"), col("eid_null").as("n_null"),
               col("eid_dist").as("n_distinct"),
               col("eid_min").cast("string").as("min_s"), col("eid_max").cast("string").as("max_s")),
        struct(lit("event_type").as("col_name"), col("n"), col("ety_null").as("n_null"),
               col("ety_dist").as("n_distinct"),
               col("ety_min").as("min_s"), col("ety_max").as("max_s")),
        struct(lit("ts_s").as("col_name"), col("n"), col("ts_null").as("n_null"),
               col("ts_dist").as("n_distinct"),
               col("ts_min").cast("string").as("min_s"), col("ts_max").cast("string").as("max_s")),
        struct(lit("user_id").as("col_name"), col("n"), col("uid_null").as("n_null"),
               col("uid_dist").as("n_distinct"),
               col("uid_min").cast("string").as("min_s"), col("uid_max").cast("string").as("max_s")),
        struct(lit("value_x100").as("col_name"), col("n"), col("val_null").as("n_null"),
               col("val_dist").as("n_distinct"),
               col("val_min").cast("string").as("min_s"), col("val_max").cast("string").as("max_s"))
      )).as("p"))
      .select(col("p.col_name"), col("p.n").as("n_rows"), col("p.n_null"),
              col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
      .orderBy("col_name")
  }

  /** Declarative expectation suite over the ingest table — the
    * dbt-test / Great-Expectations gate as ONE aggregate pass: every
    * row-local rule is a conditional count inside a single global
    * aggregate (uniqueness rides the same pass as
    * `count - countDistinct`), and the per-rule report rows are a
    * row-local explode of the 1-row result. At 100 TB this is one
    * scan + one partial-aggregated 1-row exchange — adding a rule
    * adds a column to the aggregate, never a pass over the data.
    *
    * The suite deliberately includes a FAILING business rule
    * (`value_le_100`; the generator emits values to ~490): a DQ
    * operator demo where everything passes would never exercise the
    * violation path a reviewer actually cares about. `pass` is a
    * per-rule verdict, not a gate — the caller decides which rules
    * block a load (the reference pipeline's NOT NULL / PK constraints
    * are the blocking subset here: rules 1-3).
    */
  def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val domain = Seq("click", "error", "purchase", "signup", "view")
    val agged = ev.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_uid_null"),
      sum(when(col("ts_ns").isNull, 1L).otherwise(0L)).as("v_ts_null"),
      sum(when(col("event_type").isNull ||
               !col("event_type").isin(domain: _*), 1L).otherwise(0L)).as("v_domain"),
      sum(when(col("value").isNull || col("value") < 0.0, 1L).otherwise(0L)).as("v_neg"),
      sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("v_le100"))
    agged.select(explode(array(
        struct(lit("event_id_unique").as("rule"), col("v_unique").as("v")),
        struct(lit("event_type_in_domain").as("rule"), col("v_domain").as("v")),
        struct(lit("ts_not_null").as("rule"), col("v_ts_null").as("v")),
        struct(lit("user_id_not_null").as("rule"), col("v_uid_null").as("v")),
        struct(lit("value_le_100").as("rule"), col("v_le100").as("v")),
        struct(lit("value_non_negative").as("rule"), col("v_neg").as("v"))
      )).as("r"), col("n_rows"))
      .select(col("r.rule").as("rule"), col("n_rows"),
              col("r.v").as("n_violations"),
              (col("r.v") === 0L).as("pass"))
      .orderBy("rule")
  }

  /** Distribution-drift monitor between two time slices of the orders
    * stream — the check that catches silent upstream shifts (a source
    * changing its status mix, a price-scale bug) before they poison a
    * derived table or a training mix. For each profiled column
    * (status, priority, a fixed-width price binning) the base
    * (< pivot) and current (≥ pivot) bucket distributions are compared
    * by TOTAL VARIATION DISTANCE — ½·Σ|p_cur − p_base| — in exact
    * micro-units: probabilities are cnt·1e6 div total, the TVD an
    * integer sum, so the verdict is engine-exact where a KL/PSI log
    * term could never be (and TVD is bounded [0,1e6] with no
    * zero-bucket blowups).
    *
    * Plan: ONE scan of orders, each row contributing its three
    * (column, bucket) pairs row-local (explode of a 3-literal array),
    * one partial agg on (column, bucket, side) — key space = profiled
    * buckets, not rows — then window sums over the bucket-sized frame.
    * At 100 TB nothing but bucket counts ever shuffles.
    */
  def profileDrift(s: SparkSession, dir: String,
                   pivot: String = "1998-01-01"): DataFrame = {
    val src = Tables.orders(s, dir)
      .select(
        (col("o_orderdate") < to_timestamp(lit(pivot))).as("is_base"),
        explode(array(
          struct(lit("o_orderstatus").as("col_name"),
                 col("o_orderstatus").as("bucket")),
          struct(lit("o_orderpriority").as("col_name"),
                 col("o_orderpriority").as("bucket")),
          struct(lit("o_totalprice_bin").as("col_name"),
                 floor(col("o_totalprice") / 50000.0).cast("long")
                   .cast("string").as("bucket")))).as("p"))
      .select(col("is_base"), col("p.col_name").as("col_name"),
              col("p.bucket").as("bucket"))
    val counts = src.groupBy("col_name", "bucket")
      .agg(sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
           sum(when(col("is_base"), 0L).otherwise(1L)).as("n_cur"))
    val byCol = Window.partitionBy("col_name")
    // A pivot outside the data's range leaves one side empty; `div`
    // would return NULL and the monitor would report NOTHING exactly
    // when the input is most anomalous — fail loudly instead (the
    // oracle's integer division errors on the same input).
    def pOf(n: String, t: String): Column =
      when(col(t) === 0, raise_error(concat(
        lit(s"profile_drift: zero rows on the $t side of pivot '$pivot' for column "),
        col("col_name"))).cast("long"))
        .otherwise(expr(s"($n * 1000000) div $t"))
    val withP = counts
      .withColumn("t_base", sum("n_base").over(byCol))
      .withColumn("t_cur", sum("n_cur").over(byCol))
      .withColumn("p_base_x1e6", pOf("n_base", "t_base"))
      .withColumn("p_cur_x1e6", pOf("n_cur", "t_cur"))
    withP
      .withColumn("col_tvd_x1e6",
        (sum(abs(col("p_cur_x1e6") - col("p_base_x1e6"))).over(byCol) / 2)
          .cast("long"))
      .select("col_name", "bucket", "n_base", "n_cur",
              "p_base_x1e6", "p_cur_x1e6", "col_tvd_x1e6")
      .orderBy("col_name", "bucket")
  }

  /** Data-freshness monitor — the lifecycle check [[dqExpectations]]'
    * value rules don't cover: per event type, when did data LAST
    * arrive, and how stale is that against the corpus watermark? A
    * feed that silently stops (upstream outage, dropped topic,
    * expired credential) passes every value expectation while its lag
    * grows — this is the row that pages someone. Lag is measured
    * against the corpus's own max timestamp, not wall clock, so the
    * monitor is deterministic over a fixed snapshot and oracle-exact
    * (a wall-clock variant just swaps the watermark literal in).
    * One bounded-key partial agg + a 1-row broadcast back over the
    * per-type frame; µs/s arithmetic all-integral.
    */
  def dqFreshness(s: SparkSession, dir: String,
                  staleAfterSec: Long = 7L * 86400): DataFrame = {
    require(staleAfterSec > 0, s"staleAfterSec $staleAfterSec must be positive")
    // one-shared-scan rule: the watermark branch reuses the per-type
    // aggregate instead of re-scanning events
    val perType = graft.Caches.cached(Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
           max(expr("ts_ns div 1000")).as("last_ts_us")))
    val corpus = perType.agg(max("last_ts_us").as("corpus_ts_us"))
    perType.crossJoin(broadcast(corpus))
      .select(col("event_type"), col("n_rows"), col("last_ts_us"),
              expr("(corpus_ts_us - last_ts_us) div 1000000").as("lag_s"))
      .withColumn("is_stale", col("lag_s") > staleAfterSec)
      .orderBy("event_type")
  }
}
