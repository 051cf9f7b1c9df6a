package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftFunctions

/** Data-layout operators (SURVEY.md §2) — how rows are ARRANGED into
  * files, the write-side half of the scan-pruning story. The
  * reference's load stage appends rows in arrival order
  * (/root/reference/02_etl.py:84-105); at 100 TB arrival order is the
  * worst layout there is: every query reads every file. Multi-
  * dimensional clustering is what makes parquet min/max footer stats
  * actually skip data for more than one predicate column.
  */
object LayoutOps {

  /** z-order (Morton) key over two long columns — the codegen'd
    * [[graft.functions.InterleaveBits]] expression. See
    * [[clusterByZorder]] for the layout this key drives.
    */
  def zorderCol(s: SparkSession, x: Column, y: Column, bits: Int): Column = {
    GraftFunctions.ensureRegistered(s)
    call_function("graft_zorder2", x, y, lit(bits))
  }

  /** z-key projection over the events table — (event_id, user_id)
    * interleaved. 21 bits/dimension covers both id domains with
    * headroom at every test scale factor and multiplies out to a
    * 42-bit key; out-of-range ids FAIL rather than silently fold
    * (see [[graft.functions.InterleaveBits.rangeError]]). Row-local
    * projection: the scan prunes to exactly the two id columns.
    */
  def zorderKey(s: SparkSession, dir: String, bits: Int = 21): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(col("event_id"), col("user_id"),
        zorderCol(s, col("event_id"), col("user_id"), bits).as("zval"))
      .orderBy("event_id")
  }

  /** Hilbert-curve key over two long columns — the codegen'd
    * [[graft.functions.HilbertIndex]] expression. See
    * [[clusterByHilbert]] for the layout this key drives.
    */
  def hilbertCol(s: SparkSession, x: Column, y: Column, bits: Int): Column = {
    GraftFunctions.ensureRegistered(s)
    call_function("graft_hilbert2", x, y, lit(bits))
  }

  /** Hilbert-key projection over the events table — the same
    * (event_id, user_id) domain and bit depth as [[zorderKey]], on the
    * continuous curve: consecutive key values are always grid-adjacent
    * cells (Morton jumps diagonally at every power-of-two boundary),
    * so equal-width key ranges cover tighter rectangles and the
    * range-partitioned files prune strictly better on either-column
    * predicates — why clustering engines moved Z-order → Hilbert.
    * Same loud out-of-range failure, same row-local two-column scan.
    */
  def hilbertKey(s: SparkSession, dir: String, bits: Int = 21): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(col("event_id"), col("user_id"),
        hilbertCol(s, col("event_id"), col("user_id"), bits).as("hval"))
      .orderBy("event_id")
  }

  /** Cluster a frame for writing: range-partition on the z-key of
    * (`x`, `y`) and sort within partitions, so each output file covers
    * a small rectangle of the 2-D key space and min/max footer stats
    * prune scans filtered on EITHER column (plain sort-by-x only ever
    * prunes x-predicates). One range-exchange — the same shuffle a
    * single-column sorted write pays.
    */
  def clusterByZorder(s: SparkSession, df: DataFrame, x: Column, y: Column,
                      bits: Int = 21, numFiles: Int = 32): DataFrame =
    df.withColumn("__z", zorderCol(s, x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** [[clusterByZorder]] on the Hilbert key — same single
    * range-exchange, tighter per-file bounding rectangles (the curve's
    * continuity means an index range never splits across distant
    * regions of the grid).
    */
  def clusterByHilbert(s: SparkSession, df: DataFrame, x: Column, y: Column,
                       bits: Int = 21, numFiles: Int = 32): DataFrame =
    df.withColumn("__h", hilbertCol(s, x, y, bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")

  /** Small-file compaction PLANNER (the lakehouse OPTIMIZE front
    * half): group undersized files into target-sized rewrite bins
    * WITHOUT breaking the table's cluster order. Files are taken in
    * cluster-key order and chunked by exclusive-prefix row count:
    * bin = rows_before div target — each bin rewrites to ~target rows
    * of KEY-ADJACENT data, so the min/max footer pruning the sorted
    * layout bought ([[clusterByZorder]]) survives compaction. The
    * bin-minimizing alternative (first-fit-decreasing) packs tighter
    * but interleaves distant key ranges into one output file,
    * destroying pruning — the wrong trade for a clustered table.
    *
    * This is a MANIFEST-level operator: its input is one row per
    * file, its cost O(files), never O(rows) — at 100 TB the plan runs
    * over table metadata. The ordered prefix rides
    * [[graft.operators.DistRank.withPrefix]] (the repo's standard
    * prefix-at-scale form: range-partitioned, no task ever sorts more
    * than one partition's slice), so a multi-million-file manifest
    * never funnels through a single-task global window — the same
    * code path serves the 30-day simulated manifest and the real
    * thing. Here the manifest is simulated from the events table (one
    * "file" per event day, rows as the size proxy — the driver
    * testdata ships one physical parquet per table, so day-grain
    * stands in for the file listing); per-bin file counts and row
    * totals ride along so the plan doubles as the rewrite job's work
    * list.
    */
  def compactionPlan(s: SparkSession, dir: String, targetRows: Long = 50000): DataFrame = {
    require(targetRows > 0, s"targetRows $targetRows must be positive")
    val files = Tables.events(s, dir)
      .groupBy(expr("(ts_ns div 1000000000) div 86400 * 86400").as("day_s"))
      .agg(count(lit(1)).as("n_rows"))
    // Exclusive prefix = inclusive DistRank prefix − own n_rows (day_s
    // is unique after the groupBy, so the sort is a total order);
    // bin = rows_before div target.
    val planned = DistRank
      .withPrefix(files, Nil, Seq(col("day_s")), col("n_rows"), "rows_incl")
      .withColumn("bin", expr(s"(rows_incl - n_rows) div $targetRows"))
      .drop("rows_incl")
    val binTotals = planned.groupBy("bin")
      .agg(count(lit(1)).as("bin_files"), sum("n_rows").as("bin_rows"))
    planned.join(Hints.maybeBroadcast(binTotals), Seq("bin"))
      .select("day_s", "n_rows", "bin", "bin_files", "bin_rows")
      .orderBy("day_s")
  }

  /** Retention VACUUM planner — the third leg of the table-maintenance
    * trio ([[compactionPlan]] rewrites small files, [[partitionStats]]
    * measures clustering, this one plans DELETION): files whose day
    * falls more than `retentionDays` behind the table's own watermark
    * (its max event day — deterministic over a snapshot, like
    * [[QualityOps.dqFreshness]]'s lag) are marked expired, with the
    * rows reclaimed and the running reclaim total in file order — the
    * work list a deletion job executes and the number a storage
    * budget review reads. Manifest-level O(files); the 1-row
    * watermark broadcasts back; the running total rides the same
    * bounded day-grain frame as the compaction prefix.
    */
  def vacuumPlan(s: SparkSession, dir: String, retentionDays: Long = 45): DataFrame = {
    require(retentionDays >= 0, s"retentionDays $retentionDays must be non-negative")
    val files = graft.Caches.cached(Tables.events(s, dir)
      .groupBy(expr("(ts_ns div 1000000000) div 86400 * 86400").as("day_s"))
      .agg(count(lit(1)).as("n_rows")))
    val wm = files.agg(max("day_s").as("watermark_s"))
    val flagged = files.crossJoin(broadcast(wm))
      .select(col("day_s"), col("n_rows"),
              expr("(watermark_s - day_s) div 86400").as("age_days"))
      .withColumn("expired", col("age_days") > retentionDays)
    DistRank.withPrefix(flagged, Nil, Seq(col("day_s")),
        when(col("expired"), col("n_rows")).otherwise(0L), "reclaim_running")
      .select("day_s", "n_rows", "age_days", "expired", "reclaim_running")
      .orderBy("day_s")
  }

  /** Partition/zone-map statistics — the layout-ANALYSIS half that
    * tells you whether [[clusterByZorder]]-style rewrites are needed:
    * per file (event day, as in [[compactionPlan]]), its row count
    * and share, its `user_id` min/max — the parquet footer zone map a
    * predicate on that column would prune with — and
    * `n_overlapping`: how many OTHER files' [min, max] ranges
    * intersect this one's. That count IS the clustering-effectiveness
    * metric: on a user-clustered layout it approaches 0 and an
    * equality predicate reads ~1 file; on arrival-order ingest (what
    * the reference writes, and what this testdata simulates) every
    * file spans the whole id domain, n_overlapping = files−1, and
    * min/max stats prune NOTHING — the number that justifies the
    * rewrite. Manifest-level like the planner: O(files) input, every
    * output column integral.
    *
    * Since r19 the overlap count is an ORDER-STATISTICS SWEEP, not a
    * self-interval-join: for interval i,
    * `n_overlapping_i = #{j: min_j ≤ max_i} − #{j: max_j < min_i} − 1`
    * — the second set is contained in the first (max_j < min_i ≤
    * max_i and min_j ≤ max_j), and the −1 removes i itself, so the
    * identity is exact (LayoutSpec pins it against the literal
    * quadratic recomputation). Each count is one global inclusive
    * prefix sum over a tagged union of endpoint rows
    * ([[DistRank.withPrefix]]), so the operator is two sort-rank
    * passes over 2·files rows: O(F log F), NO pairwise join, no
    * O(files²) anywhere (pinned in PlanQualitySpec). The
    * range-bucketed join the r18 note suggested was evaluated and
    * REJECTED: bucket±1 bounds candidates only when interval LENGTH
    * is bounded (the 1-hour band of `range_join_buckets`); zone-map
    * ranges on arrival-order layouts — the exact case this operator
    * diagnoses — span the whole domain, putting every file in every
    * bucket and regenerating the quadratic blowup. The sweep has no
    * degenerate case; the ~10⁶-file ceiling is gone.
    */
  def partitionStats(s: SparkSession, dir: String): DataFrame = {
    // one-shared-scan rule: all consumers (both sweep passes + totals)
    // ride ONE day-grain aggregation of the raw table
    val files = graft.Caches.cached(Tables.events(s, dir)
      .groupBy(expr("(ts_ns div 1000000000) div 86400 * 86400").as("day_s"))
      .agg(count(lit(1)).as("n_rows"),
           min("user_id").as("uid_min"), max("user_id").as("uid_max")))
    // pass LE: #{j: min_j <= max_i} — min endpoints are weighted
    // points, max endpoints zero-weight queries; the inclusive prefix
    // sum AT the query row is the count (points sort first on value
    // ties, so min_j = max_i counts as <=)
    val cntLe = DistRank.withPrefix(
        files.select(col("uid_min").as("v"), lit(0).as("is_q"),
                     col("day_s"), lit(1L).as("w"))
          .unionAll(files.select(col("uid_max").as("v"), lit(1).as("is_q"),
                                 col("day_s"), lit(0L).as("w"))),
        Nil, Seq(col("v"), col("is_q"), col("day_s")), col("w"), "cnt_le")
      .filter(col("is_q") === 1).select(col("day_s"), col("cnt_le"))
    // pass LT: #{j: max_j < min_i} — queries sort first on value
    // ties, so an equal-valued max point lands AFTER the query
    // (strict <)
    val cntLt = DistRank.withPrefix(
        files.select(col("uid_max").as("v"), lit(1).as("is_p"),
                     col("day_s"), lit(1L).as("w"))
          .unionAll(files.select(col("uid_min").as("v"), lit(0).as("is_p"),
                                 col("day_s"), lit(0L).as("w"))),
        Nil, Seq(col("v"), col("is_p"), col("day_s")), col("w"), "cnt_lt")
      .filter(col("is_p") === 0).select(col("day_s"), col("cnt_lt"))
    val overlaps = files.join(cntLe, "day_s").join(cntLt, "day_s")
      .select(col("day_s"), col("n_rows"), col("uid_min"), col("uid_max"),
              (col("cnt_le") - col("cnt_lt") - lit(1L)).as("n_overlapping"))
    val tot = files.agg(sum("n_rows").as("total_rows"))
    overlaps.crossJoin(broadcast(tot))
      .select(col("day_s"), col("n_rows"),
              expr("(n_rows * 1000000) div total_rows").as("rows_ppm"),
              col("uid_min"), col("uid_max"), col("n_overlapping"))
      .orderBy("day_s")
  }
}
