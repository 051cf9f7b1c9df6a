package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed EXACT ordered prefix aggregation — the scale-out form of
  * `sum(v) OVER (PARTITION BY g ORDER BY k ROWS UNBOUNDED PRECEDING)`
  * (and, with v=1, of `row_number`/`ntile`) for frames whose per-group
  * row count scales with the corpus. A plain global or few-huge-group
  * window funnels every row of a group through ONE task's sort; here no
  * task ever sorts more than one range-partition's slice. This is
  * `RDD.zipWithIndex` generalized to per-group prefix SUMS:
  *
  *  1. `repartitionByRange` on (group, sort) keys + in-partition sort —
  *     each group's rows land in contiguous partitions, ordered ACROSS
  *     partition ids (the RangePartitioner invariant: every row in
  *     partition i sorts ≤ every row in partition i+1).
  *  2. ONE bounded job collects per-(partition, group) value totals —
  *     parts × groups entries, the same size as zipWithIndex's
  *     per-partition counts — and prefix-sums them into offsets on the
  *     driver (constant-size by construction, like the repo's other
  *     two principled driver syncs: kmeans seeds, bpe argmax).
  *  3. a second pass over the SAME RDD instance streams each partition
  *     once, adding running value to the broadcast offset. Exact
  *     global prefix = partition offset + running local sum.
  *
  * Why an RDD two-job instead of a self-join on `spark_partition_id`:
  * the DataFrame form forks the plan — the offsets branch and the
  * probe branch each re-execute the range exchange, and
  * RangePartitioner's reservoir sampling is seeded by RDD id, so the
  * two executions can draw DIFFERENT partition boundaries whenever the
  * sample is not exhaustive (empirically: nondeterministic ranks at 4
  * shuffle partitions; exchange reuse is an optimization, never a
  * correctness guarantee). Two jobs over one RDD instance share one
  * shuffle — one sampling pass, one set of boundaries, bit-stable
  * output. The cost over a plain window: the post-shuffle in-partition
  * sort runs twice (both jobs replay it from the same shuffle files —
  * deterministic), and rows cross the Row boundary for the linear
  * streaming pass; the shuffle itself — the scale-dominant term — runs
  * once.
  *
  * Exactness needs `sortCols` to be a TOTAL order (callers append a
  * unique tie-break key), which every caller in this repo already
  * guarantees for cross-engine determinism. Partition-boundary ties
  * are then impossible, so local-prefix + offset IS the global prefix
  * regardless of where the sampled range bounds fall.
  *
  * NOTE: building the result runs the totals job EAGERLY (exactly as
  * `RDD.zipWithIndex` runs its count job on call) — the returned frame
  * is a materialized-lineage `createDataFrame`, not a lazy view.
  *
  * Used by [[Analytics.customerRfm]] (global ntile over the customer
  * frame), [[TrainingOps.sampleStratified]] (per-stratum rank) and
  * [[TrainingOps.corpusBudgetSelect]] (per-source running token
  * total) — the three window shapes whose key space scales with the
  * corpus.
  */
object DistRank {

  /** Adds `out` = exact inclusive prefix sum of `value` over rows of
    * the same `groupCols` ordered by `sortCols` (which must include a
    * unique tie-break; null values count as 0). With `value = lit(1L)`
    * this is `row_number`. `groupTotalOut`, if set, also adds the
    * group's total (the window-free `count/sum OVER (PARTITION BY
    * g)`). `sortCols` may carry sort direction (`.desc`); the same
    * expressions drive both the range partitioning and the in-cell
    * ordering.
    *
    * GROUP-CARDINALITY CONTRACT: the driver sync in step 2 holds
    * parts × groups cells, so `groupCols` must have BOUNDED
    * cardinality (an enum, a source tag, a language, or empty for
    * the global window) — it is the SORT key that may scale with the
    * corpus, never the group key. `maxCells` (default 4M ≈ a few
    * hundred MB of driver boxed keys, far below a default driver
    * heap) is enforced PER PARTITION on the executor, before any
    * collect: range partitioning lands each group's rows
    * contiguously, so total collected cells ≤ Σ per-partition
    * distinct groups ≤ parts × cap while any single partition
    * holding more than `maxCells` distinct groups proves the total
    * would blow the budget. The failure is a loud domain error at
    * job 1, not a driver OOM at the collect. Corpus-scaling group
    * keys want the hash-threshold pattern (sample_split_hash) or a
    * per-group window instead.
    */
  def withPrefix(df: DataFrame,
                 groupCols: Seq[String],
                 sortCols: Seq[Column],
                 value: Column,
                 out: String,
                 groupTotalOut: Option[String] = None,
                 numPartitions: Option[Int] = None,
                 maxCells: Int = 4000000): DataFrame = {
    require(maxCells > 0, s"maxCells=$maxCells must be positive")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val valName = "__graft_val"
    val orderExprs = groupCols.map(col) ++ sortCols
    val ranged = df.withColumn(valName, value.cast("long"))
      .repartitionByRange(parts, orderExprs: _*)
      .sortWithinPartitions(orderExprs: _*)

    val schema = ranged.schema
    val vIdx = schema.fieldIndex(valName)
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    def rowValue(r: Row): Long = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
    def groupKey(r: Row): List[Any] = gIdx.map(i => r.get(i)).toList

    // ONE RDD instance: both jobs below read the same shuffle output,
    // so the (sample-seeded) range boundaries are computed exactly once.
    val rdd = ranged.rdd

    // Job 1 (bounded): per-(partition, group) totals → driver. The
    // cap fails on the EXECUTOR, before the collect can OOM the
    // driver (see the group-cardinality contract above).
    val cap = maxCells
    val cellTotals: Array[(Int, Map[List[Any], Long])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap.empty[List[Any], Long]
        it.foreach { r =>
          val k = groupKey(r)
          if (!m.contains(k) && m.size >= cap)
            throw new IllegalStateException(
              s"DistRank.withPrefix: partition $pid exceeds $cap distinct " +
              "group cells — the group key cardinality scales with the " +
              "corpus, which this helper's driver sync cannot hold. Use a " +
              "bounded group key, raise maxCells deliberately, or switch " +
              "to a hash-threshold / per-group-window formulation.")
          m.update(k, m.getOrElse(k, 0L) + rowValue(r))
        }
        Iterator.single((pid, m.toMap))
      }
      .collect()
      .sortBy(_._1)

    // Prefix the cells: offset(pid, g) = Σ totals of g in partitions < pid.
    val offsets = Array.fill(parts)(Map.empty[List[Any], Long])
    val running = mutable.HashMap.empty[List[Any], Long]
    cellTotals.foreach { case (pid, m) =>
      offsets(pid) = m.keysIterator.map(k => k -> running.getOrElse(k, 0L)).toMap
      m.foreach { case (k, v) => running.update(k, running.getOrElse(k, 0L) + v) }
    }
    val totals = running.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)
    val emitTotal = groupTotalOut.isDefined

    // Job 2: stream each partition once; prefix = offset + running sum.
    val resRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = mutable.HashMap.empty[List[Any], Long] ++= bcOff.value(pid)
      it.map { r =>
        val k = groupKey(r)
        val nv = run.getOrElse(k, 0L) + rowValue(r)
        run.update(k, nv)
        val extra = if (emitTotal) Seq(nv, bcTot.value(k)) else Seq(nv)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    val outFields = StructField(out, LongType, nullable = false) +:
      groupTotalOut.map(t => StructField(t, LongType, nullable = false)).toSeq
    spark.createDataFrame(resRdd, StructType(schema.fields ++ outFields))
      .drop(valName)
  }

  /** SQL-standard NTILE(n) bucket from an exact 1-based rank and the
    * frame's row count, as integer-only column arithmetic (engine
    * portable — no double division): the first `N mod n` buckets get
    * `N div n + 1` rows, the rest `N div n`. `rank`/`total` are
    * COLUMN NAMES (the expression is built with `expr` to use SQL's
    * integral `div`). The q=0 division in the ELSE branch is
    * unreachable (when q=0, every rank satisfies the WHEN).
    */
  def ntileCol(rank: String, total: String, n: Int): Column = {
    require(n > 0, s"ntile bucket count $n must be positive")
    val q = s"($total div $n)"
    val r = s"($total % $n)"
    expr(
      s"CASE WHEN $rank <= $r * ($q + 1) " +
      s"THEN ($rank - 1) div ($q + 1) + 1 " +
      s"ELSE $r + ($rank - 1 - $r * ($q + 1)) div $q + 1 END").cast("long")
  }
}
