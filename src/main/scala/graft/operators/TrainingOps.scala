package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Training-data assembly operators over the `documents` corpus — the
  * steps between a deduplicated corpus and a training run (SURVEY.md
  * §2 "Training-data assembly"). Extends the reference pipeline's
  * load-for-analytics endpoint (/root/reference/02_etl.py:246-258)
  * toward the LLM-pretraining consumer.
  */
object TrainingOps {

  /** Deterministic hash-based train/test split: bucket =
    * int(md5(doc_id)[0:8]) mod 100, split = bucket < trainPct.
    *
    * Hash-based (not `rand()`/`sampleBy`) on purpose: the assignment
    * is a pure row-local function of the KEY, so it is reproducible
    * across runs, engines, partitionings and cluster sizes, stable
    * under backfills (a re-ingested doc lands in the same split), and
    * needs no stored split table. Zero shuffle: a projection the
    * optimizer prunes to (doc_id) — the 100 TB cost is one scan.
    * md5 rather than xxhash64 because the oracle must compute the
    * same bucket (md5 is the one keyed hash every engine agrees on).
    */
  def sampleSplitHash(s: SparkSession, dir: String, trainPct: Int = 80): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct $trainPct outside [0,100]")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split", when(col("bucket") < trainPct, "train").otherwise("test"))
      .orderBy("doc_id")
  }

  /** Concat-and-chunk sequence packing: documents are laid end-to-end
    * in token space and cut into fixed `ctxLen`-token context windows
    * (the GPT-style pretraining layout — a document may straddle a
    * window boundary). Emits, per document, its token count and the
    * first/last window it occupies within its shard.
    *
    * Packing is per-SHARD (shard = doc_id mod nShards, window ids are
    * (shard, chunk) pairs): a single global token order would funnel
    * the whole corpus through ONE sort partition — the number-one
    * window-function scale trap. Sharded, each shard's running sum
    * sorts independently (perfect parallelism at any corpus size) and
    * the layout stays deterministic: shard and order derive from
    * doc_id alone, so the same corpus packs identically on any
    * cluster. Window offsets use integral `div`, exact at any
    * magnitude (a per-shard token cumsum at 100 TB crosses 2^53; a
    * double quotient would mis-chunk past that).
    *
    * Token counts reuse the BPE-ish regex of
    * [[TextOps.textTokenCount]], so "token" means the same thing
    * across the engine's text surface.
    */
  def packSequences(s: SparkSession, dir: String,
                    ctxLen: Int = 512, nShards: Int = 8): DataFrame = {
    require(ctxLen > 0 && nShards > 0, "ctxLen and nShards must be positive")
    val counted = Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("norm"))
      .select(
        col("doc_id"),
        (col("doc_id") % nShards).as("shard"),
        size(regexp_extract_all(col("norm"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    counted
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"tok_start div $ctxLen").as("first_chunk"),
        // An empty document occupies no window; report its insertion
        // point (tok_end - 1 would point into the PREVIOUS window).
        when(col("n_tokens") === 0, expr(s"tok_start div $ctxLen"))
          .otherwise(expr(s"(tok_end - 1) div $ctxLen")).as("last_chunk"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: within each stratum (`lang`),
    * rows rank by md5(doc_id) — a uniform, engine-agreed pseudo-random
    * order — and the top ceil(pct% · stratum size) survive, so every
    * stratum is represented at the SAME rate regardless of how skewed
    * the stratum sizes are (uniform sampling starves small strata —
    * exactly the languages a pretraining mix most wants to keep).
    *
    * Same reproducibility rationale as [[sampleSplitHash]] (pure
    * function of the key, stable across runs/engines/partitionings),
    * but with an exact per-stratum COUNT guarantee, which costs ONE
    * window shuffle on the stratum key — that is the price of "exactly
    * ceil(pct·n)" over "pct in expectation". The quota arithmetic is
    * integral ((n·pct + 99) div 100): a double `ceil(0.01·pct·n)`
    * computes 0.1·750 = 75.000000000000014 and quietly over-admits.
    * At 100 TB with few strata, swap the row_number window for the
    * zero-shuffle hash-threshold form (keep iff bucket < pct — the
    * [[sampleSplitHash]] trick) when "pct in expectation" suffices.
    */
  def sampleStratified(s: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct $pct outside [0,100]")
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val wAll = Window.partitionBy("lang")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .withColumn("strat_size", count(lit(1)).over(wAll))
      .filter(col("sample_rank") * 100 <= col("strat_size") * pct + 99)
      .orderBy("doc_id")
  }
}
