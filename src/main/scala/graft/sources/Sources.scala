package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers (SURVEY.md §2 "Sources / sinks"). The
  * reference extracts from a paginated JSON API and loads into
  * Postgres (/root/reference/02_etl.py:50-62, 246-258); at engine
  * scale the analogues are columnar/partitioned files. Conventions
  * enforced here:
  *
  * - reads take an EXPLICIT schema — schema inference is a second full
  *   pass over the data at 100 TB and is never acceptable on the hot
  *   path;
  * - parquet sinks are partitioned by a low-cardinality column so
  *   downstream readers get partition pruning;
  * - JSONL is the interchange format for nested/evolving payloads
  *   (the reference's raw API responses), CSV for flat exports.
  */
object Sources {

  /** Partitioned parquet sink: the upsert-target layout. Readers
    * filtering on a partition column scan only matching directories
    * (partition pruning — verified in SourcesSpec).
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** JSONL (one JSON object per line) — raw API-payload interchange. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** Bucketed table sink: pre-shuffle once at write time so repeated
    * joins/aggregations on `bucketCol` run with NO exchange (the classic
    * co-located-join layout for a fact table joined every day on the
    * same key). Requires a table name (bucketing metadata lives in the
    * catalog). SourcesSpec asserts the exchange-free join plan.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
                         nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** CSV with header — flat exports. Explicit schema, never inferred. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)
}
