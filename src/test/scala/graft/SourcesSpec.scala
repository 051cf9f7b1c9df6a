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

  test("overwritePartitions replaces only the batch's partitions; plain Overwrite truncates") {
    import spark.implicits._
    val dir = tmp("dynpart")
    val day1 = Seq((1L, "d1", 10.0), (2L, "d1", 20.0)).toDF("id", "day", "v")
    val day2 = Seq((3L, "d2", 30.0)).toDF("id", "day", "v")
    Sources.writePartitionedParquet(day1.union(day2), dir, Seq("day"))
    // rerun of day2's batch with corrected values
    val day2fix = Seq((3L, "d2", 99.0), (4L, "d2", 40.0)).toDF("id", "day", "v")
    Sources.overwritePartitions(day2fix, dir, Seq("day"))
    val back = Sources.readParquet(spark, dir)
      .select("id", "day", "v").as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 99.0), (4L, "d2", 40.0)),
      "day1 must survive, day2 must be exactly the rerun batch")
    // reruns are idempotent
    Sources.overwritePartitions(day2fix, dir, Seq("day"))
    assert(Sources.readParquet(spark, dir).count() == 4)
    // the session conf is restored
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"))
  }

  test("ORC round-trips with partition pruning like the parquet twin") {
    val dir = tmp("orc")
    val nation = Tables.nation(spark, sf)
    Sources.writeOrc(nation, dir, Seq("n_regionkey"))
    val back = Sources.readOrc(spark, dir)
    assert(back.count() == nation.count())
    val pruned = back.filter(col("n_regionkey") === 0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == nation.filter(col("n_regionkey") === 0).count())
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"))
  }

  test("compactParquet collapses a small-file swamp to the byte-derived file count") {
    val fragged = tmp("frag")
    val compacted = tmp("compact")
    val ev = Tables.events(spark, sf)
    // simulate a micro-batch sink: 64 fragments for a tiny table
    ev.repartition(64).write.mode("overwrite").parquet(fragged)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(fragged) == 64)
    val totalBytes = new java.io.File(fragged).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = half the data => expect exactly 2 output files
    val n = Sources.compactParquet(spark, fragged, compacted, totalBytes / 2 + 1)
    assert(n == parquetFiles(compacted))
    assert(n >= 1 && n <= 3, s"expected ~2 files, got $n")
    // rewrite is lossless
    val back = Sources.readParquet(spark, compacted)
    assert(back.count() == ev.count())
    assert(back.exceptAll(spark.read.parquet(fragged)).count() == 0)
    // sorted variant re-establishes per-file ordering for min/max pruning
    val sortedOut = tmp("compact_sorted")
    Sources.compactParquet(spark, fragged, sortedOut, totalBytes / 2 + 1,
      sortCol = Some("event_id"))
    val files = new java.io.File(sortedOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val ranges = files.map { f =>
      val d = spark.read.parquet(f)
      val r = d.agg(org.apache.spark.sql.functions.min("event_id"),
                    org.apache.spark.sql.functions.max("event_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    // file ranges must be disjoint (range partitioning), each internally valid
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    assert(ranges.sortBy(_._1).sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 < lo2
      case _ => true
    })
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

  // --- JDBC load stage (embedded Derby — no external DB in container) ---

  private def derbyUrl(name: String): String =
    s"jdbc:derby:${tmp(name)}/db;create=true"

  private def readTable(url: String, table: String) =
    spark.read.jdbc(url, table, new java.util.Properties())

  test("writeJdbcUpsert: reruns are idempotent, conflicts update in place") {
    import spark.implicits._
    val url = derbyUrl("upsert")
    val v1 = Seq((1L, "alpha", 10), (2L, "beta", 20)).toDF("id", "name", "score")
    Sources.writeJdbcUpsert(v1, url, "movies_like", Seq("id"))
    // second load: key 2 changed, key 3 new — the reference's
    // ON CONFLICT DO UPDATE semantics (02_etl.py:84-105)
    val v2 = Seq((2L, "beta2", 21), (3L, "gamma", 30)).toDF("id", "name", "score")
    Sources.writeJdbcUpsert(v2, url, "movies_like", Seq("id"))
    // rerun the SAME load — must be a no-op, not duplicate rows
    Sources.writeJdbcUpsert(v2, url, "movies_like", Seq("id"))
    val back = readTable(url, "movies_like")
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    assert(back == Seq((1L, "alpha", 10), (2L, "beta2", 21), (3L, "gamma", 30)))
  }

  test("writeJdbcUpsert with updateOnConflict=false keeps existing rows (DO NOTHING)") {
    import spark.implicits._
    val url = derbyUrl("nothing")
    val v1 = Seq((1L, "keep"), (2L, "keep")).toDF("id", "name")
    Sources.writeJdbcUpsert(v1, url, "genres_like", Seq("id"))
    val v2 = Seq((2L, "clobber"), (3L, "new")).toDF("id", "name")
    Sources.writeJdbcUpsert(v2, url, "genres_like", Seq("id"), updateOnConflict = false)
    val back = readTable(url, "genres_like")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "keep"), (2L, "keep"), (3L, "new")))
  }

  test("writeJdbcUpsert: all-key junction load is rerun-safe and dedupes the batch") {
    import spark.implicits._
    val url = derbyUrl("junction")
    // duplicate composite key within one batch (the reference's junction
    // payload can repeat a (movie, genre) pair across API pages)
    val j1 = Seq((1L, 10L), (1L, 10L), (1L, 11L)).toDF("movie_id", "genre_id")
    Sources.writeJdbcUpsert(j1, url, "movie_genre_like", Seq("movie_id", "genre_id"))
    val j2 = Seq((1L, 10L), (2L, 10L)).toDF("movie_id", "genre_id")
    Sources.writeJdbcUpsert(j2, url, "movie_genre_like", Seq("movie_id", "genre_id"))
    Sources.writeJdbcUpsert(j2, url, "movie_genre_like", Seq("movie_id", "genre_id"))
    val back = readTable(url, "movie_genre_like")
      .orderBy("movie_id", "genre_id").as[(Long, Long)].collect().toSeq
    assert(back == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("writeJdbcUpsert: a stranded stage table from a crashed run never blocks a rerun") {
    import spark.implicits._
    val url = derbyUrl("stranded")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sources.writeJdbcUpsert(v1, url, "strand_t", Seq("id"))
    // Simulate the debris of a crashed earlier loader: both the legacy
    // fixed-name stage and a unique-suffix stage left mid-flight.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE strand_t__stage ("id" BIGINT, "name" VARCHAR(10))""")
      st.executeUpdate("""CREATE TABLE strand_t__stage_deadbeef ("id" BIGINT, "name" VARCHAR(10))""")
      st.executeUpdate("""INSERT INTO strand_t__stage_deadbeef VALUES (99, 'ghost')""")
      st.close()
    } finally conn.close()
    // The rerun must converge on the target and never read the debris.
    val v2 = Seq((2L, "b2"), (3L, "c")).toDF("id", "name")
    Sources.writeJdbcUpsert(v2, url, "strand_t", Seq("id"))
    val back = readTable(url, "strand_t")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("writeJdbcUpsert rejects unsafe table identifiers before any SQL runs") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Sources.writeJdbcUpsert(df, derbyUrl("unused"), "bad name; DROP", Seq("id"))
    }
  }

  // --- paginated extract (PagedExtract) ---

  /** 5-page fixture: page p has 3 records with ids 10p..10p+2. */
  private val fixturePages = 5
  private def fixturePage(p: Int): Option[Seq[String]] =
    if (p > fixturePages) None
    else Some((0 until 3).map(i => s"""{"movie_id":${p * 10 + i},"title":"m${p * 10 + i}"}"""))

  private val pageSchema = StructType(Seq(
    StructField("movie_id", LongType), StructField("title", StringType)))

  test("PagedExtract resumes after a failed run: no re-fetch, every page landed exactly once") {
    val dir = tmp("paged")
    // Run 1: pages 1-2 land, page 3 is permanently down -> abort.
    val run1Fetched = scala.collection.mutable.ArrayBuffer.empty[Int]
    val boom = intercept[RuntimeException] {
      graft.sources.PagedExtract.extract(
        p => { run1Fetched += p
               if (p == 3) throw new java.io.IOException("api down") else fixturePage(p) },
        dir, maxRetries = 2, sleep = _ => ())
    }
    assert(boom.getMessage.contains("page 3"))
    assert(run1Fetched.count(_ == 3) == 3, "1 attempt + 2 retries expected")
    // Run 2: API recovered. Pages 1-2 must NOT be re-fetched; 3-5 land.
    val run2Fetched = scala.collection.mutable.ArrayBuffer.empty[Int]
    val landed = graft.sources.PagedExtract.extract(
      p => { run2Fetched += p; fixturePage(p) }, dir, sleep = _ => ())
    assert(landed == 3)
    assert(run2Fetched.toSeq == Seq(3, 4, 5, 6), s"re-fetched a landed page: $run2Fetched")
    // Exactly-once landing: 15 distinct records, one per fixture row.
    val back = graft.sources.PagedExtract.readLanded(spark, dir, pageSchema)
    assert(back.count() == 15 && back.distinct().count() == 15)
    // A third run is a no-op end-probe.
    val run3Fetched = scala.collection.mutable.ArrayBuffer.empty[Int]
    assert(graft.sources.PagedExtract.extract(
      p => { run3Fetched += p; fixturePage(p) }, dir, sleep = _ => ()) == 0)
    assert(run3Fetched.toSeq == Seq(6))
  }

  test("PagedExtract retries transient failures with exponential backoff") {
    val dir = tmp("paged_retry")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var failures = 2
    val landed = graft.sources.PagedExtract.extract(
      p => if (p == 2 && { val f = failures > 0; failures -= 1; f })
             throw new java.io.IOException("flaky")
           else fixturePage(p),
      dir, maxRetries = 3, backoffMs = 100, sleep = sleeps += _)
    assert(landed == fixturePages)
    assert(sleeps.toSeq == Seq(100L, 200L), s"backoff schedule: $sleeps")
  }

  test("readJdbc partitions the scan into parallel range reads") {
    import spark.implicits._
    val url = derbyUrl("readpart")
    val rows = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    Sources.writeJdbcUpsert(rows, url, "wide_read", Seq("id"))
    val back = Sources.readJdbc(spark, url, "wide_read", "id", 1L, 100L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
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

  test("readParquetEvolved unions schema versions; old rows read new columns as null") {
    import spark.implicits._
    val dir = tmp("evolve")
    // v1 batch: (id, a); v2 batch added column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = Sources.readParquetEvolved(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("a"), col("b")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.take(2).forall(_.isNullAt(2)), "pre-evolution rows must read b as null")
    assert(rows(2).getLong(2) == 30L)
    // pinned-schema path (the metastore road) sees the same data
    val pinned = Sources.readParquetEvolved(spark, dir, Some(merged.schema))
    assert(pinned.exceptAll(merged).count() == 0 && merged.exceptAll(pinned).count() == 0)
  }

  test("readJsonlQuarantine splits clean rows from dead-lettered raw lines losslessly") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2 "name": "missing-comma"}""",   // malformed
      """{"id": 3, "name": "fine"}""",
      """not json at all""",                      // malformed
      """{"id": "not-a-number", "name": "bad-type"}""") // type mismatch
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (clean, quarantine) = Sources.readJsonlQuarantine(spark, s"$dir/data.jsonl", schema)
    val good = clean.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "ok"), (3L, "fine")))
    // every malformed line lands verbatim in the quarantine, nothing is dropped
    val dead = quarantine.collect().map(_.getString(0)).toSet
    assert(dead == Set(lines(1), lines(3), lines(4)))
    assert(clean.count() + quarantine.count() == lines.length)
  }

  test("landIncremental: watermark bounds fetch work, survives failure without advancing") {
    import graft.sources.PagedExtract
    val landing = java.nio.file.Files.createTempDirectory("graft_inc").toString
    def fetched: Seq[Long] = {
      import scala.jdk.CollectionConverters._
      IncApiState.fetched.iterator().asScala.map(_.longValue).toSeq.sorted
    }
    IncApiState.fetched.clear(); IncApiState.fail = Set.empty
    val api = new CountingIncApi
    // run 1: units 1..3 land, watermark -> 3
    val r1 = PagedExtract.landIncremental(spark, api, Seq(1L, 2L, 3L), landing,
      parallelism = 1, maxRetries = 0)
    assert(r1.ok && r1.landed == Seq(1L, 2L, 3L) && r1.watermarkAfter == 3L)
    // run 2: source re-advertises 1..3 plus new 4..5 — old units are
    // ruled out by the WATERMARK (zero fetches for them), 5 fails
    IncApiState.fetched.clear(); IncApiState.fail = Set(5L)
    val r2 = PagedExtract.landIncremental(spark, api, Seq(1L, 2L, 3L, 4L, 5L), landing,
      parallelism = 1, maxRetries = 0)
    assert(!r2.ok && r2.landed == Seq(4L) && r2.skippedByWatermark == 3L)
    assert(r2.watermarkAfter == 3L, "a failed run must NOT advance the watermark")
    assert(fetched == Seq(4L, 5L), s"watermark must rule out 1..3 unprobed: $fetched")
    // run 3: source recovered — only 5 is refetched (4's landed file is
    // the checkpoint), then the watermark advances past everything
    IncApiState.fetched.clear(); IncApiState.fail = Set.empty
    val r3 = PagedExtract.landIncremental(spark, api, Seq(1L, 2L, 3L, 4L, 5L), landing,
      parallelism = 1, maxRetries = 0)
    assert(r3.ok && r3.landed == Seq(5L) && r3.watermarkAfter == 5L)
    assert(fetched == Seq(5L), s"only the failed unit refetches: $fetched")
    // run 4: nothing new — no fetches at all, watermark stable
    IncApiState.fetched.clear()
    val r4 = PagedExtract.landIncremental(spark, api, Seq(1L, 2L, 3L, 4L, 5L), landing)
    assert(r4.ok && r4.landed.isEmpty && r4.skippedByWatermark == 5L && fetched.isEmpty)
    assert(r4.watermarkBefore == 5L && r4.watermarkAfter == 5L)
  }
}

/** JVM-singleton state for the instrumented incremental source: the
  * task closure is SERIALIZED even in local mode, so a captured buffer
  * would mutate a deserialized copy — a shared object is how the test
  * observes executor-side fetches.
  */
private[graft] object IncApiState {
  val fetched = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  @volatile var fail: Set[Long] = Set.empty
}

/** Instrumented [[graft.sources.PagedExtract.KeyedApi]]: records every
  * fetch in [[IncApiState]] and fails on demand. */
private[graft] class CountingIncApi extends graft.sources.PagedExtract.KeyedApi {
  override def fetch(unit: Long): Seq[String] = {
    IncApiState.fetched.add(unit)
    if (IncApiState.fail(unit)) sys.error(s"unit $unit transiently unavailable")
    Seq(s"""{"u":$unit}""")
  }
}
