package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Paginated extract stage — the engine's analogue of the reference's
  * paged, rate-limited API pull (/root/reference/02_etl.py:22-27
  * `tmdb_get`, :51-62 `fetch_popular_movies` page loop, :204-227
  * `load_cast_for_movies` partial-failure-tolerant fetch loop), made
  * restartable.
  *
  * The reference holds every fetched page in driver memory and loses
  * all of them when a later page fails; this stage lands EACH page to
  * the landing directory the moment it arrives, atomically, and on
  * restart skips pages already landed — so a crashed extract resumes
  * where it stopped, re-fetching nothing and landing every page
  * exactly once (SourcesSpec proves both properties).
  *
  * Deliberate design decisions:
  *  - The fetch loop is DRIVER-side and sequential. Pagination is
  *    inherently serial (whether page N+1 exists is known only after
  *    reading page N) and the reference API is rate-limited — the
  *    remote service is the bottleneck, not Spark. Scale lives
  *    downstream: the landed JSONL is read DISTRIBUTED with an
  *    explicit schema ([[readLanded]]) and flows into
  *    `EtlOps.ingestNormalize`.
  *  - A page is landed by writing to a dot-prefixed temp file and
  *    ATOMIC_MOVE-ing it into place: a crash mid-write leaves a temp
  *    file the next run overwrites, never a half page that both
  *    resume-skip and the reader would trust.
  *  - Transient fetch failures retry with exponential backoff
  *    (`tmdb_get` raises immediately; real extracts need the retry);
  *    a page that stays down after `maxRetries` aborts the run with
  *    the already-landed prefix intact.
  */
object PagedExtract {

  private def pageFile(dir: Path, page: Int): Path =
    dir.resolve(f"page_$page%05d.jsonl")

  /** Pull pages `1..` until `fetchPage` returns None (past the end) or
    * `maxPages` is hit, landing each page as one JSONL file under
    * `landingDir`. Pages already landed by a previous run are skipped
    * without calling `fetchPage`.
    *
    * @param fetchPage page number (1-based) → Some(records as JSON
    *                  object strings), or None when past the last page;
    *                  may throw on transient failure
    * @param sleep     injection point for the backoff (tests pass a
    *                  recorder; production keeps Thread.sleep)
    * @return number of pages landed BY THIS RUN (skipped pages not
    *         counted)
    */
  def extract(fetchPage: Int => Option[Seq[String]],
              landingDir: String,
              maxRetries: Int = 3,
              backoffMs: Long = 100,
              maxPages: Int = 100000,
              sleep: Long => Unit = Thread.sleep): Int = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    var landed = 0
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      if (Files.exists(pageFile(dir, page))) {
        page += 1 // landed by an earlier run — never re-fetch
      } else {
        fetchWithRetry(fetchPage, page, maxRetries, backoffMs, sleep) match {
          case None => done = true
          case Some(records) =>
            val tmp = dir.resolve(f".tmp_page_$page%05d.jsonl")
            Files.write(tmp, records.asJava)
            Files.move(tmp, pageFile(dir, page),
              StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
            landed += 1
            page += 1
        }
      }
    }
    landed
  }

  private def fetchWithRetry(fetchPage: Int => Option[Seq[String]], page: Int,
                             maxRetries: Int, backoffMs: Long,
                             sleep: Long => Unit): Option[Seq[String]] = {
    var attempt = 0
    while (true) {
      try return fetchPage(page)
      catch { case e: Exception =>
        attempt += 1
        if (attempt > maxRetries)
          throw new RuntimeException(
            s"page $page failed after $maxRetries retries (landed prefix is intact)", e)
        sleep(backoffMs << (attempt - 1)) // 1x, 2x, 4x, ...
      }
    }
    None // unreachable
  }

  /** Distributed read of the landed pages — explicit schema, per the
    * Sources convention (inference is a second full pass at scale).
    */
  def readLanded(s: SparkSession, landingDir: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(Paths.get(landingDir).resolve("page_*.jsonl").toString)
}
