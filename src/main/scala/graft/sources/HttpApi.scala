package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Real-HTTP transport for the paged/keyed extract stages — the
  * engine twin of the reference's `tmdb_get`
  * (/root/reference/02_etl.py:21-26: bearer-header session, 30 s
  * timeout, raise_for_status), with the part `raise_for_status`
  * leaves on the table: STATUS-CODE RETRY CLASSIFICATION. The
  * reference treats every non-2xx alike; a production extract must
  * not — a 503 or a 429 is the upstream saying "try again", while a
  * 401/404 is an answer that retrying can only repeat, burning the
  * retry budget and hammering an endpoint that already said no.
  *
  * The classification is expressed through the exception TYPE, so the
  * shared commit loop ([[PagedExtract]] — retry, backoff, rate limit,
  * atomic landing) applies it without knowing HTTP exists:
  *  - 2xx        → body returned
  *  - 429, 5xx   → [[TransientFetchError]] (plain retryable): retried
  *                 with exponential backoff like any IOException
  *  - other 4xx  → [[PermanentFetchError]]: the commit loop FAILS
  *                 FAST — no retry, the unit goes straight to the
  *                 failure report
  *
  * Transport is JDK `HttpURLConnection` — zero dependencies,
  * per-call, no pooled client state to serialize. The `Api` wrappers
  * hold only [[HttpConfig]] (plain strings/ints) plus a
  * unit→path lambda, so they ship to executors like the file-backed
  * stand-ins do and drive the IDENTICAL commit loop
  * (PagedExtractSpec proves both classifications against a localhost
  * stub server).
  */
object HttpTransport {

  /** Connection settings — the `tmdb_get` surface: base URL, optional
    * bearer token (`Authorization: Bearer <token>`), connect/read
    * timeouts. A hung upstream must become a (transient, retryable)
    * timeout, never a stuck executor slot.
    */
  final case class HttpConfig(baseUrl: String,
                              bearerToken: Option[String] = None,
                              connectTimeoutMs: Int = 5000,
                              readTimeoutMs: Int = 30000,
                              retryAfterCapMs: Long = 60000) {
    require(connectTimeoutMs > 0 && readTimeoutMs > 0,
      "HTTP timeouts must be positive — 0 means wait forever, which a " +
      "rate-limited extract loop must never do")
    require(retryAfterCapMs >= 0,
      "retryAfterCapMs must be non-negative — the cap is what stops a " +
      "hostile/buggy Retry-After from parking an executor slot for hours")
  }

  /** Upstream said "not now" (429, 5xx) or the socket failed — the
    * commit loop's normal retry-with-backoff path. `retryAfterMs`
    * carries a parsed (and capped) `Retry-After` header when the
    * upstream named its own wait: the retry loops take
    * max(exponential backoff, retryAfterMs) for the NEXT attempt only
    * — the polite generalization of the reference's fixed `sleep_s`
    * pacing (02_etl.py's 0.25 s loop), driven by the server instead
    * of a constant. */
  final class TransientFetchError(msg: String,
                                  val retryAfterMs: Option[Long] = None)
      extends IOException(msg)

  /** Upstream gave an ANSWER retrying cannot change (4xx except 429):
    * the commit loop fails the unit fast instead of burning its retry
    * budget re-asking. */
  final class PermanentFetchError(msg: String) extends IOException(msg)

  /** GET `cfg.baseUrl + pathAndQuery`, classified per the table above;
    * 2xx returns the body's non-empty lines (JSONL convention, same
    * record shape the file-backed stand-ins serve).
    */
  def getLines(cfg: HttpConfig, pathAndQuery: String): Seq[String] = {
    val conn = URI.create(cfg.baseUrl + pathAndQuery).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestMethod("GET")
      cfg.bearerToken.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      val code = conn.getResponseCode // connects; may throw IOException (transient)
      if (code >= 200 && code < 300) {
        val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        body.linesIterator.filter(_.nonEmpty).toSeq
      } else {
        // error body drained so keep-alive sockets are reusable
        Option(conn.getErrorStream).foreach { es => es.readAllBytes(); es.close() }
        val msg = s"HTTP $code from GET $pathAndQuery"
        if (code == 429 || code >= 500) {
          // Honor Retry-After (delta-seconds form — the rate-limit
          // convention; an HTTP-date here is ignored rather than
          // mis-parsed) capped so the upstream can pace us but never
          // park the slot: the error CARRIES the wait, the shared
          // commit loop takes it (classification stays in the type).
          val retryAfter = Option(conn.getHeaderField("Retry-After"))
            .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
            .filter(_ >= 0)
            .map(secs => math.min(secs * 1000L, cfg.retryAfterCapMs))
          throw new TransientFetchError(msg, retryAfter)
        } else throw new PermanentFetchError(msg)
      }
    } finally conn.disconnect()
  }

  /** [[PagedExtract.PageApi]] over HTTP: `pathFor(page)` names the
    * endpoint (e.g. `p => s"/movies?page=$p"` — the reference's
    * `/movie/popular` pull). Page count is endpoint-specific (the
    * reference reads `total_pages` off its first response), so the
    * caller supplies it; the transport stays protocol-free.
    */
  final class HttpPageApi(cfg: HttpConfig, nPages: Int,
                          pathFor: Int => String)
      extends PagedExtract.PageApi {
    override def totalPages(): Int = nPages
    override def fetch(page: Int): Seq[String] = getLines(cfg, pathFor(page))
  }

  /** [[PagedExtract.KeyedApi]] over HTTP: `pathFor(key)` names the
    * per-parent detail endpoint (the reference's
    * `/movie/{id}/credits` fan-out, 02_etl.py:136-140).
    */
  final class HttpKeyedApi(cfg: HttpConfig, pathFor: Long => String)
      extends PagedExtract.KeyedApi {
    override def fetch(key: Long): Seq[String] = getLines(cfg, pathFor(key))
  }
}
