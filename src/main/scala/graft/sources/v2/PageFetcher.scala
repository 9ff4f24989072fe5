package graft.sources.v2

import scala.collection.mutable.ArrayBuffer

/** How [[PagedJsonSource]] obtains pages — the seam between the DSv2
  * plumbing (partition planning, pushdown, row conversion) and the
  * transport (local page files in this zero-egress harness, HTTP OData in a
  * real deployment).
  *
  * The reference fetches the whole entity in one authenticated GET on a
  * worker (`Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:58-73`:
  * adal client-credentials auth :59-62, `requests.get` :68). Here the same
  * auth + fetch logic lives behind this trait so each PAGE is one Spark
  * partition fetched inside an executor: `planPages` runs once on the
  * driver (metadata-scale), `fetch` runs per partition (data-scale, never
  * on the driver).
  *
  * Implementations must be Serializable — they ship inside InputPartitions
  * to executors; hold sockets/tokens in @transient lazy state so each
  * executor builds its own.
  */
trait PageFetcher extends Serializable {
  /** Driver-side: enumerate page references (file paths or page URLs). */
  def planPages(): Seq[String]

  /** Executor-side: one page's records as JSON-lines. */
  def fetch(pageRef: String): Iterator[String]

  /** Driver-side: ONE page reference sufficient for schema inference,
    * without enumerating (or fetching) the full page chain.
    */
  def samplePage(): Option[String] = planPages().headOption
}

/** Local directory of JSON-lines page files (one file ≙ one fetched OData
  * page) — the zero-egress stand-in and the test fixture transport.
  */
case class FilePageFetcher(path: String) extends PageFetcher {
  override def planPages(): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory) f.listFiles().filter(_.isFile).map(_.getPath).sorted.toSeq
    else Seq(path)
  }
  override def fetch(pageRef: String): Iterator[String] = {
    val src = scala.io.Source.fromFile(pageRef)(scala.io.Codec.UTF8)
    // materialize the (one-page-sized) lines so the handle closes eagerly
    try src.getLines().filter(_.trim.nonEmpty).toArray.iterator
    finally src.close()
  }
}

/** Minimal HTTP transport seam so the OAuth2/OData logic is unit-testable
  * without egress (tests inject a fake; production uses
  * [[UrlConnectionTransport]]).
  */
trait HttpTransport extends Serializable {
  def get(url: String, headers: Map[String, String]): HttpResponse
  def post(url: String, form: Map[String, String], headers: Map[String, String]): HttpResponse
}

case class HttpResponse(status: Int, body: String)

/** `java.net.HttpURLConnection`-based transport (JDK-only, no extra
  * dependencies). Untestable in this zero-egress harness — kept deliberately
  * thin; all retry/auth/paging logic lives above the [[HttpTransport]] seam.
  */
class UrlConnectionTransport extends HttpTransport {
  private def readBody(conn: java.net.HttpURLConnection): String = {
    val stream =
      if (conn.getResponseCode >= 400) conn.getErrorStream else conn.getInputStream
    if (stream == null) ""
    else try new String(stream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally stream.close()
  }

  override def get(url: String, headers: Map[String, String]): HttpResponse = {
    val conn = new java.net.URL(url).openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      HttpResponse(conn.getResponseCode, readBody(conn))
    } finally conn.disconnect()
  }

  override def post(
      url: String,
      form: Map[String, String],
      headers: Map[String, String]): HttpResponse = {
    val conn = new java.net.URL(url).openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val body = form.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val os = conn.getOutputStream
      try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally os.close()
      HttpResponse(conn.getResponseCode, readBody(conn))
    } finally conn.disconnect()
  }
}

/** OAuth2 client-credentials token cache — the reference's
  * `adal.AuthenticationContext.acquire_token_with_client_credentials`
  * (`…/Dynamics365-to-MySQL-Method-1.py:59-62`) with expiry-aware refresh:
  * tokens are cached until `expires_in` minus a 60 s skew, and
  * [[invalidate]] forces a refresh after a 401 (expiry raced the request).
  */
class OAuth2TokenProvider(
    tokenUrl: String,
    clientId: String,
    clientSecret: String,
    resource: String,
    transport: HttpTransport,
    clock: () => Long = () => System.currentTimeMillis()) extends Serializable {

  @transient private var cached: String = _
  @transient private var expiresAtMs: Long = 0L

  def token(): String = synchronized {
    if (cached == null || clock() >= expiresAtMs) {
      val resp = transport.post(tokenUrl, Map(
        "grant_type" -> "client_credentials",
        "client_id" -> clientId,
        "client_secret" -> clientSecret,
        "resource" -> resource), Map.empty)
      if (resp.status != 200)
        throw new java.io.IOException(s"token endpoint ${resp.status}: ${resp.body.take(200)}")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(resp.body)
      cached = node.get("access_token").asText()
      val expiresIn = Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L)
      expiresAtMs = clock() + (expiresIn - 60L).max(1L) * 1000
    }
    cached
  }

  def invalidate(): Unit = synchronized { cached = null; expiresAtMs = 0L }
}

/** HTTP OData page fetcher: the real-world leg of S9/S10.
  *
  * Partition planning follows the server-driven `@odata.nextLink` chain
  * ONCE on the driver, collecting each page's URL (`…/Dynamics365-to-…`
  * responses carry the opaque `$skiptoken` continuation — page URLs cannot
  * be synthesized, so the chain walk is inherently sequential); executors
  * then re-GET their own page URL independently, which is where the data
  * volume moves. A 401 mid-fetch invalidates the cached token, refreshes,
  * and retries once (token expiry racing a long fetch).
  *
  * Pages are the raw OData envelope: `{"value": [...records...], "@odata.
  * nextLink": "..."}`; `fetch` unwraps `value` to JSON-lines for the
  * shared reader. Filter/column pushdown rides the URL as `$filter`/
  * `$select` (rendered by [[PagedScan.toODataFilter]] upstream).
  */
case class HttpPageFetcher(
    serviceUrl: String,
    tokenUrl: String,
    clientId: String,
    clientSecret: String,
    resource: String,
    @transient private val transportOverride: HttpTransport = null) extends PageFetcher {

  @transient private lazy val transport: HttpTransport =
    if (transportOverride != null) transportOverride else new UrlConnectionTransport
  @transient private lazy val tokens =
    new OAuth2TokenProvider(tokenUrl, clientId, clientSecret, resource, transport)

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def authedGet(url: String): HttpResponse = {
    val first = transport.get(url, Map("Authorization" -> s"Bearer ${tokens.token()}",
      "Accept" -> "application/json"))
    if (first.status == 401) {
      // token expired mid-flight: refresh once and retry
      tokens.invalidate()
      transport.get(url, Map("Authorization" -> s"Bearer ${tokens.token()}",
        "Accept" -> "application/json"))
    } else first
  }

  private def page(url: String): com.fasterxml.jackson.databind.JsonNode = {
    val resp = authedGet(url)
    if (resp.status != 200)
      throw new java.io.IOException(s"GET $url -> ${resp.status}: ${resp.body.take(200)}")
    mapper.readTree(resp.body)
  }

  // The nextLink protocol is inherently sequential: page N+1's URL lives in
  // page N's body, so planning walks the chain once on the driver (bodies
  // are read only for their nextLink; executors re-fetch page data in
  // parallel). Memoized so inferSchema + planInputPartitions + re-plans
  // share one walk per fetcher instance.
  @transient private lazy val plannedPages: Seq[String] = {
    val urls = ArrayBuffer(serviceUrl)
    var node = page(serviceUrl)
    var next = Option(node.get("@odata.nextLink")).map(_.asText())
    while (next.isDefined) {
      urls += next.get
      node = page(next.get)
      next = Option(node.get("@odata.nextLink")).map(_.asText())
    }
    urls.toSeq
  }

  override def planPages(): Seq[String] = plannedPages

  /** Schema inference needs one page — the service URL itself; never walk
    * (and fetch) the whole chain for it.
    */
  override def samplePage(): Option[String] = Some(serviceUrl)

  override def fetch(pageRef: String): Iterator[String] = {
    val value = page(pageRef).get("value")
    if (value == null || !value.isArray) Iterator.empty
    else {
      val it = value.elements()
      new Iterator[String] {
        override def hasNext: Boolean = it.hasNext
        override def next(): String = it.next().toString
      }
    }
  }

  // never leak the client secret into plan descriptions / logs
  override def toString: String = s"HttpPageFetcher($serviceUrl, clientId=$clientId)"
}

object PageFetchers {
  /** Build the fetcher from DSv2 options: `mode=file` (default — `path`
    * points at a page-file directory) or `mode=http` (`url`, `tokenUrl`,
    * `clientId`, `clientSecret`, `resource`). Lookup is case-insensitive:
    * Spark hands `inferSchema` a lowercased CaseInsensitiveStringMap but
    * `getTable` the original-case map.
    */
  def from(options: java.util.Map[String, String]): PageFetcher = {
    val lower = new java.util.HashMap[String, String]()
    options.forEach((k, v) => lower.put(k.toLowerCase(java.util.Locale.ROOT), v))
    def req(k: String): String = {
      val v = lower.get(k.toLowerCase(java.util.Locale.ROOT))
      require(v != null, s"graft-pages: missing required option '$k'")
      v
    }
    lower.getOrDefault("mode", "file") match {
      case "file" => FilePageFetcher(req("path"))
      case "http" => HttpPageFetcher(req("url"), req("tokenUrl"),
        req("clientId"), req("clientSecret"), req("resource"))
      case other => throw new IllegalArgumentException(s"graft-pages: unknown mode '$other'")
    }
  }
}
