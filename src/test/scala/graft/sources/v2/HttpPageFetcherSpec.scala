package graft.sources.v2

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the HTTP/OAuth2 leg of the paged source, against a fake
  * transport (this harness has zero egress — ALL auth/paging/retry logic
  * sits above the [[HttpTransport]] seam precisely so it is testable here).
  */
class HttpPageFetcherSpec extends AnyFunSuite {

  private val TokenUrl = "https://login.example.test/token"
  private val Svc = "https://svc.example.test/data/v9.0/entity"

  /** Scripted transport: token POSTs mint `tok<N>`; GETs serve a 3-page
    * nextLink chain and record every request + auth header.
    */
  private class FakeTransport extends HttpTransport {
    val gets = ArrayBuffer[(String, Option[String])]()
    var tokensMinted = 0
    var expiresIn = 3600L
    var reject: String => Boolean = _ => false // tokens to 401

    private def pageBody(i: Int): String = {
      val rows = (i * 2 until i * 2 + 2).map(j => s"""{"id":$j,"v":"r$j"}""").mkString(",")
      val next = if (i < 2) s""","@odata.nextLink":"$Svc?page=${i + 1}"""" else ""
      s"""{"value":[$rows]$next}"""
    }

    override def post(url: String, form: Map[String, String],
        headers: Map[String, String]): HttpResponse = {
      assert(url == TokenUrl && form("grant_type") == "client_credentials")
      tokensMinted += 1
      HttpResponse(200, s"""{"access_token":"tok$tokensMinted","expires_in":$expiresIn}""")
    }

    override def get(url: String, headers: Map[String, String]): HttpResponse = {
      val auth = headers.get("Authorization")
      gets += ((url, auth))
      val tok = auth.map(_.stripPrefix("Bearer ")).getOrElse("")
      if (reject(tok)) HttpResponse(401, """{"error":"token expired"}""")
      else {
        val page = if (url.contains("page=2")) 2 else if (url.contains("page=1")) 1 else 0
        HttpResponse(200, pageBody(page))
      }
    }
  }

  private def fetcher(t: HttpTransport) =
    HttpPageFetcher(Svc, TokenUrl, "client-1", "s3cret", "https://svc.example.test", t)

  test("planPages walks the @odata.nextLink chain once, in order") {
    val t = new FakeTransport
    val pages = fetcher(t).planPages()
    assert(pages == Seq(Svc, s"$Svc?page=1", s"$Svc?page=2"))
  }

  test("planPages memoizes the chain walk; samplePage never walks at all") {
    val t = new FakeTransport
    val f = fetcher(t)
    assert(f.samplePage().contains(Svc))
    assert(t.gets.isEmpty, "schema sampling must not fetch the page chain")
    f.planPages(); f.planPages()
    assert(t.gets.size == 3, s"chain must be walked once, saw ${t.gets.size} GETs")
  }

  test("fetch unwraps the OData value array as JSON-lines") {
    val t = new FakeTransport
    val rows = fetcher(t).fetch(s"$Svc?page=1").toSeq
    assert(rows == Seq("""{"id":2,"v":"r2"}""", """{"id":3,"v":"r3"}"""))
  }

  test("token is minted once and cached across requests") {
    val t = new FakeTransport
    val f = fetcher(t)
    f.planPages() // 3 GETs
    f.fetch(Svc).size
    assert(t.tokensMinted == 1)
    assert(t.gets.forall(_._2.contains("Bearer tok1")))
  }

  test("expired cache (expires_in elapsed) mints a fresh token") {
    val t = new FakeTransport
    t.expiresIn = 60L // cached for max(60-60,1)=1s... use clock injection instead
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val tokens = new OAuth2TokenProvider(TokenUrl, "c", "s", "r", t, () => clock.get())
    assert(tokens.token() == "tok1")
    assert(tokens.token() == "tok1") // cached
    clock.set(3600L * 1000)          // past expiry
    assert(tokens.token() == "tok2")
    assert(t.tokensMinted == 2)
  }

  test("401 mid-fetch invalidates the token, refreshes, and retries once") {
    val t = new FakeTransport
    t.reject = _ == "tok1" // first minted token is stale from the server's view
    val rows = fetcher(t).fetch(Svc).toSeq
    assert(rows.nonEmpty)
    assert(t.tokensMinted == 2)
    // exactly one failed GET then one success with the refreshed token
    assert(t.gets.map(_._2.get) == Seq("Bearer tok1", "Bearer tok2"))
  }

  test("non-200 page responses surface as errors (no silent empty pages)") {
    val t = new FakeTransport {
      override def get(url: String, headers: Map[String, String]): HttpResponse =
        HttpResponse(500, "boom")
    }
    assertThrows[java.io.IOException](fetcher(t).planPages())
  }

  test("plan description never leaks the client secret") {
    val t = new FakeTransport
    val f = fetcher(t)
    assert(!f.toString.contains("s3cret"))
    assert(!PagedScan(null, null, f, Array.empty).description().contains("s3cret"))
  }

  test("PageFetchers.from resolves modes case-insensitively and validates options") {
    val file = PageFetchers.from(java.util.Map.of("path", "/tmp/x"))
    assert(file == FilePageFetcher("/tmp/x"))
    val http = PageFetchers.from(java.util.Map.of(
      "MODE", "http", "url", Svc, "tokenURL", TokenUrl,
      "clientid", "c", "CLIENTSECRET", "s", "resource", "r"))
    assert(http.isInstanceOf[HttpPageFetcher])
    assertThrows[IllegalArgumentException](
      PageFetchers.from(java.util.Map.of("mode", "carrier-pigeon")))
    assertThrows[IllegalArgumentException](
      PageFetchers.from(java.util.Map.of("mode", "http", "url", Svc)))
  }
}
