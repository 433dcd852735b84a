package graft.sources

/** Minimal HTTP abstraction for the connector layer. The engine never
  * hard-codes a client: sources/sinks take a [[Transport]] function, so
  * tests inject an in-memory fake and production injects a real client.
  *
  * Reference surface being re-expressed (SURVEY.md §2.1 S6–S9, S13 and
  * §3.3): okhttp calls built in ApiClient.java:1082-1109, executed
  * :969-990, OAuth client-credentials token injection :181,514-519, and
  * the 401-refresh-retry-once wrapper copy-pasted around every call site
  * (SisConnectorService.java:190-196, 494-501, …) — here it is ONE
  * function, [[Authed.call]].
  */
object Http {

  final case class Request(
      method: String,
      path: String,
      body: String = "",
      params: Map[String, String] = Map.empty,
      headers: Map[String, String] = Map.empty)

  final case class Response(status: Int, body: String)

  /** The pluggable boundary: must be Serializable — sink transports ship to
    * executors inside foreachPartition closures.
    */
  trait Transport extends Serializable {
    def send(req: Request): Response
  }

  /** Token provider (client-credentials in the reference,
    * TokenRetriever.java:44-73). `refresh()` must return a NEW token.
    */
  trait TokenSource extends Serializable {
    def current(): String
    def refresh(): String
  }

  /** Production [[TokenSource]]: OAuth client-credentials against a token
    * endpoint (reference: TokenRetriever.java:44-73 — POST with Basic
    * key:secret auth, `grant_type=client_credentials` form body,
    * access_token out of the JSON response). Runs over the pluggable
    * [[Transport]], so specs drive it with a fake endpoint end to end —
    * including the stale-token path: [[refresh]] always re-POSTs and
    * replaces the cached token, [[current]] reuses it until someone
    * refreshes.
    */
  final class ClientCredentialsTokenSource(
      transport: Transport,
      tokenPath: String,
      clientKey: String,
      clientSecret: String) extends TokenSource {

    @volatile private var cached: String = _

    override def current(): String = {
      val c = cached
      if (c != null) c else refresh()
    }

    override def refresh(): String = synchronized {
      val basic = java.util.Base64.getEncoder
        .encodeToString(s"$clientKey:$clientSecret".getBytes("UTF-8"))
      val resp = transport.send(Request("POST", tokenPath,
        body = "grant_type=client_credentials",
        headers = Map(
          "Authorization" -> s"Basic $basic",
          "Content-Type" -> "application/x-www-form-urlencoded")))
      require(resp.status == 200, s"POST $tokenPath failed: HTTP ${resp.status}")
      val tok = parseAccessToken(resp.body)
      cached = tok
      tok
    }
  }

  /** Extract `access_token` from a token-endpoint JSON body. A targeted
    * match, not a JSON parser — the token grammar (RFC 6749 §A.12) has no
    * escapes, and the connector layer deliberately has zero parser
    * dependencies.
    */
  private[sources] def parseAccessToken(body: String): String = {
    val m = """"access_token"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body)
    require(m.isDefined, s"no access_token in token response: ${body.take(80)}")
    m.get.group(1)
  }

  /** Bearer-auth wrapper with the reference's 401 semantics: on 401,
    * refresh the token and retry ONCE; any second 401 (or other error
    * status) surfaces to the caller.
    */
  final class Authed(transport: Transport, tokens: TokenSource) extends Serializable {
    def call(req: Request): Response = {
      def withToken(t: String) =
        transport.send(req.copy(headers = req.headers + ("Authorization" -> s"Bearer $t")))
      val first = withToken(tokens.current())
      if (first.status == 401) withToken(tokens.refresh()) else first
    }
  }
}
