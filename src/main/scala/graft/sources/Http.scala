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
