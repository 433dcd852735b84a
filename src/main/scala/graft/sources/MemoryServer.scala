package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** Loopback in-memory REST endpoint: the upsert/delete contract of the
  * reference's Ed-Fi API (POST-as-upsert by natural key, DELETE-by-id
  * with 404 = already gone) backed by named JVM-wide stores.
  *
  * Purpose-built for gate queries and demos that must run a full sync
  * loop and then inspect the converged target state (e.g. the
  * incremental-sync CORRECTNESS row, which replays a change feed and
  * oracle-checks the final server contents against the batch SQL).
  *
  * State is JVM-static and the transport captures only its store NAME —
  * the FakeServer pattern: a sink task serializes the lightweight
  * endpoint, and in local mode (one JVM) every task resolves the same
  * map. On a real cluster the transport would be a genuine HTTP client;
  * everything above it (sinks, retries, token refresh) is identical.
  */
object MemoryServer {

  private val stores = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()

  /** The named server's contents (id → stored body). Creates on demand. */
  def store(name: String): ConcurrentHashMap[String, String] =
    stores.computeIfAbsent(name, _ => new ConcurrentHashMap[String, String]())

  /** Free a named server's state. */
  def drop(name: String): Unit = { stores.remove(name); () }

  private val idPattern = """.*?"(?:id|studentUniqueId)":(-?\d+).*""".r

  final class Endpoint(name: String) extends Http.Transport {
    def send(req: Http.Request): Http.Response = req.method match {
      case "POST" =>
        req.body match {
          case idPattern(id) => store(name).put(id, req.body); Http.Response(200, "")
          case _             => Http.Response(400, "no id in payload")
        }
      case "DELETE" =>
        val id = req.path.substring(req.path.lastIndexOf('/') + 1)
        if (store(name).remove(id) == null) Http.Response(404, "")
        else Http.Response(204, "")
      case _ => Http.Response(405, "")
    }
  }

  final class Tokens extends Http.TokenSource {
    def current(): String = "loopback"
    def refresh(): String = "loopback"
  }
}
