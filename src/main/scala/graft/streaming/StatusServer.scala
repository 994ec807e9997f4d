package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Thin HTTP observability endpoint (reference: lib/HttpServer.js —
  * Express endpoints serving config/stats/discovery state). Serves the
  * engine's counters and discovery state as JSON from the driver using
  * the JDK's built-in HttpServer (no extra dependencies).
  *
  * Endpoints: GET /status (counters), GET /topics (discovered topics),
  * GET /dsl (active DSL), anything else -> 404.
  */
class StatusServer(
    counters: Counters,
    discovery: Option[Discovery] = None,
    port: Int = 0, // 0 = ephemeral
) {

  private var server: Option[HttpServer] = None

  /** JSON string escape (same rules as Verify's oracle dump): quote,
    * backslash, and control chars — topic/path names come from
    * untrusted payloads and must not break the JSON.
    */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def start(): Int = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/status", handler(() => jsonObject(
      counters.snapshot.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: $v" })))
    s.createContext("/topics", handler(() => jsonArray(
      discovery.map(_.topics.toSeq.sorted).getOrElse(Nil).map(q))))
    s.createContext("/dsl", handler(() => jsonObject(
      discovery.map(_.dsl.topics).getOrElse(Nil).map { tc =>
        s"${q(tc.topic)}: ${jsonObject(tc.fields.map(f =>
          s"${q(f.path)}: [${f.windows.mkString(",")}]"))}"
      })))
    s.setExecutor(null)
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = { server.foreach(_.stop(0)); server = None }

  private def jsonObject(fields: Seq[String]): String = fields.mkString("{", ", ", "}")
  private def jsonArray(items: Seq[String]): String = items.mkString("[", ", ", "]")

  private def handler(body: () => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (code, payload) =
        if (ex.getRequestMethod == "GET") (200, body())
        else (405, """{"error": "method not allowed"}""")
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }
}
