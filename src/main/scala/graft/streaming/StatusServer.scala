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

  def start(): Int = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/status", handler(() => jsonObject(
      counters.snapshot.toSeq.sortBy(_._1).map { case (k, v) => s""""$k": $v""" })))
    s.createContext("/topics", handler(() => jsonArray(
      discovery.map(_.topics.toSeq.sorted).getOrElse(Nil).map(t => s""""$t""""))))
    s.createContext("/dsl", handler(() => jsonObject(
      discovery.map(_.dsl.topics).getOrElse(Nil).map { tc =>
        s""""${tc.topic}": ${jsonObject(tc.fields.map(f =>
          s""""${f.path}": [${f.windows.mkString(",")}]"""))}"""
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
