package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.core.Dsl

class StatusServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("serves counters, topics, and dsl as JSON (S7)") {
    val counters = new Counters(spark)
    counters.analysedMessages.add(7)
    val disc = new Discovery(spark, Dsl.parse(Map("t" -> Map("a.b" -> Seq("15m")))))
    disc.discoverTopics(() => Seq("t", "u"))
    val srv = new StatusServer(counters, Some(disc))
    val port = srv.start()
    try {
      val (c1, status) = get(port, "/status")
      assert(c1 == 200 && status.contains("\"analysedMessages\": 7"))
      val (c2, topics) = get(port, "/topics")
      assert(c2 == 200 && topics == "[\"t\", \"u\"]")
      val (c3, dsl) = get(port, "/dsl")
      assert(c3 == 200 && dsl.contains("\"a.b\": [900]"))
      // non-GET rejected
      val client = HttpClient.newHttpClient()
      val post = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/status"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 405)
    } finally srv.stop()
  }
}
