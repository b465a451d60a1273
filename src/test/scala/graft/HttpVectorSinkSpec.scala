package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.etl.{Embedder, HttpEmbedder}
import graft.sources.{HttpVectorSink, VectorSink}

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** End-to-end tests of the LIVE HTTP clients against an in-process server
  * speaking the same REST wire contract a real store/embedding service
  * serves (Qdrant-style collections/points, OpenAI-style /embeddings).
  * Localhost only — no egress; executors in local mode reach the server
  * like cluster executors reach a service endpoint. */
class HttpVectorSinkSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Fake store: collections + points in memory; optionally fails the
    * first `failFirst` upserts with 503 to exercise retry. */
  private class FakeStore(failFirst: Int = 0) {
    val points = new ConcurrentHashMap[Long, String]()
    val collections = new ConcurrentHashMap[String, Int]()
    private val failures = new AtomicInteger(0)
    val upsertCalls = new AtomicInteger(0)

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }

    val server: HttpServer = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      try {
        if (path.matches("/collections/[^/]+/points") &&
            ex.getRequestMethod == "PUT") {
          upsertCalls.incrementAndGet()
          if (failures.getAndIncrement() < failFirst)
            respond(ex, 503, """{"status":"error"}""")
          else {
            val pts = mapper.readTree(body).path("points")
            pts.forEach { p =>
              points.put(p.path("id").asLong(), p.toString)
            }
            respond(ex, 200,
              """{"result":{"operation_id":1,"status":"completed"},"status":"ok"}""")
          }
        } else if (path.matches("/collections/[^/]+/points/count")) {
          respond(ex, 200,
            s"""{"result":{"count":${points.size()}},"status":"ok"}""")
        } else if (path.matches("/collections/[^/]+") &&
            ex.getRequestMethod == "PUT") {
          val dim = mapper.readTree(body).path("vectors").path("size").asInt()
          collections.put(path.substring("/collections/".length), dim)
          respond(ex, 200, """{"result":true,"status":"ok"}""")
        } else respond(ex, 404, """{"status":"not found"}""")
      } catch {
        case e: Exception => respond(ex, 500, s"""{"err":"${e.getMessage}"}""")
      }
    })
    server.start()
    def baseUrl: String =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("HttpVectorSink: create, distributed upsert, count — full " +
      "round-trip against the wire contract") {
    val store = new FakeStore()
    try {
      import spark.implicits._
      HttpVectorSink.createCollection(store.baseUrl, "enem", dim = 4)
      assert(store.collections.get("enem") === 4)

      val points = (0L until 57L).map(i =>
        (i, Seq(i * 1.0, 0.5, -1.0, 2.0), s"content $i \"quoted\"", "math",
          2023)).toDF("id", "vector", "page_content", "materia", "ano")
      val (attempted, acked) = VectorSink.write(
        points.repartition(4), new HttpVectorSink(store.baseUrl, "enem"),
        batchSize = 10)
      assert(attempted === 57L)
      assert(acked === 57L)
      assert(HttpVectorSink.countPoints(store.baseUrl, "enem") === 57L)
      // payload survived JSON round-trip, escapes intact
      val p3 = mapper.readTree(store.points.get(3L))
      assert(p3.path("payload").path("page_content").asText()
        === "content 3 \"quoted\"")
      assert(p3.path("vector").get(0).asDouble() === 3.0)
    } finally store.stop()
  }

  test("HttpVectorSink: 503s engage the batch retry and the write " +
      "still completes") {
    val store = new FakeStore(failFirst = 2)
    try {
      import spark.implicits._
      val points = (0L until 20L).map(i =>
        (i, Seq(1.0, 2.0), s"c$i", "m", 1)).toDF(
        "id", "vector", "page_content", "materia", "ano")
      val (attempted, acked) = VectorSink.write(
        points.coalesce(1), new HttpVectorSink(store.baseUrl, "enem"),
        batchSize = 20, maxRetries = 3, backoffMs = 10L)
      assert((attempted, acked) === ((20L, 20L)))
      assert(store.points.size() === 20)
      assert(store.upsertCalls.get() === 3) // 2 failures + 1 success
    } finally store.stop()
  }

  test("HttpEmbedder: batched embedding calls, order restored from " +
      "response indices") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/embeddings", (ex: HttpExchange) => {
      calls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val in = mapper.readTree(body).path("input")
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      // respond in REVERSED order to prove index-based reassembly
      for (i <- (in.size() - 1) to 0 by -1) {
        val item = data.addObject()
        item.put("index", i)
        val e = item.putArray("embedding")
        val len = in.get(i).asText().length.toDouble
        e.add(len); e.add(-len)
      }
      val b = mapper.writeValueAsString(root).getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      import spark.implicits._
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val docs = Seq((1L, "a"), (2L, "bb"), (3L, "ccc"), (4L, "dddd"),
        (5L, "eeeee")).toDF("id", "text")
      val out = Embedder.embedColumn(docs.coalesce(1), "text",
          new HttpEmbedder(base, "test-model", dim = 2), batchSize = 3)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](2)))
        .sortBy(_._1)
      assert(out.map(_._2.head) === Array(1.0, 2.0, 3.0, 4.0, 5.0))
      assert(out.map(_._2(1)) === Array(-1.0, -2.0, -3.0, -4.0, -5.0))
      assert(calls.get() === 2) // 5 rows / batchSize 3 → 2 HTTP calls
    } finally server.stop(0)
  }
}
