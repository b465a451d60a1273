package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** S8 live form — a REAL HTTP [[VectorSink]] speaking the Qdrant REST
  * contract the reference drives through its client library
  * (`qdrant_text_loader.py:202-214`: upsert points, assert
  * `result.status == completed`):
  *
  *  - `PUT  /collections/{name}`              create (vector size+metric)
  *  - `PUT  /collections/{name}/points`       upsert a batch
  *  - `POST /collections/{name}/points/count` exact point count
  *
  * Pure JDK `java.net.http` + the Jackson already on Spark's classpath —
  * no new dependencies. The client is `@transient lazy`: each executor
  * (re)builds its own connection pool after deserialization, one per
  * JVM, reused across batches — the connection amortization the
  * reference's per-call Python loop lacks.
  *
  * Error contract: upserts are sent with `wait=true`, so non-2xx
  * responses and any status other than `completed` THROW (an
  * `acknowledged` reply to a waited upsert means the store ignored
  * the wait — not a durable ack), which marks the batch failed and
  * engages `VectorSink.write`'s retry/backoff; upserts are idempotent
  * per point id, so Spark task retries are safe. Spec-tested end-to-end
  * against an in-process HTTP server (`HttpVectorSinkSpec`) — the same
  * wire contract a live store serves. */
final class HttpVectorSink(baseUrl: String, collection: String,
    timeoutMs: Long = 10000L) extends VectorSink {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def upsertBatch(points: Seq[Point]): Long = {
    val body = HttpVectorSink.pointsJson(points)
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/collections/$collection/points?wait=true"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"upsert HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val status = mapper.readTree(resp.body()).path("result").path("status")
      .asText("")
    // wait=true is on the request, so only 'completed' proves the batch
    // is durably applied — counting 'acknowledged' (queued) as success
    // would reconcile points a crashing store never persisted
    if (status != "completed")
      throw new java.io.IOException(s"upsert status '$status' != completed")
    points.length.toLong
  }
}

object HttpVectorSink {

  private val mapper = new ObjectMapper()

  /** Serialize a point batch to the REST upsert body. Jackson builds the
    * tree, so payload strings escape correctly for ANY content. */
  private[sources] def pointsJson(
      points: Seq[(Long, Seq[Double], String, String, Int)]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("points")
    points.foreach { case (id, vec, content, materia, ano) =>
      val p = arr.addObject()
      p.put("id", id)
      val v = p.putArray("vector")
      vec.foreach(v.add)
      val payload = p.putObject("payload")
      payload.put("page_content", content)
      payload.put("materia", materia)
      payload.put("ano", ano)
    }
    mapper.writeValueAsString(root)
  }

  private def send(client: HttpClient, req: HttpRequest): JsonNode = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    mapper.readTree(resp.body())
  }

  /** `PUT /collections/{name}` — create with vector size + cosine metric
    * (the reference's collection bootstrap). */
  def createCollection(baseUrl: String, name: String, dim: Int,
      distance: String = "Cosine", timeoutMs: Long = 10000L): Unit = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    val body = mapper.createObjectNode()
    val vectors = body.putObject("vectors")
    vectors.put("size", dim)
    vectors.put("distance", distance)
    send(client, HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/collections/$name"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(body)))
      .build())
    ()
  }

  /** `POST /collections/{name}/points/count` → exact count (S10). */
  def countPoints(baseUrl: String, name: String,
      timeoutMs: Long = 10000L): Long = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    val node = send(client, HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/collections/$name/points/count"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString("""{"exact":true}"""))
      .build())
    node.path("result").path("count").asLong(-1L)
  }
}
