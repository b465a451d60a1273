package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** T15 live form — a REAL HTTP [[Embedder]] speaking the
  * OpenAI-compatible embeddings REST contract (the de-facto wire format
  * local inference servers also serve):
  *
  *   POST {base}/embeddings  {"model": m, "input": [texts…]}
  *   →  {"data":[{"index":0,"embedding":[…]}, …]}
  *
  * One request per BATCH (never per row — the scale fix over the
  * reference's per-chunk call loop, `qdrant_text_loader.py:58-64`), JDK
  * `java.net.http` + Spark's bundled Jackson, `@transient lazy` client
  * per executor JVM. Responses are re-ordered by their `index` field
  * before returning, so the output honors Embedder's in-order contract
  * even if the server reorders. Non-2xx throws → the caller's per-batch
  * retry/backoff engages. Spec-tested against an in-process HTTP server
  * (`HttpVectorSinkSpec`). */
final class HttpEmbedder(baseUrl: String, model: String,
    override val dim: Int, timeoutMs: Long = 30000L) extends Embedder {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/embeddings"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(root)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"embeddings HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val data = mapper.readTree(resp.body()).path("data")
    require(data.isArray && data.size() == texts.length,
      s"embeddings returned ${data.size()} vectors for ${texts.length} texts")
    val out = new Array[Array[Double]](texts.length)
    data.forEach { item =>
      val idx = item.path("index").asInt(-1)
      require(idx >= 0 && idx < texts.length && out(idx) == null,
        s"bad or duplicate index $idx in embeddings response")
      val emb = item.path("embedding")
      val v = new Array[Double](emb.size())
      var i = 0
      while (i < v.length) { v(i) = emb.get(i).asDouble(); i += 1 }
      out(idx) = v
    }
    out.toSeq
  }
}
