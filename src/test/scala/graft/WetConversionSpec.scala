package graft

import graft.functions.WarcCodec
import graft.operators.WebArchive
import org.apache.spark.sql.functions._

/** WET conversion (WARC-in → conversion-record WARC-out): record
  * selection (response + HTTP 200 + text-family content type only),
  * html-vs-plain strip dispatch, the conversion header shape
  * (WARC-Type, Target-URI carry-over, Refers-To back-pointer,
  * Content-Type: text/plain), record order, and the no-convertible-
  * records drop. The gate query `docs_warc_wet` value-checks the full
  * path (incl. gzip members, chunked bodies) against DuckDB. */
class WetConversionSpec extends SparkSpec {

  import spark.implicits._

  private def http(status: String, ct: String, body: String) =
    (s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n\r\n" + body)
      .getBytes("ISO-8859-1")

  private def resp(id: String, uri: String, payload: Array[Byte]) =
    (Seq("WARC-Type" -> "response", "WARC-Record-ID" -> id,
      "WARC-Target-URI" -> uri), payload)

  test("html strips, plain text passes through, non-200/non-text/" +
      "non-response records drop, order and back-pointers hold") {
    val archive = WarcCodec.encode(Seq(
      (Seq("WARC-Type" -> "warcinfo"), "software: x\r\n".getBytes("UTF-8")),
      resp("<urn:r:0>", "http://h/0",
        http("200 OK", "text/html",
          "<html><body><p>hello &amp; bye</p><script>x()</script></body></html>")),
      resp("<urn:r:1>", "http://h/1",
        http("404 Not Found", "text/html", "<p>gone</p>")),
      resp("<urn:r:2>", "http://h/2",
        http("200 OK", "text/plain; charset=utf-8", "raw  text")),
      resp("<urn:r:3>", "http://h/3",
        http("200 OK", "image/png", "binary")),
      resp("<urn:r:4>", "http://h/4", "not http at all".getBytes("UTF-8"))))
    val wet = WebArchive.wetConversion(
      Seq((7L, archive)).toDF("id", "bytes"), "id", "bytes")
      .collect()
    assert(wet.length === 1 && wet(0).getLong(0) === 7L)
    val recs = WarcCodec.decode(wet(0).getAs[Array[Byte]](1))
    assert(recs.map(_.warcType.get) === Seq("conversion", "conversion"))
    assert(recs.map(_.targetUri.get) === Seq("http://h/0", "http://h/2"))
    assert(recs.map(_.header("WARC-Refers-To").get) ===
      Seq("<urn:r:0>", "<urn:r:2>"))
    assert(recs.map(_.header("Content-Type").get) ===
      Seq("text/plain", "text/plain"))
    assert(new String(recs(0).payload, "UTF-8") === "hello & bye")
    // plain text passes through VERBATIM — no whitespace collapse
    assert(new String(recs(1).payload, "UTF-8") === "raw  text")
  }

  test("archives with no convertible record produce no output row; " +
      "null archives don't throw") {
    val only404 = WarcCodec.encode(Seq(
      resp("<urn:r:9>", "http://h/9", http("404 Not Found", "text/html",
        "<p>x</p>"))))
    val df = Seq((1L, only404), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    assert(WebArchive.wetConversion(df, "id", "bytes").count() === 0L)
  }

  test("warcinfo = true prepends the conventional WET leader record") {
    val archive = WarcCodec.encode(Seq(
      resp("<urn:r:0>", "http://h/0",
        http("200 OK", "text/plain", "t"))))
    val wet = WebArchive.wetConversion(
      Seq((1L, archive)).toDF("id", "bytes"), "id", "bytes",
      warcinfo = true).collect()
    val recs = WarcCodec.decode(wet(0).getAs[Array[Byte]](1))
    assert(recs.map(_.warcType.get) === Seq("warcinfo", "conversion"))
    assert(recs.head.header("Content-Type") ===
      Some("application/warc-fields"))
    assert(new String(recs.head.payload, "UTF-8") ===
      "software: graft-wet\r\n")
    // default stays leaderless — the gate query's contract
    val bare = WebArchive.wetConversion(
      Seq((1L, archive)).toDF("id", "bytes"), "id", "bytes").collect()
    assert(WarcCodec.decode(bare(0).getAs[Array[Byte]](1))
      .map(_.warcType.get) === Seq("conversion"))
  }

  test("WET ↔ records roundtrip battery (VERDICT r11 #5): 64 generated " +
      "plain-text bodies — CRLFs, unicode, entity look-alikes, runs of " +
      "whitespace — survive conversion + re-decode VERBATIM with exact " +
      "content_length and back-pointers") {
    // deterministic splitmix-style generator: adversarial alphabet
    // including CR/LF (WARC's own framing bytes), multi-byte unicode,
    // '&amp;'-shaped sequences the HTML branch would decode (the plain
    // branch must NOT), and double spaces (the strip would collapse)
    val alphabet = Array("a", "B", " ", "  ", "\r\n", "\n", "é", "日",
      "&amp;", "<p>", "</p>", ".", "0", "\t")
    def text(i: Int): String = {
      if (i == 63) return "" // one guaranteed empty body
      var x = i * 0x9E3779B97F4A7C15L + 1
      val n = math.abs(x % 40).toInt + 1
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb ++= alphabet(math.floorMod(x, alphabet.length).toInt)
      }
      sb.result()
    }
    // http() encodes ISO-8859-1; the BODY must carry real UTF-8 bytes
    // (multi-byte unicode is part of what's under test), so the archive
    // is assembled from raw header + body bytes here
    def mk(i: Int): Array[Byte] = {
      val body = text(i).getBytes("UTF-8")
      val head = "HTTP/1.1 200 OK\r\nContent-Type: " +
        "text/plain; charset=utf-8\r\n\r\n"
      WarcCodec.encode(Seq(
        resp(s"<urn:r:$i>", s"http://h/$i",
          head.getBytes("ISO-8859-1") ++ body)),
        gzipPerRecord = i % 2 == 0)
    }
    val df = (0 until 64).map(i => (i.toLong, mk(i))).toDF("id", "bytes")
    val wet = WebArchive.wetConversion(df, "id", "bytes")
    val got = WebArchive.records(wet, "id", "wet")
      .select(col("id"), col("rec_idx"), col("warc_type"),
        col("target_uri"), col("refers_to"), col("content_length"),
        col("payload"))
      .as[(Long, Int, String, String, String, Long, String)]
      .collect().sortBy(_._1)
    assert(got.length === 64)
    for ((id, idx, wt, uri, ref, len, payload) <- got) {
      val i = id.toInt
      assert(idx === 0 && wt === "conversion")
      assert(uri === s"http://h/$i" && ref === s"<urn:r:$i>")
      assert(payload === text(i), s"payload drifted for id $i")
      assert(len === text(i).getBytes("UTF-8").length.toLong,
        s"content_length drifted for id $i")
    }
  }

  test("records() exposes refers_to ('' when absent)") {
    val archive = WarcCodec.encode(Seq(
      (Seq("WARC-Type" -> "conversion", "WARC-Refers-To" -> "<urn:r:0>"),
        "t".getBytes("UTF-8")),
      (Seq("WARC-Type" -> "warcinfo"), "s".getBytes("UTF-8"))))
    val got = WebArchive.records(Seq((1L, archive)).toDF("id", "bytes"),
        "id", "bytes")
      .orderBy(col("rec_idx"))
      .select(col("refers_to")).as[String].collect()
    assert(got === Seq("<urn:r:0>", ""))
  }
}
