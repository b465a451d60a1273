package graft

import graft.functions.WarcCodec
import org.scalatest.funsuite.AnyFunSuite

class WarcCodecSpec extends AnyFunSuite {

  private val rec1 = (Seq("WARC-Type" -> "response",
    "WARC-Target-URI" -> "http://a/1"), "hello".getBytes("UTF-8"))
  private val rec2 = (Seq("WARC-Type" -> "warcinfo"),
    "software: x\r\n".getBytes("UTF-8"))

  test("golden byte layout of one plain record") {
    val got = new String(WarcCodec.encode(Seq(rec1)), "UTF-8")
    assert(got ===
      "WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://a/1\r\nContent-Length: 5\r\n\r\n" +
        "hello\r\n\r\n")
  }

  test("round trip, plain and per-record-gzip-member layouts") {
    for (gz <- Seq(false, true)) {
      val decoded = WarcCodec.decode(
        WarcCodec.encode(Seq(rec1, rec2), gzipPerRecord = gz))
      assert(decoded.size === 2, s"gz=$gz")
      assert(decoded(0).warcType === Some("response"))
      assert(decoded(0).targetUri === Some("http://a/1"))
      assert(new String(decoded(0).payload, "UTF-8") === "hello")
      assert(decoded(1).warcType === Some("warcinfo"))
      assert(new String(decoded(1).payload, "UTF-8") === "software: x\r\n")
    }
  }

  test("header lookup is case-insensitive (crawlers vary casing)") {
    val bytes = ("WARC/1.0\r\nwarc-type: response\r\n" +
      "content-length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val r = WarcCodec.decode(bytes)
    assert(r.size === 1 && r.head.warcType === Some("response"))
  }

  test("binary payloads survive (Content-Length in octets, not chars)") {
    val payload = Array.tabulate(64)(i => (i * 5 - 128).toByte)
    val r = WarcCodec.decode(WarcCodec.encode(
      Seq((Seq("WARC-Type" -> "resource"), payload))))
    assert(r.size === 1 && r.head.payload.toSeq === payload.toSeq)
  }

  test("malformed tails degrade to the well-formed prefix, never throw") {
    val good = WarcCodec.encode(Seq(rec1))
    // truncated second record (header cut mid-line)
    val truncated = good ++ "WARC/1.0\r\nWARC-Type: re".getBytes("UTF-8")
    assert(WarcCodec.decode(truncated).size === 1)
    // Content-Length beyond the remaining bytes
    val overlong = good ++ ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes("UTF-8")
    assert(WarcCodec.decode(overlong).size === 1)
    // junk that is not WARC at all
    assert(WarcCodec.decode("not a warc".getBytes("UTF-8")).isEmpty)
    // corrupt gzip
    assert(WarcCodec.decode(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)).isEmpty)
    assert(WarcCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("gzip-membered archive with a truncated TAIL member keeps the " +
      "intact members' records — the well-formed-prefix contract holds " +
      "for the CommonCrawl layout, not just plain archives") {
    val gz = WarcCodec.encode(Seq(rec1, rec2), gzipPerRecord = true)
    // chop inside the LAST member: the first members inflate fully,
    // then the stream hits EOF mid-member
    val truncated = java.util.Arrays.copyOf(gz, gz.length - 7)
    val r = WarcCodec.decode(truncated)
    assert(r.nonEmpty,
      "intact leading members were discarded with the corrupt tail")
    assert(r.head.warcType === Some("response"))
    assert(new String(r.head.payload, "UTF-8") === "hello")
  }

  test("writer rejects a caller-supplied Content-Length (it computes it)") {
    intercept[IllegalArgumentException] {
      WarcCodec.encode(Seq((Seq("Content-Length" -> "3"), "abc".getBytes)))
    }
  }
}
