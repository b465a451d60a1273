package graft

import graft.functions.TfRecordCodec
import org.scalatest.funsuite.AnyFunSuite

class TfRecordCodecSpec extends AnyFunSuite {

  test("framing matches TensorFlow's golden masked-CRC32C vectors") {
    // crc32c("abc") = 0x364b3fb7 → masked 0x21f1576e;
    // crc32c(LE64 length 3) = 0x576c35e3 → masked 0x0e4999b0
    // (vectors computed independently from the CRC32C polynomial +
    // the rotr15 + 0xa282ead8 mask definition)
    val shard = TfRecordCodec.encodeRecords(Seq("abc".getBytes("UTF-8")))
    assert(shard.length === 8 + 4 + 3 + 4)
    def le32(off: Int): Int =
      java.nio.ByteBuffer.wrap(shard, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(le32(8) === 0x0e4999b0, "length crc")
    assert(le32(15) === 0x21f1576e, "data crc")
    assert(shard(0) === 3.toByte && shard(7) === 0.toByte, "LE64 length")
  }

  test("record round trip, multi-record shards") {
    val payloads = Seq("".getBytes, "one".getBytes,
      Array.tabulate(300)(i => (i % 251).toByte))
    val got = TfRecordCodec.decodeRecords(
      TfRecordCodec.encodeRecords(payloads))
    assert(got.size === 3)
    got.zip(payloads).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("corrupt frames end the read with the verified prefix") {
    val shard = TfRecordCodec.encodeRecords(
      Seq("first".getBytes, "second".getBytes))
    // flip one payload byte of the second record
    val corrupt = shard.clone()
    corrupt(shard.length - 6) = (corrupt(shard.length - 6) ^ 0x1).toByte
    val got = TfRecordCodec.decodeRecords(corrupt)
    assert(got.size === 1 && new String(got.head, "UTF-8") === "first")
    // truncated tail
    assert(TfRecordCodec.decodeRecords(shard.dropRight(3)).size === 1)
    assert(TfRecordCodec.decodeRecords(Array.emptyByteArray).isEmpty)
  }

  test("Example round trip: bytes + packed int64 features, varints " +
      "crossing the 7-bit boundaries") {
    val ids = Array(0L, 1L, 127L, 128L, 300L, 1L << 40, Long.MaxValue)
    val ex = TfRecordCodec.encodeExample(
      Seq("text" -> "héllo".getBytes("UTF-8")),
      Seq("tokens" -> ids))
    val (bs, is) = TfRecordCodec.decodeExample(ex)
    assert(new String(bs("text"), "UTF-8") === "héllo")
    assert(is("tokens").toSeq === ids.toSeq)
  }

  test("reader skips unknown feature kinds and fields (float lists " +
      "from other writers decode to the known features only)") {
    // hand-built Feature with field 2 (FloatList, fixed32 floats) —
    // feature {1: key, 2: Feature{2: FloatList{1: fixed32}}}
    val floatFeat = Array[Byte](
      0x12, 0x06, // Feature field 2 (FloatList), len 6
      0x0d, 0x00, 0x00, 0x00, 0x3f, // fixed32 field 1 = 0.5f
      0x00)
    val entry = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x0a, 0x01, 'f'.toByte)) // key "f"
      out.write(Array[Byte](0x12, floatFeat.length.toByte))
      out.write(floatFeat)
      out.toByteArray
    }
    val features = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x0a, entry.length.toByte))
      out.write(entry)
      out.toByteArray
    }
    val example = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x0a, features.length.toByte))
      out.write(features)
      out.toByteArray
    }
    val (bs, is) = TfRecordCodec.decodeExample(example)
    assert(bs.isEmpty && is.isEmpty) // nothing known, nothing thrown
    // and garbage degrades silently
    assert(TfRecordCodec.decodeExample("junk".getBytes) === (Map.empty, Map.empty))
  }
}
