package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** Pure-JVM TFRecord shard writer/reader + a minimal `tf.train.Example`
  * protobuf codec — the output leg of a training-data pipeline: packed
  * token sequences and text leave the engine as TFRecord shards any
  * TF/JAX/PyTorch loader consumes.
  *
  * Framing (TensorFlow's record format):
  * {{{
  * uint64  length        (little-endian)
  * uint32  masked_crc32c(length bytes)
  * byte    data[length]
  * uint32  masked_crc32c(data)
  * }}}
  * with masked_crc = rotr15(crc32c) + 0xa282ead8 (mod 2³²) — the mask
  * exists so a CRC over data that happens to contain CRCs still
  * detects corruption.
  *
  * The Example codec covers the two feature kinds a text pipeline
  * emits — bytes_list (text, serialized blobs) and packed int64_list
  * (token ids) — with deterministic field order (features serialize in
  * the order given, so shards replay byte-identically). The reader is
  * a minimal wire-format parser that SKIPS unknown fields, so Examples
  * written with float_lists by other tools still decode their
  * bytes/int64 features here.
  *
  * Degradation contract ([[WavCodec]] discipline): a corrupt frame
  * (bad CRC, truncated tail) ends the read and returns the verified
  * prefix — a 100 TB shard scan cannot abort on one bad record. */
object TfRecordCodec {

  private def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** rotr15(crc) + 0xa282ead8 — TensorFlow's CRC mask. */
  def maskedCrc(bytes: Array[Byte], off: Int = 0, len: Int = -1): Int = {
    val n = if (len < 0) bytes.length - off else len
    val crc = crc32c(bytes, off, n)
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8) // Int arithmetic wraps mod 2³²
  }

  /** Frame payloads into one TFRecord shard. */
  def encodeRecords(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    payloads.foreach { p =>
      val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(p.length.toLong).array()
      out.write(lenBytes)
      out.write(intLe(maskedCrc(lenBytes)))
      out.write(p)
      out.write(intLe(maskedCrc(p)))
    }
    out.toByteArray
  }

  /** CRC-verified payloads; stops at the first corrupt or truncated
    * frame and returns the verified prefix. */
  def decodeRecords(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var ok = true
    while (ok && pos + 12 <= bytes.length) {
      val bb = ByteBuffer.wrap(bytes, pos, 12).order(ByteOrder.LITTLE_ENDIAN)
      val len = bb.getLong
      val lenCrc = bb.getInt
      if (len < 0 || len > bytes.length - pos - 16 ||
          lenCrc != maskedCrc(bytes, pos, 8)) ok = false
      else {
        val dataOff = pos + 12
        val dataCrc = ByteBuffer.wrap(bytes, dataOff + len.toInt, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        if (dataCrc != maskedCrc(bytes, dataOff, len.toInt)) ok = false
        else {
          out += java.util.Arrays.copyOfRange(bytes, dataOff,
            dataOff + len.toInt)
          pos = dataOff + len.toInt + 4
        }
      }
    }
    out.result()
  }

  // ── minimal tf.train.Example protobuf wire codec ─────────────────────
  // Example{1: Features}; Features{1: repeated map entry{1: key,
  // 2: Feature}}; Feature{1: BytesList{1: repeated bytes},
  // 3: Int64List{1: packed varint}}

  private def intLe(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  private def lenDelim(out: ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    varint(out, (field << 3) | 2)
    varint(out, body.length.toLong)
    out.write(body)
  }

  /** Serialize one Example with bytes features then int64 features, in
    * the order given (deterministic shards). */
  def encodeExample(bytesFeats: Seq[(String, Array[Byte])],
      intFeats: Seq[(String, Array[Long])]): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    def entry(name: String, feature: Array[Byte]): Unit = {
      val e = new ByteArrayOutputStream()
      lenDelim(e, 1, name.getBytes("UTF-8"))
      lenDelim(e, 2, feature)
      lenDelim(features, 1, e.toByteArray)
    }
    bytesFeats.foreach { case (name, v) =>
      val bl = new ByteArrayOutputStream()
      lenDelim(bl, 1, v)
      val f = new ByteArrayOutputStream()
      lenDelim(f, 1, bl.toByteArray)
      entry(name, f.toByteArray)
    }
    intFeats.foreach { case (name, vs) =>
      val packed = new ByteArrayOutputStream()
      vs.foreach(varint(packed, _))
      val il = new ByteArrayOutputStream()
      lenDelim(il, 1, packed.toByteArray)
      val f = new ByteArrayOutputStream()
      lenDelim(f, 3, il.toByteArray)
      entry(name, f.toByteArray)
    }
    val ex = new ByteArrayOutputStream()
    lenDelim(ex, 1, features.toByteArray)
    ex.toByteArray
  }

  /** Parse an Example's bytes + int64 features (unknown fields and
    * kinds are skipped; int64 lists accept packed AND unpacked
    * encodings). Malformed input → empty maps, never a throw.
    *
    * Single-value contract for BytesList: the return type holds ONE
    * byte payload per feature (what [[encodeExample]] writes — the
    * training-record shape this pipeline produces). A foreign Example
    * carrying a multi-value BytesList decodes to its LAST value; use
    * this codec for round-trips of its own records, not as a general
    * tf.train.Example reader. Int64List keeps every value (the model
    * type is an array). */
  def decodeExample(bytes: Array[Byte])
      : (Map[String, Array[Byte]], Map[String, Array[Long]]) = {
    try {
      val bm = Map.newBuilder[String, Array[Byte]]
      val im = Map.newBuilder[String, Array[Long]]
      fields(bytes).foreach {
        case (1, featuresBody) => // Features
          fields(featuresBody).foreach {
            case (1, entry) => // map entry
              var name = ""
              var feat = Array.emptyByteArray
              fields(entry).foreach {
                case (1, k) => name = new String(k, "UTF-8")
                case (2, f) => feat = f
                case _ => ()
              }
              fields(feat).foreach {
                case (1, bl) => // BytesList
                  fields(bl).foreach {
                    case (1, v) => bm += name -> v
                    case _ => ()
                  }
                case (3, il) => // Int64List
                  val vs = Array.newBuilder[Long]
                  fields(il).foreach {
                    case (1, packed) =>
                      var p = 0
                      while (p < packed.length) {
                        val (v, np) = readVarint(packed, p)
                        vs += v; p = np
                      }
                    case _ => ()
                  }
                  im += name -> vs.result()
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      (bm.result(), im.result())
    } catch { case _: Exception => (Map.empty, Map.empty) }
  }

  /** Top-level wire fields of a message: (fieldNumber, body) for
    * length-delimited fields; varint fields are re-encoded as a minimal
    * varint buffer so int64 lists written UNPACKED parse through the
    * same packed-list reader. */
  private def fields(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = readVarint(bytes, pos)
      val field = (tag >>> 3).toInt
      (tag & 7) match {
        case 2 => // length-delimited
          val (len, p2) = readVarint(bytes, p1)
          if (len < 0 || p2 + len > bytes.length)
            throw new IllegalArgumentException("truncated field")
          out += field -> java.util.Arrays.copyOfRange(bytes, p2,
            p2 + len.toInt)
          pos = p2 + len.toInt
        case 0 => // varint (unpacked int64 list element)
          val (v, p2) = readVarint(bytes, p1)
          val b = new ByteArrayOutputStream()
          varint(b, v)
          out += field -> b.toByteArray
          pos = p2
        case 5 => // fixed32 (float) — skip
          pos = p1 + 4
        case 1 => // fixed64 — skip
          pos = p1 + 8
        case _ => throw new IllegalArgumentException("unsupported wire type")
      }
    }
    out.result()
  }

  private def readVarint(bytes: Array[Byte], from: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var pos = from
    while (pos < bytes.length) {
      val b = bytes(pos)
      v |= (b & 0x7fL) << shift
      pos += 1
      if ((b & 0x80) == 0) return (v, pos)
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint overflow")
    }
    throw new IllegalArgumentException("truncated varint")
  }
}
