package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM AVI (RIFF) container codec — the VIDEO leg of the
  * multimodal column plumbing ([[ImageCodec]]: images, [[WavCodec]]:
  * audio). Written against the public RIFF/AVI layout: `RIFF <size>
  * AVI ` holding a `LIST hdrl` (with the 56-byte `avih` main header:
  * µs/frame, total frames, width, height) and a `LIST movi` whose
  * `..dc`/`..db` chunks carry one compressed/uncompressed frame each
  * (optionally nested in `rec ` LISTs). The container is parsed here;
  * FRAME PAYLOADS are format-agnostic bytes handed to [[ImageCodec]]
  * (JPEG for real MJPG files — the dominant "raw AVI" codec — or
  * PNM/BMP for fixtures), so the frame path reuses the image stack
  * end-to-end.
  *
  * Lenient by contract: malformed/truncated containers yield None or
  * fewer frames, never a throw — a billion-file corpus always contains
  * garbage. */
object AviCodec {

  final case class Info(width: Int, height: Int, usPerFrame: Int,
      declaredFrames: Int, frameChunks: Int)

  private def u32(b: Array[Byte], o: Int): Long = LittleEndian.u32(b, o)
  private def fourcc(b: Array[Byte], o: Int): String =
    LittleEndian.fourcc(b, o)

  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.substring(2) == "dc" || id.substring(2) == "db")

  /** Walk a chunk range, recursing into LISTs, invoking `f` per leaf
    * chunk (id, bodyOffset, bodyLen). Bounded by the byte array AND by a
    * nesting-depth cap: real AVIs nest ≤ 3 deep (RIFF → hdrl/movi →
    * rec ), but a crafted file of nothing-but-LIST headers would
    * otherwise recurse once per 12 bytes — a StackOverflowError, which
    * is an Error the lenient catch-Exception contract would NOT contain. */
  private def walk(b: Array[Byte], from: Int, until: Int,
      f: (String, Int, Int) => Unit, depth: Int = 0): Unit = {
    if (depth > 16) return
    var off = from
    while (off + 8 <= until) {
      val id = fourcc(b, off)
      val len = u32(b, off + 4)
      if (len < 0 || len > Int.MaxValue - 8) return
      val body = off + 8
      val end = math.min(until.toLong, body.toLong + len).toInt
      if (id == "LIST" && body + 4 <= until)
        walk(b, body + 4, end, f, depth + 1)
      else if (body <= until)
        f(id, body, math.max(0, end - body))
      off = body + len.toInt + (len.toInt & 1)
    }
  }

  /** Container metadata: the avih main header + a count of actual frame
    * chunks in `movi` (declared and actual can disagree in the wild). */
  def decodeInfo(bytes: Array[Byte]): Option[Info] = {
    try {
      if (bytes == null || bytes.length < 24) return None
      if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
        return None
      var info: Option[(Int, Int, Int, Int)] = None
      var chunks = 0
      walk(bytes, 12, bytes.length, (id, body, len) => {
        if (id == "avih" && len >= 40 && info.isEmpty) {
          val usPerFrame = u32(bytes, body).toInt
          val total = u32(bytes, body + 16).toInt
          val w = u32(bytes, body + 32).toInt
          val h = u32(bytes, body + 36).toInt
          if (w > 0 && h > 0 && w <= 65536 && h <= 65536)
            info = Some((w, h, usPerFrame, total))
        } else if (isFrameChunk(id)) chunks += 1
      })
      info.map { case (w, h, us, total) => Info(w, h, us, total, chunks) }
    } catch { case _: Exception => None }
  }

  /** Frame payload bytes in container order (the `..dc`/`..db` chunk
    * bodies — JPEG for MJPG, whatever the writer stored otherwise). */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    try {
      if (bytes == null || bytes.length < 24 ||
        fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
        return Seq.empty
      val out = ArrayBuffer.empty[Array[Byte]]
      walk(bytes, 12, bytes.length, (id, body, len) => {
        if (isFrameChunk(id) && len > 0 && out.length < (1 << 20))
          out += java.util.Arrays.copyOfRange(bytes, body, body + len)
      })
      out.toSeq
    } catch { case _: Exception => Seq.empty }
  }

  /** Minimal AVI writer (test-fixture twin of the parser): one video
    * stream, `00dc` chunks holding the given frame payloads verbatim. */
  def encode(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = LittleEndian.w32(out, v)
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      def a32(v: Long): Unit = LittleEndian.w32(b, v)
      a32(usPerFrame.toLong); a32(0L); a32(0L); a32(0L)
      a32(frames.length.toLong); a32(0L); a32(1L); a32(0L)
      a32(width.toLong); a32(height.toLong)
      a32(0L); a32(0L); a32(0L); a32(0L)
      b.toByteArray
    }
    val hdrl = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("hdrl".getBytes("US-ASCII"))
      b.write("avih".getBytes("US-ASCII"))
      LittleEndian.w32(b, avih.length.toLong); b.write(avih)
      if ((avih.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("movi".getBytes("US-ASCII"))
      frames.foreach { f =>
        b.write("00dc".getBytes("US-ASCII"))
        LittleEndian.w32(b, f.length.toLong); b.write(f)
        if ((f.length & 1) == 1) b.write(0)
      }
      b.toByteArray
    }
    val payload = 4L + (8L + hdrl.length) + (8L + movi.length)
    tag("RIFF"); w32(payload); tag("AVI ")
    tag("LIST"); w32(hdrl.length.toLong); out.write(hdrl)
    tag("LIST"); w32(movi.length.toLong); out.write(movi)
    out.toByteArray
  }
}
