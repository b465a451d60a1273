package graft.functions

/** Shared little-endian integer readers for the RIFF-family codecs
  * (AVI, WAV) and BMP — ONE copy so width/sign handling cannot drift
  * between codecs (the [[ByteSearch]] rationale). Two 32-bit forms on
  * purpose: `u32` is UNSIGNED (Long) for RIFF chunk sizes, which are
  * unsigned on the wire; `i32` is SIGNED (Int) for BMP header fields,
  * where a negative height legitimately means a top-down raster. */
private[graft] object LittleEndian {

  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  // writer twins (the codecs' encode fixtures) — same one-copy rule
  def w16(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  def w32(out: java.io.OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
}
