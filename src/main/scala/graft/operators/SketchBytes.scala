package graft.operators

/** Little-endian long packing shared by the byte-buffer sketch
  * aggregators ([[KmvSketch]], [[QuantileSketch]]) — one copy of the
  * wire-format primitives so the two serializations cannot silently
  * diverge under a future fix. */
private[operators] object SketchBytes {

  def getL(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  def putL(b: Array[Byte], off: Int, v0: Long): Unit = {
    var v = v0; var i = 0
    while (i < 8) { b(off + i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
  }
}
