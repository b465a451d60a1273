package graft.functions

/** Naive byte-subsequence search shared by the binary parsers
  * ([[HttpMessage]]'s header/body split, [[PdfCodec]]'s token scan) —
  * one copy so the boundary semantics cannot drift between codecs. */
private[functions] object ByteSearch {

  def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = if (from < 0) 0 else from
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
