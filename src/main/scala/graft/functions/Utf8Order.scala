package graft.functions

/** Driver-side String ordering matching Spark's BINARY string compare
  * (UTF-8 bytes, unsigned, then length) — NOT `String.compareTo`, which
  * compares UTF-16 code units and diverges for [U+E000, U+FFFF] vs
  * supplementary code points. Every sidecar that orders segment/group
  * names on the driver and then joins (or is compared) against a
  * Spark/DuckDB `<` on the same strings must sort with THIS ordering,
  * or pair orientation silently flips for exotic code points
  * (KmvSketch.pairOverlapAudit r9 adjudication; Drift.centroidCosine
  * had the same latent divergence). */
object Utf8Order {
  val ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    var d = 0
    while (d == 0 && i < x.length && i < y.length) {
      d = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (d != 0) d else x.length - y.length
  }
}
