package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV / theta-style distinct-value sketches (Bar-Yossef et al. 2002;
  * Dasgupta et al., "Theta Sketch Framework", 2016) — the set-ALGEBRA
  * complement to [[Hll]]: where HLL registers only union, a KMV sketch
  * (the k minimum hash values of a set) supports INTERSECTION and
  * DIFFERENCE estimates too, because the retained hashes below a common
  * threshold θ are a uniform coordinated sample of the underlying set.
  * That is the primitive a 100 TB curation stack needs for questions HLL
  * cannot answer without a rescan: "how many users do segments A and B
  * share", "how many documents are in source X but not source Y" —
  * per-segment sketches persist once (k longs each, a sidecar), every
  * pairwise overlap answers from the sketches alone.
  *
  * Representation: a sketch is the SORTED ascending (unsigned order)
  * array of the k smallest distinct 64-bit hashes seen, serialized
  * little-endian; fewer than k entries means the sketch is EXACT (every
  * distinct hash is present). Hashing is the engine's own mixer
  * ([[Hashing.hash64]], dedicated seed) — deterministic across runs,
  * partitionings, and engines, so estimates are contract values, not
  * run artifacts (the [[Hll]] discipline).
  *
  * Estimators (hashes normalized to U = unsigned(h)/2^64 ∈ [0,1)):
  *  - cardinality: exact count when < k retained, else (k−1)/U(k)
  *    (U(k) = the kth smallest normalized hash); stderr ≈ 1/√(k−2).
  *  - set ops at threshold θ = min over operands of (U(k) if full, 1 if
  *    exact): every retained hash < θ is a uniform coordinated sample
  *    with inclusion probability θ, so |A ∩ B| ≈ |{h ∈ Sa ∩ Sb,
  *    h < θ}|/θ and |A \ B| ≈ |{h ∈ Sa, h ∉ Sb, h < θ}|/θ — the same
  *    coordinated-sample argument as the MinHash-union overlap
  *    estimator ([[graft.functions.Fingerprints]]), but cardinality-
  *    typed rather than Jaccard-typed.
  *
  * Scale shape: the aggregation is map-side combinable (each task
  * reduces its rows into one ≤ k-slot buffer before the exchange), the
  * shuffle carries O(groups × tasks × 8k) bytes however large the
  * corpus, and set algebra runs on collected sketches — group-count
  * sized sidecars, never data. */
object KmvSketch {

  private val Seed = 0x4b_4d_56L // "KMV"

  /** Buffer layout: [0..8) = count n, [8..16) = current max retained
    * hash (valid once n = k), [16 .. 16+8k) = n retained hashes,
    * UNSORTED, distinct, the k smallest (unsigned order) seen so far.
    * All little-endian longs; fixed-size so reduce/merge mutate in
    * place — no per-row allocation. Once the sketch saturates, a row
    * hashing at/above the cached max rejects in O(1) — the dup scan
    * only runs for hashes below θ, i.e. with probability ≈ k/n, so the
    * amortized per-row cost is O(1) however large the group. */
  import SketchBytes.{getL, putL}

  /** Insert hash h into a k-slot buffer: skip when present or not
    * among the k smallest. Shared by the build and merge aggregators. */
  private def insert(buf: Array[Byte], h: Long, k: Int): Unit = {
    val n = getL(buf, 0).toInt
    if (n == k &&
        java.lang.Long.compareUnsigned(h, getL(buf, 8)) >= 0) return
    var maxIdx = -1
    var maxV = 0L
    var i = 0
    while (i < n) {
      val v = getL(buf, 16 + 8 * i)
      if (v == h) return // already retained
      if (maxIdx < 0 || java.lang.Long.compareUnsigned(v, maxV) > 0) {
        maxIdx = i; maxV = v
      }
      i += 1
    }
    if (n < k) {
      putL(buf, 16 + 8 * n, h)
      putL(buf, 0, n + 1L)
      if (n + 1 == k)
        putL(buf, 8,
          if (java.lang.Long.compareUnsigned(h, maxV) > 0 || maxIdx < 0) h
          else maxV)
    } else {
      // h < old max (checked above): replace it, recompute the max
      putL(buf, 16 + 8 * maxIdx, h)
      var newMax = h
      i = 0
      while (i < k) {
        val v = getL(buf, 16 + 8 * i)
        if (java.lang.Long.compareUnsigned(v, newMax) > 0) newMax = v
        i += 1
      }
      putL(buf, 8, newMax)
    }
  }

  /** Compact a reduce buffer to the sorted (unsigned ascending)
    * retained-hash array — the persistable sketch value. */
  private def compact(buf: Array[Byte]): Array[Byte] = {
    val n = getL(buf, 0).toInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = getL(buf, 16 + 8 * i); i += 1 }
    encode(sortUnsigned(hs))
  }

  final class SketchAgg(k: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
    require(k >= 16, "k must be >= 16")
    override def zero: Array[Byte] = new Array[Byte](16 + 8 * k)
    override def reduce(buf: Array[Byte], v: String): Array[Byte] = {
      insert(buf, Hashing.hash64(if (v == null) "" else v, Seed), k)
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val nb = getL(b, 0).toInt
      var i = 0
      while (i < nb) { insert(a, getL(b, 16 + 8 * i), k); i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Array[Byte] = compact(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge aggregator over ALREADY-BUILT sketches (binary column) —
    * the incremental-maintenance primitive ([[Hll.MergeAgg]]'s role):
    * persisted per-segment sketches fold with a new batch's without
    * touching raw history, keeping the k smallest across all inputs. */
  final class MergeAgg(k: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    require(k >= 16, "k must be >= 16")
    private def foldIn(buf: Array[Byte], sketch: Array[Byte]): Array[Byte] = {
      val hs = decode(sketch)
      var i = 0
      while (i < hs.length) { insert(buf, hs(i), k); i += 1 }
      buf
    }
    override def zero: Array[Byte] = new Array[Byte](16 + 8 * k)
    override def reduce(buf: Array[Byte], v: Array[Byte]): Array[Byte] =
      foldIn(buf, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val nb = getL(b, 0).toInt
      var i = 0
      while (i < nb) { insert(a, getL(b, 16 + 8 * i), k); i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Array[Byte] = compact(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private def sortUnsigned(hs: Array[Long]): Array[Long] = {
    // flip the sign bit → unsigned order becomes signed order
    val t = hs.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(t)
    t.map(_ ^ Long.MinValue)
  }

  /** Serialize a retained-hash array back to sketch bytes — the
    * persistence inverse of [[decode]] (e.g. to publish a driver-side
    * [[union]] result back into a sketch table). */
  def encode(hs: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](8 * hs.length)
    var i = 0
    while (i < hs.length) {
      var v = hs(i); var j = 0
      while (j < 8) { out(8 * i + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
      i += 1
    }
    out
  }

  /** Decode a sketch back to its sorted retained-hash array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, "kmv sketch length must be 8n")
    val hs = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < hs.length) {
      var v = 0L; var j = 7
      while (j >= 0) { v = (v << 8) | (bytes(8 * i + j) & 0xffL); j -= 1 }
      hs(i) = v
      i += 1
    }
    hs
  }

  private def toUnit(h: Long): Double =
    // unsigned(h) / 2^64, exact to double precision
    ((h >>> 1).toDouble * 2.0 + (h & 1L)) / 1.8446744073709552e19

  /** Inclusion threshold θ: 1 for an exact (< k entries) sketch, else
    * the kth smallest normalized hash — retained hashes STRICTLY below
    * θ are a uniform sample with inclusion probability θ. */
  def theta(hs: Array[Long], k: Int): Double =
    if (hs.length < k) 1.0 else toUnit(hs(k - 1))

  /** Cardinality estimate: exact below k, else (k−1)/U(k). */
  def estimate(hs: Array[Long], k: Int): Double =
    if (hs.length < k) hs.length.toDouble
    else (k - 1).toDouble / toUnit(hs(k - 1))

  /** Union sketch: merged distinct hashes, k smallest kept — the same
    * sketch building A ∪ B directly would produce (KMV's union law). */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val merged = sortUnsigned((a ++ b).distinct)
    if (merged.length <= k) merged else merged.take(k)
  }

  private def belowTheta(hs: Array[Long], th: Double): Array[Long] =
    hs.filter(h => toUnit(h) < th)

  /** |A ∩ B| estimate: common retained hashes below the joint θ,
    * scaled by 1/θ. Exact when both sketches are exact (θ = 1). */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    belowTheta(a, th).count(bs.contains).toDouble / th
  }

  /** |A \ B| estimate: retained hashes of A below the joint θ that B
    * does not retain, scaled by 1/θ. */
  def differenceEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    belowTheta(a, th).count(h => !bs.contains(h)).toDouble / th
  }

  /** Jaccard estimate from the coordinated sample below the joint θ. */
  def jaccardEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val sa = belowTheta(a, th).toSet
    val sb = belowTheta(b, th).toSet
    val u = (sa ++ sb).size
    if (u == 0) 0.0 else sa.count(sb.contains).toDouble / u
  }

  /** Per-group sketches: (groupCols…, kmv BINARY). Map-side combinable;
    * the shuffle carries one ≤ 8k-byte buffer per task per group. */
  def groupSketches(df: DataFrame, valueCol: Column,
      groupCols: Seq[String], k: Int = 1024): DataFrame = {
    val agg = udaf(new SketchAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(valueCol.cast("string")).as("kmv"))
  }

  /** Pairwise set-algebra audit over per-group sketches (the
    * [[Hll.auditedEstimates]] shape, extended to intersection AND
    * difference): for every unordered group pair (a < b), the sketch
    * estimates of |A ∩ B| and |A \ B| next to the exact counts and
    * tolerance flags. Groups are segment-sized (event types, sources) —
    * the sketch table collects as a sidecar; the EXACT counts exist
    * only because this is the audit that licenses sketch-only reads at
    * scale. Estimates themselves are hash-defined (pinned in
    * KmvSketchSpec); exact counts + flags are the oracle surface. */
  def pairOverlapAudit(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Int = 1024, tol: Double = 0.15, slack: Double = 32.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null groups would NPE the driver pairing — fail loudly; and the
    // driver-side pair order must match the exact-side Spark string
    // '<' (UTF-8 BINARY bytes), not String.compareTo (UTF-16 units) —
    // they diverge for [U+E000,U+FFFF] vs supplementary code points,
    // which would silently mis-join the exact counts
    val checkedG = when(groupCol.isNotNull, groupCol.cast("string"))
      .otherwise(raise_error(
        lit("KmvSketch.pairOverlapAudit: group must not be NULL")))
    val utf8Order = graft.functions.Utf8Order.ordering
    val keyed = df.select(checkedG.as("_g"), valueCol.as("_v"))
    val sketches = groupSketches(keyed, col("_v"), Seq("_g"), k)
    // group-count sized sidecar (segments, not data) — capped so a
    // mistakenly data-grained group column fails loudly before pulling
    // the corpus to the driver (the centroidCosine guard discipline);
    // 1024 groups already mean ~524k output pairs, far past any
    // segment-shaped audit
    val maxGroups = 1024
    val sk = sketches.limit(maxGroups + 1).collect()
      .map(r => r.getString(0) -> decode(r.getAs[Array[Byte]](1)))
      .toMap
    require(sk.size <= maxGroups,
      s"KmvSketch.pairOverlapAudit: over $maxGroups groups — the group " +
        "column looks data-grained, not segment-grained")
    val pairs = sk.keys.toSeq.sorted(utf8Order).combinations(2).map { c =>
      val (ga, gb) = (c(0), c(1))
      val (a, b) = (sk(ga), sk(gb))
      (ga, gb, math.round(intersectEstimate(a, b, k)),
        math.round(differenceEstimate(a, b, k)))
    }.toSeq.toDF("type_a", "type_b", "inter_est", "diff_est")
    val tu = keyed.distinct()
    val sizes = tu.groupBy(col("_g")).agg(count(lit(1)).as("nu"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a._v") === col("b._v") && col("a._g") < col("b._g"))
      .groupBy(col("a._g").as("type_a"), col("b._g").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(inter, Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .join(sizes.select(col("_g").as("type_a"), col("nu").as("na")), "type_a")
      .select(col("type_a"), col("type_b"), col("exact_inter"),
        (col("na") - col("exact_inter")).as("exact_diff"),
        (abs(col("inter_est") - col("exact_inter")).cast("double") <=
          greatest(col("exact_inter") * tol, lit(slack))).as("inter_ok"),
        (abs(col("diff_est") - (col("na") - col("exact_inter"))).cast("double") <=
          greatest((col("na") - col("exact_inter")) * tol, lit(slack))).as("diff_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
