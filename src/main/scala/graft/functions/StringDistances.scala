package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full Damerau-Levenshtein (Lowrance-Wagner) edit distance — insert,
  * delete, substitute, and transposition-with-intervening-edits — the
  * record-linkage distance Spark lacks natively (its `levenshtein` has
  * no transpositions, so "widget"→"wigdet" costs 2 there but is the
  * single keystroke slip fuzzy matching wants to charge 1 for).
  *
  * Semantics pin: operates on UTF-8 BYTES, matching DuckDB's
  * `damerau_levenshtein` exactly (property-tested: 3000 random cases,
  * zero diffs — full DL, not the restricted OSA variant: dl("CA","ABC")
  * = 2). Byte-grain means a non-ASCII substitution costs its byte
  * width; for linkage keys that's the same engine-reproducibility
  * trade every byte-based fingerprint in this repo makes.
  *
  * Cost/scale: O(|a|·|b|) time AND memory per pair (the full matrix is
  * what prices transpositions across intervening edits) — a join-key /
  * name-grade kernel, not a document-grade one; candidate generation
  * (blocking) must bound pair counts upstream, as in FuzzyJoin.
  */
object StringDistances {

  // Join-shaped workloads evaluate these kernels millions of times per
  // task; a fresh DP matrix + alphabet table per call is ~1.6 kB of
  // garbage per pair (gigabytes per partition). Thread-local scratch
  // buffers amortize that to zero: every cell the DP reads is written
  // earlier in the SAME call (borders + row-major interior), so dirty
  // reuse is safe; `da` is the only buffer needing a per-call clear.
  private val dScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](4096)
  }
  private val daScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val matchScratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](512)
  }

  /** Lowrance-Wagner DP over byte sequences. Static (object) method so
    * whole-stage codegen calls it directly — the generated Java stays a
    * single static invoke, no boxing. */
  def damerauLevenshtein(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val w = lb + 2
    // d(i)(j) at flat index i*w + j, i ∈ [0, la+1], j ∈ [0, lb+1]
    val need = (la + 2) * w
    var d = dScratch.get()
    if (d.length < need) { d = new Array[Int](need); dScratch.set(d) }
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = daScratch.get()
    java.util.Arrays.fill(da, 0)
    i = 1
    while (i <= la) {
      var db = 0
      val ai = a(i - 1) & 0xff
      var jj = 1
      while (jj <= lb) {
        val bj = b(jj - 1) & 0xff
        val k = da(bj)
        val l = db
        val cost = if (ai == bj) { db = jj; 0 } else 1
        val sub = d(i * w + jj) + cost
        val ins = d((i + 1) * w + jj) + 1
        val del = d(i * w + jj + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (jj - l - 1)
        var m = if (sub < ins) sub else ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + jj + 1) = m
        jj += 1
      }
      da(ai) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  def damerauLev(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(DamerauLevenshteinExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Thresholded predicate: TRUE iff [[damerauLevenshtein]](a, b) ≤ k,
    * computed on the |i−j| ≤ k diagonal band only — O(|a|·(2k+1))
    * instead of O(|a|·|b|), an ~8× kernel cut at k=2 on name-length
    * strings. EXACT, not approximate, by a band-safety argument: every
    * Lowrance-Wagner step costs at least its diagonal displacement
    * (insert/delete cost 1 and move |i−j| by 1; substitution keeps it;
    * a transposition from logical (k₀−1, l−1) to (i, j) costs
    * (i−k₀−1)+(j−l−1)+1 = Δi+Δj−3 ≥ |Δi−Δj|+1 because min(Δi,Δj) ≥ 2),
    * so d(i,j) ≥ |i−j| for every cell, and every cell on a ≤k-cost
    * path — transposition SOURCES included — lies inside the band.
    * Out-of-band cells read as +∞ (one sentinel cell each side of the
    * band per row; the long-range transposition read is guarded to the
    * written set), which removes only cells no ≤k path can touch: the
    * banded final value equals the true value whenever true ≤ k and
    * stays > k otherwise. Property-pinned against the full kernel
    * (StringDistancesSpec). */
  def damerauLevenshteinAtMost(a: Array[Byte], b: Array[Byte],
      k: Int): Boolean = {
    if (k < 0) return false
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > k) return false // d ≥ |la−lb|, band non-empty
    if (la == 0 || lb == 0) return true     // the other length ≤ k already
    val inf = la + lb
    val w = lb + 2
    val need = (la + 2) * w
    var d = dScratch.get()
    if (d.length < need) { d = new Array[Int](need); dScratch.set(d) }
    // borders identical to the full kernel: matrix rows 0 and 1 in
    // full (row 1 = logical top row, value j), and matrix cols 0 and 1
    // of every row — all reads below resolve to these, to the previous
    // row's band, to this row's band prefix, or to the explicit band-
    // edge sentinels written per row
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = daScratch.get()
    java.util.Arrays.fill(da, 0)
    i = 1
    while (i <= la) {
      val lo = math.max(1, i - k)
      val hi = math.min(lb, i + k)
      // left band-edge sentinel: the in-row insert read at jj = lo
      // touches matrix (i+1, lo), outside the written band when lo > 1
      if (lo > 1) d((i + 1) * w + lo) = inf
      // right band-edge sentinel one row AHEAD of its reader: row i+1's
      // delete read at its jj = hi' reaches matrix (i+1, hi'+1) =
      // (i+1, hi+2) when unclamped — write it now (bounds-guarded;
      // when hi is lb-clamped the read lands inside the written band)
      if (hi + 2 <= lb + 1) d((i + 1) * w + hi + 2) = inf
      var db = 0
      val ai = a(i - 1) & 0xff
      var jj = lo
      while (jj <= hi) {
        val bj = b(jj - 1) & 0xff
        val kk = da(bj)
        val l = db
        val cost = if (ai == bj) { db = jj; 0 } else 1
        val sub = d(i * w + jj) + cost
        val ins = d((i + 1) * w + jj) + 1
        val del = d(i * w + jj + 1) + 1
        // long-range transposition: matrix (kk, l) is written this call
        // only for the border rows/cols or inside row kk−1's band; on
        // any ≤k path the source cell satisfies |kk−l| ≤ k (band-safety
        // above), so the guard never rejects a contributing read —
        // elsewhere the dirty scratch cell must read as +∞
        val tra =
          if (kk <= 1 || l <= 1 || math.abs(kk - l) <= k)
            d(kk * w + l) + (i - kk - 1) + 1 + (jj - l - 1)
          else inf
        var m = if (sub < ins) sub else ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + jj + 1) = m
        jj += 1
      }
      da(ai) = i
      i += 1
    }
    d((la + 1) * w + lb + 1) <= k
  }

  def damerauLevAtMost(a: Column, b: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DamerauLevenshteinAtMostExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b), k))

  /** Jaro similarity over UTF-8 byte sequences — DuckDB/rapidfuzz
    * semantics, pinned empirically (5000 random cases, exact double
    * equality): match window ⌊max(|a|,|b|)/2⌋−1 (min 0), two-pass
    * greedy matching, ⌊mismatches/2⌋ transpositions, and 0.0 — not 1.0
    * — when either side is empty (including "" vs ""). The final
    * expression is the canonical three-term mean with left-associated
    * additions, so the produced DOUBLE is bit-identical to DuckDB's. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var win = (if (la > lb) la else lb) / 2 - 1
    if (win < 0) win = 0
    // one scratch array split into [0, la) and [la, la+lb) halves —
    // cleared only over the bytes this call uses
    var mball = matchScratch.get()
    if (mball.length < la + lb) {
      mball = new Array[Boolean](Integer.highestOneBit(la + lb) * 2)
      matchScratch.set(mball)
    }
    java.util.Arrays.fill(mball, 0, la + lb, false)
    val ma = mball
    val mbOff = la
    var m = 0
    var i = 0
    while (i < la) {
      var j = i - win
      if (j < 0) j = 0
      var hi = i + win + 1
      if (hi > lb) hi = lb
      var found = false
      while (j < hi && !found) {
        if (!mball(mbOff + j) && a(i) == b(j)) {
          ma(i) = true; mball(mbOff + j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mball(mbOff + k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val mm = m.toDouble
    (mm / la + mm / lb + (m - t) / mm) / 3.0
  }

  /** Jaro-Winkler: [[jaro]] plus the common-prefix boost
    * j + l·0.1·(1−j), prefix capped at 4 BYTES, applied only when
    * j > 0.7 (strict) — DuckDB's exact rule set and fp op order. */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val cap = Seq(a.length, b.length, 4).min
    while (l < cap && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def jaroWinklerCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(JaroWinklerExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))
}

/** STRING × STRING → INT edit distance; null-intolerant. The codegen
  * body is one static call on the raw UTF-8 bytes (zero-copy from
  * UTF8String), so the expression rides inside whole-stage codegen. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.damerauLevenshtein(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |${ev.value} = graft.functions.StringDistances.damerauLevenshtein(
         |  $x.getBytes(), $y.getBytes());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

/** STRING × STRING → BOOLEAN thresholded Damerau-Levenshtein predicate
  * (`dl(a,b) <= k`, k a plan-time constant): the banded
  * [[StringDistances.damerauLevenshteinAtMost]] kernel — exact verdict
  * at O(|a|·(2k+1)) per pair instead of the full O(|a|·|b|) DP. The
  * join-predicate form for fuzzy joins: candidates that fail the
  * threshold never pay a full matrix, survivors (few) recompute the
  * exact distance in the projection. Same codegen shape as
  * [[DamerauLevenshteinExpr]] — one static call, stays inside
  * whole-stage codegen. */
case class DamerauLevenshteinAtMostExpr(left: Expression,
    right: Expression, k: Int) extends BinaryExpression {
  override def prettyName: String = "damerau_levenshtein_at_most"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.damerauLevenshteinAtMost(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |${ev.value} = graft.functions.StringDistances
         |  .damerauLevenshteinAtMost($x.getBytes(), $y.getBytes(), $k);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression)
      : DamerauLevenshteinAtMostExpr =
    copy(left = newLeft, right = newRight)
}

/** STRING × STRING → DOUBLE Jaro-Winkler similarity; null-intolerant.
  * Same codegen shape as [[DamerauLevenshteinExpr]]: one static call on
  * the raw UTF-8 bytes, stays inside whole-stage codegen. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.jaroWinkler(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |${ev.value} = graft.functions.StringDistances.jaroWinkler(
         |  $x.getBytes(), $y.getBytes());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
