package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact covariance matrix of an embedding corpus + a deterministic
  * principal-component extraction on top — the correlation-structure
  * audit behind whitening, PCA dim-reduction decisions ("how many
  * Matryoshka dims can we truncate?"), and redundant-dimension
  * detection after an embedder change.
  *
  * Numerics ([[Standardize]]'s integer-statistics pattern, extended to
  * pairs): elements are quantized to micro units IN-PLAN
  * (round(x·10⁶) — Spark HALF_UP and DuckDB half-away agree on
  * doubles), and every corpus-sized sum — Σqᵢ, Σqᵢqⱼ — is an integer
  * sum: associative, shuffle-proof, overflow-proof (the per-partition
  * Long grid flushes every 64k rows and uses exact arithmetic as a
  * loud backstop; the cross-partition reduce accumulates as
  * decimal(38,0): 10¹¹ rows × 10¹² ≈ 10²³ ≪ 10³⁸). fp
  * re-enters only in the per-cell fixed tree cov = (E[qᵢqⱼ] −
  * E[qᵢ]E[qⱼ])/10¹², identical in every engine.
  *
  * Scale: ONE typed-kernel pass computes the full upper-triangular
  * (dim·(dim+1)/2)-cell partial grid per partition — the corpus is
  * never exploded to N·dim² rows (at 64 dims that explosion is 2080×
  * the input; the kernel's exchange instead carries one grid per task).
  * The eigen step runs on the driver over the dim×dim matrix — a
  * bounded sidecar (dim² doubles), not data.
  */
object Covariance {

  private val Micro = 1000000L

  /** Upper-triangular exact integer pair statistics + covariance:
    * (i, j, n, s_i, s_j, s_ij, cov) for 0 ≤ i ≤ j < dim, where s_ij =
    * Σ qᵢqⱼ as decimal(38,0) and cov is the population covariance of
    * the MICRO-QUANTIZED values in original units (micro² / 10¹²),
    * rounded to `decimals` (with the +0.0 signed-zero guard — off-
    * diagonal cells are legitimately negative). */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int,
      decimals: Int = 6): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val spark = df.sparkSession
    val nPairs = dim * (dim + 1) / 2
    // quantize declaratively (the emb_standardize-green rounding path),
    // then run the pair grid in one typed kernel pass.
    val q = df.select(transform(asDouble(col(vecCol)),
      x => round(x * lit(Micro), 0).cast("long")).as("qv"))
    // The JVM accumulators are Longs, which wrap SILENTLY — unlike the
    // decimal(38,0) reduce below, which is where the scaladoc's
    // overflow-proof claim actually lives. Two defenses: the grid
    // FLUSHES every 64k rows (bounding per-partial magnitude to
    // 2¹⁶·qmax², i.e. safe through |x| ≈ 30 at micro scale — the
    // flushed partials meet the map-side combine, so the extra rows
    // never reach the shuffle ungrouped), and the pair product/add use
    // EXACT arithmetic so a pathological vector fails loudly instead
    // of corrupting every cell downstream.
    val FlushRows = 1 << 16
    val partials = q.select(col("qv")).rdd.mapPartitions { it =>
      var cnt = 0L
      val s = new Array[Long](dim)
      val p = new Array[Long](nPairs)
      def emit(): Iterator[Row] = {
        val rows = new Array[Row](nPairs)
        var i = 0
        var k = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            rows(k) = Row(i, j, cnt, s(i), s(j), p(k))
            k += 1
            j += 1
          }
          i += 1
        }
        cnt = 0L
        java.util.Arrays.fill(s, 0L)
        java.util.Arrays.fill(p, 0L)
        rows.iterator
      }
      it.flatMap { row =>
        val v = row.getSeq[Long](0)
        require(v.length == dim,
          s"covarianceMatrix: expected dim $dim, got ${v.length}")
        val a = v.toArray
        cnt += 1
        var i = 0
        var k = 0
        while (i < dim) {
          s(i) = Math.addExact(s(i), a(i))
          var j = i
          while (j < dim) {
            p(k) = Math.addExact(p(k), Math.multiplyExact(a(i), a(j)))
            k += 1
            j += 1
          }
          i += 1
        }
        if (cnt >= FlushRows) emit() else Iterator.empty
      } ++ (if (cnt > 0) emit() else Iterator.empty)
    }
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("psi", LongType, nullable = false),
      StructField("psj", LongType, nullable = false),
      StructField("pij", LongType, nullable = false)))
    val agg = spark.createDataFrame(partials, schema)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("psi")).as("s_i"), sum(col("psj")).as("s_j"),
        sum(col("pij").cast("decimal(38,0)")).as("s_ij"))
    // s_ij travels as a canonical digit STRING: DECIMAL(38,0) is exact in
    // both engines, but compare harnesses that coerce one side's decimals
    // to float (or format them differently) see representation — not
    // value — diverge. A digit string hashes identically everywhere.
    agg.select(col("i"), col("j"), col("n"), col("s_i"), col("s_j"),
      col("s_ij").cast("string").as("s_ij"),
      (round((col("s_ij").cast("double") / col("n") -
          (col("s_i").cast("double") / col("n")) *
            (col("s_j").cast("double") / col("n"))) / lit(1.0e12),
        decimals) + lit(0.0)).as("cov"))
  }

  /** Principal eigenpair of the covariance matrix by fixed-iteration
    * power method on the DRIVER (the matrix is a dim² sidecar, not
    * data): deterministic — all-ones start, `iters` fixed rounds, no
    * randomness, no convergence-dependent early exit. Returns
    * (eigenvalue, eigenvector) where the eigenvalue is the Rayleigh
    * quotient of the final iterate and the vector's sign is fixed by
    * making its largest-|·| component positive. */
  def principalComponent(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 50): (Double, Array[Double]) = {
    require(iters >= 1, "iters must be >= 1")
    val cells = covarianceMatrix(df, vecCol, dim).collect()
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(6)
      c(i)(j) = v
      c(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm > 0) w.map(_ / norm) else w
    }
    var lambda = 0.0
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { lambda += v(i) * c(i)(j) * v(j); j += 1 }
      i += 1
    }
    val amax = v.indices.maxBy(k => math.abs(v(k)))
    val fixed = if (v(amax) < 0) v.map(-_) else v
    (lambda, fixed)
  }

  /** 0-row PCA dominance audit: for a symmetric covariance C, the top
    * eigenvalue satisfies λ₁ = max_{‖u‖=1} uᵀCu ≥ C_kk for EVERY axis k
    * (take u = e_k) — so the power-method Rayleigh quotient, if the
    * iteration works, must dominate every diagonal variance. Emits the
    * violating diagonal cells (empty = pass); `tol` absorbs the 6dp
    * cell rounding. */
  def pcaDominanceAudit(df: DataFrame, vecCol: String, dim: Int,
      tol: Double = 1e-4): DataFrame = {
    val (lambda, _) = principalComponent(df, vecCol, dim)
    covarianceMatrix(df, vecCol, dim)
      .filter(col("i") === col("j") && col("cov") > lambda + tol)
      .select(col("i"), col("cov"), lit(lambda).as("lambda1"))
  }

  /** Full symmetric eigendecomposition by cyclic Jacobi rotations on
    * the DRIVER — the matrix is a dim² sidecar. Deterministic: fixed
    * sweep order, fixed sweep count (no data-dependent early exit
    * beyond the rotation threshold, which only SKIPS work). Returns
    * (eigenvalues, eigenvectors as rows) with eigenvalues descending
    * and each vector's largest-|·| component positive. */
  def jacobiEigen(c0: Array[Array[Double]],
      sweeps: Int = 20): (Array[Double], Array[Array[Double]]) = {
    val n = c0.length
    val a = c0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case x => x
        }
        val cth = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * cth
        var k = 0
        while (k < n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = cth * akp - s * akq
          a(k)(q) = s * akp + cth * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = cth * apk - s * aqk
          a(q)(k) = s * apk + cth * aqk
          val vpk = v(p)(k); val vqk = v(q)(k)
          v(p)(k) = cth * vpk - s * vqk
          v(q)(k) = s * vpk + cth * vqk
          k += 1
        }
      }
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val row = v(i)
      val amax = row.indices.maxBy(k => math.abs(row(k)))
      if (row(amax) < 0) row.map(-_) else row.clone()
    }.toArray
    (evals, evecs)
  }

  /** ZCA whitening: x → W·x with W = E·diag(1/√(λ+eps))·Eᵀ from the
    * micro-quantized covariance — the embedding-preprocessing transform
    * that removes feature correlation while staying closest to the
    * original basis (the property that makes ZCA — not PCA — the
    * standard for representation whitening). The dim×dim W rides the
    * closure; the corpus transform is ONE projection (no shuffle).
    * Returns (idCol, whitened ARRAY<DOUBLE>). */
  def whiten(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      eps: Double = 1e-6): DataFrame = {
    val cells = covarianceMatrix(df, vecCol, dim).collect()
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(6)
      c(i)(j) = v; c(j)(i) = v
    }
    val (evals, evecs) = jacobiEigen(c)
    // W = Eᵀ·diag(1/√(λ+eps))·E with eigenvectors as rows of `evecs`
    val w = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var k = 0
        while (k < dim) {
          acc += evecs(k)(i) * evecs(k)(j) /
            math.sqrt(math.max(evals(k), 0.0) + eps)
          k += 1
        }
        w(i)(j) = acc
        j += 1
      }
      i += 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(w)
    df.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val m = bw.value
        it.map { case (id, vec) =>
          val x = vec.toArray
          val out = new Array[Double](m.length)
          var i = 0
          while (i < m.length) {
            var acc = 0.0
            var j = 0
            while (j < m.length) { acc += m(i)(j) * x(j); j += 1 }
            out(i) = acc
            i += 1
          }
          (id, out.toSeq)
        }
      }
      .toDF(idCol, "whitened")
  }

  /** 0-row whitening audit: the covariance of the WHITENED vectors must
    * be ≈ identity (diagonal within `tol` of 1 for well-conditioned
    * directions, off-diagonal within `tol` of 0) — the property that IS
    * whitening, checked corpus-wide through the same exact covariance
    * kernel. Directions with near-zero variance (λ ≲ eps) stay shrunk
    * by design and are exempted via the `minVar` floor. */
  def whitenAudit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      tol: Double = 0.05, minVar: Double = 1e-4): DataFrame = {
    val whitened = whiten(df, idCol, vecCol, dim)
    val cov = covarianceMatrix(whitened, "whitened", dim)
    val orig = covarianceMatrix(df, vecCol, dim)
      .filter(col("i") === col("j"))
      .select(col("i").as("d"), col("cov").as("orig_var"))
    cov
      .join(orig, col("i") === col("d"))
      .filter(
        (col("i") === col("j") && col("orig_var") >= minVar &&
          abs(col("cov") - 1.0) > tol) ||
        (col("i") =!= col("j") && abs(col("cov")) > tol))
      .select(col("i"), col("j"), col("cov"))
  }
}
