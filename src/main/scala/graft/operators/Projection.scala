package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction (Johnson–Lindenstrauss
  * sketch, public technique): project dim-d embeddings onto `outDim`
  * pseudo-random ±1/√k axes — the standard cheap shrink before ANN
  * indexing or pairwise-distance sweeps (distances are preserved within
  * 1±ε with k = O(log n / ε²)).
  *
  * The projection matrix is never materialized or shipped: sign(i, j) =
  * parity of md5("i_j"), derived independently on every executor (and by
  * the DuckDB oracle — the projected VALUES are value-checked, not just
  * audited). Typed kernel per PLANS.md lesson 7: a nested
  * transform-lambda would run interpreted per element.
  *
  * Scale shape: one corpus pass with d×k multiplies per row and the sign
  * matrix built once per partition; the operator itself adds no shuffle
  * (the `spread` guard repartitions ONLY under-partitioned inputs so a
  * 1-file corpus doesn't project single-threaded — PLANS.md lesson 2). */
object Projection {

  /** Parity-of-md5 sign: +1 when the first 16 bits of md5("i_j") are
    * even, else -1. Matches the oracle's
    * ('0x' || substr(md5(i || '_' || j), 1, 4))::INT % 2. */
  private[operators] def sign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    if (Integer.parseInt(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  def project(vec: Array[Double], signs: Array[Array[Double]],
      outDim: Int): Array[Double] = {
    val out = new Array[Double](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      while (i < vec.length) { acc += vec(i) * signs(i)(j); i += 1 }
      out(j) = acc * scale
      j += 1
    }
    out
  }

  /** Project one vector (driver-side helper for query vectors — the
    * same matrix the distributed form derives per partition). `inDim`
    * must match the corpus projection's: a wrong-dimension query would
    * otherwise silently use a truncated sign matrix and search garbage. */
  def projectOne(vec: Array[Double], inDim: Int, outDim: Int): Array[Double] = {
    require(vec.length == inDim,
      s"projectOne: vector has dim ${vec.length}, expected $inDim")
    project(vec, Array.tabulate(inDim, outDim)(sign), outDim)
  }

  /** (idCol, projected ARRAY<DOUBLE>[outDim]) — deterministic across
    * engines, layouts, and retries. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim > 0 && outDim > 0, "dimensions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        // the sign matrix is built once per partition from the hash —
        // no broadcast, no driver state, nothing on the wire
        val signs = Array.tabulate(inDim, outDim)(sign)
        it.map { case (id, v) =>
          require(v.length == inDim,
            s"randomProject: row $id has dim ${v.length}, expected $inDim")
          (id, project(v.toArray, signs, outDim).toSeq)
        }
      }
      .toDF(idCol, "projected")
  }
}
