package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011): split each
  * d-dim embedding into `m` contiguous subvectors, k-means each subspace
  * independently into `ksub` centroids, and store a vector as the `m`
  * nearest-centroid codes — `m` bytes instead of `d` floats (64-dim
  * float64 at m=8 is a 64× cut). Search scores compressed codes against
  * an uncompressed query with an Asymmetric Distance Computation (ADC)
  * lookup table, so the corpus side never decompresses.
  *
  * The reference delegates vector storage and search to its vector DB
  * (qdrant_text_loader.py:137-141 search, :202-214 upsert — qdrant
  * offers server-side product quantization for exactly this memory/
  * recall trade); this is the engine-native form, composable with
  * `IvfIndex` (IVF prunes cells, PQ shrinks what a probe reads).
  *
  * Spark-first, 100 TB posture:
  *  - **Train** runs all `m` subspace Lloyd loops FUSED: one corpus
  *    pass per round computes the full m×ksub (sum, count) partial grid
  *    per partition, so the round cost is one scan regardless of `m`
  *    (the unfused form re-reads the corpus m times per round — 8× the
  *    I/O at m=8, fatal at 100 TB). The model is m×ksub×dsub doubles,
  *    driver-sized by definition (8×16×8 = 1 k doubles here).
  *    Deterministic by construction: hash-ordered init, discrete
  *    per-subspace convergence, and driver folds of partials in
  *    partition-index order — two trains on the same corpus produce
  *    byte-identical codebooks.
  *  - **Encode** is one typed mapPartitions kernel (PLANS.md lesson 7:
  *    scalac-compiled argmin beats an interpreted HOF chain) emitting
  *    (id, codes) only — the corpus is read once and only codes ride
  *    downstream shuffles/writes.
  *  - **ADC search** broadcasts an m×ksub lookup table in the task
  *    closure; per row the score is m array reads + m adds, no vector
  *    math, and top-k goes through `orderBy.limit` →
  *    `TakeOrderedAndProject` (per-task k-heaps, never a global sort).
  *  - **Contracts**: ADC-vs-reconstruction consistency is an algebraic
  *    identity (Σ_j q_j·c_{j,code_j} = q·reconstruct(codes)) checked by
  *    a 0-row gate for ANY codebook; recall@k vs exact search is
  *    corpus-dependent, gated by a floor (0-row) and pinned exactly in
  *    PqSpec — same discipline as `ann_ivf_recall`/`ann_ivf_dominance`.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j (dsub doubles). */
  final case class Model(m: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) {
    def ksub: Int = codebooks.head.length
    def dim: Int = m * dsub
  }

  /** Train per-subspace codebooks. `dim % m == 0` (contiguous equal
    * slices — the standard PQ layout). Rows whose vector is not exactly
    * `dim` long are excluded from training (they cannot contribute to
    * every subspace).
    *
    * All `m` Lloyd loops run FUSED: each iteration is ONE corpus pass
    * whose per-partition partial is an m×ksub grid of (sum, count) plus
    * an m-long changed-assignment counter — the corpus is read once per
    * round instead of once per round PER SUBSPACE (8× fewer jobs at
    * m=8, and the only shape that survives a 100 TB corpus, where every
    * extra pass is a full scan). Partials fold on the driver in
    * partition-index order, so retraining is byte-identical by
    * construction (the `Classifier.train` discipline), not merely
    * observed. Init matches `KMeansCluster`: per-subspace hash-ordered
    * subvector sample + greedy furthest-first seeding. Convergence is
    * discrete per subspace (no subvector changed cell); converged
    * subspaces stop updating but the scan cost is shared until ALL
    * converge or `maxIter`. */
  def train(embs: DataFrame, vecCol: String, m: Int, ksub: Int,
      maxIter: Int = 30): Model = {
    require(m > 0 && ksub > 0 && maxIter > 0,
      "m, ksub, maxIter must be positive")
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = embs.select(size(asDouble(col(vecCol))).as("d"))
      .filter(col("d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "cannot train PQ on an empty corpus"))
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m

    val src = KMeansCluster.sizeToWorkingSet(
      embs.select(asDouble(col(vecCol)).as("v"))
        .filter(size(col("v")) === dim))

    // ── init: per-subspace hash-ordered sample (deterministic, no RNG)
    //    + furthest-first seeding, all m samples from ONE pass ─────────
    val sampleN = math.max(ksub * 8, ksub)
    val subRows = src.select(posexplode(array((0 until m).map(j =>
        slice(col("v"), j * dsub + 1, dsub)): _*)).as(Seq("j", "sv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("j"))
      .orderBy(xxhash64(col("sv").cast("string")))
    val sampled = subRows
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= sampleN)
      .orderBy(col("j"), col("rk"))
      .select(col("j"), col("sv")).as[(Int, Seq[Double])].collect()
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val sample = sampled.collect { case (`j`, sv) => sv.toArray }
      require(sample.nonEmpty, "cannot train PQ on an empty corpus")
      val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
      while (chosen.length < math.min(ksub, sample.length))
        chosen += sample.maxBy(p => chosen.map(c => dist2(p, c)).min)
      while (chosen.length < ksub) chosen += chosen.head
      chosen.toArray
    }

    // ── fused Lloyd rounds: one corpus pass per round for ALL m
    //    subspaces (KMeansCluster.lloydFused — shared with fit) ─────────
    val (cb, _, _) =
      KMeansCluster.lloydFused(src, m, dsub, ksub, maxIter, codebooks)
    Model(m, dsub, cb)
  }

  /** Nearest-centroid code per subspace — strict-less argmin with
    * first-wins ties (deterministic). Shared by `encode` and
    * `PqIndex`'s cell-carrying encode kernel. */
  private[operators] def codesOf(cb: Array[Array[Array[Double]]],
      dsub: Int, v: Array[Double]): Array[Int] = {
    val m = cb.length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = cb(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub && off + i < v.length) {
          val t = v(off + i) - cent(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    codes
  }

  /** (id LONG, codes ARRAY<INT>) — nearest-centroid code per subspace.
    * Codes are INT in the frame for painless downstream SQL; they are
    * ≤ ksub−1 and pack to bytes at rest
    * (`codes.cast("array<byte>")` when ksub ≤ 256). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb = model.codebooks
    val dsub = model.dsub
    val dim = model.dim
    df.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, vseq) =>
          // loud like PqIndex.encodeWithCell: a wrong-dim vector would
          // otherwise encode against a TRUNCATED distance comparison —
          // garbage codes with no signal (train merely EXCLUDES such
          // rows, but an encode that silently drops or mis-codes them
          // corrupts the downstream ADC ranking)
          require(vseq != null && vseq.length == dim,
            s"Pq.encode: vector for id $id has dim " +
              s"${if (vseq == null) -1 else vseq.length}, expected $dim")
          (id, codesOf(cb, dsub, vseq.toArray).toSeq)
        }
      }.toDF("id", "codes")
  }

  /** Reconstruction (codebook lookup per subspace, concatenated) as a
    * Column over a codes column — audit/verify path, not the hot loop. */
  def reconstructCol(codes: Column, model: Model): Column = {
    val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(zip_with(codes, sequence(lit(0), lit(model.m - 1)),
      (c, j) => element_at(element_at(cbLit, j + 1), c + 1)))
  }

  /** ADC inner-product scores: score(id) = Σ_j lut(j)(codes(j)) where
    * lut(j)(c) = dot(query_sub_j, codebook_j_c). The table is m×ksub
    * doubles computed once on the driver and shipped in the closure —
    * the per-row cost is m reads + m adds regardless of dim. */
  def adcScores(encoded: DataFrame, model: Model,
      query: Seq[Double]): DataFrame = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    val spark = encoded.sparkSession
    import spark.implicits._
    val q = query.toArray
    val dsub = model.dsub
    val lut: Array[Array[Double]] = Array.tabulate(model.m) { j =>
      val off = j * dsub
      model.codebooks(j).map { cent =>
        var s = 0.0; var i = 0
        while (i < dsub) { s += q(off + i) * cent(i); i += 1 }
        s
      }
    }
    encoded.select(col("id").cast("long"), col("codes"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        it.map { case (id, codes) =>
          // a short codes row would sum a PARTIAL lookup silently; a
          // long one would crash with a bare index error — name the id
          require(codes != null && codes.length == lut.length,
            s"Pq.adcScores: codes for id $id have length " +
              s"${if (codes == null) -1 else codes.length}, " +
              s"expected ${lut.length}")
          var s = 0.0
          var j = 0
          while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
          (id, s)
        }
      }.toDF("id", "adc_score")
  }

  /** Approximate top-k by ADC score (ties → smallest id). `orderBy.limit`
    * lowers to TakeOrderedAndProject: per-task k-heaps over code rows. */
  def adcTopK(encoded: DataFrame, model: Model, query: Seq[Double],
      k: Int): DataFrame =
    adcScores(encoded, model, query)
      .orderBy(desc("adc_score"), col("id").asc)
      .limit(k)

  /** IVF-ADC (the FAISS IVFPQ production shape, without residual
    * encoding): coarse centroids prune to `nprobe` cells, PQ codes rank
    * what survives. At 100 TB the two compressions compose — a probe
    * touches nprobe/ncells of the corpus AND reads m bytes per vector
    * instead of the embedding column; pair with `IvfIndex`'s
    * cell-partitioned layout to get both from one store. Contract:
    * searching a subset under the SAME score function can never beat the
    * full-corpus ADC ranking — `ann_ivfpq_dominance` holds for any
    * codebook and any cell assignment (0-row oracle). */
  def ivfAdcTopK(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, query: Seq[Double], k: Int, ncells: Int, nprobe: Int,
      seed: Long = 42L): DataFrame = {
    val centroids =
      SimilaritySearch.computeCentroids(corpus, vecCol, ncells, seed)
    val probed = SimilaritySearch.nearestCells(centroids, query, nprobe)
    val sub = SimilaritySearch.assignCells(corpus, idCol, vecCol, centroids)
      .filter(col("cell").isin(probed: _*))
    adcTopK(encode(sub, idCol, "v", model), model, query, k)
  }
}
