package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column — the clustering primitive
  * behind semantic curation of training corpora (cluster-then-sample topic
  * balancing, SemDeDup-style semantic dedup, cluster-local near-dup
  * search). The reference delegates vector organization to its vector DB;
  * this is the engine-native form.
  *
  * Spark-first, 100 TB posture:
  *  - **Init** is a deterministic hash-ordered sample (no RNG — the same
  *    corpus always yields the same model, and executors agree without a
  *    seed broadcast), matching `SimilaritySearch.computeCentroids`.
  *  - **Assignment** is one codegen'd projection per iteration: centroids
  *    travel as a broadcast literal and
  *    argmin ‖x − c‖² = argmax (x·c − ‖c‖²/2), so the inner loop is the
  *    same `vectorDot` expression the search operators use — no crossJoin,
  *    no UDF, no shuffle of vectors.
  *  - **Update** is one map-side-combinable aggregation: a typed
  *    elementwise vector-sum UDAF + count per cell. Each executor emits at
  *    most k partial sums per partition; only k×dim doubles reach the
  *    driver — centroids are driver-sized BY DEFINITION, so this is not a
  *    collect-of-data anti-pattern.
  *  - **Convergence** is discrete and exact: iterate until the per-cell
  *    (sum, count) pair — and hence the assignment — stops changing, not
  *    until a float tolerance flips. Guarantees the fixed-point property
  *    (centroid == mean of its members) that `emb_kmeans_audit` checks
  *    with a 0-row oracle.
  */
object KMeansCluster {

  /** Elementwise vector sum with map-side partial aggregation (the array
    * analogue of `sum`): per-partition partials merge associatively, so a
    * 100 TB update step shuffles k rows per partition, not the corpus. */
  class VectorSum(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = new Array[Double](dim)
    override def reduce(acc: Array[Double], v: Seq[Double]): Array[Double] = {
      var i = 0
      val n = math.min(acc.length, v.length)
      while (i < n) { acc(i) += v(i); i += 1 }
      acc
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Double]): Seq[Double] = acc.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      Encoders.javaSerialization[Array[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  final case class Model(centroids: Array[Array[Double]], iterations: Int,
      converged: Boolean)

  /** Nearest-centroid cell id for a vector column, as ONE projection over
    * a centroid literal: argmax of (x·c_i − ‖c_i‖²/2) with first-wins tie
    * break (deterministic). */
  private[operators] def cellOf(vec: Column,
      centroids: Array[Array[Double]]): Column = {
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val halfNorms = typedLit(centroids.map(c => c.map(x => x * x).sum / 2.0).toSeq)
    aggregate(
      sequence(lit(0), lit(math.max(centroids.length - 1, 0))),
      struct(lit(Double.NegativeInfinity).as("s"), lit(-1).as("i")),
      (acc, i) => {
        val s = vectorDot(vec, element_at(centLit, i + 1)) -
          element_at(halfNorms, i + 1)
        when(s > acc.getField("s"), struct(s.as("s"), i.as("i")))
          .otherwise(acc)
      },
      acc => acc.getField("i"))
  }

  /** Deterministic init, no RNG: a hash-ordered sample (machine-
    * independent), then greedy furthest-first (max-min distance) seeding
    * over it — the classic guard against two seeds landing in one
    * cluster, which strands Lloyd in an obvious local optimum.
    * Driver-side work is O(sample × k) on ≤ 8k sampled vectors. */
  private def initCentroids(df: DataFrame, vecCol: String,
      k: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(asDouble(col(vecCol)).as("v"))
      .filter(size(col("v")) > 0)
      .orderBy(xxhash64(col("v").cast("string")))
      .limit(math.max(k * 8, k))
      .as[Seq[Double]].collect().map(_.toArray)
    if (sample.isEmpty) return Array.empty
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    while (chosen.length < math.min(k, sample.length)) {
      // maxBy keeps the FIRST maximum → deterministic under ties.
      chosen += sample.maxBy(p => chosen.map(c => dist2(p, c)).min)
    }
    // fewer distinct points than k: pad by repeating the first seed (its
    // duplicate cells stay empty and keep their centroid).
    while (chosen.length < k) chosen += chosen.head
    chosen.toArray
  }

  /** Fused multi-subspace Lloyd loop, shared by `fit` (m = 1) and
    * `Pq.train` (m subspaces over contiguous slices of one vector
    * column). `src` must be a single-column frame of `m × dsub`-long
    * double arrays named "v".
    *
    * Per round: ONE typed mapPartitions pass over a once-materialized
    * vector block emits a per-partition partial — the m×ksub (sum,
    * count) grid plus an m-long changed-assignment counter — and the
    * driver folds partials in partition-index order
    * (byte-deterministic retrains by construction). Assignments are
    * recomputed in-pass under the previous AND current codebooks
    * instead of being stored, so there is no per-round checkpoint and
    * no lineage growth. No per-round Catalyst expression is built:
    * centroids ride the task closure as plain arrays, so iterating
    * never re-plans or re-codegens — the per-round cost is one scan,
    * which is also the only shape that survives a 100 TB corpus.
    *
    * Convergence is decided on the DISCRETE per-subspace assignment
    * ("no vector changed cell"), immune to low-bit float jitter. On
    * convergence the returned centroids ARE the member means of the
    * final assignment — the fixed-point contract `emb_kmeans_audit`
    * verifies. Empty cells keep their previous centroid. */
  private[operators] def lloydFused(src: DataFrame, m: Int, dsub: Int,
      ksub: Int, maxIter: Int,
      init: Array[Array[Array[Double]]]): (Array[Array[Array[Double]]], Int, Boolean) = {
    val spark = src.sparkSession
    import spark.implicits._
    def assignAll(cb: Array[Array[Array[Double]]], v: Array[Double],
        out: Array[Int]): Unit = {
      var j = 0
      while (j < m) {
        val book = cb(j); val off = j * dsub
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < book.length) {
          val cent = book(c); var d = 0.0; var i = 0
          val n = math.min(dsub, math.max(v.length - off, 0))
          while (i < n) { val t = v(off + i) - cent(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best; j += 1
      }
    }
    var cb = init
    // The vector frame is materialized ONCE; assignments are never
    // stored. Each round is ONE job that assigns every row under the
    // PREVIOUS and CURRENT codebooks (two in-memory argmins — cheaper
    // than a second pass) and emits the per-partition partial grid:
    // sums/counts keyed by the current assignment, changed = the two
    // assignments differing. Comparing SUCCESSIVE codebooks is what
    // makes convergence real (a single codebook trivially agrees with
    // itself); when changed == 0 the centroids just produced were
    // computed over exactly the membership they now induce — the fixed
    // point holds without an extra pass. No per-round checkpoint, no
    // lineage growth: the loop re-reads one materialized block.
    val cur = src.as[Seq[Double]].localCheckpoint()
    var cbPrev: Array[Array[Array[Double]]] = null
    var iter = 1
    var converged = false
    while (!converged && iter < maxIter) {
      val cbNow = cb
      val cbOld = cbPrev
      // (partitionId, sums[m·ksub·dsub], counts[m·ksub], changed[m])
      val partials = cur.mapPartitions { it =>
        val sums = new Array[Double](m * ksub * dsub)
        val cnts = new Array[Long](m * ksub)
        val chg = new Array[Long](m)
        val cells = new Array[Int](m)
        val prev = new Array[Int](m)
        it.foreach { vs =>
          val v = vs.toArray
          assignAll(cbNow, v, cells)
          if (cbOld == null) java.util.Arrays.fill(prev, -1)
          else assignAll(cbOld, v, prev)
          var j = 0
          while (j < m) {
            val c = cells(j)
            if (c != prev(j)) chg(j) += 1
            cnts(j * ksub + c) += 1
            val base = (j * ksub + c) * dsub; val off = j * dsub
            var i = 0
            val n = math.min(dsub, math.max(v.length - off, 0))
            while (i < n) { sums(base + i) += v(off + i); i += 1 }
            j += 1
          }
        }
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
          sums.toSeq, cnts.toSeq, chg.toSeq))
      }.collect().sortBy(_._1) // partition-index fold → deterministic
      val sums = new Array[Double](m * ksub * dsub)
      val cnts = new Array[Long](m * ksub)
      val chg = new Array[Long](m)
      partials.foreach { case (_, s, c, g) =>
        var i = 0
        while (i < sums.length) { sums(i) += s(i); i += 1 }
        i = 0
        while (i < cnts.length) { cnts(i) += c(i); i += 1 }
        i = 0
        while (i < m) { chg(i) += g(i); i += 1 }
      }
      if (iter > 1 && chg.forall(_ == 0L)) converged = true
      else {
        cbPrev = cb
        cb = Array.tabulate(m) { j =>
          Array.tabulate(ksub) { c =>
            val n = cnts(j * ksub + c)
            if (n == 0) cb(j)(c) // empty cell keeps its centroid
            else {
              val base = (j * ksub + c) * dsub
              Array.tabulate(dsub)(i => sums(base + i) / n)
            }
          }
        }
        iter += 1
      }
    }
    cur.unpersist()
    (cb, iter, converged)
  }

  /** Size iteration parallelism to the WORKING SET, in BOTH directions:
    * Lloyd's runs dozens of tiny jobs, so a sample-sized fit should not
    * schedule a full session's worth of tasks per round (cap at ~20k
    * vectors/partition), while an under-partitioned large corpus (one
    * giant parquet file) must spread UP to the session's parallelism or
    * every round runs single-task. The sizing count() is one cheap
    * column-pruned pass before the loop's dozens of rounds. */
  private[operators] def sizeToWorkingSet(src: DataFrame): DataFrame = {
    val maxPar = src.sparkSession.sparkContext.defaultParallelism
    val n = src.count()
    val target = math.max(1L, math.min(maxPar.toLong, n / 20000L)).toInt
    val have = src.queryExecution.toRdd.getNumPartitions
    if (have == target) src else src.repartition(target)
  }

  /** Lloyd's algorithm to an exact assignment fixed point (or maxIter),
    * via `lloydFused` with a single subspace. */
  def fit(df: DataFrame, vecCol: String, k: Int,
      maxIter: Int = 50): Model = {
    require(k > 0, "k must be positive")
    val centroids = initCentroids(df, vecCol, k)
    require(centroids.nonEmpty, "cannot fit k-means on an empty corpus")
    val dim = centroids.head.length
    val src = sizeToWorkingSet(
      df.select(asDouble(col(vecCol)).as("v"))
        .filter(size(col("v")) > 0))
    val (cb, iter, converged) =
      lloydFused(src, 1, dim, k, maxIter, Array(centroids))
    Model(cb.head, iter, converged)
  }

  /** (original columns…, cell) — assignment against a fitted model; one
    * codegen'd projection, suitable for writing partitioned by cell (the
    * same layout `IvfIndex` uses for probe pruning). */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("cell", cellOf(asDouble(col(vecCol)), model.centroids))

  /** Fixed-point audit frame: cells whose centroid differs from the mean
    * of its assigned members by more than `tol` in any component. For a
    * CONVERGED model this is empty by Lloyd's invariant (the final update
    * used exactly the final membership) — `tol` absorbs only the
    * aggregation-merge-order float jitter between fit's update pass and
    * this recomputation. Returns (cell INT, max_err DOUBLE). */
  def fixedPointViolations(df: DataFrame, vecCol: String, model: Model,
      tol: Double = 1e-9): DataFrame = {
    val dim = model.centroids.head.length
    val vecSum = udaf(new VectorSum(dim))
    val centLit = typedLit(model.centroids.map(_.toSeq).toSeq)
    assign(df, vecCol, model)
      .select(asDouble(col(vecCol)).as("v"), col("cell"))
      .filter(size(col("v")) > 0)
      .groupBy(col("cell"))
      .agg(vecSum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("cell"),
        aggregate(
          zip_with(col("s"), element_at(centLit, col("cell") + 1),
            (si, ci) => abs(si / col("n") - ci)),
          lit(0.0), (a, b) => greatest(a, b)).as("max_err"))
      .filter(col("max_err") > tol)
  }
}
