package graft.operators

import graft.functions.VectorFunctions.asDouble
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding pooling — collapse many vectors into one per group.
  * The standard step that turns chunk embeddings into a document
  * embedding (RAG indexing) or member embeddings into a cluster/class
  * prototype (SemDeDup centroids, contrastive class anchors).
  *
  * Scale shape: ONE map-side-combinable aggregation over ONE corpus pass
  * — the `VectorSumDyn` UDAF reduces within partitions first, so the
  * shuffle carries one dim-length array per (group × task), never the
  * member vectors. NO driver traffic before the plan (the buffer sizes
  * itself from the first vector a task sees); dimension CONSISTENCY is
  * validated inside the same aggregation pass (min/max of the sizes ride
  * along), not by an extra corpus scan or a partition-order-dependent
  * first-row probe. */
object Pooling {

  /** [[KMeansCluster.VectorSum]] without the up-front dimension: the
    * buffer starts empty and adopts the first vector's length, so no
    * caller needs a driver-side dim probe. Length mismatches are summed
    * over the shared prefix here and FAIL the query via the _dmin/_dmax
    * check that rides the same aggregation (never silently emitted). */
  class VectorSumDyn extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(acc: Array[Double], v: Seq[Double]): Array[Double] = {
      if (acc.isEmpty) {
        val out = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { out(i) = v(i); i += 1 }
        out
      } else {
        var i = 0
        val n = math.min(acc.length, v.length)
        while (i < n) { acc(i) += v(i); i += 1 }
        acc
      }
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(acc: Array[Double]): Seq[Double] = acc.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      Encoders.javaSerialization[Array[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Element-wise MEAN vector per group: (groupCol, n, mean_vec).
    * Ragged, null, or empty vectors fail the query loudly — silently
    * averaging a truncated or zero-filled substitute would bias every
    * prototype. With `expectedDim` the check is against that global
    * dimension; without it, each group must be internally consistent
    * (min == max of its member dims) — both forms are deterministic
    * (no first-row probe; which group raises never depends on
    * partition order). */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String,
      expectedDim: Option[Int] = None): DataFrame = {
    val v = asDouble(col(vecCol))
    // coalesce: under ANSI mode size(NULL) is NULL, not -1 — either way a
    // null vector must hit the loud-failure path, not an NPE
    val withDim = df.select(col(groupCol), v.as("_v"),
      coalesce(size(v), lit(-1)).as("_d"))
    val vecSum = udaf(new VectorSumDyn)
    // null vectors reach the UDAF as an empty array (it must not NPE
    // mid-task); their _d = -1 then fails the query via raise_error below
    val safeV = coalesce(col("_v"), array().cast("array<double>"))
    val dimOk = expectedDim match {
      case Some(dim) => col("_dmin") === dim && col("_dmax") === dim
      case None => col("_dmin") === col("_dmax") && col("_dmin") > 0
    }
    val expectText = expectedDim.map(d => s"expected $d").getOrElse(
      "each group must be internally consistent and > 0")
    withDim.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), vecSum(safeV).as("_sum"),
        min(col("_d")).as("_dmin"), max(col("_d")).as("_dmax"))
      .select(col(groupCol), col("n"),
        when(dimOk, transform(col("_sum"), x => x / col("n")))
          .otherwise(raise_error(concat(
            lit(s"meanPool: ragged or null vector dimensions " +
              s"($expectText) in group "),
            coalesce(col(groupCol).cast("string"), lit("NULL")))))
          .as("mean_vec"))
  }
}
