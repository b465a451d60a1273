package graft.operators

import graft.functions.VectorFunctions.asDouble
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — collapse many vectors into one per group.
  * The standard step that turns chunk embeddings into a document
  * embedding (RAG indexing) or member embeddings into a cluster/class
  * prototype (SemDeDup centroids, contrastive class anchors).
  *
  * Scale shape: ONE map-side-combinable aggregation over ONE corpus pass
  * — the `VectorSum` UDAF reduces within partitions first, so the
  * shuffle carries one dim-length array per (group × task), never the
  * member vectors. The only driver traffic before the plan is a single
  * limit-1 read of the dimension (to size the UDAF's zero buffer);
  * dimension CONSISTENCY is validated inside the same aggregation pass
  * (min/max of the sizes ride along), not by an extra corpus scan. */
object Pooling {

  /** Element-wise MEAN vector per group: (groupCol, n, mean_vec).
    * Ragged, null, or empty vectors fail the query loudly — silently
    * averaging a truncated or zero-filled substitute would bias every
    * prototype. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    // coalesce: under ANSI mode size(NULL) is NULL, not -1 — either way a
    // null vector must hit the loud-failure path, not an NPE
    val withDim = df.select(col(groupCol), v.as("_v"),
      coalesce(size(v), lit(-1)).as("_d"))
    val head = withDim.select(col("_d")).limit(1).collect()
    require(head.nonEmpty, "meanPool: empty input")
    val dim = head(0).getInt(0)
    require(dim > 0,
      s"meanPool: first vector has dimension $dim (need > 0)")
    val vecSum = udaf(new KMeansCluster.VectorSum(dim))
    // null vectors reach the UDAF as an empty array (it must not NPE
    // mid-task); their _d = -1 then fails the query via raise_error below
    val safeV = coalesce(col("_v"), array().cast("array<double>"))
    withDim.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), vecSum(safeV).as("_sum"),
        min(col("_d")).as("_dmin"), max(col("_d")).as("_dmax"))
      .select(col(groupCol), col("n"),
        when(col("_dmin") === dim && col("_dmax") === dim,
            transform(col("_sum"), x => x / col("n")))
          .otherwise(raise_error(concat(
            lit(s"meanPool: ragged or null vector dimensions (expected " +
              s"$dim) in group "),
            coalesce(col(groupCol).cast("string"), lit("NULL")))))
          .as("mean_vec"))
  }
}
