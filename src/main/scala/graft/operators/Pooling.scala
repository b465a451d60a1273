package graft.operators

import graft.functions.VectorFunctions.asDouble
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — collapse many vectors into one per group.
  * The standard step that turns chunk embeddings into a document
  * embedding (RAG indexing) or member embeddings into a cluster/class
  * prototype (SemDeDup centroids, contrastive class anchors).
  *
  * Scale shape: ONE map-side-combinable aggregation — the `VectorSum`
  * UDAF reduces within partitions first, so the shuffle carries one
  * dim-length array per (group × task), never the member vectors. The
  * only driver traffic before the plan is a single first() to read the
  * dimension (needed to size the UDAF's zero buffer). */
object Pooling {

  /** Element-wise MEAN vector per group: (groupCol, n, mean_vec).
    * Rows with empty/null vectors are rejected loudly — silently
    * averaging a zero-filled substitute would bias every prototype. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val withDim = df.select(col(groupCol), v.as("_v"))
    val dims = withDim.select(size(col("_v")).as("d")).distinct()
      .collect().map(_.getInt(0))
    require(dims.nonEmpty, "meanPool: empty input")
    require(dims.length == 1 && dims(0) > 0,
      s"meanPool: vectors must share one positive dimension, got " +
        dims.sorted.mkString("{", ",", "}"))
    val vecSum = udaf(new KMeansCluster.VectorSum(dims(0)))
    withDim.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), vecSum(col("_v")).as("_sum"))
      .select(col(groupCol), col("n"),
        transform(col("_sum"), x => x / col("n")).as("mean_vec"))
  }
}
