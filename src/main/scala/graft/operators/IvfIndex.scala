package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the scale form of `SimilaritySearch.topKIvf`
  * (the reference delegates this role to Qdrant's HNSW index,
  * qdrant_text_loader.py:122-142; IVF is the partition-friendly analogue
  * for a columnar engine).
  *
  * `build` assigns every vector to its nearest centroid once and persists
  * the corpus PARTITIONED BY cell (Hive-style `cell=N/` directories) with
  * a tiny centroid sidecar. `probe` reads the sidecar (ncells rows), picks
  * the `nprobe` nearest cells, and scans ONLY those partition directories —
  * partition pruning means a probe touches nprobe/ncells of the data no
  * matter how large the corpus grows (plan-asserted in SimilaritySpec).
  * Rebuilds are explicit and amortized across the query workload, instead
  * of `topKIvf`'s per-call assignment.
  */
object IvfIndex {

  private def cellsPath(path: String) = s"$path/cells"
  private def centroidsPath(path: String) = s"$path/centroids"

  /** Assignment-failure guard shared by [[build]] and [[append]]: a
    * null or dimension-drifted vector assigns cell = -1, which would
    * WRITE into a `cell=-1` partition that [[probe]] never reads —
    * silent permanent loss. Fail loudly, naming the offending id. */
  private def guardedCells(assigned: DataFrame, idCol: String,
      op: String): DataFrame =
    assigned.withColumn("cell",
      when(col("cell") >= 0, col("cell")).otherwise(raise_error(concat(
        lit(s"IvfIndex.$op: vector failed centroid assignment " +
          "(dimension drift or null vector) for id "),
        coalesce(col(idCol).cast("string"), lit("NULL"))))))

  /** Build (or rebuild) the index at `path`: one pass to fit centroids on
    * a seeded sample, one pass to assign + write, centroid sidecar last. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
      ncells: Int = 16, seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids =
      SimilaritySearch.computeCentroids(corpus, vecCol, ncells, seed)
    guardedCells(
        SimilaritySearch.assignCells(corpus, idCol, vecCol, centroids),
        idCol, "build")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(cellsPath(path))
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
  }

  /** The sidecar contract in ONE place: row = (cell INT, centroid
    * ARRAY<DOUBLE>), cell ids contiguous from 0, so after the orderBy the
    * array index IS the cell id. */
  private def loadCentroids(spark: SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(centroidsPath(path))
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Exact top-k over the `nprobe` nearest cells. The scan reads only the
    * probed `cell=N/` directories (partition pruning); with
    * nprobe = ncells the result equals exact brute-force top-k. */
  def probe(spark: SparkSession, path: String, idCol: String,
      query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val probed = SimilaritySearch.nearestCells(centroids, query, nprobe)
    spark.read.parquet(cellsPath(path))
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol),
        round(cosineSimilarity(col("v"), typedLit(query)), 6).as("score"))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)
  }

  /** Number of cells in a built index (sidecar row count). */
  def ncells(spark: SparkSession, path: String): Int =
    spark.read.parquet(centroidsPath(path)).count().toInt

  /** Incremental append: assign NEW vectors with the index's EXISTING
    * centroids and append only the `cell=N/` partitions they land in —
    * the per-batch maintenance path (a full `build` re-clusters and
    * rewrites everything; appends amortize until drift degrades cell
    * balance, at which point the caller rebuilds). Probes see appended
    * vectors immediately; cells untouched by the batch are not rewritten
    * (dynamic partition overwrite is NOT used — plain append). */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val centroids = loadCentroids(newVecs.sparkSession, path)
    val assigned = guardedCells(
      SimilaritySearch.assignCells(newVecs, idCol, vecCol, centroids),
      idCol, "append")
    assigned.write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(cellsPath(path))
  }
}
