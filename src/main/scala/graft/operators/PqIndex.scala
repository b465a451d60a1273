package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the compressed companion of `IvfIndex`, and
  * the disk shape of FAISS's IndexIVFPQ (Jégou et al., TPAMI 2011; the
  * reference delegates this role to Qdrant's server-side quantized
  * storage, qdrant_text_loader.py:122-142). Where `IvfIndex` persists
  * full vectors per cell, this stores `m` SMALL INTS per vector — at
  * m=8 over 64-dim float64 that is a 64× smaller probe payload, which
  * at 100 TB is the difference between a probe reading gigabytes and
  * reading megabytes.
  *
  * Layout at `path`:
  *  - `cells/cell=N/`  (id LONG, codes ARRAY<INT>) — Hive-partitioned,
  *    so a probe's scan lists ONLY the probed directories (partition
  *    pruning, plan-asserted in PqIndexSpec).
  *  - `centroids/`     coarse (cell, centroid) sidecar — ncells rows.
  *  - `codebook/`      PQ sidecar (j, c, centroid) — m×ksub rows.
  *
  * `probe` reads both sidecars (driver-sized), prunes to the `nprobe`
  * nearest cells, ADC-scores the surviving code rows against a lookup
  * table in the task closure, and lowers top-k through
  * `TakeOrderedAndProject`. With nprobe = ncells the result equals the
  * ephemeral full-corpus `Pq.adcTopK` under the same model EXACTLY —
  * the build→write→probe roundtrip loses nothing (0-row gate oracle
  * `ann_pqindex_topk`). `append` encodes new vectors with the FROZEN
  * sidecars (coarse + codebook) and appends only the touched cell
  * partitions — the per-batch maintenance path; rebuilds re-cluster
  * everything and are amortized across the query workload. */
object PqIndex {

  private def cellsPath(path: String) = s"$path/cells"
  private def centroidsPath(path: String) = s"$path/centroids"
  private def codebookPath(path: String) = s"$path/codebook"

  /** Build (or rebuild) the index: fit coarse centroids + PQ codebooks,
    * then ONE corpus pass assigns and encodes every vector (cell and
    * codes from the same kernel — the vector itself is never written). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
      ncells: Int, m: Int, ksub: Int, maxIter: Int = 12,
      seed: Long = 42L): Unit =
    buildWith(corpus, idCol, vecCol, path, ncells,
      Pq.train(corpus, vecCol, m, ksub, maxIter), seed)

  /** [[build]] with an ALREADY-TRAINED codebook (r17): `Pq.train` is a
    * deterministic function of (corpus, m, ksub, maxIter) — hash-ordered
    * init, fixed Lloyd passes — so a caller that already holds the
    * model for this corpus (the gate queries share one via a model
    * registry) gets a bit-identical index without paying the full
    * k-means train a second time. The m/ksub geometry rides in the
    * model itself. */
  def buildWith(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, ncells: Int, model: Pq.Model,
      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarse = SimilaritySearch.computeCentroids(corpus, vecCol, ncells, seed)
    require(coarse.nonEmpty, "cannot build an index on an empty corpus")
    encodeWithCell(corpus, idCol, vecCol, coarse, model)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(cellsPath(path))
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
    model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq
      .toDF("j", "c", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(codebookPath(path))
  }

  /** (id, codes, cell) in one typed pass: coarse assignment by max
    * (x·c − ‖c‖²/2) (the `SimilaritySearch.assignCells` scoring, kept in
    * lockstep) and PQ codes from `Pq.codesOf`. Assignment failures
    * (dimension drift, null vectors) fail loudly — a cell = -1 row would
    * be invisible to every probe (the `IvfIndex.append` rationale). */
  private def encodeWithCell(df: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Double]], model: Pq.Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb = model.codebooks
    val dsub = model.dsub
    val halfNorms = coarse.map(c => c.map(x => x * x).sum / 2.0)
    val dim = model.dim
    df.select(col(idCol).cast("long").as("id"),
        graft.functions.VectorFunctions.asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, vseq) =>
          require(vseq != null && vseq.length == dim,
            s"PqIndex: vector for id $id has dim " +
              s"${if (vseq == null) -1 else vseq.length}, expected $dim")
          val v = vseq.toArray
          var best = -1
          var bestS = Double.NegativeInfinity
          var c = 0
          while (c < coarse.length) {
            val cent = coarse(c)
            var s = 0.0
            var i = 0
            while (i < cent.length) { s += v(i) * cent(i); i += 1 }
            s -= halfNorms(c)
            if (s > bestS) { bestS = s; best = c }
            c += 1
          }
          (id, Pq.codesOf(cb, dsub, v).toSeq, best)
        }
      }.toDF("id", "codes", "cell")
  }

  /** Load the PQ sidecar back into a model. */
  def loadModel(spark: SparkSession, path: String): Pq.Model = {
    val rows = spark.read.parquet(codebookPath(path))
      .orderBy(col("j"), col("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no PQ codebook at $path")
    val m = rows.map(_._1).max + 1
    val codebooks = Array.tabulate(m)(j => rows.filter(_._1 == j).map(_._3))
    Pq.Model(m, codebooks.head.head.length, codebooks)
  }

  private def loadCentroids(spark: SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(centroidsPath(path))
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** ADC top-k over the `nprobe` nearest cells: the scan lists only the
    * probed `cell=N/` directories and reads m ints per vector. */
  def probe(spark: SparkSession, path: String, query: Seq[Double], k: Int,
      nprobe: Int): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val model = loadModel(spark, path)
    val probed = SimilaritySearch.nearestCells(centroids, query, nprobe)
    Pq.adcTopK(
      spark.read.parquet(cellsPath(path))
        .filter(col("cell").isin(probed: _*))
        .select(col("id"), col("codes")),
      model, query, k)
  }

  /** Incremental append with the index's FROZEN coarse centroids and
    * codebook: new vectors land in existing cell partitions; untouched
    * cells are not rewritten. Probes see appends immediately. */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = newVecs.sparkSession
    encodeWithCell(newVecs, idCol, vecCol,
        loadCentroids(spark, path), loadModel(spark, path))
      .write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(cellsPath(path))
  }
}
