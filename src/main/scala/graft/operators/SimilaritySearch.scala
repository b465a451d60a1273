package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column — the Spark re-expression of
  * the reference's Qdrant `search` (qdrant_text_loader.py:122-142, SURVEY.md
  * op K1), plus the ANN scale paths the reference delegates to Qdrant's index.
  *
  * Scale notes:
  *  - `topK` broadcasts the single query vector as a literal — the scan is
  *    one embarrassingly-parallel stage + a tiny TakeOrdered; this is the
  *    exact-search baseline at any corpus size.
  *  - `topKForQueries` is a broadcast nested-loop (queries must be the small
  *    side) with a per-query window rank — brute force, exact.
  *  - `topKIvf` is the index path: k-means-style centroids on a sample,
  *    partition corpus by nearest centroid, probe only `nprobe` cells per
  *    query. Recall < 1, cost ~ nprobe/ncells of brute force.
  */
object SimilaritySearch {

  /** Exact top-k by cosine for one query vector. Ties broken by id.
    * Degenerate corpus vectors (zero norm / dim mismatch) score null and
    * are excluded — the [[topKForQueries]] contract. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, scoreDecimals: Int = 6): DataFrame =
    corpus.select(col(idCol),
        round(cosineSimilarity(col(vecCol), typedLit(query)), scoreDecimals)
          .as("score"))
      .filter(col("score").isNotNull)
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)

  /** Exact top-k per query row (broadcast the queries side). Degenerate
    * corpus vectors (zero norm / dimension mismatch) score null and are
    * EXCLUDED — without the filter they would back-fill ranks on corpora
    * with < k valid candidates, diverging from [[topKForQueriesHeap]],
    * which never emits them. */
  def topKForQueries(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(queryId).as("query_id"), col(corpusId).as("id"),
        cosineSimilarity(col(corpusVec), col(queryVec)).as("score"))
      .filter($"score".isNotNull)
    val w = Window.partitionBy($"query_id")
      .orderBy(desc("score"), $"id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** Batch top-k with per-partition bounded heaps — the scale form of
    * `topKForQueries`. The window form sorts EVERY (query, corpus) score
    * through a shuffle; here each partition keeps only the k best
    * candidates per query in a bounded heap, so the shuffle carries
    * ≤ partitions·queries·k rows and the final exact re-rank is tiny.
    * Output contract identical (rank ≤ k, score desc, id tiebreak). */
  def topKForQueriesHeap(corpus: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Double])], k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    val cand = corpus
      .select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val qs = bq.value
        // max of this ordering = WORST kept candidate (lowest score,
        // then highest id) — what a full heap evicts first.
        val evictFirst =
          Ordering.by[(Double, Long), (Double, Long)] { case (s, id) =>
            (-s, id)
          }
        // keyed map, not a list scanned per row — lookup must be O(1) or
        // the kernel degrades to O(rows · queries²) on large query batches.
        val heaps = scala.collection.mutable.LongMap(qs.map { case (qid, _) =>
          qid -> scala.collection.mutable.PriorityQueue
            .empty[(Double, Long)](evictFirst)
        }: _*)
        it.foreach { case (id, v) =>
          val arr = v.toArray
          qs.foreach { case (qid, qv) =>
            val s = localCosine(arr, qv)
            if (!s.isNaN) {
              val h = heaps(qid)
              if (h.size < k) h.enqueue((s, id))
              else {
                val worst = h.head
                if (s > worst._1 || (s == worst._1 && id < worst._2)) {
                  h.dequeue(); h.enqueue((s, id))
                }
              }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (s, id) => (qid, id, s) }
        }
      }
      .toDF("query_id", "id", "score")
    // final exact re-rank over ≤ partitions·queries·k rows.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact k-NN graph: every vector's `k` most-cosine-similar neighbors
    * with dense rank — the SemDeDup / graph-dedup / diversity-sampling
    * building block. Scores are rounded in-plan BEFORE ranking so the
    * (score desc, dst) order is reproducible across engines. All-pairs:
    * the labeled verification / small-corpus form — at corpus scale use
    * [[knnGraphCells]] (cell-restricted candidates, audit-dominated by
    * this exact form). */
  def knnGraph(embs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val e = Dedup.spread(embs)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        round(cosineSimilarity(col("a.v"), col("b.v")), 6).as("score"))
    val w = Window.partitionBy(col("src")).orderBy(desc("score"), col("dst"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[knnGraph]] restricted to a set of source ids: each SOURCE's exact
    * k nearest neighbors over the full corpus — identical output to
    * `knnGraph(...).filter(src ∈ sources)` but O(|sources|·N) instead of
    * O(N²). The source side (ids + vectors, batch-sized — e.g. contrastive
    * anchors) is broadcast, so the corpus never shuffles: one
    * broadcast-nested-loop stage + a window over ≤ |sources|·N rows. */
  def knnGraphForSources(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, sources: DataFrame, sourceIdCol: String): DataFrame = {
    val e = Dedup.spread(embs)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val src = e.join(
      broadcast(sources.select(col(sourceIdCol).as("id")).distinct()),
      Seq("id"))
    val pairs = broadcast(src).as("a")
      .join(e.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        round(cosineSimilarity(col("a.v"), col("b.v")), 6).as("score"))
    val w = Window.partitionBy(col("src")).orderBy(desc("score"), col("dst"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate k-NN graph, cell-restricted: candidates are limited to
    * vectors sharing the node's IVF cell, so the join is per-cell
    * (sum of cell² instead of n²) and embarrassingly parallel across
    * cells. Neighbors living in other cells are missed — recall < 1 by
    * design; every emitted score is dominated by the exact graph's score
    * at the same (src, rank), which is the 0-row `knn_graph_dominance`
    * audit. Same columns and ranking contract as [[knnGraph]]. */
  def knnGraphCells(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, ncells: Int = 16, seed: Long = 42L): DataFrame = {
    val centroids = computeCentroids(embs, vecCol, ncells, seed)
    val cells = assignCells(embs, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col("v"), col("cell"))
    val pairs = cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        round(cosineSimilarity(col("a.v"), col("b.v")), 6).as("score"))
    val w = Window.partitionBy(col("src")).orderBy(desc("score"), col("dst"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor, the `k` corpus ids with the smallest md5(anchor|candidate)
    * rank that are neither the anchor itself nor one of its `exclude`
    * pairs — a (src, dst) DataFrame, typically the [[knnGraph]] output
    * (whose columns already carry those names). Hash ranking draws a
    * uniform-pseudorandom sample that is REPRODUCIBLE across runs,
    * retries, and engines — rand() would re-deal negatives on every
    * retry, silently changing the training set.
    *
    * This all-pairs form is the verification / small-anchor-set shape
    * (anchor sets are usually batch-sized); at corpus scale, exploit that
    * the winners are exactly the k smallest hashes per anchor: pre-filter
    * candidates to a small hash prefix (md5 is uniform, so a prefix
    * window sized to ~10·k survivors suffices, with one adaptive retry
    * for unlucky anchors) before ranking. */
  def negativeSamples(items: DataFrame, idCol: String, anchors: DataFrame,
      anchorIdCol: String, exclude: DataFrame, k: Int): DataFrame = {
    // distinct: a duplicated anchor row would duplicate every candidate
    // pair, and row_number over the identical order keys would spend two
    // ranks per candidate — k rows but < k DISTINCT negatives.
    val cand = anchors.select(col(anchorIdCol).cast("long").as("anchor_id"))
      .distinct()
      .crossJoin(items.select(col(idCol).cast("long").as("neg_id")))
      .filter(col("anchor_id") =!= col("neg_id"))
      .join(exclude.select(col("src").cast("long").as("anchor_id"),
          col("dst").cast("long").as("neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
    val h = md5(concat(col("anchor_id").cast("string"), lit("|"),
      col("neg_id").cast("string")))
    val w = Window.partitionBy(col("anchor_id")).orderBy(h, col("neg_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def localCosine(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IVF-style approximate search: centroids from a deterministic sample
    * (k-means|| would be the production path; here a single Lloyd pass over
    * a seeded sample keeps it dependency-free and deterministic), corpus
    * bucketed by nearest centroid, queries probe `nprobe` nearest cells.
    *
    * This form recomputes the assignment per call — fine for one-off
    * queries; a query WORKLOAD should `IvfIndex.build` once and probe the
    * persisted, cell-partitioned index (partition-pruned reads). */
  def topKIvf(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, ncells: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val centroids = computeCentroids(corpus, vecCol, ncells, seed)
    val assigned = assignCells(corpus, idCol, vecCol, centroids)
    val probed = nearestCells(centroids, query, nprobe)
    assigned.filter(col("cell").isin(probed: _*))
      .select(col(idCol),
        round(cosineSimilarity(col("v"), typedLit(query)), 6).as("score"))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)
  }

  /** Deterministic sample → one Lloyd refinement pass (k-means|| would be
    * the production path; this keeps it dependency-free and seeded). */
  private[operators] def computeCentroids(corpus: DataFrame, vecCol: String,
      ncells: Int, seed: Long): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // null vectors carry no centroid information and would NPE the
    // driver-side Lloyd pass; they are excluded HERE so the cell
    // ASSIGNMENT (which names the offending id) owns the loud failure
    val sample = corpus.select(asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(col("v").cast("string"), lit(seed)))
      .limit(ncells * 8)
      .as[Seq[Double]].collect()
    val init = sample.take(ncells).map(_.toArray)
    if (sample.isEmpty) Array.empty[Array[Double]]
    else lloydPass(sample.map(_.toArray), init)
  }

  /** Assign each corpus vector to its nearest centroid: the argmax is ONE
    * aggregate over a centroid-array literal inside a single projection —
    * no crossJoin row blowup, no per-id window shuffle; the corpus streams
    * through one codegen stage (the form that survives a 100 TB scan). The
    * accumulator is a (best-dot, best-cell) struct; lambda variables
    * evaluate once per element. Returns (idCol, v, cell). */
  private[operators] def assignCells(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]]): DataFrame = {
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    corpus
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("cell",
        aggregate(
          sequence(lit(0), lit(math.max(centroids.length - 1, 0))),
          struct(lit(Double.NegativeInfinity).as("d"), lit(-1).as("i")),
          (acc, i) => {
            val d = vectorDot(col("v"), element_at(centLit, i + 1))
            when(d > acc.getField("d"),
              struct(d.as("d"), i.as("i"))).otherwise(acc)
          },
          acc => acc.getField("i")))
  }

  /** The nprobe cells whose centroids are nearest the query (by dot). */
  private[operators] def nearestCells(centroids: Array[Array[Double]],
      query: Seq[Double], nprobe: Int): Seq[Int] = {
    val q = query.toArray
    centroids.zipWithIndex
      .map { case (c, i) => (i, dot(c, q)) }
      .sortBy { case (i, d) => (-d, i) }
      .take(nprobe).map(_._1).toSeq
  }

  private[operators] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def lloydPass(points: Array[Array[Double]],
      init: Array[Array[Double]]): Array[Array[Double]] = {
    val k = init.length
    val dim = init.head.length
    val sums = Array.fill(k)(new Array[Double](dim))
    val counts = new Array[Int](k)
    points.foreach { p =>
      var best = 0; var bestD = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val d = dot(p, init(c))
        if (d > bestD) { bestD = d; best = c }
        c += 1
      }
      counts(best) += 1
      var j = 0
      while (j < dim) { sums(best)(j) += p(j); j += 1 }
    }
    (0 until k).map { c =>
      if (counts(c) == 0) init(c)
      else sums(c).map(_ / counts(c))
    }.toArray
  }

  private implicit class ColName(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
