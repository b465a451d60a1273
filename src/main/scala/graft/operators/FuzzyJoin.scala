package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (record-linkage) joins with recall-1 blocking.
  *
  * A naive fuzzy join `levenshtein(a.s, b.s) <= k` has no equi-key, so
  * Spark plans a nested loop — quadratic at corpus scale. The scale-safe
  * form blocks on the DELETION NEIGHBORHOOD (SymSpell/FastSS scheme,
  * public algorithm): every string emits the set of variants reachable by
  * deleting up to `maxDist` characters, and two strings within edit
  * distance k always share at least one variant (delete the edited
  * positions from both sides of an optimal alignment and the remainders
  * coincide), so candidates joined on a variant have recall 1. False
  * positives exist (distance-2 strings can share a deletion variant) and
  * are removed by the exact verify pass, so the output EQUALS the
  * theta-join's — the DuckDB `levenshtein` oracle checks it end to end.
  *
  * Scale posture: the candidate shuffle carries `(xxhash64(variant), id)`
  * — 16-byte rows, never the strings; full strings re-attach by id only
  * for deduplicated candidate pairs, and the verify uses Spark's
  * thresholded `levenshtein(l, r, k)` (early-exit band DP). Variant count
  * per row is C(L,≤k): L+1 keys at k=1, ~L²/2 at k=2 — the scheme is for
  * SHORT keys (names, codes, titles), which is the record-linkage case.
  * Low-entropy columns (mass-shared values) make hot blocks; cap them
  * with `maxBlock` (drops blocks bigger than the cap — a shared-by-all
  * variant cannot certify a *useful* match anyway at k≪L, but the cap is
  * a recall trade documented at the call site; default keeps everything).
  */
object FuzzyJoin {

  /** All variants of `s` reachable by deleting up to `maxDist` chars
    * (including `s` itself), as a distinct array column. Pure column
    * expressions — codegen'd, one projection. */
  private[operators] def deleteVariants(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2, got $maxDist")
    // delete char at 1-based position i
    def del1(str: Column): Column =
      transform(sequence(lit(1), length(str)),
        i => concat(str.substr(lit(1), i - 1),
          str.substr(i + 1, length(str) - i)))
    val d1 = del1(s)
    val vs = if (maxDist == 1) concat(array(s), d1)
    else concat(array(s), d1, flatten(transform(d1, v => {
      // second deletion: only positions >= first deletion point would
      // suffice for distinctness, but position bookkeeping through a
      // lambda costs more than array_distinct on these short keys.
      // Same empty-string guard as the outer level: a length-1 input's
      // d1 is [""], and deleting from "" must yield [""] explicitly, not
      // lean on sequence(1,0)/negative-length substr.
      when(length(v) === 0, array(v)).otherwise(
        transform(sequence(lit(1), length(v)),
          i => concat(v.substr(lit(1), i - 1),
            v.substr(i + 1, length(v) - i))))
    })))
    // guard length 0 explicitly: sequence(1, 0) generates the DESCENDING
    // [1, 0], and the variant math then leans on substr's negative-length
    // behavior — works today, but semantics this operator shouldn't
    // depend on. An empty string's only variant is itself.
    array_distinct(when(length(s) === 0, array(s)).otherwise(vs))
  }

  /** Candidate (id_a, id_b) pairs from deletion-variant co-occurrence,
    * id_a < id_b, deduplicated. Only (hash, id) rides the shuffle. */
  private def candidatePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxBlock: Option[Int]): DataFrame = {
    val keyed = df.select(col(idCol).as("id"),
        explode(deleteVariants(col(strCol), maxDist)).as("v"))
      .select(col("id"), xxhash64(col("v")).as("h"))
    val blocks = maxBlock match {
      case Some(cap) =>
        // count per block map-side-combines to one row per distinct hash;
        // oversized blocks (low-entropy values) are dropped, not exploded
        val sizes = keyed.groupBy("h").agg(count(lit(1)).as("n"))
          .filter(col("n") <= cap).select("h")
        keyed.join(sizes, "h")
      case None => keyed
    }
    blocks.as("a").join(blocks.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Self-join: all pairs within `df` at edit distance <= maxDist.
    * Output (id_a, id_b, dist), id_a < id_b — equals the exhaustive
    * theta-join (recall-1 blocking + exact verify). */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxBlock: Option[Int] = None): DataFrame = {
    val cands = candidatePairs(df, idCol, strCol, maxDist, maxBlock)
    val strs = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // strings re-attach by id AFTER candidate dedup; thresholded
    // levenshtein returns -1 above maxDist (early-exit verify)
    val d = levenshtein(col("sa"), col("sb"), maxDist)
    cands
      .join(strs.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .withColumn("dist", d)
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Two-table record linkage: (left_id, right_id, dist) for every
    * left×right pair within edit distance <= maxDist. Same blocking and
    * verify discipline as the self-join form. */
  def linkage(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, maxBlock: Option[Int] = None): DataFrame = {
    val lk = left.select(col(leftId).as("left_id"),
        explode(deleteVariants(col(leftStr), maxDist)).as("v"))
      .select(col("left_id"), xxhash64(col("v")).as("h"))
    val rk = right.select(col(rightId).as("right_id"),
        explode(deleteVariants(col(rightStr), maxDist)).as("v"))
      .select(col("right_id"), xxhash64(col("v")).as("h"))
    // hot-block cap, same recall trade as the self-join form: the block
    // cost here is |L_block| × |R_block|, so the cap applies to the
    // SUMMED occupancy of a variant across both sides
    val (lb, rb) = maxBlock match {
      case Some(cap) =>
        val sizes = lk.select(col("h")).unionByName(rk.select(col("h")))
          .groupBy("h").agg(count(lit(1)).as("n"))
          .filter(col("n") <= cap).select("h")
        (lk.join(sizes, "h"), rk.join(sizes, "h"))
      case None => (lk, rk)
    }
    val cands = lb.join(rb, "h").select("left_id", "right_id").distinct()
    val ls = left.select(col(leftId).as("left_id"), col(leftStr).as("sa"))
    val rs = right.select(col(rightId).as("right_id"), col(rightStr).as("sb"))
    cands.join(ls, "left_id").join(rs, "right_id")
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("left_id"), col("right_id"), col("dist"))
  }

  /** Sorted-neighborhood blocking (Hernández/Stolfo): order the table by
    * a blocking key and compare each row only against its `window − 1`
    * sort successors — the OTHER classic linkage blocking. Where the
    * deletion neighborhood certifies recall for a known edit radius,
    * sorted-neighborhood bounds COST unconditionally (n·(w−1) candidate
    * pairs regardless of string length or distance cutoff) and catches
    * whatever the key design sorts together. Recall is key-dependent BY
    * DESIGN (pairs whose keys sort > w−1 apart are missed) — callers
    * choose keys like soundex or prefix+suffix; the oracle replays the
    * window definition exactly, so the gated contract is the blocking
    * semantics, not a recall claim.
    *
    * Scale shape — explicitly NOT a global Window (which would funnel
    * the table into one task): range-partition + sort by (key, id),
    * then each task slides a (w−1)-row buffer over its partition; the
    * only cross-partition data is each partition's FIRST w−1 rows,
    * collected to a (partitions × w)-row broadcast sidecar so the
    * predecessor task can close its boundary pairs. Degenerate
    * partitions (fewer than w−1 rows — possible only on tiny or
    * extremely skewed inputs) fall back to one task to keep the output
    * contract exact. Verify = thresholded banded levenshtein on
    * candidates only. Output: (id_a, id_b, dist), a before b in
    * (key, id) order. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
      keyCol: Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    val base = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"), keyCol.cast("string").as("k"))
      .as[(Long, String, String)]
    def sortInto(n: Int) = base
      .repartitionByRange(math.max(n, 1), col("k"), col("id"))
      .sortWithinPartitions("k", "id")
    // counts AND heads come from ONE pass over the sorted partitions
    // (ADVICE r7 #4: separate it.size / heads jobs re-ran the
    // range-shuffle+sort once each; now the sort runs once for the
    // sidecar and once for the pair pass — two jobs total, not three)
    def partStats(ds: org.apache.spark.sql.Dataset[(Long, String, String)])
        : Map[Int, (Int, Array[(Long, String, String)])] =
      ds.rdd.mapPartitionsWithIndex { (i, it) =>
        val head = it.take(window - 1).toArray
        Iterator.single((i, (head.length + it.size, head)))
      }.collect().toMap
    var sorted = sortInto(parallelism)
    var stats = partStats(sorted)
    if (stats.size > 1 &&
        stats.filter(_._1 < stats.size - 1).values.exists(_._1 < window - 1)) {
      sorted = sortInto(1) // degenerate partitioning: exactness first
      stats = partStats(sorted)
    }
    val rdd = sorted.rdd
    val heads = stats.map { case (i, (_, h)) => (i, h) }
    val bc = spark.sparkContext.broadcast(heads)
    val pairs = rdd.mapPartitionsWithIndex { (pi, it) =>
      // rows beyond the partition come from the successor's head: they
      // pair as SECOND members with this partition's residents, never
      // lead pairs themselves (those belong to the successor task)
      val all = it.map((_, true)) ++
        bc.value.getOrElse(pi + 1, Array.empty).iterator.map((_, false))
      val q = scala.collection.mutable.Queue[((Long, String, String), Boolean)]()
      while (q.size < window && all.hasNext) q.enqueue(all.next())
      new Iterator[(Long, Long, String, String)] {
        private var pending: Iterator[(Long, Long, String, String)] =
          Iterator.empty
        override def hasNext: Boolean = {
          while (!pending.hasNext && q.nonEmpty) {
            val (head, resident) = q.dequeue() // q now holds ≤ w−1 successors
            if (resident)
              pending = q.iterator.map { case ((idb, sb, _), _) =>
                (head._1, idb, head._2, sb)
              }.toArray.iterator
            if (all.hasNext) q.enqueue(all.next())
          }
          pending.hasNext
        }
        override def next(): (Long, Long, String, String) = pending.next()
      }
    }.toDF("id_a", "id_b", "sa", "sb")
    pairs
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
