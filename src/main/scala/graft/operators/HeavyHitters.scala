package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012) — the deterministic
  * counter-based frequent-items sketch next to [[CmsSketch]]'s
  * hash-based one: k counters, decrement-all on overflow. Guarantees,
  * with n = stream length:
  *
  *   - every item with true count > n/(k+1) IS in the summary
  *     (deleting one occurrence of an item costs k+1 stream elements,
  *     so an item can be fully deleted at most n/(k+1) times over);
  *   - each retained estimate undercounts by at most n/(k+1).
  *
  * The merge (sum counters pairwise, keep the k largest, subtract the
  * (k+1)-th largest from the kept) preserves both bounds, which is what
  * makes the summary map-side combinable: every partition reduces to a
  * ≤ k-entry map before anything shuffles, and the driver sees one
  * k-entry sidecar — a 100 TB token stream costs one pass and k
  * counters per task, no token-keyed shuffle.
  *
  * Gate discipline ("sketch proposes, exact disposes"): the SUMMARY's
  * exact contents depend on merge order (any MG implementation's do),
  * so the driver-gated operator [[frequentItems]] never emits raw
  * estimates — it joins the candidate set back to the corpus for exact
  * counts of JUST those ≤ k items and keeps count·k > n. By the
  * guarantee, that output is exactly {items with count > n/k} — a
  * deterministic, oracle-replayable set — while the corpus-sized exact
  * aggregation the naive form would shuffle never happens (only
  * candidate rows survive the semi-join into the count). */
object HeavyHitters {

  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1L)
        case None if b.size < k => b.updated(v, 1L)
        case None =>
          // decrement-all; drop zeros (the classic MG step)
          b.flatMap { case (kk, c) =>
            if (c > 1L) Some(kk -> (c - 1L)) else None
          }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator.map { kk =>
        kk -> (a.getOrElse(kk, 0L) + b.getOrElse(kk, 0L))
      }.toMap
      if (sum.size <= k) sum
      else {
        // keep the k largest, subtract the (k+1)-th largest count
        val sorted = sum.toSeq.sortBy { case (kk, c) => (-c, kk) }
        val cut = sorted(k)._2
        sorted.take(k).flatMap { case (kk, c) =>
          if (c - cut > 0L) Some(kk -> (c - cut)) else None
        }.toMap
      }
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b

    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form of the raw summary: map<item, estimate>. Estimates and
    * membership beyond the guarantee are merge-order-dependent — use
    * [[frequentItems]] for the deterministic gated set. */
  def misraGries(item: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(item)

  /** Fold ALREADY-BUILT summaries (the persisted-daily streaming path:
    * yesterday's stored map ∪ today's fresh one) without re-touching
    * raw history — [[MisraGries.merge]] lifted to an aggregator over
    * map rows. Unlike the KMV fold this is NOT replay-idempotent: a
    * crash-replayed batch adds its counts twice, and the guarantee must
    * be stated against the DELIVERED stream, not the true one — every
    * bound's n grows by the replayed volume, so presence is guaranteed
    * for items above n_delivered/(k+1). An item that was heavy against
    * the true stream but sits near the threshold CAN lose its guarantee
    * when replays of batches not containing it inflate n_delivered
    * (e.g. k=2, true stream A×4 + 7 singletons: bound 11/3 ≈ 3.67 keeps
    * A; replay 5 foreign singletons and the bound is 16/3 ≈ 5.33 > 4).
    * Consumers sizing k for a replay-prone source should budget for the
    * at-least-once inflation: guarantee margin scales with
    * k − (replayed fraction)·k, so pick k against the worst-case
    * delivered volume, not the nominal daily volume. */
  class MergeAgg(k: Int)
      extends Aggregator[Map[String, Long], Map[String, Long],
        Map[String, Long]] {
    private val mg = new MisraGries(k)
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long],
        v: Map[String, Long]): Map[String, Long] = mg.merge(b, v)
    def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = mg.merge(a, b)
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Exactly the items whose true count exceeds n/k, with their EXACT
    * counts: MG proposes ≤ k candidates (one-pass, no item-keyed
    * shuffle), an exact count over the candidate semi-join disposes.
    * Output: (item, cnt) — deterministic by the MG guarantee
    * ({count > n/k} ⊆ {count > n/(k+1)} ⊆ candidates, merge order
    * irrelevant). `items` is one string column. */
  def frequentItems(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val src = items.select(col(itemCol).as("item")).filter($"item".isNotNull)
    // one pass: candidates + the exact stream length ride one aggregate
    val row = src.agg(misraGries($"item", k).as("cand"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val cand = row.getMap[String, Long](0).keys.toSeq
    if (cand.isEmpty) {
      src.sparkSession.emptyDataFrame
        .select(lit("").as("item"), lit(0L).as("cnt")).limit(0)
    } else {
      // exact counts for ≤ k items: the semi-join keeps candidate rows
      // only, so the groupBy shuffles a candidate-bounded stream
      src.filter($"item".isin(cand: _*))
        .groupBy($"item").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * k > n)
    }
  }
}
