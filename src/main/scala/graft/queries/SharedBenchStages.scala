package graft.queries

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BENCH-ONLY cross-query stage sharing (VERDICT r9 task 6): the three
  * connected-components consumers (`dedup_clusters`, `dedup_apply`,
  * `dedup_apply_best`) all derive from the SAME
  * `prefixFilterJaccardPairs(documents, n=3, t=0.8)` call; running each
  * gate form in the bench recomputes that pair pipeline — and its
  * internal localCheckpoint — three times in one session, which is
  * exactly where r9's in-suite block pressure concentrated. The bench
  * overrides pull the pair table from this memo instead: computed once
  * per (session, sfDir), materialized with an EAGER localCheckpoint, and
  * its block ids PINNED so the harness's between-query purge
  * ([[graft.JvmHygiene.purgeBlocks]]) does not unpersist a live
  * checkpoint out from under the next query (truncated lineage cannot
  * be recomputed — the r9 tail-warning interaction).
  *
  * The correctness gate (Verify) never sees this: it runs the plain
  * `queries` forms, each self-contained. At production scale the same
  * idea is "materialize the pair table once, run clusters/apply/policy
  * passes over it" — the memo is the single-process stand-in. */
object SharedBenchStages {
  private case class Entry(session: SparkSession, pairs: DataFrame,
    pinned: Set[Int])
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Entry]()

  private def key(s: SparkSession, d: String) =
    (System.identityHashCode(s), d)

  /** The shared (id_a, id_b, jaccard) pair table for `documents` in
    * `d` — eagerly checkpointed on first use in this session. Only the
    * OUTER pair-table checkpoint stays pinned: the generator's internal
    * shingle-base checkpoint (`prefixFilterJaccardPairs`'s own
    * localCheckpoint, which runs during plan construction) is DEAD once
    * the pair table materializes, so it is unpersisted here rather than
    * left for the between-query purge to find — pinning it would hold
    * the largest intermediate of the whole stage resident for every
    * remaining query in the bin. (`localCheckpoint()` is eager; no
    * extra action is needed to materialize.) */
  def prefixPairs(s: SparkSession, d: String): DataFrame =
    cache.computeIfAbsent(key(s, d), _ => {
      val before = s.sparkContext.getPersistentRDDs.keySet.toSet
      val pairsDf = Dedup.prefixFilterJaccardPairs(
        Tables.t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
      // ids persisted by the generator itself (its internal base cp)
      val mid = s.sparkContext.getPersistentRDDs.keySet.toSet
      val cp = pairsDf.localCheckpoint() // eager: materializes now
      val after = s.sparkContext.getPersistentRDDs.keySet.toSet
      // blocking, for the same reason purgeBlocks is: async removals of
      // the stage's largest intermediate would overlap — and jitter —
      // the remainder of the first consumer's timed stages
      s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if ((mid -- before).contains(id))
          try rdd.unpersist(blocking = true)
          catch { case _: Exception => () }
      }
      Entry(s, cp, after -- mid)
    }).pairs

  /** Block ids the between-query purge must leave alone (live
    * checkpoints of memoized stages in THIS session). */
  def pinnedIds(s: SparkSession): Set[Int] = {
    import scala.jdk.CollectionConverters._
    val h = System.identityHashCode(s)
    cache.asScala.collect {
      case ((k, _), e) if k == h => e.pinned
    }.flatten.toSet
  }

  /** Drop memo entries AND unpersist their pinned blocks (best-effort:
    * Bench calls this before stopping the session; long-lived callers —
    * the spec suite's shared session — would otherwise leak the
    * checkpoint blocks forever since nothing else may unpersist a
    * pinned id). */
  def clear(): Unit = {
    import scala.jdk.CollectionConverters._
    cache.asScala.values.foreach { e =>
      try {
        val sc = e.session.sparkContext
        // per-RDD try (the purgeBlocks discipline): one throwing
        // unpersist must not leak the entry's remaining pinned blocks
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (e.pinned.contains(id)) {
            try rdd.unpersist(blocking = false)
            catch { case _: Exception => () }
          }
        }
      } catch { case _: Exception => () }
    }
    cache.clear()
  }
}
