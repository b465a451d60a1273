package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class BucketedSpec extends SparkSpec {

  test("same-bucketed tables join without any shuffle exchange") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i", i * 1.5))
      .toDF("key", "name", "value")
    val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("key", "tag")

    Bucketed.write(facts, "graft_b_facts", "key", buckets = 8)
    Bucketed.write(dims, "graft_b_dims", "key", buckets = 8)
    try {
      val joined = Bucketed.join(spark, "graft_b_facts", "graft_b_dims", "key")
        // disable broadcast so the join must be SMJ — the point is proving
        // bucketing removes the exchanges, not that the dim broadcasts.
        .hint("merge")
      assert(joined.count() === 1000)

      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free co-located join, found:\n$plan")

      // correctness: equal to the unbucketed join.
      val plain = facts.join(dims, "key")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bucketed = Bucketed
        .join(spark, "graft_b_facts", "graft_b_dims", "key")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_facts")
      spark.sql("DROP TABLE IF EXISTS graft_b_dims")
    }
  }
}
