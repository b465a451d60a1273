package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoin output equals the plain semi join; pre-filter prunes " +
      "most non-matching probe rows") {
    // probe: 20k rows over keys 0..1999; build: 50 selective keys.
    val large = (0L until 20000L).map(i => (i % 2000, i)).toDF("k", "payload")
    val small = (0L until 2000L by 40L).toDF("k")
    val got = BloomJoin.semiJoin(large, small, "k")
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val expected = large.join(small, Seq("k"), "left_semi")
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(got === expected)
    assert(got.nonEmpty)

    // shuffle-reduction evidence: survivors ≈ matches + fpp·|probe|.
    val (survivors, total) = BloomJoin.prefilterSurvivors(large, small, "k")
    val matches = expected.length
    assert(total === 20000L)
    assert(survivors >= matches)
    assert(survivors <= matches + (0.05 * total).toLong,
      s"bloom pruned too little: $survivors of $total (matches=$matches)")
  }
}
