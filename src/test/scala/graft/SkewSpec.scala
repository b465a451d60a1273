package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  // 90% of rows share one hot key — the shape salting exists for.
  private lazy val skewed = {
    import spark.implicits._
    ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble)))
      .toDF("key", "value").repartition(8)
  }

  test("saltedSumCount equals the plain groupBy") {
    val plain = skewed.groupBy("key")
      .agg(round(sum("value"), 6).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "value", salts = 16)
      .select(col("key"), round(col("sum_value"), 6).as("s"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
  }

  test("saltedJoin equals the plain inner join (row multiset)") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B"), ("nomatch", "X"))
      .toDF("key", "tag")
    val plain = skewed.join(dim, Seq("key"))
      .groupBy("key", "tag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", salts = 8)
      .groupBy("key", "tag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
    // hot key present with full multiplicity
    assert(salted.exists { case (k, _, n) => k == "hot" && n == 900L })
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, col("key"), topK = 3).collect()
    assert(top.head.getString(0) === "hot")
    assert(top.head.getDouble(2) === 0.9)
  }

  test("AQE splits the skewed partition at runtime (the built-in path " +
      "salting complements)") {
    import spark.implicits._
    // SURVEY §7's scale rule is "skewed keys → salting or AQE skew-join";
    // Skew.saltedJoin is the manual form, this proves the AQE form engages
    // on the same hot-key shape so both legs of the claim are demonstrated.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      // force SMJ — a broadcast join would dodge the skew entirely
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val pad = "x" * 200
      val facts = ((1 to 20000).map(i => ("hot", s"$pad$i")) ++
        (1 to 2000).map(i => (s"k${i % 20}", s"$pad$i")))
        .toDF("key", "payload").repartition(8)
      val dim = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
        .map(k => (k, s"tag_$k")).toDF("key", "tag")

      val joined = facts.join(dim, Seq("key"))
      // collect() (not count()) — count() spawns its own QueryExecution;
      // the plan inspected below must be the one that actually ran.
      assert(joined.collect().length === 22000)

      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an AdaptiveSparkPlanExec root"))
      // query stages are leaf wrappers (their subtree is `.plan`, not
      // children), so a typed collect can't see the AQEShuffleRead nodes;
      // the final plan string carries the authoritative markers.
      val planStr = adaptive.executedPlan.toString
      assert(planStr.contains("skew=true") && planStr.contains("skewed"),
        s"expected AQE to mark the hot partition skewed:\n$planStr")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
