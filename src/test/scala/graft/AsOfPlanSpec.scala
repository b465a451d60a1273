package graft

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("plan: AsOfJoinExec node present, exactly two exchanges, sorted children") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("k", "t", "rv")
    val df = AsOfJoinPlan.asOfBackward(left, right, "k", "t", Seq("rv"))
    df.collect() // materialize so AQE exposes the final plan
    // AQE wraps stages as leaf nodes — walk through QueryStageExec.plan
    def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T])
        : Seq[T] = {
      val stages = p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q
      }
      p.collect(pf) ++ stages.flatMap(q => collectAll(q.plan)(pf))
    }
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(collectAll(plan) { case e: AsOfJoinExec => e }.length === 1,
      plan.toString)
    val exchanges = collectAll(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.length === 2, "both sides shuffle on the key once")
    val sorts = collectAll(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.length === 2, "both sides sorted by (key, ts)")
  }

  test("backward: hand case — latest at-or-before, equal ts matches, " +
      "missing key nulls") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 10:00:00"), "p3"), // no key-2 right rows
      (3L, ts("2024-01-01 08:00:00"), "p4")  // right row is later → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 9.0),
      (1L, ts("2024-01-01 10:00:00"), 10.0), // equal ts → matches p1
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (3L, ts("2024-01-01 09:00:00"), 3.0)
    ).toDF("k", "t", "v")
    val got = AsOfJoinPlan.asOfBackward(left, right, "k", "t", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v")
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(got === Array(
      ("p1", Some(10.0)), ("p2", Some(11.0)),
      ("p3", None), ("p4", None)))
  }

  test("forward: earliest at-or-after") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 11:30:00"), "p2")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0), // equal ts → matches p1
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0)
    ).toDF("k", "t", "v")
    val got = AsOfJoinPlan.asOfForward(left, right, "k", "t", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got === Array(("p1", 10.0), ("p2", 12.0)))
  }

  test("null semantics: null left ts matches nothing; null right ts " +
      "never blocks or matches; null keys match null keys") {
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "a"),
      (Some(1L), None, "b"),                // null left ts → null
      (None, Some(ts("2024-01-01 10:00:00")), "c") // null key side
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), None, 99.0),               // null right ts: skipped
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 9.0),
      (None, Some(ts("2024-01-01 09:30:00")), 7.0) // null key row
    ).toDF("k", "t", "v")
    val got = AsOfJoinPlan.asOfBackward(left, right, "k", "t", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v")
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(got === Array(
      ("a", Some(9.0)), ("b", None), ("c", Some(7.0))))
  }

  test("equivalence with the composed operator on the real event stream " +
      "(both directions, multi-partition)") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .repartition(7)
    for (forward <- Seq(false, true)) {
      val viaPlan =
        if (forward) AsOfJoinPlan.asOfForward(purchases, clicks,
          "user_id", "ts", Seq("click_value"))
        else AsOfJoinPlan.asOfBackward(purchases, clicks,
          "user_id", "ts", Seq("click_value"))
      val viaWindow =
        if (forward) AsOfJoin.asOfForward(purchases, clicks,
          "user_id", "ts", Seq("click_value"))
        else AsOfJoin.asOfBackward(purchases, clicks,
          "user_id", "ts", Seq("click_value"))
      assert(viaPlan.columns.toSeq === viaWindow.columns.toSeq)
      val a = sortedRows(viaPlan)
      val b = sortedRows(viaWindow)
      assert(a.length === b.length && a.sameElements(b),
        s"forward=$forward diverged from the composed baseline")
    }
  }

  test("guards: missing column, empty payload, prefix collision") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfBackward(l, r, "nope", "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfBackward(l, r, "k", "t", Nil)
    }
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfBackward(l.withColumn("asof_x", lit(1)), r,
        "k", "t", Seq("v"))
    }
  }

  test("guards: key/ts type mismatch fails at analysis time — the exec " +
      "compares right-side values with LEFT-typed orderings, so a " +
      "mismatch would otherwise be an executor-side ClassCastException") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val rIntKey = Seq((1, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfBackward(l, rIntKey, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("type mismatch"))
    val rLongTs = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOfBackward(l, rLongTs, "k", "t", Seq("v"))
    }
  }

  test("column resolution is case-insensitive under the default " +
      "resolver, like the composed operator's col() path") {
    val l = Seq((1L, ts("2024-01-01 00:02:00"))).toDF("Key", "TS")
    val r = Seq((1L, ts("2024-01-01 00:01:00"), 7.0))
      .toDF("key", "ts", "v")
    val got = AsOfJoinPlan.asOfBackward(l, r, "kEy", "tS", Seq("v"))
      .select(col("asof_v")).collect()
    assert(got.map(_.getDouble(0)).toSeq === Seq(7.0))
  }
}
