package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of: latest prior row attaches; equal-ts matches " +
    "inclusively; no-prior yields null") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val quotes = Seq((1L, ts(0), 10.0), (1L, ts(10), 11.0), (2L, ts(5), 20.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (100L, 1L, ts(10)), // equal ts → inclusive match (11.0)
      (101L, 1L, ts(15)), // latest prior = 11.0
      (102L, 1L, ts(5)),  // between quotes → 10.0
      (103L, 2L, ts(1)),  // before any quote → null
      (104L, 3L, ts(30))) // key with no quotes at all → null
      .toDF("trade_id", "key", "ts")

    val got = AsOfJoin.asOfBackward(trades, quotes, "key", "ts", Seq("px"))
      .select(col("trade_id"), col("asof_px"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      100L -> Some(11.0), 101L -> Some(11.0), 102L -> Some(10.0),
      103L -> None, 104L -> None))
  }

  test("tolerance as-of: stale matches null out; boundary is inclusive") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val quotes = Seq((1L, ts(0), 10.0), (1L, ts(10), 11.0), (2L, ts(5), 20.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (100L, 1L, ts(12)), // prior at :10, 120 s ago → within 300 s
      (101L, 1L, ts(15)), // prior at :10, 300 s ago → inclusive boundary
      (102L, 1L, ts(16)), // prior at :10, 360 s ago → stale, nulled
      (103L, 2L, ts(1)),  // no prior at all → null
      (104L, 1L, ts(5)))  // prior at :00, 300 s ago → inclusive boundary
      .toDF("trade_id", "key", "ts")

    val got = AsOfJoin.asOfTolerance(trades, quotes, "key", "ts",
        Seq("px"), toleranceSeconds = 300)
      .select(col("trade_id"), col("asof_px"), col("asof_ts"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
          r.isNullAt(2)))
      .toMap
    assert(got === Map(
      100L -> (Some(11.0), false), 101L -> (Some(11.0), false),
      102L -> (None, true), 103L -> (None, true),
      104L -> (Some(10.0), false)))
  }

  test("forward as-of: earliest following row attaches; equal-ts matches " +
    "inclusively; no-follower yields null") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val quotes = Seq((1L, ts(0), 10.0), (1L, ts(10), 11.0), (2L, ts(5), 20.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (100L, 1L, ts(10)), // equal ts → inclusive match (11.0)
      (101L, 1L, ts(15)), // nothing follows → null
      (102L, 1L, ts(5)),  // next quote at :10 → 11.0
      (103L, 2L, ts(1)),  // next quote at :05 → 20.0
      (104L, 3L, ts(30))) // key with no quotes at all → null
      .toDF("trade_id", "key", "ts")

    val got = AsOfJoin.asOfForward(trades, quotes, "key", "ts", Seq("px"))
      .select(col("trade_id"), col("asof_px"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      100L -> Some(11.0), 101L -> None, 102L -> Some(11.0),
      103L -> Some(20.0), 104L -> None))
  }

  test("null-ts left rows carry null in BOTH directions (desc_nulls_first " +
    "keeps forward consistent with backward)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val quotes = Seq((1L, ts(0), 10.0), (1L, ts(10), 11.0))
      .toDF("key", "ts", "px")
    val trades = Seq((100L, 1L, Option(ts(5))), (101L, 1L, Option.empty[Timestamp]))
      .toDF("trade_id", "key", "ts")
    def px(df: org.apache.spark.sql.DataFrame) = df
      .select(col("trade_id"), col("asof_px")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val back = px(AsOfJoin.asOfBackward(trades, quotes, "key", "ts", Seq("px")))
    val fwd = px(AsOfJoin.asOfForward(trades, quotes, "key", "ts", Seq("px")))
    assert(back === Map(100L -> Some(10.0), 101L -> None))
    assert(fwd === Map(100L -> Some(11.0), 101L -> None))
  }

  test("nearest: closest side wins, equidistant → backward, " +
      "one-sided and no-match rows keep as-of semantics") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val quotes = Seq((1L, ts(0), 10.0), (1L, ts(10), 11.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (100L, 1L, ts(2)),  // 2 min back vs 8 fwd → backward 10.0
      (101L, 1L, ts(9)),  // 9 back vs 1 fwd → forward 11.0
      (102L, 1L, ts(5)),  // equidistant → backward 10.0
      (103L, 1L, ts(30)), // after all quotes → backward only
      (104L, 2L, ts(5)))  // no quotes for key → null
      .toDF("trade_id", "key", "ts")
    val got = AsOfJoin.asOfNearest(trades, quotes, "key", "ts",
        "trade_id", Seq("px"))
      .select(col("trade_id"), col("near_dir"), col("near_px"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got === Map(
      100L -> ((Some("b"), Some(10.0))),
      101L -> ((Some("f"), Some(11.0))),
      102L -> ((Some("b"), Some(10.0))),
      103L -> ((Some("b"), Some(11.0))),
      104L -> ((None, None))))
  }
}
