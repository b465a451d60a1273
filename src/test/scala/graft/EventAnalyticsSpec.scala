package graft

import graft.operators.EventAnalytics
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only STRICTLY ordered stage progressions") {
    val events = Seq(
      // user 1: view → click → purchase in order (full funnel)
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: purchase BEFORE the click — stalls at stage 2
      (2L, ts("2024-01-02 10:00:00"), "view"),
      (2L, ts("2024-01-02 09:00:00"), "purchase"),
      (2L, ts("2024-01-02 11:00:00"), "click"),
      // user 3: click before any view — never enters the funnel past 1?
      // no: user 3 has NO view at all → not even stage 1
      (3L, ts("2024-01-03 10:00:00"), "click"),
      (3L, ts("2024-01-03 11:00:00"), "purchase"),
      // user 4: view only
      (4L, ts("2024-01-04 10:00:00"), "view"),
      // user 5: view → click, where an EARLIER purchase must not count,
      // but a later one must
      (5L, ts("2024-01-05 08:00:00"), "purchase"),
      (5L, ts("2024-01-05 10:00:00"), "view"),
      (5L, ts("2024-01-05 11:00:00"), "click"),
      (5L, ts("2024-01-05 12:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // stage 1: users 1,2,4,5; stage 2: 1,2,5; stage 3: 1,5
    assert(got === Array((1, "view", 4L), (2, "click", 3L),
      (3, "purchase", 2L)))
  }

  test("funnel equal timestamps do NOT satisfy the strict ordering") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got === Array((1, 1L), (2, 0L)))
  }

  test("retention: offsets measured from each user's first-seen day") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-03 10:00:00"), "click"), // offset 2
      (2L, ts("2024-01-01 23:00:00"), "view"),
      (2L, ts("2024-01-01 23:30:00"), "view"),  // same day → one active day
      (3L, ts("2024-01-03 10:00:00"), "view")   // its own cohort
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.retention(events, "user_id", "ts")
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("2024-01-01", 0) -> 2L,
      ("2024-01-01", 2) -> 1L,
      ("2024-01-03", 0) -> 1L))
  }

  test("trailingZScore: spike flags against the trailing RANGE baseline; " +
      "hour gaps do not shift it") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d $h%02d:30:00")
    // 10 steady hours of 2 events, a 3-hour GAP, then a 20-event spike.
    val rows =
      (0 until 10).flatMap(h => Seq.fill(2)(ts(1, h))) ++
      Seq.fill(20)(ts(1, 13))
    val events = rows.map(t => (1L, t)).toDF("user_id", "ts")
    val out = graft.operators.EventAnalytics
      .trailingZScore(events, "ts", baselineSecs = 24 * 3600L,
        gapSecs = 3600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_ => r.getDouble(4)))))
      .toMap
    // first hour: empty baseline -> null z
    assert(out("2024-01-01 00:00") === ((2L, None)))
    // steady hours: constant baseline -> std 0 -> null z (no fake signal)
    assert(out("2024-01-01 05:00") === ((2L, None)))
    // the spike hour's baseline is the 10 steady hours — the 3-hour gap
    // sits inside the RANGE frame but contributes no rows; all-constant
    // baseline still means std 0 -> null z even for the spike
    assert(out("2024-01-01 13:00") === ((20L, None)))
    // non-constant baseline: add one hour of 4 events and re-run
    val rows2 = rows ++ Seq.fill(4)(ts(1, 10))
    val out2 = graft.operators.EventAnalytics
      .trailingZScore(rows2.map(t => (1L, t)).toDF("user_id", "ts"), "ts",
        baselineSecs = 24 * 3600L, gapSecs = 3600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_ => r.getDouble(4)))))
      .toMap
    // baseline for 13:00 = ten 2s + one 4: avg = 24/11, std_samp > 0,
    // z = (20 - avg)/std -- large positive
    val n = 11.0
    val mean = 24.0 / n
    val std = math.sqrt((10 * math.pow(2 - mean, 2)
      + math.pow(4 - mean, 2)) / (n - 1))
    val expectedZ = math.floor((20 - mean) / std * 10000 + 0.5) / 10000
    assert(out2("2024-01-01 13:00")._1 === 20L)
    assert(math.abs(out2("2024-01-01 13:00")._2.get - expectedZ) < 1e-9)
    assert(out2("2024-01-01 13:00")._2.get > 10)
  }

  test("latestPerKey: newest row per key survives; equal-ts re-sends " +
      "resolve deterministically by the tie column") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, "click", 100L, ts(1), 1.0),
      (1L, "click", 101L, ts(5), 2.0),   // newest for (1, click)
      (1L, "view", 102L, ts(3), 3.0),
      (2L, "click", 103L, ts(2), 4.0),
      (2L, "click", 104L, ts(2), 5.0)    // equal ts: higher event_id wins
    ).toDF("user_id", "event_type", "event_id", "ts", "value")
    val got = EventAnalytics.latestPerKey(events,
        Seq("user_id", "event_type"), "ts", "event_id")
      .select("user_id", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (1L, "click") -> 101L, (1L, "view") -> 102L, (2L, "click") -> 104L))
    // layout-independent
    val again = EventAnalytics.latestPerKey(events.repartition(7),
        Seq("user_id", "event_type"), "ts", "event_id")
      .select("user_id", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(again === got)
  }

  test("transitions counts consecutive pairs per user, tie-broken " +
      "deterministically, never crossing users") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      // user 1: view -> click -> view (2 transitions)
      (1L, ts(0), "view", 1L), (1L, ts(1), "click", 2L),
      (1L, ts(2), "view", 3L),
      // user 2: equal timestamps — event_id orders: view(id 4) -> click(id 5)
      (2L, ts(0), "click", 5L), (2L, ts(0), "view", 4L),
      // user 3: single event, no transition
      (3L, ts(0), "purchase", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.operators.EventAnalytics
      .transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("view", "click") -> 2L, ("click", "view") -> 1L))
  }

  test("gapFillHourly zero-fills missing hours per type between bounds") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // type a: events at hours 0 and 3 (1, 2 missing); type b: hour 1 only
    val ev = Seq((ts(0), "a"), (ts(3), "a"), (ts(3), "a"), (ts(1), "b"))
      .toDF("ts", "event_type")
    val got = graft.operators.EventAnalytics
      .gapFillHourly(ev, "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // dense: 4 hours x 2 types
    assert(got.size === 8)
    assert(got(("2024-01-01 00:00", "a")) === 1L)
    assert(got(("2024-01-01 01:00", "a")) === 0L)
    assert(got(("2024-01-01 02:00", "a")) === 0L)
    assert(got(("2024-01-01 03:00", "a")) === 2L)
    assert(got(("2024-01-01 01:00", "b")) === 1L)
    assert(got(("2024-01-01 03:00", "b")) === 0L)
  }

  test("applyDelta: upserts replace, deletes drop, intermediate delta " +
      "rows collapse to the newest") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val base = Seq(
      (1L, "k1", ts(0), 10.0), (2L, "k1", ts(0), 20.0),
      (3L, "k1", ts(0), 30.0)
    ).toDF("uid", "key", "ts", "v")
    val delta = Seq(
      // uid 1: two upserts — only the newer (v=12) must survive
      (1L, "k1", ts(1), 11.0, "U"), (1L, "k1", ts(2), 12.0, "U"),
      // uid 2: upsert then delete — key must vanish
      (2L, "k1", ts(1), 21.0, "U"), (2L, "k1", ts(2), 0.0, "D"),
      // uid 4: brand-new key inserted
      (4L, "k1", ts(1), 40.0, "U")
    ).toDF("uid", "key", "ts", "v", "op")
    val got = graft.operators.EventAnalytics
      .applyDelta(base, delta, Seq("uid", "key"), "ts", "v", "op")
      .select("uid", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 12.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("ewma: hand-computed recursion, per-key isolation, s1 = x1") {
    import graft.operators.EventAnalytics
    val series = Seq(
      ("a", 1, 8.0), ("a", 2, 4.0), ("a", 3, 0.0),
      ("b", 1, 100.0)
    ).toDF("k", "t", "x")
    val got = EventAnalytics.ewma(series, "k", "t", "x", alpha = 0.25)
      .orderBy("k", "t")
      .select("k", "t", "ewma")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // a: s1=8; s2=0.25*4+0.75*8=7; s3=0.25*0+0.75*7=5.25
    assert(got === Array(("a", 1, 8.0), ("a", 2, 7.0), ("a", 3, 5.25),
      ("b", 1, 100.0)))
  }

  test("ewma: result independent of input row order and partitioning") {
    import graft.operators.EventAnalytics
    val rows = (1 to 50).map(i => ("k", i, (i * 37 % 11).toDouble))
    val a = EventAnalytics.ewma(rows.toDF("k", "t", "x"), "k", "t", "x", 0.25)
      .orderBy("t").select("ewma").as[Double].collect()
    val b = EventAnalytics.ewma(
        scala.util.Random.shuffle(rows).toDF("k", "t", "x").repartition(7),
        "k", "t", "x", 0.25)
      .orderBy("t").select("ewma").as[Double].collect()
    assert(a.sameElements(b))
  }

  test("funnelWithin: conversion only counts inside the window; " +
      "greedy anchor at the earliest qualifying event") {
    import graft.operators.EventAnalytics
    val events = Seq(
      // user 1: click 10 min after view → within 1h window
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      // user 2: click 2h after view → outside the window
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 12:00:00"), "click"),
      // user 3: greedy anchors at the EARLIEST view (9:00); the 9:30
      // click is within ITS window even though a later view exists
      (3L, ts("2024-01-01 09:00:00"), "view"),
      (3L, ts("2024-01-01 09:30:00"), "click"),
      (3L, ts("2024-01-01 11:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelWithin(events, "user_id", "ts",
        "event_type", Seq("view", "click"), windowSeconds = 3600L)
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1, "view", 3L), (2, "click", 2L)))
  }

  test("funnelWithin: greedy stall — an only-through-later-anchor " +
      "conversion is counted where the greedy chain stalls") {
    import graft.operators.EventAnalytics
    val events = Seq(
      // earliest view at 8:00; the only click (10:30) is outside ITS
      // 1h window but inside the 10:00 view's — greedy still stalls
      (1L, ts("2024-01-01 08:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelWithin(events, "user_id", "ts",
        "event_type", Seq("view", "click"), windowSeconds = 3600L)
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1, "view", 1L), (2, "click", 0L)))
  }

  test("ewma: alpha guard") {
    import graft.operators.EventAnalytics
    intercept[IllegalArgumentException] {
      EventAnalytics.ewma(Seq(("k", 1, 1.0)).toDF("k", "t", "x"),
        "k", "t", "x", alpha = 0.0)
    }
  }

  test("scd2History: runs collapse, null attr is a legal run, " +
      "ts ties break by tie col") {
    val events = Seq(
      // key 1: A A B A → versions A, B, A (the repeated A collapses)
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("A")),
      (1L, ts("2024-01-01 11:00:00"), 2L, Some("A")),
      (1L, ts("2024-01-01 12:00:00"), 3L, Some("B")),
      (1L, ts("2024-01-01 13:00:00"), 4L, Some("A")),
      // key 2: A, null, null, A → null is its own (collapsed) run
      (2L, ts("2024-01-01 10:00:00"), 5L, Some("A")),
      (2L, ts("2024-01-01 11:00:00"), 6L, None),
      (2L, ts("2024-01-01 12:00:00"), 7L, None),
      (2L, ts("2024-01-01 13:00:00"), 8L, Some("A")),
      // key 3: same ts, order by event_id → B wins as version 2
      (3L, ts("2024-01-01 10:00:00"), 9L, Some("A")),
      (3L, ts("2024-01-01 10:00:00"), 10L, Some("B"))
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.scd2History(events, "user_id", "ts",
        "event_id", "event_type")
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      (1L, 1, Some("A")), (1L, 2, Some("B")), (1L, 3, Some("A")),
      (2L, 1, Some("A")), (2L, 2, None), (2L, 3, Some("A")),
      (3L, 1, Some("A")), (3L, 2, Some("B"))))
    // interval stitch: key 1 v1 closes at v2's open; only the last
    // version of each key is current
    assert(got(0)._5 === Some(ts("2024-01-01 12:00:00")))
    assert(got.filter(_._6).map(t => (t._1, t._2)).toSeq ===
      Seq((1L, 3), (2L, 3), (3L, 2)))
  }

  test("rollingDistinct: contribute-forward window, re-activity not " +
      "double-counted, output clipped to the data's day span") {
    def dts(day: Int) = ts(f"2024-01-0${day + 1}%d 10:00:00")
    val events = Seq(
      (1L, dts(0)), (1L, dts(0)),  // same user same day → one contribution
      (2L, dts(1)),
      (1L, dts(3))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.rollingDistinct(events, "user_id", "ts",
        windowDays = 2)
      .orderBy("day")
      .collect().map(r => (r.getLong(1)))
    // day0: {1}; day1: {1,2}; day2: {2}; day3: {1}; day4 clipped
    assert(got.toSeq === Seq(1L, 2L, 1L, 1L))
  }

  test("linearTrend: hand OLS; degenerate keys emit null, not zero") {
    val series = Seq(
      ("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),  // y = 2x + 1 exactly
      ("b", 7L, 4L),                                // single point
      ("c", 3L, 1L), ("c", 3L, 9L)                  // constant x
    ).toDF("k", "x", "y")
    val got = EventAnalytics.linearTrend(series, "k", "x", "y")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got === Array(
      ("a", 3L, Some(2.0), Some(1.0)),
      ("b", 1L, None, None),
      ("c", 2L, None, None)))
  }

  test("assembleTranscripts: order pinned by (ts, tie), not collect order") {
    val events = Seq(
      (1L, ts("2024-01-01 12:00:00"), 3L, "c"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"), // ts tie → event_id order
      (2L, ts("2024-01-01 10:00:00"), 4L, "solo")
    ).toDF("user_id", "ts", "event_id", "line").repartition(4)
    val got = EventAnalytics.assembleTranscripts(events, "user_id", "ts",
        "event_id", org.apache.spark.sql.functions.col("line"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got === Array((1L, 3, "a\nb\nc"), (2L, 1, "solo")))
  }

  test("timeWeightedAvg: hand case (durations weight the values), " +
      "single-event key → null, layout independence") {
    import spark.implicits._
    // k1: v=10 holds 1 s, v=20 holds 2 s, v=30 unobserved
    //   → (10·1e6 + 20·2e6) / 3e6 = 16.666667
    val e = Seq(
      ("k1", 1L, "2024-01-01 00:00:00", 10.0),
      ("k1", 2L, "2024-01-01 00:00:01", 20.0),
      ("k1", 3L, "2024-01-01 00:00:03", 30.0),
      ("k2", 4L, "2024-01-01 00:00:05", 99.0))
      .toDF("k", "id", "t", "v")
      .withColumn("t", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("t")))
    val got = EventAnalytics.timeWeightedAvg(e, "k", "t", "id", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("k1") === ((3L, 3000000L, Some(16.666667))))
    assert(got("k2")._1 === 1L && got("k2")._3 === None)
    val again = EventAnalytics.timeWeightedAvg(e.repartition(7), "k", "t",
        "id", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(again === got.map { case (k, v) => k -> v._3 })
  }
}
