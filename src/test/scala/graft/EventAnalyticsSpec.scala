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
}
