package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) = // (event_id, user, type, second)
    rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

  test("funnel requires strict temporal order, not mere presence") {
    // user 1 completes signup->view->purchase in order;
    // user 2 has all events but the purchase PRECEDES the view;
    // user 3 only signs up
    val df = ev(
      (1L, 1L, "signup", 100L), (2L, 1L, "view", 200L), (3L, 1L, "purchase", 300L),
      (4L, 2L, "signup", 100L), (5L, 2L, "purchase", 150L), (6L, 2L, "view", 200L),
      (7L, 3L, "signup", 50L))
    val out = EventAnalytics.funnel(df, Seq("signup", "view", "purchase"))
      .orderBy("step").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel uses the EARLIEST qualifying event at each step") {
    // a later signup must not push the view out of the funnel
    val df = ev(
      (1L, 1L, "signup", 100L), (2L, 1L, "signup", 500L),
      (3L, 1L, "view", 200L))
    val out = EventAnalytics.funnel(df, Seq("signup", "view"))
      .orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("retention buckets whole weeks since first activity") {
    // user 1 first active day 0, returns day 8 (offset week 1) and day 21
    // (offset week 3); user 2 first active day 7 (cohort week 1)
    val day = 86400L
    val df = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 8 * day), (3L, 1L, "view", 21 * day),
      (4L, 2L, "view", 7 * day))
    val out = EventAnalytics.retention(df)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
  }

  test("attribution: lookback window, strict upper bound, empty conversions kept") {
    val df = ev(
      (1L, 1L, "view", 10L), (2L, 1L, "view", 50L),
      (3L, 1L, "purchase", 100L), // touches 1, 2 in [0, 100)
      (4L, 1L, "view", 100L), //     simultaneous view must NOT attribute
      (5L, 1L, "purchase", 300L), // window [200, 300): no touches
      (6L, 2L, "purchase", 50L)) //  user with no views at all
    val out = EventAnalytics.attribution(df, 100000000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(out === Map(
      3L -> ((2L, Some(1L), Some(2L))),
      5L -> ((0L, None, None)),
      6L -> ((0L, None, None))))
  }

  test("movingAggregate: trailing range frame, inclusive lower bound") {
    val df = ev((1L, 1L, "view", 0L), (2L, 1L, "view", 100L),
      (3L, 1L, "view", 400L))
      .withColumn("value",
        when(col("event_id") === 1, 1.0)
          .when(col("event_id") === 2, 2.0).otherwise(4.0))
    val out = EventAnalytics.movingAggregate(df, 300000000L)
      .orderBy("event_id")
      .select("event_id", "n_win", "sum_micro", "avg_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 1000000L, 1.0),
      (2L, 2L, 3000000L, 1.5), // frame [-200s, 100s] holds both
      (3L, 2L, 6000000L, 3.0))) // 0s event falls off; 100s is inclusive
  }

  test("sessionStats: gap split, duration, and conversion flag") {
    // user 1: events at 0s, 60s (same session, converted), then 4000s
    // (> 30 min gap -> new session, single event, not converted)
    val df = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "purchase", 60L),
      (3L, 1L, "view", 4000L))
    val out = EventAnalytics.sessionStats(df)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 60000000L, true),
      (1L, 2L, 1L, 0L, false)))
  }

  test("inter-arrival gaps are per (user, type) and exclude stream heads") {
    val df = ev(
      (1L, 1L, "view", 100L), (2L, 1L, "view", 160L), (3L, 1L, "view", 280L),
      (4L, 2L, "view", 100L), // head of its own stream: no gap
      (5L, 1L, "click", 100L)) // single event: no gap
    val out = EventAnalytics.interArrival(df).collect()
    assert(out.length === 1) // only 'view' has gaps
    val r = out.head
    assert(r.getString(0) === "view")
    assert(r.getLong(1) === 2L) // two gaps, both user 1
    assert(r.getDouble(2) === 90000000.0) // mean of 60 s and 120 s, in µs
    assert(r.getLong(3) === 60000000L)
    assert(r.getLong(4) === 120000000L)
  }
}
