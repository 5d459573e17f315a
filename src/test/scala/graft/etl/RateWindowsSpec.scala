package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class RateWindowsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Int) =
    new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime
      + sec * 1000L)

  test("trailing count over an inclusive 60 s horizon; bursts flagged " +
      "at the threshold") {
    val e = Seq(
      (1L, 10L, ts(0), "x"), (1L, 11L, ts(30), "x"), (1L, 12L, ts(59), "x"),
      (1L, 13L, ts(60), "x"), (1L, 14L, ts(61), "x"), (1L, 15L, ts(200), "x"),
      (2L, 20L, ts(59), "x") // other key: isolated
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = RateWindows.trailingRate(e, "user_id", "ts", "event_id",
        60L * 1000000L, 3L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // window is (t-60s, t]: at t=60 the t=0 event has aged out exactly
    assert(out.toSeq === Seq(
      (10L, 1L, 0L), (11L, 2L, 0L), (12L, 3L, 1L),
      (13L, 3L, 1L), (14L, 4L, 1L), (15L, 1L, 0L),
      (20L, 1L, 0L)))
  }

  test("same-timestamp events share a RANGE-frame count (tie-safe)") {
    val e = Seq(
      (1L, 1L, ts(5), "x"), (1L, 2L, ts(5), "x"), (1L, 3L, ts(5), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = RateWindows.trailingRate(e, "user_id", "ts", "event_id",
        60L * 1000000L, 3L).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 3L, 3L))
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 1L, 1L))
  }
}
