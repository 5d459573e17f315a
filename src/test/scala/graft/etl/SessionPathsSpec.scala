package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class SessionPathsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Int) =
    new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime
      + sec * 1000L)

  test("sessions cut at the gap; identical paths count across users; " +
      "ranks tie-break lexically") {
    val e = Seq(
      // user 1, session 1: A>B ; session 2 (after 1h): C
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(10), "B"), (1L, 3L, ts(4000), "C"),
      // user 2, one session: A>B
      (2L, 4L, ts(0), "A"), (2L, 5L, ts(5), "B"),
      // user 3, one session: C  (ties A>B-count? no: C count 2 total)
      (3L, 6L, ts(0), "C")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = SessionPaths.topPaths(e, 1800000000L, 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // both paths occur twice -> lexical: "A>B" before "C"
    assert(out.toSeq === Seq((1L, "A>B", 2L), (2L, "C", 2L)))
  }

  test("within-session order is pinned by (ts, event_id) under ties") {
    val e = Seq(
      (1L, 2L, ts(0), "B"), (1L, 1L, ts(0), "A"), (1L, 3L, ts(1), "C")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = SessionPaths.topPaths(e, 1800000000L, 1).collect()
    assert(out.head.getString(1) === "A>B>C") // same-ts: event_id order
  }
}
