package graft.etl

import graft.SparkSpecBase

class SessionFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, u: Long, usec: Long, t: String) =
    (id, u, new java.sql.Timestamp(usec / 1000), t)

  test("steps must complete IN ORDER within ONE session; the gap resets " +
      "progress; rates exact") {
    val g = 1000000L // 1s
    val events = Seq(
      // u1 s1: view -> click -> purchase (full depth)
      ev(1, 1, 1000000L, "view"), ev(2, 1, 1100000L, "click"),
      ev(3, 1, 1200000L, "purchase"),
      // u2 s1: click before view -> depth stops at view
      ev(4, 2, 1000000L, "click"), ev(5, 2, 1100000L, "view"),
      // u3: view in session 1, click only AFTER the gap -> no step 2
      ev(6, 3, 1000000L, "view"), ev(7, 3, 9000000L, "click"),
      // u4: no funnel events at all (still a session for the base rate)
      ev(8, 4, 1000000L, "error")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = SessionFunnel.sessionFunnel(events, g,
      Seq("view", "click", "purchase")).orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 5 sessions total (u1, u2, u3 x2, u4); views in u1, u2, u3-s1
    assert(out(0) === ((1L, "view", 3L, 600000L, 1000000L)))
    // click after view only in u1's session
    assert(out(1) === ((2L, "click", 1L, 200000L, 333333L)))
    assert(out(2) === ((3L, "purchase", 1L, 200000L, 1000000L)))
  }

  test("same-microsecond tie: later event id counts as after") {
    val events = Seq(
      ev(10, 7, 1000000L, "view"), ev(11, 7, 1000000L, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = SessionFunnel.sessionFunnel(events, 1000000L,
      Seq("view", "click")).orderBy("step").collect()
    assert(out(1).getLong(2) === 1L)
  }
}
