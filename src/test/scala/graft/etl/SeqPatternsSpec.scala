package graft.etl

import graft.SparkSpecBase

class SeqPatternsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(id: Long, u: Long, usec: Long, t: String) =
    (id, u, new java.sql.Timestamp(usec / 1000), t)

  test("ordered pairs counted once per session; support over ALL " +
      "sessions; gap cut splits") {
    // user 1 session: A B A C ; user 2 session: A B ;
    // user 1 second session (after the gap): C alone (no pairs)
    val g = 1000000L // 1s gap
    val events = Seq(
      ev(1, 1, 1000000L, "A"), ev(2, 1, 1100000L, "B"),
      ev(3, 1, 1200000L, "A"), ev(4, 1, 1300000L, "C"),
      ev(5, 2, 1000000L, "A"), ev(6, 2, 1100000L, "B"),
      ev(7, 1, 9000000L, "C")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = SeqPatterns.topSequentialPairs(events, g, 10)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // 3 sessions total; (A,B) in two of them
    assert(out(("A", "B")) === ((2L, 666666L)))
    // (A,A) appears once despite two ordered A pairs in user 1's session
    assert(out(("A", "A")) === ((1L, 333333L)))
    assert(out(("B", "C")) === ((1L, 333333L)))
    assert(!out.contains(("C", "A"))) // the lone C session adds nothing
  }

  test("same-microsecond ties order by event id") {
    val events = Seq(
      ev(10, 5, 1000000L, "X"), ev(11, 5, 1000000L, "Y")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = SeqPatterns.topSequentialPairs(events, 1000000L, 10)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(out === Set(("X", "Y")))
  }
}
