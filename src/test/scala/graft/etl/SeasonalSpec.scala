package graft.etl

import graft.SparkSpecBase

class SeasonalSpec extends SparkSpecBase {
  import spark.implicits._

  private def prof(rows: (String, Long, Long)*) = Seasonal.dowProfile(
    rows.toDF("s", "t", "x"), "s", "t", "x").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("a clean weekly pattern never alarms, whatever the level gap") {
    // dow 0 always 10, dow 1 always 50, three weeks
    val rows = (0 to 2).flatMap(w =>
      Seq(("a", w * 7L, 10L), ("a", w * 7L + 1, 50L)))
    val m = prof(rows: _*)
    assert(m(("a", 0L)) === ((3L, 20L, 0L)))
    assert(m(("a", 1L)) === ((3L, 100L, 0L)))
  }

  test("a spike against the weekly profile is flagged on its dow only") {
    val rows = (0 to 3).flatMap(w =>
      Seq(("a", w * 7L, 10L), ("a", w * 7L + 1, 50L))) :+
      ("a", 4 * 7L, 500L) // a 50x weekday spike
    val m = prof(rows: _*)
    assert(m(("a", 0L))._3 === 1L)
    assert(m(("a", 1L))._3 === 0L)
  }

  test("zero-MAD series: the degenerate rule flags any deviation") {
    val rows = Seq(("a", 0L, 5L), ("a", 7L, 5L), ("a", 14L, 5L),
      ("a", 21L, 6L))
    val m = prof(rows: _*)
    // med2(dow 0) = 10 (values 5,5,5,6 -> lo=5, hi=5); residuals
    // {0,0,0,2}; mad2 = 0 -> the 6 is flagged
    assert(m(("a", 0L))._3 === 1L)
  }

  test("the doubled median uses the two middle order statistics") {
    // dow 0 values {10, 20}: med2 = 30; residuals |2x-30| = {10, 10}
    val m = prof(("a", 0L, 10L), ("a", 7L, 20L))
    assert(m(("a", 0L))._2 === 30L)
    assert(m(("a", 0L))._3 === 0L) // mad2 = 20, 2a = 20 not > 100
  }

  test("series are profiled independently") {
    val m = prof(("a", 0L, 10L), ("b", 0L, 99L))
    assert(m(("a", 0L))._2 === 20L)
    assert(m(("b", 0L))._2 === 198L)
  }
}
