package graft.etl

import graft.SparkSpecBase

class HoltSpec extends SparkSpecBase {
  import spark.implicits._

  private def ch(rows: (String, Long, Long)*) = Holt.chart(
    rows.toDF("s", "t", "x"), "s", "t", "x").collect()
      .map(r => r.getString(0) -> r).toMap

  test("two-point hand fold: l = 1000, b = 250") {
    // x = [0, 4]: l1 = floor((4000 + 0)/4) = 1000, b1 = floor(1000/4)
    val r = ch(("a", 1L, 0L), ("a", 2L, 4L))("a")
    assert(r.getAs[Long]("level_milli") === 1000L)
    assert(r.getAs[Long]("trend_milli") === 250L)
    assert(r.getAs[Long]("peak_dev_milli") === 4000L)
    assert(r.getAs[Long]("peak_t") === 2L)
  }

  test("a constant series settles at the level with zero trend") {
    val r = ch((1L to 6L).map(t => ("a", t, 7L)): _*)("a")
    assert(r.getAs[Long]("level_milli") === 7000L)
    assert(r.getAs[Long]("trend_milli") === 0L)
    assert(r.getAs[Long]("peak_dev_milli") === 0L)
  }

  test("a steady ramp builds a positive trend state EWMA cannot carry") {
    val r = ch((1L to 20L).map(t => ("a", t, t * 10L)): _*)("a")
    // slope 10/day = 10000 milli; at alpha = beta = 1/4 the trend
    // state settles just above it while the level still lags —
    // exact integer replay of the recursion gives 10537
    assert(r.getAs[Long]("trend_milli") === 10537L)
  }

  test("a downward ramp drives the trend negative (sign-safe floor)") {
    val r = ch((1L to 20L).map(t => ("a", t, 500L - t * 10L)): _*)("a")
    assert(r.getAs[Long]("trend_milli") < 0L)
  }

  test("single-point series: no forecast, null peak") {
    val r = ch(("a", 3L, 9L))("a")
    assert(r.getAs[Long]("level_milli") === 9000L)
    assert(r.getAs[Long]("trend_milli") === 0L)
    assert(r.isNullAt(r.fieldIndex("peak_dev_milli")))
  }

  test("the peak tracks the first largest forecast break") {
    // forecast at t=3 is l+b = 1250; x=0 -> dev 1250 < first 4000
    val r = ch(("a", 1L, 0L), ("a", 2L, 4L), ("a", 3L, 0L))("a")
    assert(r.getAs[Long]("peak_dev_milli") === 4000L)
    assert(r.getAs[Long]("peak_t") === 2L)
  }
}
