package graft.etl

import graft.SparkSpecBase

class EwmaSpec extends SparkSpecBase {
  import spark.implicits._

  private def ch(rows: (String, Long, Long)*) = Ewma.chart(
    rows.toDF("s", "t", "x"), "s", "t", "x").collect()
      .map(r => r.getString(0) -> r).toMap

  test("two-point hand fold: e = (3*4000 + 8000)/4 = 5000") {
    val r = ch(("a", 1L, 4L), ("a", 2L, 8L))("a")
    assert(r.getAs[Long]("ewma_milli") === 5000L)
    assert(r.getAs[Long]("peak_dev_milli") === 4000L)
    assert(r.getAs[Long]("peak_t") === 2L)
  }

  test("constant series stays at its level with zero peak deviation") {
    val r = ch(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))("a")
    assert(r.getAs[Long]("ewma_milli") === 5000L)
    assert(r.getAs[Long]("peak_dev_milli") === 0L)
    assert(r.getAs[Long]("peak_t") === 2L)
  }

  test("single-point series has no forecast: null peak") {
    val r = ch(("a", 7L, 3L))("a")
    assert(r.getAs[Long]("ewma_milli") === 3000L)
    assert(r.isNullAt(r.fieldIndex("peak_dev_milli")))
    assert(r.isNullAt(r.fieldIndex("peak_t")))
  }

  test("peak tracks the FIRST largest forecast break") {
    // devs: |20-10|=10 at t2, then |0-17.5|=17.5 at t3 (e1=12500)
    val r = ch(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 0L))("a")
    assert(r.getAs[Long]("peak_dev_milli") === 12500L)
    assert(r.getAs[Long]("peak_t") === 3L)
    // e2 = (3*12500 + 0)/4 = 9375
    assert(r.getAs[Long]("ewma_milli") === 9375L)
  }

  test("integer floor at every step, not at the end") {
    // x = [1, 0]: e1 = (3000+0)/4 = 750
    val r = ch(("a", 1L, 1L), ("a", 2L, 0L))("a")
    assert(r.getAs[Long]("ewma_milli") === 750L)
  }

  test("series are independent") {
    val m = ch(("a", 1L, 4L), ("a", 2L, 8L), ("b", 1L, 100L))
    assert(m("a").getAs[Long]("ewma_milli") === 5000L)
    assert(m("b").getAs[Long]("ewma_milli") === 100000L)
  }

  test("a sustained small shift accumulates into the smoothed level") {
    val rows = (1L to 10L).map(t => ("a", t, 10L)) ++
      (11L to 20L).map(t => ("a", t, 12L))
    val r = ch(rows: _*)("a")
    val e = r.getAs[Long]("ewma_milli")
    assert(e > 11500L && e <= 12000L)
  }
}
