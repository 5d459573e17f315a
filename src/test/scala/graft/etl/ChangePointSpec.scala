package graft.etl

import graft.SparkSpecBase

class ChangePointSpec extends SparkSpecBase {
  import spark.implicits._

  private def peak(xs: Long*) = ChangePoint.cusumPeak(
    xs.zipWithIndex.map { case (x, i) => ("s", (i + 1).toLong, x) }
      .toDF("series", "t", "x"),
    "series", "t", "x").collect()(0)

  test("a planted level shift peaks on the last day of the old level") {
    // x = 1,1,1,9,9,9: C_t = 6*S_t - t*30 peaks at t=3 with -72
    val r = peak(1L, 1L, 1L, 9L, 9L, 9L)
    assert(r.getAs[Long]("change_t") === 3L)
    assert(r.getAs[Long]("c_peak_scaled") === -72L)
  }

  test("a constant series has zero CUSUM everywhere, argmax at min t") {
    val r = peak(5L, 5L, 5L)
    assert(r.getAs[Long]("change_t") === 1L)
    assert(r.getAs[Long]("c_peak_scaled") === 0L)
  }

  test("absolute-peak ties break to the earliest day") {
    // x = 9,1,1,9: |C| = 16, 0, 16, 0 -> t=1, +16 (high before)
    val r = peak(9L, 1L, 1L, 9L)
    assert(r.getAs[Long]("change_t") === 1L)
    assert(r.getAs[Long]("c_peak_scaled") === 16L)
  }
}
