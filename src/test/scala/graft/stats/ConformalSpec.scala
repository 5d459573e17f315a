package graft.stats

import graft.SparkSpecBase

class ConformalSpec extends SparkSpecBase {
  import spark.implicits._

  private def band(vals: Long*) = Conformal.conformalBand(
    vals.map(("g", _)).toDF("grp", "v"), "grp", "v").collect()(0)

  test("nearest-rank conformal quantile on a symmetric group") {
    // values 0,10..90: mean_floor 45; |residuals| sorted:
    // 5,5,15,15,25,25,35,35,45,45; k = ceil(11*0.9) = 10 -> qhat 45
    val r = band((0L until 10L).map(_ * 10L): _*)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("mean_floor") === 45L)
    assert(r.getAs[Long]("k") === 10L)
    assert(r.getAs[Long]("qhat") === 45L)
  }

  test("group too small for the guarantee: k > n gives null qhat") {
    val r = band(1L, 2L, 3L)
    assert(r.getAs[Long]("k") === 4L)
    assert(r.isNullAt(r.fieldIndex("qhat")))
  }

  test("negative values: the predictor is the FLOOR mean") {
    // -5..-14: sum -95, floor(-95/10) = -10 (not trunc -9)
    val r = band((5L to 14L).map(-_): _*)
    assert(r.getAs[Long]("mean_floor") === -10L)
    assert(r.getAs[Long]("qhat") === 5L)
  }

  test("alpha widens or narrows the band monotonically") {
    val df = (0L until 100L).map(("g", _)).toDF("grp", "v")
    val q50 = Conformal.conformalBand(df, "grp", "v", alphaPct = 50)
      .collect()(0).getAs[Long]("qhat")
    val q10 = Conformal.conformalBand(df, "grp", "v", alphaPct = 10)
      .collect()(0).getAs[Long]("qhat")
    val q1 = Conformal.conformalBand(df, "grp", "v", alphaPct = 1)
      .collect()(0).getAs[Long]("qhat")
    assert(q50 <= q10 && q10 <= q1)
  }
}
