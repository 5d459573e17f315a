package graft.stats

import graft.SparkSpecBase

class BrierCronbachSpec extends SparkSpecBase {
  import spark.implicits._

  private def br(rows: (Long, Boolean)*) = Brier.decompose(
    rows.toDF("p", "y"), "p", "y").collect()(0)

  test("perfect sharp forecasts: Brier 0, REL 0, RES = UNC") {
    val r = br(1000L -> true, 1000L -> true, 0L -> false, 0L -> false)
    assert(r.getAs[Long]("brier_micro") === 0L)
    assert(r.getAs[Long]("rel_micro") === 0L)
    assert(r.getAs[Long]("res_micro") === r.getAs[Long]("unc_micro"))
    assert(r.getAs[Long]("unc_micro") === 250000L)
  }

  test("a constant calibrated forecast: REL 0, RES 0, Brier = UNC") {
    val r = br(500L -> true, 500L -> false)
    assert(r.getAs[Long]("brier_micro") === 250000L)
    assert(r.getAs[Long]("rel_micro") === 0L)
    assert(r.getAs[Long]("res_micro") === 0L)
    assert(r.getAs[Long]("unc_micro") === 250000L)
  }

  test("confidently wrong forecasts: REL carries the whole square") {
    val r = br(1000L -> false, 0L -> true)
    assert(r.getAs[Long]("brier_micro") === 1000000L)
    assert(r.getAs[Long]("rel_micro") === 1000000L)
    assert(r.getAs[Long]("res_micro") === 250000L)
    assert(r.getAs[Long]("unc_micro") === 250000L)
  }

  test("the Murphy identity holds to fold precision") {
    val rows = Seq(100L -> false, 100L -> false, 300L -> false,
      300L -> true, 700L -> true, 700L -> false, 900L -> true,
      900L -> true, 900L -> true)
    val r = br(rows: _*)
    val lhs = r.getAs[Long]("brier_micro")
    val rhs = r.getAs[Long]("rel_micro") - r.getAs[Long]("res_micro") +
      r.getAs[Long]("unc_micro")
    assert(math.abs(lhs - rhs) <= 2L)
  }

  private def al(rows: (Long, String, Long)*) = Cronbach.alpha(
    rows.toDF("i", "r", "x"), "i", "r", "x").collect()(0)

  test("identical raters give alpha exactly 1") {
    val r = al((1L, "a", 5L), (1L, "b", 5L), (2L, "a", 9L), (2L, "b", 9L))
    assert(r.getAs[Long]("alpha_micro") === 1000000L)
    assert(r.getAs[Long]("k") === 2L)
  }

  test("anti-correlated raters push alpha hard negative") {
    // x=[0,2] vs [1,0]: Vt=1, V1=4, V2=1 -> alpha = 2(1-5) = -8
    val r = al((1L, "a", 0L), (2L, "a", 2L), (1L, "b", 1L), (2L, "b", 0L))
    assert(r.getAs[Long]("alpha_micro") === -8000000L)
  }

  test("constant row sums leave alpha undefined") {
    val r = al((1L, "a", 0L), (2L, "a", 1L), (1L, "b", 1L), (2L, "b", 0L))
    assert(r.isNullAt(r.fieldIndex("alpha_micro")))
  }

  test("a ragged panel fails loudly instead of mis-scoring") {
    intercept[Exception] {
      al((1L, "a", 1L), (2L, "a", 2L), (1L, "b", 3L))
    }
  }

  test("equal per-rater counts over DIFFERENT items still fail loudly") {
    // each rater scores 2 items, but the item sets differ: items 1 and 4
    // carry one rating, 2 and 3 carry one each from the other rater —
    // per-rater counts alone would pass, per-item counts catch it
    intercept[Exception] {
      al((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L), (4L, "b", 4L))
    }
  }

  test("a noisy-but-shared construct lands between 0 and 1") {
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 12L), (2L, "a", 20L), (2L, "b", 19L),
      (3L, "a", 30L), (3L, "b", 33L), (4L, "a", 40L), (4L, "b", 38L))
    val r = al(rows: _*)
    val a = r.getAs[Long]("alpha_micro")
    assert(a > 900000L && a <= 1000000L)
  }
}
