package graft.stats

import graft.SparkSpecBase

class CmhSpec extends SparkSpecBase {
  import spark.implicits._

  private def cm(rows: (Boolean, String, Boolean)*) = Cmh.cmh(
    rows.toDF("arm", "st", "won"), "arm", "st", "won").collect()(0)

  test("hand stratum: T = x_a - n_a*m1/n, V = hypergeometric variance") {
    // one stratum: a: 3/4 wins, b: 1/4 -> n=8, m1=4
    // T = 3 - 4*4/8 = 1; V = 4*4*4*4/(64*7) = 4/7
    val rows = Seq.fill(3)((true, "s", true)) ++ Seq((true, "s", false)) ++
      Seq((false, "s", true)) ++ Seq.fill(3)((false, "s", false))
    val r = cm(rows: _*)
    assert(r.getAs[Long]("t_micro") === 1000000L)
    assert(r.getAs[Long]("v_micro") === math.floor(4.0 / 7.0 * 1e6).toLong)
    // chi2 = (1 - 0.5)^2 / (4/7) = 0.4375
    assert(r.getAs[Long]("chi2_cc_micro") === 437500L)
    assert(r.getAs[Long]("direction") === 1L)
  }

  test("evidence accumulates across strata that each look weak") {
    val one = cm(Seq.fill(3)((true, "s", true)) ++ Seq((true, "s", false)) ++
      Seq((false, "s", true)) ++ Seq.fill(3)((false, "s", false)): _*)
    val stratum = Seq.fill(3)((true, "s", true)) ++ Seq((true, "s", false)) ++
      Seq((false, "s", true)) ++ Seq.fill(3)((false, "s", false))
    val two = cm((stratum ++ stratum.map { case (a, _, w) => (a, "t", w) }): _*)
    assert(two.getAs[Long]("chi2_cc_micro") >
      one.getAs[Long]("chi2_cc_micro"))
  }

  test("the confounded pool: CMH stays near zero where pooling lies") {
    // each stratum has ZERO within-stratum effect, but arm allocation
    // correlates with the stratum base rate (the Simpson setup)
    val rows =
      Seq.fill(8)((true, "easy", true)) ++ Seq.fill(2)((true, "easy", false)) ++
      Seq.fill(4)((false, "easy", true)) ++ Seq.fill(1)((false, "easy", false)) ++
      Seq.fill(1)((true, "hard", true)) ++ Seq.fill(4)((true, "hard", false)) ++
      Seq.fill(2)((false, "hard", true)) ++ Seq.fill(8)((false, "hard", false))
    val r = cm(rows: _*)
    // rates equal within stratum -> each T-term is exactly 0
    assert(r.getAs[Long]("t_micro") === 0L)
    assert(r.getAs[Long]("chi2_cc_micro") === 0L)
  }

  test("|T| under the continuity half is clamped to zero, not inflated") {
    // tiny single stratum with near-zero evidence
    val r = cm((true, "s", true), (true, "s", false),
      (false, "s", true), (false, "s", false))
    assert(r.getAs[Long]("t_micro") === 0L)
    assert(r.getAs[Long]("chi2_cc_micro") === 0L)
  }

  test("degenerate strata (single row) contribute nothing; V = 0 nulls") {
    val r = cm((true, "s", true))
    assert(r.isNullAt(r.fieldIndex("chi2_cc_micro")))
  }
}
