package graft.stats

import graft.SparkSpecBase

class GwetAc1Spec extends SparkSpecBase {
  import spark.implicits._

  private def g(rows: (String, String)*) = GwetAc1.ac1(
    rows.toDF("a", "b"), "a", "b").collect()(0)

  test("perfect balanced agreement gives AC1 exactly 1") {
    val r = g("x" -> "x", "x" -> "x", "y" -> "y", "y" -> "y")
    assert(r.getAs[Long]("ac1_micro") === 1000000L)
    assert(r.getAs[Long]("po_micro") === 1000000L)
  }

  test("hand value: 3 agreements of 4 on balanced marginals") {
    // cells xx:2, yy:1, xy:1 -> n=4, g=3; m_x=5, m_y=3
    // P = 5*3 + 3*5 = 30; D = 4*16*1 = 64; pe = 30/64
    // AC1 = (3*64 - 4*30)/(4*(64-30)) = 72/136 = 9/17
    val r = g("x" -> "x", "x" -> "x", "y" -> "y", "x" -> "y")
    assert(r.getAs[Long]("pe_ac1_micro") === 468750L)
    assert(r.getAs[Long]("ac1_micro") === (9L * 1000000L) / 17L)
  }

  test("the kappa paradox: AC1 stays high under prevalence skew") {
    // 95 of 100 in the dominant class, raters agree on 98
    val rows = Seq.fill(95)("p" -> "p") ++ Seq.fill(3)("n" -> "n") ++
      Seq("p" -> "n", "n" -> "p")
    val r = g(rows: _*)
    val ac1 = r.getAs[Long]("ac1_micro")
    assert(ac1 > 900000L)
    // kappa on the same pair collapses toward ~0.73 — the gap IS the
    // prevalence diagnostic
    val kap = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .collect()(0).getAs[Long]("kappa_micro")
    assert(ac1 > kap)
  }

  test("a single observed category leaves AC1 undefined") {
    val r = g("x" -> "x", "x" -> "x")
    assert(r.isNullAt(r.fieldIndex("ac1_micro")))
  }

  test("systematic disagreement drives AC1 negative (signed floor)") {
    val r = g("x" -> "y", "y" -> "x", "x" -> "y", "y" -> "x")
    assert(r.getAs[Long]("ac1_micro") < 0L)
    assert(r.getAs[Long]("po_micro") === 0L)
  }
}
