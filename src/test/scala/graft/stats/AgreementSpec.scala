package graft.stats

import graft.SparkSpecBase

class AgreementSpec extends SparkSpecBase {
  import spark.implicits._

  private def kappa(pairs: (String, String)*): org.apache.spark.sql.Row =
    Agreement.cohenKappa(pairs.toDF("a", "b"), "a", "b").head()

  test("perfect agreement scores exactly 1e6; perfect disagreement on " +
      "balanced binary marginals scores -1e6") {
    val perfect = kappa(("k", "k"), ("k", "k"), ("d", "d"), ("d", "d"))
    assert(perfect.getAs[Long]("kappa_micro") === 1000000L)
    // each rater half keep/half drop, never agreeing: po=0, pe=1/2
    val worst = kappa(("k", "d"), ("d", "k"), ("k", "d"), ("d", "k"))
    assert(worst.getAs[Long]("po_micro") === 0L)
    assert(worst.getAs[Long]("kappa_micro") === -1000000L)
  }

  test("textbook 2x2 fixture: exact-rational kappa") {
    // agreements 20 keep + 15 drop of n=50; A keeps 25, B keeps 30
    val pairs =
      Seq.fill(20)(("k", "k")) ++ Seq.fill(15)(("d", "d")) ++
        Seq.fill(10)(("d", "k")) ++ Seq.fill(5)(("k", "d"))
    val r = kappa(pairs: _*)
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Long]("sum_diag") === 35L)
    // RC = 25*30 + 25*20 = 1250
    assert(r.getAs[Long]("sum_rc") === 1250L)
    // kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    assert(r.getAs[Long]("kappa_micro") === 400000L)
  }

  test("constant raters (degenerate marginals) yield null, not a " +
      "0-divide; chance-level agreement scores 0") {
    val degenerate = kappa(("k", "k"), ("k", "k"))
    assert(degenerate.isNullAt(degenerate.fieldIndex("kappa_micro")))
    // independent raters at the observed marginals: po == pe exactly
    val chance = kappa(("k", "k"), ("k", "d"), ("d", "k"), ("d", "d"))
    assert(chance.getAs[Long]("kappa_micro") === 0L)
  }

  test("negative kappa FLOORS like the oracle's //, not JVM-truncates") {
    // A = (x, x, y), B = (z, z, x): zero agreements, RC = 2*1 = 2
    // kappa = (3*0 - 2) / (9 - 2) = -2/7; micro = -2000000/7 =
    // -285714.28... -> floor -285715 (truncation would say -285714)
    val r = kappa(("x", "z"), ("x", "z"), ("y", "x"))
    assert(r.getAs[Long]("sum_diag") === 0L)
    assert(r.getAs[Long]("sum_rc") === 2L)
    assert(r.getAs[Long]("kappa_micro") === -285715L)
  }
}
