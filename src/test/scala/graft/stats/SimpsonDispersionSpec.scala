package graft.stats

import graft.SparkSpecBase

class SimpsonDispersionSpec extends SparkSpecBase {
  import spark.implicits._

  private def sg(rows: (Boolean, String, Boolean)*) = Simpson.guard(
    rows.toDF("arm", "st", "won"), "arm", "st", "won").collect()(0)

  test("the Berkeley shape: every stratum favors A, the pool favors B") {
    // stratum e (easy): A 2/4 wins, B 4/10 — A better (.5 vs .4)
    // stratum h (hard): A 1/10, B 0/4 — A better (.1 vs 0)
    // pooled: A 3/14 (.214), B 4/14 (.286) — B better: STRONG FLIP
    val rows =
      Seq.fill(2)((true, "e", true)) ++ Seq.fill(2)((true, "e", false)) ++
      Seq.fill(4)((false, "e", true)) ++ Seq.fill(6)((false, "e", false)) ++
      Seq.fill(1)((true, "h", true)) ++ Seq.fill(9)((true, "h", false)) ++
      Seq.fill(4)((false, "h", false))
    val r = sg(rows: _*)
    assert(r.getAs[Long]("pooled_dir") === -1L)
    assert(r.getAs[Long]("n_opposite") === 2L)
    assert(r.getAs[Long]("n_same") === 0L)
    assert(r.getAs[Boolean]("strong_flip"))
  }

  test("consistent strata: pooled direction agrees, no flip") {
    val rows =
      Seq.fill(3)((true, "x", true)) ++ Seq.fill(1)((true, "x", false)) ++
      Seq.fill(1)((false, "x", true)) ++ Seq.fill(3)((false, "x", false)) ++
      Seq.fill(3)((true, "y", true)) ++ Seq.fill(1)((true, "y", false)) ++
      Seq.fill(1)((false, "y", true)) ++ Seq.fill(3)((false, "y", false))
    val r = sg(rows: _*)
    assert(r.getAs[Long]("pooled_dir") === 1L)
    assert(r.getAs[Long]("n_same") === 2L)
    assert(!r.getAs[Boolean]("strong_flip"))
  }

  test("strata missing an arm are counted but direction-neutral") {
    val rows = Seq((true, "x", true), (false, "x", false),
      (true, "solo", true))
    val r = sg(rows: _*)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("n_same") + r.getAs[Long]("n_opposite") === 1L)
  }

  private def di(rows: (String, Long, Long)*) = graft.etl.Dispersion.index(
    rows.toDF("s", "t", "x"), "s", "t", "x").collect()
      .map(r => r.getString(0) -> r).toMap

  test("a constant series is maximally underdispersed (index 0)") {
    val r = di(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))("a")
    assert(r.getAs[Long]("dispersion_micro") === 0L)
    assert(r.getAs[Long]("mean_milli") === 5000L)
  }

  test("hand dispersion: {0, 10} has s2/mean = 10") {
    // n=2, S=10, Q=100: (2*100-100)/(1*10) = 10
    val r = di(("a", 1L, 0L), ("a", 2L, 10L))("a")
    assert(r.getAs[Long]("dispersion_micro") === 10000000L)
  }

  test("degenerate series (all-zero or single point) report null") {
    val m = di(("z", 1L, 0L), ("z", 2L, 0L), ("one", 1L, 7L))
    assert(m("z").isNullAt(m("z").fieldIndex("dispersion_micro")))
    assert(m("one").isNullAt(m("one").fieldIndex("dispersion_micro")))
  }

  test("bursty counts disperse far above the Poisson unit index") {
    val calm = di((1L to 10L).map(t => ("c", t, 10L + (t % 2))): _*)("c")
    val bursty = di(((1L to 9L).map(t => ("b", t, 1L)) :+ ("b", 10L, 91L)): _*)("b")
    assert(bursty.getAs[Long]("dispersion_micro") >
      calm.getAs[Long]("dispersion_micro") * 10)
  }
}
