package graft.stats

import graft.SparkSpecBase

class FriedmanSpec extends SparkSpecBase {
  import spark.implicits._

  private def fr(rows: (String, String, Long)*) = Friedman.friedman(
    rows.toDF("b", "t", "s"), "b", "t", "s").collect()(0)

  test("single block, no ties: the textbook chi2 = 2 at k = 3") {
    val r = fr(("b1", "x", 10L), ("b1", "y", 20L), ("b1", "z", 30L))
    assert(r.getAs[Long]("n_blocks") === 1L)
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("chi2_micro") === 2000000L)
    assert(r.getAs[Long]("w_micro") === 1000000L)
  }

  test("two perfectly concordant blocks: W stays exactly 1") {
    val r = fr(("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 10L), ("b2", "y", 20L), ("b2", "z", 30L))
    assert(r.getAs[Long]("chi2_micro") === 4000000L)
    assert(r.getAs[Long]("w_micro") === 1000000L)
  }

  test("two perfectly discordant blocks at k = 2: chi2 exactly 0") {
    val r = fr(("b1", "x", 1L), ("b1", "y", 2L),
      ("b2", "x", 5L), ("b2", "y", 3L))
    assert(r.getAs[Long]("chi2_micro") === 0L)
    assert(r.getAs[Long]("w_micro") === 0L)
  }

  test("fully tied blocks leave the statistic undefined (B = 0)") {
    val r = fr(("b1", "x", 7L), ("b1", "y", 7L),
      ("b2", "x", 9L), ("b2", "y", 9L))
    assert(r.isNullAt(r.fieldIndex("chi2_micro")))
    assert(r.isNullAt(r.fieldIndex("w_micro")))
  }

  test("incomplete blocks are dropped, not mis-ranked") {
    val base = fr(("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 10L), ("b2", "y", 20L), ("b2", "z", 30L))
    val extra = fr(("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 10L), ("b2", "y", 20L), ("b2", "z", 30L),
      ("b3", "x", 99L))
    assert(base.getAs[Long]("chi2_micro") ===
      extra.getAs[Long]("chi2_micro"))
    assert(extra.getAs[Long]("n_blocks") === 2L)
  }

  test("partial ties use doubled average ranks") {
    // b1: x=1 y=1 z=3 -> ranks {1.5, 1.5, 3} -> rho {3, 3, 6}
    // A: R2 = {3,3,6}, n(k+1)=4 -> A = 1+1+4 = 6
    // B: sr2 = 9+9+36 = 54; nk(k+1)^2 = 48 -> B = 6
    // chi2 = 2*6/6 = 2, W = 6/(1*6) = 1... but ties: W = 1 with ties
    val r = fr(("b1", "x", 1L), ("b1", "y", 1L), ("b1", "z", 3L))
    assert(r.getAs[Long]("chi2_micro") === 2000000L)
    assert(r.getAs[Long]("w_micro") === 1000000L)
  }
}
