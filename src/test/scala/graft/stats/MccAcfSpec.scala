package graft.stats

import graft.SparkSpecBase

class MccAcfSpec extends SparkSpecBase {
  import spark.implicits._

  private def mc(rows: (Boolean, Boolean)*) = McNemar.mcc(
    rows.toDF("a", "b"), "a", "b").collect()(0)

  test("perfect agreement gives MCC exactly +1, disagreement -1") {
    val p = mc(true -> true, true -> true, false -> false, false -> false)
    assert(p.getAs[Long]("mcc_micro") === 1000000L)
    assert(p.getAs[Long]("mcc2_micro") === 1000000L)
    val n = mc(true -> false, true -> false, false -> true, false -> true)
    assert(n.getAs[Long]("mcc_micro") === -1000000L)
    assert(n.getAs[Long]("mcc2_micro") === -1000000L)
  }

  test("independence gives MCC exactly 0") {
    val r = mc(true -> true, true -> false, false -> true, false -> false)
    assert(r.getAs[Long]("mcc_micro") === 0L)
  }

  test("a zero marginal leaves MCC undefined") {
    val r = mc(true -> true, true -> false)
    assert(r.isNullAt(r.fieldIndex("mcc_micro")))
  }

  test("hand 2x2: MCC^2 is the exact rational chi2/n") {
    // cells 3,1,1,3: num = 8, prod = 4*4*4*4 = 256: mcc = 0.5
    val r = mc(Seq.fill(3)(true -> true) ++ Seq(true -> false) ++
      Seq(false -> true) ++ Seq.fill(3)(false -> false): _*)
    assert(r.getAs[Long]("mcc_micro") === 500000L)
    assert(r.getAs[Long]("mcc2_micro") === 250000L)
  }

  private def ac(lags: Seq[Int], rows: (String, Long, Long)*) =
    graft.etl.Autocorr.acf(rows.toDF("s", "t", "x"), "s", "t", "x", lags)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap

  test("an alternating series hits the biased-ACF extremes exactly") {
    // the standard n-denominator sample ACF: lag-1 = -(n-1)/n = -7/8,
    // lag-2 = +(n-2)/n = 3/4 for a balanced alternating series of 8
    val rows = (1L to 8L).map(t => ("a", t, if (t % 2 == 0) 10L else 0L))
    val m = ac(Seq(1, 2), rows: _*)
    assert(m(("a", 1L)).getAs[Long]("r_micro") === -875000L)
    assert(m(("a", 2L)).getAs[Long]("r_micro") === 750000L)
  }

  test("a constant series has undefined autocorrelation") {
    val m = ac(Seq(1), ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))
    assert(m(("a", 1L)).isNullAt(m(("a", 1L)).fieldIndex("r_micro")))
  }

  test("missing days contribute no pair (calendar-keyed lag join)") {
    // days 1,2,4: lag-1 pairs only (1,2); day 4 has no predecessor
    val m = ac(Seq(1), ("a", 1L, 0L), ("a", 2L, 6L), ("a", 4L, 0L))
    assert(m(("a", 1L)).getAs[Long]("n_pairs") === 1L)
  }

  test("a pair-less lag still emits its grid row: n_pairs 0, null r") {
    // two points one day apart: lag 1 has a pair, lag 7 has none —
    // the lag-7 row must survive with n_pairs = 0 and undefined r
    val m = ac(Seq(1, 7), ("a", 1L, 0L), ("a", 2L, 6L))
    assert(m(("a", 1L)).getAs[Long]("n_pairs") === 1L)
    assert(m(("a", 7L)).getAs[Long]("n_pairs") === 0L)
    assert(m(("a", 7L)).isNullAt(m(("a", 7L)).fieldIndex("r_micro")))
  }

  test("the weekly echo: period-7 pattern scores high at lag 7") {
    val rows = (0L until 28L).map(t =>
      ("a", t, if (t % 7 == 0) 100L else 10L))
    val m = ac(Seq(1, 7), rows: _*)
    assert(m(("a", 7L)).getAs[Long]("r_micro") > 700000L)
    assert(m(("a", 1L)).getAs[Long]("r_micro") <
      m(("a", 7L)).getAs[Long]("r_micro"))
  }
}
