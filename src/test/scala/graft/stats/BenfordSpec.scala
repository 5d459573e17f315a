package graft.stats

import graft.SparkSpecBase

class BenfordSpec extends SparkSpecBase {
  import spark.implicits._

  private def bf(rows: (String, Long)*) = Benford.audit(
    rows.toDF("v", "x"), "v", "x").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Long]("mad_micro"),
          r.getAs[Long]("chi2_micro"))).toMap

  private val p = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10.0))

  test("all values starting with 1: MAD hits the hand value") {
    val m = bf(("a", 15L), ("a", 105L), ("a", 1005L), ("a", 19L))
    // c_1 = n: MAD = ((1-p1) + sum_{d>=2} p_d) / 9 = 2(1-p1)/9
    val expect = math.floor(2.0 * (1.0 - p(0)) / 9.0 * 1e6).toLong
    assert(m("a")._1 === 4L)
    assert(math.abs(m("a")._2 - expect) <= 1L)
  }

  test("zero and negative values are excluded by definition") {
    val m = bf(("a", 15L), ("a", 0L), ("a", -23L))
    assert(m("a")._1 === 1L)
  }

  test("a Benford-ish geometric sample conforms better than a uniform one") {
    // geometric growth cycles first digits with Benford-like frequency
    val geo = (0 until 200).map(i =>
      ("g", math.round(math.pow(1.07, i) * 100).toLong))
    val uni = (0 until 200).map(i => ("u", 100L + i * 4L))
    val m = bf(geo ++ uni: _*)
    assert(m("g")._2 < m("u")._2)
    assert(m("g")._3 < m("u")._3)
  }

  test("absent digits still count against conformance (9-cell grid)") {
    // only digits 1 and 2 present: chi2 must include the 7 empty cells
    val m = bf(("a", 10L), ("a", 20L))
    // chi2 >= n * sum of missing p_d (each empty cell contributes n*p_d)
    val missing = (3 to 9).map(d => p(d - 1)).sum
    assert(m("a")._3 >= math.floor(2.0 * missing * 1e6).toLong)
  }

  test("variables are audited independently") {
    val m = bf(("a", 11L), ("b", 91L))
    assert(m.keySet === Set("a", "b"))
    assert(m("a")._1 === 1L && m("b")._1 === 1L)
  }
}
