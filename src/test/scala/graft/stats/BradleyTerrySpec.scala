package graft.stats

import graft.SparkSpecBase

class BradleyTerrySpec extends SparkSpecBase {
  import spark.implicits._

  private def fit(rows: (String, String)*) = BradleyTerry.fit(
    rows.toDF("w", "l"), "w", "l").collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("games"),
          r.getAs[Long]("strength_micro"))).toMap

  test("two items, 3:1 record: strengths converge to 3/4 vs 1/4") {
    val m = fit("A" -> "B", "A" -> "B", "A" -> "B", "B" -> "A")
    assert(m("A")._1 === 3L && m("A")._2 === 4L)
    assert(m("B")._1 === 1L && m("B")._2 === 4L)
    // integer MM at T=1e9, 20 sweeps: within a few micro of the exact
    // fixed point (750000 / 250000)
    assert(math.abs(m("A")._3 - 750000L) <= 5L)
    assert(math.abs(m("B")._3 - 250000L) <= 5L)
  }

  test("symmetric 1:1 record gives exactly equal strengths") {
    val m = fit("A" -> "B", "B" -> "A")
    assert(m("A")._3 === m("B")._3)
    assert(math.abs(m("A")._3 - 500000L) <= 1L)
  }

  test("dominance chain orders strengths A > B > C") {
    val m = fit("A" -> "B", "A" -> "B", "B" -> "C", "B" -> "C",
      "A" -> "C", "A" -> "C")
    assert(m("A")._3 > m("B")._3 && m("B")._3 > m("C")._3)
  }

  test("deterministic: the integer MM gives bit-identical strengths") {
    val rows = Seq("A" -> "B", "A" -> "B", "B" -> "C", "C" -> "A",
      "B" -> "C", "A" -> "C")
    assert(fit(rows: _*) === fit(rows: _*))
  }

  test("an item that never wins stays at the 1-grid-unit floor, not 0") {
    val m = fit("A" -> "B", "A" -> "B")
    assert(m("B")._3 >= 0L && m("B")._1 === 0L && m("B")._2 === 2L)
    assert(m("A")._3 > 990000L)
  }
}
