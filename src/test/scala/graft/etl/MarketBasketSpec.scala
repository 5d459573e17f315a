package graft.etl

import graft.SparkSpecBase

class MarketBasketSpec extends SparkSpecBase {
  import spark.implicits._

  // baskets: 1:{A,B,C} 2:{A,B} 3:{A,C} 4:{B,C} 5:{A,B} 6:{D}
  // N=6; s_A=4 s_B=4 s_C=3 s_D=1
  // s_AB=3 s_AC=2 s_BC=2
  private lazy val tx = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"), (4L, "C"),
    (5L, "A"), (5L, "B"), (5L, "A"), // duplicate line: same item twice
    (6L, "D")
  ).toDF("basket", "item")

  // exact-rational reference: the operator computes (num·1e6) div den
  private def micro(num: Long, den: Long): Long = num * 1000000L / den

  test("supports, confidence, and lift match hand counts; duplicate " +
      "basket lines count once") {
    val out = MarketBasket.liftTopK(tx, "basket", "item", 2, 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    // lifts: AB 3*6/16=1.125, AC 2*6/12=1.0, BC 2*6/12=1.0
    // order: AB first, then AC before BC lexically (equal lift)
    assert(out.toSeq === Seq(
      ("A", "B", 3L, 4L, 4L, micro(3, 4), micro(3 * 6, 4 * 4)),
      ("A", "C", 2L, 4L, 3L, micro(2, 4), micro(2 * 6, 4 * 3)),
      ("B", "C", 2L, 4L, 3L, micro(2, 4), micro(2 * 6, 4 * 3))))
  }

  test("min-support floors singleton pairs and k truncates") {
    val out3 = MarketBasket.liftTopK(tx, "basket", "item", 3, 10).collect()
    assert(out3.length === 1) // only AB has s_xy >= 3
    val out1 = MarketBasket.liftTopK(tx, "basket", "item", 1, 1).collect()
    assert(out1.length === 1 && out1.head.getString(1) === "A" &&
      out1.head.getString(2) === "B")
  }
}
