package graft.stats

import graft.SparkSpecBase

class DunnSpec extends SparkSpecBase {
  import spark.implicits._

  private def du(rows: (String, Long)*) = Dunn.dunn(
    rows.toDF("g", "v"), "g", "v").collect()

  test("two groups of two, no ties: z^2 exactly 2.4") {
    // ranks {1,2} vs {3,4}: Rbar 1.5 vs 3.5, sigma2*(1/2+1/2) = 5/3
    val rs = du("x" -> 1L, "x" -> 2L, "y" -> 3L, "y" -> 4L)
    assert(rs.length === 1)
    assert(rs(0).getAs[Long]("z2_micro") === 2400000L)
    assert(rs(0).getAs[Long]("direction") === -1L)
    assert(rs(0).getAs[Long]("m") === 1L)
  }

  test("three groups produce all three ordered pairs and m = 3") {
    val rs = du("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L,
      "c" -> 5L, "c" -> 6L)
    assert(rs.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(rs.forall(_.getAs[Long]("m") === 3L))
    // the extreme pair (a,c) separates harder than adjacent pairs
    val z = rs.map(r => ((r.getString(0), r.getString(1)),
      r.getAs[Long]("z2_micro"))).toMap
    assert(z(("a", "c")) > z(("a", "b")))
    assert(z(("a", "c")) > z(("b", "c")))
  }

  test("identical distributions give z^2 exactly 0") {
    val rs = du("x" -> 5L, "x" -> 7L, "y" -> 5L, "y" -> 7L)
    assert(rs(0).getAs[Long]("z2_micro") === 0L)
    assert(rs(0).getAs[Long]("direction") === 0L)
  }

  test("all-tied data leaves z^2 undefined (tie term swallows variance)") {
    val rs = du("x" -> 3L, "x" -> 3L, "y" -> 3L, "y" -> 3L)
    assert(rs(0).isNullAt(rs(0).fieldIndex("z2_micro")))
  }

  test("tie correction shrinks the denominator vs the naive form") {
    // with ties present the corrected z^2 exceeds the uncorrected value
    // computed by hand: x={1,1}, y={2,2}: rho(1)=2cum-cv+1 = {3}, rho(2)={7}
    // S_x=6, S_y=14, dnum=-16, T = (8-2)+(8-2)=12
    // z2 = 3*256*3 / (2*2*4*(60-12)) = 2304/768 = 3.0
    val rs = du("x" -> 1L, "x" -> 1L, "y" -> 2L, "y" -> 2L)
    assert(rs(0).getAs[Long]("z2_micro") === 3000000L)
  }
}
