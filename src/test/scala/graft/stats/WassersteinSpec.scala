package graft.stats

import graft.SparkSpecBase

class WassersteinSpec extends SparkSpecBase {
  import spark.implicits._

  private def w1(rows: (String, Long)*) = Wasserstein.oneVsRest(
    rows.toDF("g", "v"), "g", "v").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("w1_micro"))) None
         else Some(r.getAs[Long]("w1_micro")))).toMap

  test("identical distributions are at distance exactly 0") {
    val m = w1("a" -> 1L, "a" -> 5L, "b" -> 1L, "b" -> 5L)
    assert(m("a") === Some(0L))
    assert(m("b") === Some(0L))
  }

  test("point masses one apart are at distance exactly 1") {
    val m = w1("a" -> 0L, "b" -> 1L)
    assert(m("a") === Some(1000000L))
    assert(m("b") === Some(1000000L))
  }

  test("mass and gap both scale the distance") {
    // a = {0,0}, b = {2}: |F diff| = 1 over gap 2 -> W1 = 2
    val m = w1("a" -> 0L, "a" -> 0L, "b" -> 2L)
    assert(m("a") === Some(2000000L))
  }

  test("a pure shift moves W1 by exactly the shift") {
    // {0,10} vs {5,15}: area between CDFs = 5
    val m = w1("a" -> 0L, "a" -> 10L, "b" -> 5L, "b" -> 15L)
    assert(m("a") === Some(5000000L))
    assert(m("b") === Some(5000000L))
  }

  test("three groups: each scored against the pooled rest") {
    // a={0}, b={0}, c={3}: rest of a = {0,3} -> W1 = |1 - 1/2|*3 = 1.5
    val m = w1("a" -> 0L, "b" -> 0L, "c" -> 3L)
    assert(m("a") === Some(1500000L))
    assert(m("b") === Some(1500000L))
    // rest of c = {0,0}: W1 = 3
    assert(m("c") === Some(3000000L))
  }

  test("a single group has an empty rest: null distance") {
    val m = w1("a" -> 1L, "a" -> 2L)
    assert(m("a") === None)
  }
}
