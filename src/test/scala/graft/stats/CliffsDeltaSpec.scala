package graft.stats

import graft.SparkSpecBase

class CliffsDeltaSpec extends SparkSpecBase {
  import spark.implicits._

  private def cd(rows: (String, Long)*) = {
    val r = TwoSample.cliffsDelta(
      rows.map { case (g, v) => ("v", g, v) }.toDF("var", "g", "x"),
      "var", "g", "x").collect()(0)
    r.getAs[Long]("delta_micro")
  }

  test("complete dominance of a over b gives delta exactly +1") {
    assert(cd("a" -> 3L, "a" -> 4L, "b" -> 1L, "b" -> 2L) === 1000000L)
  }

  test("complete dominance of b gives exactly -1") {
    assert(cd("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L) === -1000000L)
  }

  test("identical samples give exactly 0 (ties cancel)") {
    assert(cd("a" -> 5L, "b" -> 5L) === 0L)
    assert(cd("a" -> 1L, "a" -> 2L, "b" -> 1L, "b" -> 2L) === 0L)
  }

  test("mixed dominance lands on the exact rational") {
    // a={1,3}, b={2}: pairs (1,2) b wins, (3,2) a wins -> delta = 0
    assert(cd("a" -> 1L, "a" -> 3L, "b" -> 2L) === 0L)
    // a={2,3}, b={1,2}: wins a: (2,1),(3,1),(3,2)=3; tie: (2,2)=0.5U
    // U_a = 3.5, delta = (7-4)/4 = 0.75
    assert(cd("a" -> 2L, "a" -> 3L, "b" -> 1L, "b" -> 2L) === 750000L)
  }

  test("negative non-integer delta floors toward minus infinity") {
    // a={1,2}, b={2,3}: U_a = 0.5 -> delta = (1-4)/4 = -0.75
    assert(cd("a" -> 1L, "a" -> 2L, "b" -> 2L, "b" -> 3L) === -750000L)
  }
}
