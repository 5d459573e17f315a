package graft.stats

import graft.SparkSpecBase

class GiniSpec extends SparkSpecBase {
  import spark.implicits._

  private def g(vals: Long*) = Gini.gini(
    vals.map(("g", _)).toDF("grp", "v"), "grp", "v").collect()(0)

  test("uniform values give exactly 0") {
    assert(g(5L, 5L, 5L, 5L).getAs[Long]("gini_micro") === 0L)
  }

  test("one-takes-all gives (n-1)/n = 0.75 at n = 4") {
    assert(g(0L, 0L, 0L, 10L).getAs[Long]("gini_micro") === 750000L)
  }

  test("tied values need no tie-break: (1,1,2) gives exactly 1/6") {
    assert(g(1L, 1L, 2L).getAs[Long]("gini_micro") === 166666L)
  }

  test("zero mass gives null, counts survive") {
    val r = g(0L, 0L)
    assert(r.isNullAt(r.fieldIndex("gini_micro")))
    assert(r.getAs[Long]("n") === 2L && r.getAs[Long]("sum_v") === 0L)
  }
}
