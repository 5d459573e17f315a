package graft.stats

import graft.SparkSpecBase

class JackknifeSpec extends SparkSpecBase {
  import spark.implicits._

  private def jk(cells: (String, Long, Long)*) = Jackknife.jackknifeRatio(
    cells.map { case (g, n, d) => (g, n, d) }.toDF("g", "num", "den"),
    "g").collect()

  test("identical buckets give zero jackknife variance") {
    val out = jk(("g", 100L, 10L), ("g", 100L, 10L), ("g", 100L, 10L))
    assert(out(0).getAs[Long]("mean_micro") === 10000L)
    assert(out(0).getAs[Long]("jk_var_micro2") === 0L)
    assert(out(0).getAs[Long]("jk_se_micro") === 0L)
  }

  test("hand-computed two-bucket variance") {
    // buckets (num, den) = (100, 10), (300, 10):
    // r1 = 300*1000/10 = 30000; r2 = 100*1000/10 = 10000
    // var = (B-1)*(B*Srr - Sr^2)/B^2 = 1*(2*(9e8+1e8) - 16e8)/4 = 1e8
    val out = jk(("g", 100L, 10L), ("g", 300L, 10L))
    assert(out(0).getAs[Long]("mean_micro") === 20000L)
    assert(out(0).getAs[Long]("jk_var_micro2") === 100000000L)
    assert(out(0).getAs[Long]("jk_se_micro") === 10000L)
  }

  test("a single-bucket group is undefined and emits nothing") {
    assert(jk(("g", 50L, 5L)).isEmpty)
  }

  test("groups compute independently") {
    val out = jk(("a", 100L, 10L), ("a", 100L, 10L),
      ("b", 10L, 1L), ("b", 30L, 1L))
    assert(out.length === 2)
  }
}
