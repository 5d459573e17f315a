package graft.stats

import graft.SparkSpecBase

class TrendTestSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(rows: (Long, Long)*) = TrendTest.mannKendall(
    rows.map { case (t, x) => ("g", t, x) }.toDF("grp", "t", "x"),
    "grp", "t", "x").collect()(0)

  test("strictly increasing series: S = n(n-1)/2, sen slope exact") {
    val r = mk(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(r.getAs[Long]("s") === 6L)
    assert(r.getAs[Long]("var18") === 4L * 3L * 13L) // no ties
    assert(r.getAs[Long]("sen_micro") === 1000000L)
    // z replays the exact float tree: (S-1)/sqrt(var18/18)
    val z = math.floor((6.0 - 1.0) / math.sqrt(156.0 / 18.0) * 1e6).toLong
    assert(r.getAs[Long]("z_micro") === z)
  }

  test("strictly decreasing series mirrors the sign") {
    val r = mk(0L -> 4L, 1L -> 3L, 2L -> 2L, 3L -> 1L)
    assert(r.getAs[Long]("s") === -6L)
    assert(r.getAs[Long]("sen_micro") === -1000000L)
  }

  test("constant series: zero variance, null z, zero slope") {
    val r = mk(0L -> 5L, 1L -> 5L, 2L -> 5L)
    assert(r.getAs[Long]("s") === 0L)
    assert(r.getAs[Long]("var18") === 0L)
    assert(r.isNullAt(r.fieldIndex("z_micro")))
    assert(r.getAs[Long]("sen_micro") === 0L)
  }

  test("tie correction subtracts t(t-1)(2t+5) per tied value") {
    val r = mk(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L)
    assert(r.getAs[Long]("s") === 4L)
    assert(r.getAs[Long]("var18") === 156L - 36L)
  }

  test("sen slope is the LOWER median of floored pair slopes") {
    // pairs of (1,1,2,2) at t=0..3: floored micro slopes sorted are
    // 0, 0, 333333, 500000, 500000, 1000000 -> rank (6+1) div 2 = 3
    val r = mk(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L)
    assert(r.getAs[Long]("sen_micro") === 333333L)
  }

  test("negative slopes floor toward -inf (cross-engine floor div)") {
    // single pair, dx = -1 over dt = 3: floor(-1e6/3) = -333334
    val r = mk(0L -> 1L, 3L -> 0L)
    assert(r.getAs[Long]("sen_micro") === -333334L)
  }
}
