package graft.stats

import graft.SparkSpecBase

class WinsorizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("nearest-rank bounds clip the tails; winsorized mean exact") {
    // 10 values 1..10, p10/p90: klo = ceil(1) = 1 -> lo = 1;
    // khi = ceil(9) = 9 -> hi = 9; only the 10 clips (to 9)
    val rows = (1L to 10L).map(v => ("g", v)).toDF("g", "x")
    val r = Winsorize.winsorize(rows, "g", "x", 10, 90).collect().head
    assert(r.getLong(1) === 10L)          // n
    assert(r.getLong(2) === 1L)           // lo
    assert(r.getLong(3) === 9L)           // hi
    assert(r.getLong(4) === 0L)           // n_low
    assert(r.getLong(5) === 1L)           // n_high
    // wsum = 1+..+9 + 9 = 54 -> mean 5.4 -> 5400000
    assert(r.getLong(6) === 5400000L)
  }

  test("duplicated extremes clip by count; two groups independent") {
    // g1: {0,0,5,5,5,100,100} p25/p75: klo=ceil(7/4)=2 -> lo=0;
    // khi=ceil(21/4)=6 -> hi=100  (values at sorted ranks 2 and 6)
    // g2: all equal -> lo=hi=value, nothing clips, mean = value
    val rows = (Seq.fill(2)(0L) ++ Seq.fill(3)(5L) ++ Seq.fill(2)(100L))
      .map(("g1", _)) ++ Seq.fill(4)(("g2", 7L))
    val out = Winsorize.winsorize(rows.toDF("g", "x"), "g", "x", 25, 75)
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getLong(2) === 0L && g1.getLong(3) === 100L)
    assert(g1.getLong(4) === 0L && g1.getLong(5) === 0L)
    val g2 = out("g2")
    assert(g2.getLong(2) === 7L && g2.getLong(3) === 7L)
    assert(g2.getLong(6) === 7000000L)
  }
}
