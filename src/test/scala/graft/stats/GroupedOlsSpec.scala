package graft.stats

import graft.SparkSpecBase

class GroupedOlsSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfect line recovers slope/intercept exactly with R² = 1") {
    // y = 3x + 2 on x = 1..4
    val rows = (1L to 4L).map(x => ("lin", x, 3 * x + 2)).toDF("g", "x", "y")
    val r = GroupedOls.fit(rows, "g", "x", "y").collect().head
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 3000000L)
    assert(r.getLong(3) === 2000000L)
    assert(r.getLong(4) === 1000000L)
  }

  test("hand-computed noisy fit; zero x-variance reports nulls") {
    // (0,0),(1,1),(2,1): slope = cov/varx = (3*... ) -> 0.5, b = 1/6
    val rows = Seq(("n", 0L, 0L), ("n", 1L, 1L), ("n", 2L, 1L),
      ("flat", 5L, 1L), ("flat", 5L, 9L)).toDF("g", "x", "y")
    val out = GroupedOls.fit(rows, "g", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val n = out("n")
    assert(n.getLong(2) === 500000L)
    assert(n.getLong(3) === math.floor(1.0 / 6 * 1e6).toLong)
    // r2 = cov^2/(varx*vary) = (3*3-3*2)^2/((3*5-9)*(3*2-4)) = 9/12
    assert(n.getLong(4) === 750000L)
    val flat = out("flat")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4))
  }
}
