package graft.stats

import graft.SparkSpecBase

class MutualInfoSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfect dependence reads ln2 nats and NMI ~ 1; independence " +
      "reads 0; both exact integers") {
    val rows = Seq(
      ("dep", "a", "a"), ("dep", "a", "a"),
      ("dep", "b", "b"), ("dep", "b", "b"),
      ("ind", "a", "a"), ("ind", "a", "b"),
      ("ind", "b", "a"), ("ind", "b", "b")
    ).toDF("v", "x", "y")
    val out = MutualInfo.pairwise(rows, "v", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val dep = out("dep")
    assert(dep.getLong(1) === 4L && dep.getLong(2) === 2L)
    assert(dep.getLong(3) === 693147L) // floor(ln2 * 1e6)
    assert(dep.getLong(4) >= 999999L && dep.getLong(4) <= 1000000L)
    val ind = out("ind")
    assert(ind.getLong(2) === 4L)
    assert(ind.getLong(3) === 0L && ind.getLong(4) === 0L)
  }

  test("single-valued side: zero entropy reports null NMI, MI = 0") {
    val rows = Seq(("c", "only", "p"), ("c", "only", "q"))
      .toDF("v", "x", "y")
    val r = MutualInfo.pairwise(rows, "v", "x", "y").collect().head
    assert(r.getLong(3) === 0L)
    assert(r.isNullAt(4))
  }
}
