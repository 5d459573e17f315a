package graft.sim

import graft.SparkSpecBase

class GraphTrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangle in a 4-node graph: counts, degrees, coefficient") {
    // K3 on {1,2,3} plus pendant 3-4; directed duplicates collapse
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L)
    ).toDF("s", "t")
    val out = GraphTriangles.triangleStats(edges, "s", "t")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L),
        (4L, 1L, 0L)))
    // node 3: deg 3, 1 triangle -> cc = 2/6 -> 333333 micro (floor)
    assert(out(2).getLong(3) === 333333L)
    // node 1: deg 2 -> cc = 2*1e6/2 = 1e6
    assert(out(0).getLong(3) === 1000000L)
    // pendant: deg 1 -> undefined
    assert(out(3).isNullAt(3))
  }

  test("K4 counts every triangle once per containing node") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = (for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)).toDF("s", "t")
    val out = GraphTriangles.triangleStats(edges, "s", "t")
      .orderBy("id").collect()
    // K4: each node in C(3,2)=3 triangles, deg 3, cc = 1
    assert(out.forall(r => r.getLong(1) === 3L && r.getLong(2) === 3L &&
      r.getLong(3) === 1000000L))
  }
}
