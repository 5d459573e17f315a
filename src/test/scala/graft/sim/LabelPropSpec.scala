package graft.sim

import graft.SparkSpecBase

class LabelPropSpec extends SparkSpecBase {
  import spark.implicits._

  // two triangles joined by one bridge edge (3-4); undirected = both
  // directions
  private def bridgeFixture = {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    (und ++ und.map(_.swap)).toDF("a", "b")
  }

  test("two bridged triangles split into their own communities") {
    val nodes = (1L to 6L).toDF("id")
    val out = LabelProp.labelPropagate(nodes, bridgeFixture, "a", "b",
        rounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // hand-replayed sync self-vote min-tie rounds: l2 = [1,1,1,4,4,4],
    // stable thereafter
    assert(Seq(1L, 2L, 3L).forall(out(_) == (1L, 3L)))
    assert(Seq(4L, 5L, 6L).forall(out(_) == (4L, 3L)))
  }

  test("the fixture has converged by round 4 (round 5 is identical)") {
    val nodes = (1L to 6L).toDF("id")
    val r4 = LabelProp.labelPropagate(nodes, bridgeFixture, "a", "b", 4)
      .orderBy("id").collect().toSeq
    val r5 = LabelProp.labelPropagate(nodes, bridgeFixture, "a", "b", 5)
      .orderBy("id").collect().toSeq
    assert(r4 === r5)
  }

  test("isolated nodes keep their own label as singleton communities") {
    val nodes = Seq(1L, 2L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val out = LabelProp.labelPropagate(nodes, edges, "a", "b", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(9L) === (9L, 1L))
    // the pair converges to the min label round 1 (self-vote breaks the
    // sync two-node oscillation: {self, neighbor} ties resolve to min)
    assert(out(1L) === (1L, 2L) && out(2L) === (1L, 2L))
  }

  test("all-singleton ties break to the smallest label (self included)") {
    val nodes = Seq(2L, 5L, 6L, 10L).toDF("id")
    val edges = Seq((10L, 5L), (10L, 6L), (10L, 2L),
        (5L, 6L), (6L, 5L))
      .flatMap(e => Seq(e, e.swap)).toDF("a", "b")
    // round-1 update at node 10: label multiset {10 (self), 5, 6, 2},
    // all count 1 -> tie -> min label 2
    val r1 = LabelProp.labelPropagate(nodes, edges, "a", "b", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(10L) === 2L)
  }
}
