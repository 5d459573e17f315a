package graft.sim

import graft.SparkSpecBase

class HitsSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int = 2) =
    Hits.hits(nodes.toDF("id"), edges.toDF("src", "dst"), "src", "dst",
      rounds).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("one round on a star: the center is the sole authority") {
    // 1,2,3 all point at 0
    val m = run(Seq(0L, 1L, 2L, 3L), Seq(1L -> 0L, 2L -> 0L, 3L -> 0L),
      rounds = 1)
    // a1(0) = 3; h1(i) = a1(0) = 3 for the pointers; node 0 points
    // nowhere -> hub 0
    assert(m(0L) === ((0L, 3L)))
    assert(m(1L) === ((3L, 0L)))
  }

  test("two rounds reinforce: hubs covering strong authorities win") {
    // hub A (10) points at two authorities {1, 2}; hub B (11) at one {1}
    val edges = Seq(10L -> 1L, 10L -> 2L, 11L -> 1L)
    val m = run(Seq(1L, 2L, 10L, 11L), edges)
    // round1: a(1)=2, a(2)=1; h(10)=3, h(11)=2
    // round2: a(1)=h10+h11=5, a(2)=h10=3; h(10)=8, h(11)=5
    assert(m(1L)._2 === 5L)
    assert(m(2L)._2 === 3L)
    assert(m(10L)._1 === 8L)
    assert(m(11L)._1 === 5L)
  }

  test("isolated nodes score zero both ways after two rounds") {
    val m = run(Seq(0L, 1L, 9L), Seq(0L -> 1L))
    assert(m(9L) === ((0L, 0L)))
  }

  test("authority and hub roles separate on an asymmetric chain") {
    // 0 -> 1 -> 2: node 2 is pure authority, node 0 pure hub
    val m = run(Seq(0L, 1L, 2L), Seq(0L -> 1L, 1L -> 2L))
    assert(m(0L)._2 === 0L) // never pointed at
    assert(m(2L)._1 === 0L) // never points
    assert(m(0L)._1 > 0L && m(2L)._2 > 0L)
  }
}
