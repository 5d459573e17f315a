package graft.sim

import graft.SparkSpecBase

class GraphStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  test("two disjoint triangles split into their cliques: Q exactly 1/2") {
    val edges = sym(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L)
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("id", "community")
    val r = GraphStats.modularity(edges, labels).collect()(0)
    assert(r.getAs[Long]("q_micro") === 500000L)
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(r.getAs[Long]("m2") === 12L)
  }

  test("everything in one community scores exactly 0") {
    val edges = sym(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "community")
    val r = GraphStats.modularity(edges, labels).collect()(0)
    assert(r.getAs[Long]("q_micro") === 0L)
  }

  test("anti-community labels go negative (pmod floor, not truncate)") {
    // a 4-cycle labeled across the structure: every edge crosses
    val edges = sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val labels = Seq((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L))
      .toDF("id", "community")
    val r = GraphStats.modularity(edges, labels).collect()(0)
    // intra2 = 0 each, deg_c = 4 each: Q = (0 - 16 - 16)/64 = -1/2
    assert(r.getAs[Long]("q_micro") === -500000L)
  }

  test("star graph is perfectly disassortative: r exactly -1") {
    val r = GraphStats.assortativity(sym(0L -> 1L, 0L -> 2L, 0L -> 3L))
      .collect()(0)
    assert(r.getAs[Long]("r_micro") === -1000000L)
    assert(r.getAs[Long]("r2_micro") === -1000000L)
    assert(r.getAs[Long]("direction") === -1L)
  }

  test("a regular graph has undefined assortativity (zero variance)") {
    val r = GraphStats.assortativity(
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)).collect()(0)
    assert(r.isNullAt(r.fieldIndex("r_micro")))
    assert(r.isNullAt(r.fieldIndex("r2_micro")))
    assert(r.getAs[Long]("direction") === 0L)
  }

  test("two hubs joined by a bridge mix positively vs the stars") {
    // hub-hub edge raises same-degree pairing: two 3-stars + bridge
    val star2 = GraphStats.assortativity(sym(
      0L -> 1L, 0L -> 2L, 0L -> 3L,
      10L -> 11L, 10L -> 12L, 10L -> 13L,
      0L -> 10L)).collect()(0)
    val star1 = GraphStats.assortativity(
      sym(0L -> 1L, 0L -> 2L, 0L -> 3L)).collect()(0)
    assert(star2.getAs[Long]("r_micro") > star1.getAs[Long]("r_micro"))
  }
}
