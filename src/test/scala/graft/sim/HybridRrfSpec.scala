package graft.sim

import graft.SparkSpecBase

class HybridRrfSpec extends SparkSpecBase {
  import spark.implicits._

  test("fuse: doc in both lists outranks single-list docs; exact " +
      "integer contributions") {
    val l1 = Seq((0, 10L, 1L), (0, 11L, 2L)).toDF("query_id", "id", "rank")
    val l2 = Seq((0, 11L, 1L), (0, 12L, 2L)).toDF("query_id", "id", "rank")
    val out = HybridRrf.fuse(Seq(l1, l2), 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(11L, 10L, 12L))
    // id 11: 1e12 div 61 + 1e12 div 62 ; id 10: 1e12 div 61
    assert(out(0).getLong(3) === 1000000000000L / 61 + 1000000000000L / 62)
    assert(out(1).getLong(3) === 1000000000000L / 61)
    assert(out(2).getLong(3) === 1000000000000L / 62)
  }

  test("fuse: equal-score ties break on id ascending; k bounds output") {
    val l1 = Seq((7, 5L, 1L), (7, 3L, 2L), (7, 9L, 3L))
      .toDF("query_id", "id", "rank")
    val l2 = Seq((7, 3L, 1L), (7, 5L, 2L), (7, 1L, 3L))
      .toDF("query_id", "id", "rank")
    // ids 3 and 5 both score div61+div62 -> tie, id 3 first
    val out = HybridRrf.fuse(Seq(l1, l2), 2).orderBy("rank").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 3L && out(1).getLong(2) === 5L)
    assert(out(0).getLong(3) === out(1).getLong(3))
  }
}
