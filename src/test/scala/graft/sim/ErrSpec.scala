package graft.sim

import graft.SparkSpecBase

class ErrSpec extends SparkSpecBase {
  import spark.implicits._

  private def err(run: Seq[(Long, Long, Long)],
      qrels: Seq[(Long, Long, Long)], k: Int = 10) = Err.errGraded(
    run.toDF("qid", "rank", "neighbor"),
    qrels.toDF("qid", "neighbor", "gain"), k).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("err_micro")).toMap

  test("perfect hit at rank 1 with gain 3 scores exactly 7/8") {
    val m = err(Seq((1L, 1L, 10L)), Seq((1L, 10L, 3L)))
    assert(m(1L) === 875000L)
  }

  test("the same hit at rank 2 halves the contribution") {
    val m = err(Seq((1L, 1L, 99L), (1L, 2L, 10L)), Seq((1L, 10L, 3L)))
    assert(m(1L) === 437500L)
  }

  test("cascade attenuation: an early weak hit damps the later strong one") {
    // rank1 g=1 (R=1/8), rank2 g=3: ERR = 1/8 + (1/2)(7/8)(7/8)
    val m = err(Seq((1L, 1L, 10L), (1L, 2L, 11L)),
      Seq((1L, 10L, 1L), (1L, 11L, 3L)))
    assert(m(1L) === 507812L)
  }

  test("no relevant retrieved scores exactly 0, query still emitted") {
    val m = err(Seq((1L, 1L, 99L)), Seq((1L, 10L, 3L), (2L, 20L, 2L)))
    assert(m(1L) === 0L)
    assert(m(2L) === 0L)
  }

  test("results past k are ignored") {
    val m = err(Seq((1L, 3L, 10L)), Seq((1L, 10L, 3L)), k = 2)
    assert(m(1L) === 0L)
  }

  test("stopping model: a rank-1 g=3 hit dominates any tail") {
    val withTail = err(
      Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L)),
      Seq((1L, 10L, 3L), (1L, 11L, 3L), (1L, 12L, 3L)))
    // 7/8 + (1/2)(1/8)(7/8) + (1/3)(1/64)(7/8)
    assert(withTail(1L) > 875000L && withTail(1L) < 935000L)
  }
}
