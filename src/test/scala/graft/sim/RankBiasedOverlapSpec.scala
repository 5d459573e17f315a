package graft.sim

import graft.SparkSpecBase

class RankBiasedOverlapSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "rank", "neighbor")

  /** The operator's own floored-term definition, replayed in BigInt. */
  private def expectedIdentical(k: Int): Long =
    (1 to k).map { d =>
      (BigInt(d) * (BigInt(9).pow(d - 1) * 1000000)
        / (BigInt(10).pow(d) * d)).toLong
    }.sum

  test("identical runs score the full truncated mass") {
    val a = run((1 to 5).map(r => (1L, r.toLong, 100L + r)): _*)
    val out = RankBiasedOverlap.rbo(a, a, k = 5).collect()(0)
    assert(out.getAs[Long]("rbo_micro") === expectedIdentical(5))
    assert(out.getAs[Long]("overlap_k") === 5L)
  }

  test("disjoint runs score zero") {
    val a = run((1L, 1L, 10L), (1L, 2L, 11L))
    val b = run((1L, 1L, 20L), (1L, 2L, 21L))
    val out = RankBiasedOverlap.rbo(a, b, k = 2).collect()(0)
    assert(out.getAs[Long]("rbo_micro") === 0L)
    assert(out.getAs[Long]("overlap_k") === 0L)
  }

  test("agreement at rank 1 outweighs agreement at rank k") {
    // q1: runs share only the rank-1 item; q2: share only the rank-3 item
    val a = run((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L))
    val b = run((1L, 1L, 10L), (1L, 2L, 31L), (1L, 3L, 32L),
      (2L, 1L, 40L), (2L, 2L, 41L), (2L, 3L, 22L))
    val out = RankBiasedOverlap.rbo(a, b, k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rbo_micro"))
      .toMap
    assert(out(1L) > out(2L))
    assert(out(2L) > 0L)
  }

  test("a query present in one run only scores zero, not absent") {
    val a = run((1L, 1L, 10L), (7L, 1L, 50L))
    val b = run((1L, 1L, 10L))
    val out = RankBiasedOverlap.rbo(a, b, k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rbo_micro"))
      .toMap
    assert(out.keySet === Set(1L, 7L))
    assert(out(7L) === 0L)
  }
}
