package graft.sim

import graft.SparkSpecBase

class MmrDiversifySpec extends SparkSpecBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long, Long, Long)*) =
    (pairs ++ pairs.map { case (q, a, b, s) => (q, b, a, s) })
      .toDF("qid", "a", "b", "s_micro")

  test("diversity flips the second pick away from the redundant runner-up") {
    // A(rel 100) picked first; B(rel 90) is near-duplicate of A (sim 95),
    // C(rel 60) is novel (sim 10): 7*90-3*95=345 < 7*60-3*10=390 -> C
    val cands = Seq((1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 60L))
      .toDF("qid", "id", "rel_micro")
    val sims = sym((1L, 1L, 2L, 95L), (1L, 1L, 3L, 10L), (1L, 2L, 3L, 10L))
    val out = MmrDiversify.mmrSelect(cands, sims, k = 3,
        lamNum = 7, lamDen = 10)
      .orderBy("pick").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // objectives recorded at selection time
    assert(out(0).getAs[Long]("mmr_micro") === 700L)
    assert(out(1).getAs[Long]("mmr_micro") === 390L)
    // B's final score counts its max sim to the selected set {A, C}
    assert(out(2).getAs[Long]("mmr_micro") === 7L * 90L - 3L * 95L)
  }

  test("exact score ties break on the smaller candidate id") {
    val cands = Seq((1L, 5L, 80L), (1L, 4L, 80L)).toDF("qid", "id", "rel_micro")
    val sims = sym((1L, 4L, 5L, 0L))
    val out = MmrDiversify.mmrSelect(cands, sims, k = 2,
        lamNum = 7, lamDen = 10)
      .orderBy("pick").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 5L))
  }

  test("selection stops cleanly when candidates are exhausted before k") {
    val cands = Seq((1L, 1L, 50L), (1L, 2L, 40L)).toDF("qid", "id", "rel_micro")
    val sims = sym((1L, 1L, 2L, 5L))
    val out = MmrDiversify.mmrSelect(cands, sims, k = 4,
      lamNum = 7, lamDen = 10)
    assert(out.count() === 2L)
  }

  test("queries select independently") {
    val cands = Seq((1L, 1L, 100L), (1L, 2L, 10L),
        (2L, 2L, 100L), (2L, 1L, 10L))
      .toDF("qid", "id", "rel_micro")
    val sims = sym((1L, 1L, 2L, 0L), (2L, 1L, 2L, 0L))
    val out = MmrDiversify.mmrSelect(cands, sims, k = 1,
        lamNum = 7, lamDen = 10)
      .orderBy("qid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((1L, 1L), (2L, 2L)))
  }
}
