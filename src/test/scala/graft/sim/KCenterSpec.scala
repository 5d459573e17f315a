package graft.sim

import graft.SparkSpecBase

class KCenterSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("greedy selection picks the least-covered point each step") {
    // 0=(1,0) seed; 1 duplicates 0 (sim 1e6); 2=(0,1) orthogonal;
    // 3=45 degrees (sim 707107 to both axes)
    val e = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(0f, 1f), 3L -> Seq(0.7071068f, 0.7071068f))
    val out = KCenter.kCenterSelect(e, "vec_id", "embedding", k = 3)
      .orderBy("pick").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // step 2: sims to seed = [1: 1e6, 2: 0, 3: 707107] -> argmin id 2
    // step 3: maxsim = [1: 1e6, 3: max(707107, 707107)] -> id 3
    assert(out.toSeq === Seq((1L, 0L, 0L), (2L, 2L, 0L),
      (3L, 3L, 707107L)))
  }

  test("duplicate vectors cannot be re-picked (anti-join guard)") {
    val e = emb(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f))
    val out = KCenter.kCenterSelect(e, "vec_id", "embedding", k = 2)
      .orderBy("pick").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 0L, 0L), (2L, 1L, 1000000L)))
  }

  test("a pool smaller than k stops cleanly at the pool size") {
    val e = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val out = KCenter.kCenterSelect(e, "vec_id", "embedding", k = 5)
    assert(out.count() === 2L)
  }

  test("k covers monotonically: max similarity at selection never rises") {
    val out = KCenter.kCenterSelect(
        graft.Tables.embeddings(spark, sf), "vec_id", "embedding", k = 6)
      .orderBy("pick").collect().map(_.getLong(2)).drop(1)
    // after the seed, each later pick is at least as covered as the
    // previous one (greedy min-of-max is nondecreasing)
    assert(out.zip(out.tail).forall { case (a, b) => a <= b })
  }
}
