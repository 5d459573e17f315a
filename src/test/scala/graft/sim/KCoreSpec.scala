package graft.sim

import graft.SparkSpecBase

class KCoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("2-core peels the pendant chain down to the triangle; cascade " +
      "needs the later rounds; converged certifies the fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val out = KCore.kCore(edges, "s", "t", k = 2, rounds = 4)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall(r => r.getLong(1) === 2L && r.getBoolean(2)))
  }

  test("insufficient rounds leave the cascade unfinished and say so") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val out = KCore.kCore(edges, "s", "t", k = 2, rounds = 1)
      .orderBy("id").collect()
    // round 1 only removed node 5; node 4 still dangles at degree 1
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out.forall(!_.getBoolean(2)))
  }
}
