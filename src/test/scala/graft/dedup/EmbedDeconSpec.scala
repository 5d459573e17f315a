package graft.dedup

import graft.SparkSpecBase

class EmbedDeconSpec extends SparkSpecBase {
  import spark.implicits._

  test("max cosine against the bench set decides the flag; argmax ties " +
      "break on the lower bench id") {
    val corpus = Seq(
      (100L, Array(1.0f, 0.0f)),   // identical to bench 1 -> cos 1
      (101L, Array(0.0f, 1.0f)),   // orthogonal to 1, identical to 2
      (102L, Array(1.0f, 1.0f))    // cos ~0.707 to both -> tie on id
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = EmbedDecon.embedDecontaminate(corpus, bench, "vec_id",
      "embedding", tauMicro = 900000L).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out(0) === ((100L, 1L, 1000000L, 1)))
    assert(out(1) === ((101L, 2L, 1000000L, 1)))
    // 0.7071... floors to 707106 < tau; tie -> bench 1
    assert(out(2) === ((102L, 1L, 707106L, 0)))
  }
}
