package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MaxSimSpec extends SparkSpecBase {
  import spark.implicits._

  // docs: 1 = {e1, e2} (orthonormal pair), 2 = {(0.6, 0.8)},
  //       3 = {e1, e1, e1} (duplicates must not inflate the score)
  private lazy val corpus = Seq(
    (1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
    (2L, Seq(0.6, 0.8)),
    (3L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0))
  ).toDF("doc", "vec")

  // one query, two tokens: e1 and e2
  private lazy val q = Seq(
    (0L, 0L, Seq(1.0, 0.0)), (0L, 1L, Seq(0.0, 1.0))
  ).toDF("qid", "tok", "qv")

  test("MaxSim sums each token's best doc-vector match; extra copies " +
      "of a vector add nothing") {
    val out = MaxSim.maxSimTopK(corpus, "doc", "vec", q, "qid", "tok",
        "qv", 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc1: 1 + 1 = 2 ; doc2: 0.6 + 0.8 = 1.4 ; doc3: 1 + 0 = 1
    assert(out.toSeq === Seq((1L, 1L, 2.0), (2L, 2L, 1.4), (3L, 3L, 1.0)))
  }

  test("k truncates per query and ties break on doc id") {
    val twin = Seq((7L, Seq(1.0, 0.0)), (5L, Seq(1.0, 0.0)))
      .toDF("doc", "vec")
    val out = MaxSim.maxSimTopK(twin, "doc", "vec",
        q.filter(col("tok") === 0L), "qid", "tok", "qv", 1).collect()
    assert(out.length === 1 && out.head.getLong(2) === 5L)
  }
}
