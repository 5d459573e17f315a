package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MatryoshkaSpec extends SparkSpecBase {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val queries = emb.filter(col("vec_id") < 10)

  private def recallAtK(run: Seq[(Long, Long)], exact: Seq[(Long, Long)])
      : Double = {
    val e = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = run.count { case (q, n) => e(q).contains(n) }
    hits.toDouble / exact.size
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("qid", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("kCand = corpus reproduces the exact brute-force ranking " +
      "(rerank is exact by construction)") {
    val n = emb.count().toInt
    val got = Matryoshka.matryoshkaTopK(emb, queries, "vec_id",
      "embedding", dPrefix = 16, kCand = n, k = 3)
    val want = SimilarityOps.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 3)
    assert(pairs(got.orderBy("qid", "rank")) ===
      pairs(want.orderBy("qid", "rank")))
  }

  test("wider prefixes do not lose recall: d=32 candidates recall >= " +
      "d=8 at the same kCand, and a modest kCand already recalls most " +
      "of the exact top-3") {
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 3))
    def recall(d: Int, kc: Int) = recallAtK(pairs(Matryoshka
      .matryoshkaTopK(emb, queries, "vec_id", "embedding", d, kc, k = 3)),
      exact)
    // measured on the sf0.001 fixture (synthetic, NOT MRL-trained, so
    // the prefix is a plain random projection — the honest floor):
    // (8,12)=0.13 (16,12)=0.30 (32,12)=0.47 (32,24)=0.73 (32,48)=0.80
    val r8 = recall(8, 12); val r32 = recall(32, 12)
    assert(r32 >= r8, s"recall fell with more dims: d8=$r8 d32=$r32")
    assert(recall(32, 24) >= 0.7, "half-dim candidates at kCand=24 " +
      "should recall >= 0.7 of exact top-3 even untrained")
  }

  test("prefix_rank records the candidate stage's position and the " +
      "rerank genuinely reorders somewhere") {
    val out = Matryoshka.matryoshkaTopK(emb, queries, "vec_id",
      "embedding", dPrefix = 8, kCand = 12, k = 5).collect()
    assert(out.forall(r => r.getAs[Long]("prefix_rank") >= 1L &&
      r.getAs[Long]("prefix_rank") <= 12L))
    // with an 8-dim prefix the cheap order disagrees with the exact
    // order for at least one pick (else the test data is degenerate)
    assert(out.exists(r =>
      r.getAs[Long]("rank") != r.getAs[Long]("prefix_rank")))
  }
}
