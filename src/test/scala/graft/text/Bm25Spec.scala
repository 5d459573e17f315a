package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  // corpus with hand-checkable stats: N = 4, dl = {4, 5, 8, 2}
  private lazy val docs = Seq(
    (1L, "spark engine spark core"),
    (2L, "fast engine on the cluster"),
    (3L, "spark cluster spark cluster spark cluster query plan"),
    (4L, "no match")).toDF("doc_id", "text")

  /** Independent reference implementation in plain Scala (same integer
    * cross-multiplication, different execution path — BigInt instead of
    * Spark decimal(38,0) expressions). */
  private def refScore(tf: Long, df: Long, n: Long, dl: Long,
      sumdl: Long): Long = {
    val idfMicro = math.floor(math.log(1.0 +
      (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)) * 1e6).toLong
    ((BigInt(idfMicro) * tf * 22 * sumdl) /
      (BigInt(tf) * 10 * sumdl + BigInt(sumdl) * 3 + BigInt(dl) * 9 * n))
      .toLong
  }

  test("scores equal the plain-Scala BM25 reference and rank by score") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "spark", 0 -> "cluster"), 10)
      .orderBy("query_id", "rank").collect()
    // postings: spark -> docs 1 (tf 2), 3 (tf 3); cluster -> 2 (tf 1), 3 (tf 3)
    val n = 4L
    val dls = Map(1L -> 4L, 2L -> 5L, 3L -> 8L, 4L -> 2L)
    val sumdl = dls.values.sum
    val expected = Map(
      1L -> refScore(2, 2, n, dls(1L), sumdl),
      2L -> refScore(1, 2, n, dls(2L), sumdl),
      3L -> (refScore(3, 2, n, dls(3L), sumdl)
        + refScore(3, 2, n, dls(3L), sumdl)))
    val got = out.map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got === expected)
    // doc 3 matches both terms -> highest score; doc 4 matches nothing
    assert(out.head.getLong(2) === 3L)
    assert(!got.contains(4L))
    // ranks are 1..3 in score order
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    val scores = out.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("k bounds per-query output; unmatched queries vanish; ties break " +
      "on doc_id") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "engine", 1 -> "absentterm"), 1).collect()
    // engine hits docs 1 and 2 with identical tf=1 and idf; dl differs so
    // scores differ — but k=1 keeps only the best
    assert(out.length === 1 && out.head.getInt(0) === 0)
    // a same-score tie (two docs, same dl, same tf) orders by doc_id
    val twin = Seq((7L, "alpha beta"), (5L, "alpha beta"))
      .toDF("doc_id", "text")
    val t = Bm25.bm25TopK(twin, "doc_id", "text", Seq(0 -> "alpha"), 2)
      .orderBy("rank").collect()
    assert(t.map(_.getLong(2)).toSeq === Seq(5L, 7L))
    assert(t.map(_.getLong(3)).distinct.length === 1, "equal scores")
  }
}
