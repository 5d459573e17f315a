package graft.text

import graft.SparkSpecBase

class CollocationsSpec extends SparkSpecBase {
  import spark.implicits._

  // corpus totals: nt = 10 unigrams, nb = 8 bigram positions
  // bigram counts: (a,b)=3, (b,a)=(b,c)=(c,d)=(b,e)=(e,e)=1
  // unigram counts: a=3, b=3, c=1, d=1, e=2
  private lazy val docs = Seq(
    (1L, "a b a b c d"), (2L, "a b e e")).toDF("doc_id", "text")

  private def refMicro(cxy: Long, cx: Long, cy: Long): Long =
    math.floor(math.log((cxy.toDouble * 10 * 10) /
      (cx.toDouble * cy * 8)) * 1e6).toLong

  test("PMI matches the plain-Scala reference; min-count floors hapax " +
      "pairs") {
    val out = Collocations.pmiTopK(docs, "doc_id", "text", 2, 10).collect()
    // only (a,b) survives minCount=2
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)) ===
      ("a", "b", 3L, refMicro(3, 3, 3)))
  }

  test("ranking is (pmi desc, x, y) — equal-rational scores tie-break " +
      "lexically") {
    val out = Collocations.pmiTopK(docs, "doc_id", "text", 1, 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    // (c,d): ln(100/8); then (a,b) and (b,c) both equal 25/6 EXACTLY as
    // rationals -> identical doubles -> identical micro-nats -> lexical
    assert(out.toSeq === Seq(
      (1L, "c", "d", refMicro(1, 1, 1)),
      (2L, "a", "b", refMicro(3, 3, 3)),
      (3L, "b", "c", refMicro(1, 3, 1))))
    assert(out(1)._4 === out(2)._4, "the planted tie is exact")
  }
}
