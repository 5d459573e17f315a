package graft.text

import graft.SparkSpecBase

class PseudoRelevanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana banana"),
    (2L, "apple cherry"),
    (3L, "durian durian durian"),
    (4L, "banana banana banana banana"))
    .toDF("doc_id", "text")

  test("expansion adds the feedback set's dominant non-query term") {
    val q = Seq(0 -> "apple")
    val exp = PseudoRelevance.prfExpand(corpus, "doc_id", "text", q,
        kFb = 2, mExp = 1)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // feedback docs = {1, 2} (the only apple docs); banana(2) > cherry(1)
    assert(exp === Set(0 -> "apple", 0 -> "banana"))
  }

  test("re-retrieval reaches docs the original query cannot") {
    val q = Seq(0 -> "apple")
    val before = Bm25.bm25TopK(corpus, "doc_id", "text", q, 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val after = PseudoRelevance.prfTopK(corpus, "doc_id", "text", q,
        kFb = 2, mExp = 1, k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!before.contains(4L))
    assert(after.contains(4L))
    // the never-relevant durian doc stays out
    assert(!after.contains(3L))
  }

  test("expansion weight ties break on the lexicographically smaller term") {
    val docs = Seq((1L, "q zz aa"), (2L, "q zz aa")).toDF("doc_id", "text")
    val exp = PseudoRelevance.prfExpand(docs, "doc_id", "text",
        Seq(0 -> "q"), kFb = 2, mExp = 1)
      .collect().map(_.getString(1)).toSet
    assert(exp === Set("q", "aa"))
  }
}
