package graft.etl

import graft.SparkSpecBase

class ShuffleQualitySpec extends SparkSpecBase {
  import spark.implicits._

  // independent replica of the corpus PRNG for the hash-order trace
  private def h32(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private val docs = Seq(
    (1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "C"))
    .toDF("doc_id", "source")

  test("source-sorted layout hits the ceiling: same pairs = N - S; " +
      "expectation is the floored sum of squared shares") {
    val got = ShuffleQuality.shuffleQualityReport(docs, "doc_id", "source")
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    val so = got("source_sorted")
    assert(so.getAs[Long]("n_docs") === 6L)
    assert(so.getAs[Long]("n_pairs") === 5L)
    assert(so.getAs[Long]("same_pairs") === 3L) // (3-1)+(2-1)+(1-1)
    assert(so.getAs[Long]("obs_same_micro") === 600000L)
    // p = 3/6, 2/6, 1/6 -> floored micro 500000, 333333, 166666
    // sum of pm^2 div 1e6 = 250000 + 111110 + 27767 = 388877
    assert(so.getAs[Long]("exp_same_micro") ===
      (500000L * 500000L / 1000000L) + (333333L * 333333L / 1000000L) +
        (166666L * 166666L / 1000000L))
  }

  test("hash-shuffled adjacency replays the independent md5 order") {
    val order = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, _) => (h32(id.toString), id) }
    val expectedSame = order.sliding(2)
      .count(p => p(0)._2 == p(1)._2).toLong
    val sh = ShuffleQuality.shuffleQualityReport(docs, "doc_id", "source")
      .collect().find(_.getAs[String]("policy") == "hash_shuffled").get
    assert(sh.getAs[Long]("same_pairs") === expectedSame)
    assert(sh.getAs[Long]("n_pairs") === 5L)
  }

  test("a well-shuffled planted corpus sits far below the sorted " +
      "ceiling") {
    val big = (1L to 400L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val got = ShuffleQuality.shuffleQualityReport(big, "doc_id", "source")
      .collect().map(r => r.getAs[String]("policy") ->
        r.getAs[Long]("obs_same_micro")).toMap
    assert(got("hash_shuffled") < got("source_sorted"))
    // 4 equal sources: expectation 250000; sorted ceiling ~990000
    assert(got("source_sorted") === (400L - 4L) * 1000000L / 399L)
  }
}
