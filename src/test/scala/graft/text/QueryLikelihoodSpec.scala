package graft.text

import graft.SparkSpecBase

class QueryLikelihoodSpec extends SparkSpecBase {
  import spark.implicits._

  private def rank(q: Seq[(Int, String)], docs: (Long, String)*) =
    QueryLikelihood.qlTopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      q, 10)
      .collect().map(r => (r.getAs[Int]("query_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_micro")))

  test("more matched occurrences rank higher at equal length") {
    val out = rank(Seq(0 -> "cat"),
      1L -> "cat dog dog dog", 2L -> "cat cat dog dog",
      3L -> "dog dog dog dog")
    // doc 3 never matches and is absent; doc 2 (tf=2) beats doc 1 (tf=1)
    assert(out.map(_._3).toSeq === Seq(2L, 1L))
  }

  test("Dirichlet length prior: same tf, longer doc ranks lower") {
    val out = rank(Seq(0 -> "cat"),
      1L -> "cat dog", 2L -> "cat dog dog dog dog dog dog dog")
    assert(out.map(_._3).toSeq === Seq(1L, 2L))
  }

  test("score replays the floored two-term decomposition exactly") {
    // corpus: d1 = "cat dog", d2 = "dog dog" -> sumdl = 4, cf(cat) = 1
    val out = rank(Seq(0 -> "cat"), 1L -> "cat dog", 2L -> "dog dog")
    val mu = 100.0
    val expected = (math.floor(math.log(1.0 + (1.0 * 4.0) / (mu * 1.0))
      * 1e6) + 1L * math.floor(math.log(mu / (2.0 + mu)) * 1e6)).toLong
    assert(out.toSeq === Seq((0, 1L, 1L, expected)))
  }

  test("ties break on doc id; multi-term queries sum matched terms") {
    val out = rank(Seq(0 -> "cat", 0 -> "dog"),
      1L -> "cat dog", 2L -> "cat dog", 3L -> "cat cat")
    assert(out.take(2).map(r => (r._2, r._3)).toSeq ===
      Seq((1L, 1L), (2L, 2L)))
    assert(out(0)._4 === out(1)._4)
  }
}
