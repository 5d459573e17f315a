package graft.text

import graft.SparkSpecBase

class NgramLmSpec extends SparkSpecBase {
  import spark.implicits._

  test("negLogMicro: hand-computed add-1 bigram model") {
    // model corpus: "a b a b" and "a b" → tokens: a×3 b×3, V = 2
    // bigrams: (a,b)×3, (b,a)×1
    // p(b|a) = (3+1)/(3+2) = 0.8; p(a|b) = (1+1)/(3+2) = 0.4
    val model = Seq("a b a b", "a b").toDF("text")
    val docs = Seq((1L, "a b a"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val out = NgramLm.negLogMicro(docs, "doc_id", "text", model, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    val nlp = (p: Double) => math.floor(-math.log(p) * 1e6).toLong
    // doc 1: bigrams (a,b), (b,a) → nlp(0.8) + nlp(0.4)
    assert(out(1L) === ((2L, Some(nlp(0.8) + nlp(0.4)))))
    // docs with < 2 tokens are emitted unscored
    assert(out(2L) === ((0L, None)))
    assert(out(3L) === ((0L, None)))
  }

  test("perplexityScore: uniform model gives ppl = smoothed vocabulary mass") {
    // model "a b" seen once: p(b|a) = 2/3; a doc of exactly (a,b) must get
    // ppl = 1/p = 1.5 up to micro-nat rounding
    val model = Seq("a b").toDF("text")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val ppl = NgramLm.perplexityScore(docs, "doc_id", "text", model, "text")
      .collect().head.getAs[Double]("ppl")
    assert(math.abs(ppl - 1.5) < 1e-4, s"ppl $ppl")
    // unseen bigrams score worse than seen ones
    val docs2 = Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text")
    val both = NgramLm.perplexityScore(docs2, "doc_id", "text", model, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl"))
      .toMap
    assert(both(2L) > both(1L), "unseen bigram must have higher perplexity")
  }

  test("perplexityBuckets: balanced rank bands ordered by mean micro-nats") {
    val docs = graft.Tables.documents(spark, sf)
    val (out, release) = NgramLm.perplexityBucketsReleasable(
      docs, "doc_id", "text", docs, "text", nBuckets = 3)
    val rows = out.collect().map(r => (r.getAs[Int]("bucket"),
      r.getAs[Long]("n_bigrams"), Option(r.getAs[Any]("nlp_micro"))))
    release()
    val sizes = rows.filter(_._1 > 0).groupBy(_._1).view.mapValues(_.length)
    assert(sizes.keySet === Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 2,
      s"rank bands should be near-equal, got $sizes")
    // CCNet ordering: every head doc's mean micro-nats <= every tail doc's
    def means(b: Int) = rows.filter(_._1 == b).map {
      case (_, n, Some(m)) => m.asInstanceOf[Long].toDouble / n
      case x => fail(s"scorable row without nlp_micro: $x")
    }
    assert(means(1).max <= means(3).min,
      "head bucket must be uniformly closer to the model than tail")
    // unscorable docs (no bigrams) land in bucket 0 with null score
    rows.filter(_._1 == 0).foreach { case (_, n, m) =>
      assert(n === 0L && m.isEmpty)
    }
    spark.catalog.clearCache()
  }
}
