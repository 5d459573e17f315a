package graft.text

import graft.SparkSpecBase

class KneserNeySpec extends SparkSpecBase {
  import spark.implicits._

  private def score(model: Seq[String], docs: Seq[(Long, String)]) =
    KneserNey.negLogMicro(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      model.map(Tuple1(_)).toDF("text"), "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("hand probability: seen bigram under the cleared-integer form") {
    // model "a b", "a c": P(b|a) = 1/8 + (3/4 * 2/2) * 2/6 = 3/8
    val m = score(Seq("a b", "a c"), Seq(1L -> "a b"))
    val expected = math.floor(-math.log(18.0 / 48.0) * 1e6).toLong
    assert(m(1L) === ((1L, Some(expected))))
  }

  test("unseen continuation backs off to the reserved unk mass") {
    // "a z": num = 3 * n1f(a) * 1 = 6, den = 4 * 2 * 6 = 48 -> 1/8
    val m = score(Seq("a b", "a c"), Seq(1L -> "a z"))
    val expected = math.floor(-math.log(6.0 / 48.0) * 1e6).toLong
    assert(m(1L)._2 === Some(expected))
  }

  test("unseen context falls back to pure continuation probability") {
    // "q b": P = (n1b(b)+1)/CN = 2/6
    val m = score(Seq("a b", "a c"), Seq(1L -> "q b"))
    val expected = math.floor(-math.log(2.0 / 6.0) * 1e6).toLong
    assert(m(1L)._2 === Some(expected))
  }

  test("the KN signature: continuation counts CONTEXTS, not occurrences") {
    // "francisco" occurs twice but after ONE context; "dog" occurs
    // twice after TWO contexts. Under an unseen context, dog must be
    // the better continuation despite equal unigram counts.
    val model = Seq("san francisco", "san francisco", "the dog", "big dog")
    val m = score(model, Seq(1L -> "q dog", 2L -> "q francisco"))
    assert(m(1L)._2.get < m(2L)._2.get)
  }

  test("short docs are emitted unscored, not dropped") {
    val m = score(Seq("a b"), Seq(1L -> "a", 2L -> ""))
    assert(m(1L) === ((0L, None)))
    assert(m(2L) === ((0L, None)))
  }

  test("repeated seen bigrams sum exactly (order-free integer sum)") {
    val one = score(Seq("a b", "a c"), Seq(1L -> "a b"))(1L)._2.get
    val twice = score(Seq("a b", "a c"), Seq(1L -> "a b a b"))(1L)
    // "a b a b" has bigrams (a,b), (b,a), (a,b): the two (a,b) terms
    // contribute exactly 2 * one
    assert(twice._1 === 3L)
    val ba = score(Seq("a b", "a c"), Seq(1L -> "b a"))(1L)._2.get
    assert(twice._2.get === 2L * one + ba)
  }

  private def mink(model: Seq[String], docs: Seq[(Long, String)]) =
    KneserNey.minKSurprisal(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      model.map(Tuple1(_)).toDF("text"), "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("min-k tail: 5 bigrams keep ceil(5/5) = 1, the most surprising") {
    // "a b" is the only trained bigram; the rest are surprises
    val m = mink(Seq("a b"), Seq(1L -> "a b c d e f"))
    val (n, k, mean) = m(1L)
    assert(n === 5L && k === 1L)
    // the kept bigram must score at least the full-document mean
    val full = score(Seq("a b"), Seq(1L -> "a b c d e f"))(1L)._2.get
    assert(mean.get >= full / 5L)
  }

  test("min-k mean separates memorized text from novel text") {
    val model = Seq("the cat sat on the mat", "the cat sat on the mat")
    val m = mink(model,
      Seq(1L -> "the cat sat on the mat", 2L -> "purple quantum bananas dream"))
    assert(m(1L)._3.get < m(2L)._3.get)
  }

  test("min-k on short docs: unscorable emits k_top 0 and null mean") {
    val m = mink(Seq("a b"), Seq(1L -> "a"))
    assert(m(1L) === ((0L, 0L, None)))
  }
}
