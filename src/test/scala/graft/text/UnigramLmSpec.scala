package graft.text

import graft.SparkSpecBase

class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def micro(c: Long, tPlusN: Long): Long =
    math.floor(math.log((c + 1).toDouble / tPlusN.toDouble) * 1e6).toLong

  test("hand-traced hard EM on a 2-word vocab: Viterbi picks the whole" +
      " word, chars survive pruning at count 0") {
    // vocab: ab (freq 2), b (1). Seed: a=2, b=3, ab=2 (T=7, N=3).
    // score0: a = ln(3/10), b = ln(4/10), ab = ln(3/10); the Viterbi
    // path for "ab" is [ab] (one piece beats a+b), so iter-1 counts
    // are ab=2, b=1, a=0; iter 2 repeats with the same counts.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = UnigramLm.learn(docs, "text", maxPieceLen = 4,
      vocabExtra = 60, iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet === Set("a", "b", "ab"))
    assert(got("a") === ((0L, micro(0, 6))))
    assert(got("b") === ((1L, micro(1, 6))))
    assert(got("ab") === ((2L, micro(2, 6))))
  }

  test("encode: per-doc word, piece, and char counts under the learned" +
      " model") {
    val docs = Seq((1L, "ab ab b"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val got = UnigramLm.encodeCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "ab" segments as the single piece [ab]
    assert(got(1L) === ((3L, 3L, 5L)))
    assert(got(2L) === ((1L, 1L, 2L)))
    assert(!got.contains(3L)) // token-less docs emit no row
  }

  test("multi-char pruning keeps the top-K by count with the piece " +
      "tiebreak; losers drop, chars never do") {
    // words: ab(3) cd(1) -> multi pieces ab=3, cd=1; vocabExtra=1
    // keeps only ab; chars a,b,c,d all stay
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val got = UnigramLm.learn(docs, "text", maxPieceLen = 2,
      vocabExtra = 1, iters = 1)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("a", "b", "c", "d", "ab"))
  }

  test("a word longer than maxPieceLen segments greedily by the DP, " +
      "never crashes") {
    val docs = Seq((1L, "abcdefgh abcdefgh")).toDF("doc_id", "text")
    val enc = UnigramLm.encodeCorpus(docs, "doc_id", "text",
      maxPieceLen = 3, vocabExtra = 10, iters = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 8 chars, pieces of len <= 3: at least ceil(8/3) = 3 pieces
    assert(enc(1L)._1 === 2L)
    assert(enc(1L)._2 >= 6L && enc(1L)._2 <= 16L)
    assert(enc(1L)._3 === 16L)
  }
}
