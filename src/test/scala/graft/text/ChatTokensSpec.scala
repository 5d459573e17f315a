package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChatTokensSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat and then the dog ate the cat food too"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "solo")).toDF("doc_id", "text")

  // small model so the spec stays fast: pieces up to 3 chars, 10 extra
  private val (mpl, extra, its, w) = (3, 10, 1, 4)

  private def spans() = ChatTokens.chatTokenSpans(docs, "doc_id", "text",
    wordsPerTurn = w, maxPieceLen = mpl, vocabExtra = extra, iters = its)
    .orderBy("doc_id", "turn_idx").collect()

  test("per-doc token totals equal the batch unigram encode " +
      "(the tokenizer leg is the SAME segmentation)") {
    val got = spans().groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.map(_.getAs[Long]("n_text_tokens")).sum
    }
    val enc = UnigramLm.encodeCorpus(docs, "doc_id", "text",
      maxPieceLen = mpl, vocabExtra = extra, iters = its)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_pieces")).toMap
    assert(got === enc)
  }

  test("turn spans tile the conversation: tok_start(0)=0, each turn " +
      "starts where the previous ended, extent = text tokens + 2 specials") {
    spans().groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("turn_idx"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_start") === expect)
        assert(r.getAs[Long]("turn_tokens") ===
          r.getAs[Long]("n_text_tokens") + 2L)
        assert(r.getAs[Long]("tok_end") ===
          r.getAs[Long]("tok_start") + r.getAs[Long]("turn_tokens"))
        expect = r.getAs[Long]("tok_end")
      }
    }
  }

  test("char and token masks agree: the char-masked text re-segments " +
      "to exactly the token-mask extent minus the end special") {
    val scores = UnigramLm.learn(docs, "text", maxPieceLen = mpl,
      vocabExtra = extra, iters = its)
      .collect().map(r => r.getAs[String]("piece") ->
        r.getAs[Long]("score_micro")).toMap
    val rendered = ChatPrep.renderConversations(docs, "doc_id", "text",
      wordsPerTurn = w).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("rendered")).toMap
    val chars = ChatPrep.chatTurns(docs, "doc_id", "text", wordsPerTurn = w)
      .orderBy("doc_id", "turn_idx").collect()
    val toks = spans()
    assert(chars.length === toks.length)
    chars.zip(toks).foreach { case (c, t) =>
      // same turn structure on both sides
      assert(c.getLong(0) === t.getLong(0))
      assert(c.getAs[Long]("turn_idx") === t.getAs[Long]("turn_idx"))
      assert(c.getAs[String]("role") === t.getAs[String]("role"))
      assert(c.getAs[Long]("turn_words") === t.getAs[Long]("turn_words"))
      if (c.getAs[String]("role") == "assistant") {
        val r = rendered(c.getLong(0))
        val span = r.substring(c.getAs[Long]("mask_start").toInt,
          c.getAs[Long]("mask_end").toInt)
        assert(span.endsWith("\n<|end|>\n"))
        val text = span.dropRight(9)
        val nTok = text.split(" ").filter(_.nonEmpty)
          .map(UnigramLm.viterbiPieceCount(_, scores, mpl)).sum
        assert(nTok > 0L)
        assert(t.getAs[Long]("n_text_tokens") === nTok)
        // token mask = text tokens + the end special, never the header
        assert(t.getAs[Long]("mask_end_tok") -
          t.getAs[Long]("mask_start_tok") === nTok + 1L)
        assert(t.getAs[Long]("mask_start_tok") ===
          t.getAs[Long]("tok_start") + 1L)
        assert(t.getAs[Long]("mask_end_tok") === t.getAs[Long]("tok_end"))
      } else {
        assert(t.isNullAt(t.fieldIndex("mask_start_tok")))
        assert(t.isNullAt(t.fieldIndex("mask_end_tok")))
      }
    }
  }
}
