package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChatPrepSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a bb ccc dddd e ff ggg hhhh i jj"), // 10 words -> 2 turns
    (2L, "one two three"), //  3 words -> 1 turn
    (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")) //  9 words -> 2 turns (8 + 1)
    .toDF("doc_id", "text")

  test("offsets CERTIFY against the real render: every turn's " +
      "[render_start, render_end) is header+text+trailer, every " +
      "assistant mask span is text+trailer") {
    val rendered = ChatPrep.renderConversations(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val turns = ChatPrep.chatTurns(docs, "doc_id", "text")
      .orderBy("doc_id", "turn_idx").collect()
    assert(turns.nonEmpty)
    turns.foreach { t =>
      val id = t.getAs[Long]("doc_id")
      val full = rendered(id)
      val role = t.getAs[String]("role")
      val idx = t.getAs[Long]("turn_idx").toInt
      val text = words(id).slice(idx * 8, idx * 8 + 8).mkString(" ")
      val seg = full.substring(t.getAs[Long]("render_start").toInt,
        t.getAs[Long]("render_end").toInt)
      assert(seg === s"<|$role|>\n$text\n<|end|>\n")
      if (role == "assistant") {
        val mask = full.substring(t.getAs[Long]("mask_start").toInt,
          t.getAs[Long]("mask_end").toInt)
        assert(mask === s"$text\n<|end|>\n")
      } else {
        assert(t.isNullAt(t.fieldIndex("mask_start")))
        assert(t.isNullAt(t.fieldIndex("mask_end")))
      }
    }
    // the last turn ends exactly at the render's end (no slack chars)
    rendered.keys.foreach { id =>
      val last = turns.filter(_.getAs[Long]("doc_id") == id)
        .maxBy(_.getAs[Long]("turn_idx"))
      assert(last.getAs[Long]("render_end") === rendered(id).length.toLong)
    }
  }

  test("turn structure: words partition exactly, roles alternate from " +
      "user, every turn but the last is full") {
    val turns = ChatPrep.chatTurns(docs, "doc_id", "text")
      .orderBy("doc_id", "turn_idx").collect()
    val byDoc = turns.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).length === 2 && byDoc(2L).length === 1 &&
      byDoc(3L).length === 2)
    byDoc.foreach { case (id, ts) =>
      val n = docs.filter(col("doc_id") === id).head()
        .getString(1).split(" ").length
      assert(ts.map(_.getAs[Long]("turn_words")).sum === n.toLong)
      ts.foreach { t =>
        val expRole = if (t.getAs[Long]("turn_idx") % 2 == 0) "user"
        else "assistant"
        assert(t.getAs[String]("role") === expRole)
      }
      ts.dropRight(1).foreach(t =>
        assert(t.getAs[Long]("turn_words") === 8L))
    }
  }

  test("validateAlternation flags each violation class exactly once " +
      "and passes the clean conversation") {
    val fixture = Seq(
      // clean: user/assistant/user
      ("ok", 0L, "user", 5L), ("ok", 1L, "assistant", 6L),
      ("ok", 2L, "user", 2L),
      // bad role at idx 1 (counted as bad_role, NOT also parity)
      ("roles", 0L, "user", 3L), ("roles", 1L, "system", 3L),
      // parity break: assistant where user expected
      ("parity", 0L, "assistant", 3L),
      // empty + oversize turns
      ("sizes", 0L, "user", 0L), ("sizes", 1L, "assistant", 2000L),
      // index gap: turn 1 missing
      ("gap", 0L, "user", 3L), ("gap", 2L, "user", 3L))
      .toDF("conv_id", "turn_idx", "role", "turn_words")
    val got = ChatPrep.validateAlternation(fixture, "conv_id")
      .collect().map(r => r.getAs[String]("conv_id") -> r).toMap
    assert(got("ok").getAs[Boolean]("valid"))
    assert(got("roles").getAs[Long]("bad_role") === 1L)
    assert(got("roles").getAs[Long]("parity_breaks") === 0L)
    assert(!got("roles").getAs[Boolean]("valid"))
    assert(got("parity").getAs[Long]("parity_breaks") === 1L)
    assert(got("sizes").getAs[Long]("empty_turns") === 1L)
    assert(got("sizes").getAs[Long]("oversize_turns") === 1L)
    assert(got("gap").getAs[Long]("index_gap") === 1L)
    assert(!got("gap").getAs[Boolean]("valid"))
  }

  test("a document with no words emits no turns, not a crash") {
    val empty = Seq((9L, "   ")).toDF("doc_id", "text")
    assert(ChatPrep.chatTurns(empty, "doc_id", "text").count() === 0L)
    assert(ChatPrep.renderConversations(empty, "doc_id", "text")
      .count() === 0L)
  }
}
