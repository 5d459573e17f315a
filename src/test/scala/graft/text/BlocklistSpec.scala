package graft.text

import graft.SparkSpecBase

class BlocklistSpec extends SparkSpecBase {
  import spark.implicits._

  private def gate(maxHits: Long, lex: Seq[String],
      docs: (Long, String)*) =
    Blocklist.blocklistGate(docs.toDF("doc_id", "text"), "doc_id", "text",
      lex.toDF("phrase"), "phrase", maxHits)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

  test("hand-counted hits across gram lengths; zero-hit docs keep") {
    val m = gate(2L, Seq("spark", "big table"),
      (1L, "a spark spark big table"), // spark x2 + big table x1 = 3
      (2L, "nothing to see here"),
      (3L, "big table"))
    assert(m(1L) === ((3L, 2L, false)))
    assert(m(2L) === ((0L, 0L, true)))
    assert(m(3L) === ((1L, 1L, true)))
  }

  test("overlapping windows all count (automaton semantics)") {
    // toks [key agg key agg key]: 'key agg key' matches at 0 AND 2
    val m = gate(10L, Seq("key agg key"), (1L, "key agg key agg key"))
    assert(m(1L) === ((2L, 1L, true)))
  }

  test("empty lexicon short-circuits to the all-keep zero-hit report") {
    val m = gate(0L, Seq.empty, (1L, "anything at all"), (2L, ""))
    assert(m(1L) === ((0L, 0L, true)))
    assert(m(2L) === ((0L, 0L, true)))
  }

  test("all-whitespace lexicon rows are dropped, not crashed on") {
    val m = gate(0L, Seq("", "   "), (1L, "anything"))
    assert(m(1L) === ((0L, 0L, true)))
  }

  test("a doc shorter than every phrase emits the zero row") {
    val m = gate(0L, Seq("one two three"), (1L, "one two"))
    assert(m(1L) === ((0L, 0L, true)))
  }

  test("duplicate lexicon rows do not double-count") {
    val m = gate(10L, Seq("spark", "spark"), (1L, "spark lights"))
    assert(m(1L) === ((1L, 1L, true)))
  }
}
