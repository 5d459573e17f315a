package graft.text

import graft.SparkSpecBase

class PhraseSearchSpec extends SparkSpecBase {
  import spark.implicits._

  test("adjacency, not co-occurrence; overlapping occurrences count; " +
      "case folds") {
    val docs = Seq(
      (1L, "the Slow scan wins"),          // 1 occurrence (case folded)
      (2L, "scan slow"),                   // wrong order -> no match
      (3L, "slow x scan"),                 // not adjacent -> no match
      (4L, "slow scan slow scan"),         // 2 occurrences
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq("slow", "scan")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 4L -> 2L))
  }

  test("three-term phrase chains the adjacency join") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b x c"), (3L, "a b c a b c")
    ).toDF("doc_id", "text")
    val out = PhraseSearch.phraseSearch(docs, "doc_id", "text",
      Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 3L -> 2L))
  }
}
