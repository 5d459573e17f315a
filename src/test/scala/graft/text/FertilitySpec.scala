package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FertilitySpec extends SparkSpecBase {
  import spark.implicits._

  test("per-source rollup of encode counts gives exact micro ratios") {
    val docs = Seq(
      (1L, "aa aa b", "sa"), (2L, "aa b b", "sb")
    ).toDF("doc_id", "text", "source")
    // one merge: (a,a) wins -> 'aa' encodes to a single symbol
    val (out, release) = BpeMerge.encodeCorpusReleasable(
      docs, "doc_id", "text", 1)
    val mat = out.localCheckpoint(true); release()
    val rolled = mat
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(sum("n_words").as("words"), sum("n_bpe_tokens").as("toks"),
        sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc1: 3 words -> aa,aa,b = 3 tokens, 5 chars
    assert(rolled("sa") === ((3L, 3L, 5L)))
    // doc2: 3 words -> aa,b,b = 3 tokens, 4 chars
    assert(rolled("sb") === ((3L, 3L, 4L)))
    assert((rolled("sa")._3 * 1000000L) / rolled("sa")._2 === 1666666L)
  }
}
