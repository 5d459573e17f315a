package graft.streaming

import graft.SparkSpecBase
import graft.text.UnigramLm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TokenMeterSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "src0", "ab ab b"), (2L, "src0", "ab"), (3L, "src1", "b ab ab"))

  private def model(): Map[String, Long] = {
    val docs = corpus.toDF("doc_id", "source", "text")
    UnigramLm.learn(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  test("streaming meter totals equal the batch encode rolled up by " +
      "source (segmenter parity)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "source", "text")
    val batch = UnigramLm.encodeCorpus(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_words").as("words"),
        sum("n_pieces").as("pieces"), sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val input = MemoryStream[(String, String)]
    val q = Streams.streamingTokenMeter(input.toDS(), model(), 4)
      .writeStream.format("memory").queryName("meter_parity")
      .outputMode("update").start()
    input.addData(corpus.map(d => (d._2, d._3)): _*)
    q.processAllAvailable()
    val got = spark.table("meter_parity").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("words"),
          r.getAs[Long]("pieces"), r.getAs[Long]("chars"),
          r.getAs[Long]("oovWords"))).toMap
    q.stop()
    assert(got("src0") === ((batch("src0")._1, batch("src0")._2,
      batch("src0")._3, batch("src0")._4, 0L)))
    assert(got("src1") === ((batch("src1")._1, batch("src1")._2,
      batch("src1")._3, batch("src1")._4, 0L)))
  }

  test("totals accumulate across micro-batches; batchSeq advances; " +
      "state is one row per source") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = Streams.streamingTokenMeter(input.toDS(), model(), 4)
      .writeStream.format("memory").queryName("meter_inc")
      .outputMode("update").start()
    input.addData(("src0", "ab b"))
    q.processAllAvailable()
    input.addData(("src0", "ab ab"))
    q.processAllAvailable()
    val rows = spark.table("meter_inc").collect()
      .map(r => (r.getAs[Long]("batchSeq"), r.getAs[Long]("docs"),
        r.getAs[Long]("words"), r.getAs[Long]("pieces")))
      .sortBy(_._1)
    q.stop()
    assert(rows === Seq((1L, 1L, 2L, 2L), (2L, 2L, 4L, 4L)))
  }

  test("a word with a character outside the model inventory counts as " +
      "OOV, never crashes or skews piece totals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = Streams.streamingTokenMeter(input.toDS(), model(), 4)
      .writeStream.format("memory").queryName("meter_oov")
      .outputMode("update").start()
    input.addData(("srcX", "zz ab"))
    q.processAllAvailable()
    val r = spark.table("meter_oov").collect().head
    q.stop()
    assert(r.getAs[Long]("words") === 2L)
    assert(r.getAs[Long]("oovWords") === 1L)
    assert(r.getAs[Long]("pieces") === 1L) // only "ab" segments
    assert(r.getAs[Long]("chars") === 4L)
  }

  test("scala viterbiPieceCount matches the column DP tie-break on a " +
      "crafted equal-score lattice") {
    // scores make [ab]+[c] and [a]+[bc] EQUAL totals for "abc"; the
    // pinned tie-break (smallest start j at each position = longest
    // piece ending there) must pick the same path as the column DP:
    // best[3] via j=1 ("bc") vs j=2 ("c") — equal totals resolve to
    // j=1, giving 2 pieces either way; the assert pins the count and
    // the deterministic -1-free result
    val scores = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -15L, "bc" -> -15L)
    // paths: a|b|c=-30, ab|c=-25, a|bc=-25 -> 2 pieces
    assert(UnigramLm.viterbiPieceCount("abc", scores, 2) === 2L)
    assert(UnigramLm.viterbiPieceCount("", scores, 2) === 0L)
    assert(UnigramLm.viterbiPieceCount("az", scores, 2) === -1L)
  }
}
