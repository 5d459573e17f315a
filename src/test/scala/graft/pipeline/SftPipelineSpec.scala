package graft.pipeline

import graft.SparkSpecBase
import graft.text.ChatTokens
import org.apache.spark.sql.functions._

class SftPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat and then the dog ate the cat food too"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "solo"),
    (4L, "")).toDF("doc_id", "text")

  private val (w, b, mpl, extra, its) = (4, 32L, 3, 10, 1)

  test("the batch plan covers every non-empty conversation with the " +
      "chat-token totals, splits only over-budget ones, fills <= budget") {
    val spans = ChatTokens.chatTokenSpans(docs, "doc_id", "text",
      wordsPerTurn = w, maxPieceLen = mpl, vocabExtra = extra,
      iters = its).collect()
    val totals = spans.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("turn_tokens")).sum).toMap
    val plan = SftPipeline.sftBatchPlan(docs, "doc_id", "text",
      wordsPerTurn = w, budget = b, maxPieceLen = mpl,
      vocabExtra = extra, iters = its).collect()
    // every conversation with words is planned, the empty one is not
    assert(plan.map(_.getLong(0)).toSet === totals.keySet)
    assert(!totals.keySet.contains(4L))
    // per-conversation planned tokens equal the chat-token totals
    val planned = plan.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("seg_tokens")).sum).toMap
    assert(planned === totals)
    // a conversation within budget is never split
    totals.foreach { case (id, n) =>
      val nSegs = plan.count(_.getLong(0) == id)
      if (n <= b) assert(nSegs === 1, s"conv $id")
      else assert(nSegs === (n / b + (if (n % b > 0) 1 else 0)).toInt)
    }
    // bins never overfill and ids are contiguous
    val byBin = plan.groupBy(_.getAs[Long]("bin"))
    byBin.values.foreach(rows =>
      assert(rows.map(_.getAs[Long]("seg_tokens")).sum <= b))
    assert(byBin.keySet === (0L until byBin.size.toLong).toSet)
  }
}
