package graft.streaming

import graft.SparkSpecBase
import graft.text.ChatPrep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ChatValidatorSpec extends SparkSpecBase {
  import spark.implicits._

  private val cleanTurns = Seq(
    ("c1", 0L, "user", 5L), ("c1", 1L, "assistant", 6L),
    ("c1", 2L, "user", 2L),
    ("c2", 0L, "user", 3L), ("c2", 1L, "assistant", 4L))

  test("streaming verdicts equal the batch validator on in-order " +
      "input (gate parity)") {
    implicit val sqlCtx = spark.sqlContext
    val batch = ChatPrep.validateAlternation(
      cleanTurns.toDF("conv_id", "turn_idx", "role", "turn_words"),
      "conv_id").collect()
      .map(r => r.getAs[String]("conv_id") ->
        (r.getAs[Long]("n_turns"), r.getAs[Boolean]("valid"))).toMap
    val input = MemoryStream[(String, Long, String, Long)]
    val q = Streams.streamingChatValidator(input.toDS())
      .writeStream.format("memory").queryName("chat_parity")
      .outputMode("update").start()
    input.addData(cleanTurns: _*)
    q.processAllAvailable()
    val got = spark.table("chat_parity").collect()
      .map(r => r.getAs[String]("convId") ->
        (r.getAs[Long]("nTurns"), r.getAs[Boolean]("valid"))).toMap
    q.stop()
    assert(got === batch)
  }

  test("violations accumulate across micro-batches; an out-of-order " +
      "arrival counts as an index gap; state is one row per conv") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val q = Streams.streamingChatValidator(input.toDS(), maxTurnWords = 10L)
      .writeStream.format("memory").queryName("chat_inc")
      .outputMode("update").start()
    input.addData(("c", 0L, "user", 3L), ("c", 1L, "assistant", 4L))
    q.processAllAvailable()
    // turn 3 arrives before turn 2 ever does -> one gap; oversize too
    input.addData(("c", 3L, "assistant", 99L))
    q.processAllAvailable()
    val rows = spark.table("chat_inc").collect()
      .sortBy(_.getAs[Long]("nTurns"))
    q.stop()
    assert(rows.head.getAs[Boolean]("valid"))
    val last = rows.last
    assert(last.getAs[Long]("nTurns") === 3L)
    assert(last.getAs[Long]("indexGaps") === 1L)
    assert(last.getAs[Long]("oversizeTurns") === 1L)
    assert(!last.getAs[Boolean]("valid"))
  }

  test("a late arrival CONVERGES the gap count back to the batch value " +
      "(indexGaps is max-index-vs-count, not a permanent desync counter)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val q = Streams.streamingChatValidator(input.toDS())
      .writeStream.format("memory").queryName("chat_converge")
      .outputMode("update").start()
    input.addData(("c", 0L, "user", 3L), ("c", 1L, "assistant", 4L))
    q.processAllAvailable()
    input.addData(("c", 3L, "assistant", 5L)) // early: gap opens
    q.processAllAvailable()
    input.addData(("c", 2L, "user", 2L)) // the missing turn arrives late
    q.processAllAvailable()
    val rows = spark.table("chat_converge").collect()
      .sortBy(_.getAs[Long]("nTurns"))
    q.stop()
    assert(rows(1).getAs[Long]("indexGaps") === 1L) // while 2 is missing
    val fin = rows.last
    assert(fin.getAs[Long]("nTurns") === 4L)
    assert(fin.getAs[Long]("indexGaps") === 0L) // converged
    assert(fin.getAs[Boolean]("valid"))
  }

  test("duplicate turn indexes produce the SAME (negative) gap as the " +
      "batch validator") {
    implicit val sqlCtx = spark.sqlContext
    val dup = Seq(("c", 0L, "user", 3L), ("c", 0L, "user", 3L),
      ("c", 1L, "assistant", 4L))
    val batchGap = ChatPrep.validateAlternation(
      dup.toDF("conv_id", "turn_idx", "role", "turn_words"), "conv_id")
      .collect().head.getAs[Long]("index_gap")
    assert(batchGap === -1L)
    val input = MemoryStream[(String, Long, String, Long)]
    val q = Streams.streamingChatValidator(input.toDS())
      .writeStream.format("memory").queryName("chat_dup")
      .outputMode("update").start()
    input.addData(dup: _*)
    q.processAllAvailable()
    val r = spark.table("chat_dup").collect().head
    q.stop()
    assert(r.getAs[Long]("indexGaps") === batchGap)
    assert(!r.getAs[Boolean]("valid"))
  }

  test("within one micro-batch turns sort by index before validation " +
      "(arrival order inside a batch is not a violation)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val q = Streams.streamingChatValidator(input.toDS())
      .writeStream.format("memory").queryName("chat_sorted")
      .outputMode("update").start()
    input.addData(("c", 1L, "assistant", 4L), ("c", 0L, "user", 3L))
    q.processAllAvailable()
    val r = spark.table("chat_sorted").collect().head
    q.stop()
    assert(r.getAs[Long]("indexGaps") === 0L)
    assert(r.getAs[Boolean]("valid"))
  }
}
