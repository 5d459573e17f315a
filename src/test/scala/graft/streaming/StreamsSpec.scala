package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + minute * 60000L)

  test("windowed counts with watermark aggregate by hour") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    input.addData(
      Streams.Event(1, ts(5), 1, "click", 1.0),
      Streams.Event(2, ts(10), 1, "click", 2.0),
      Streams.Event(3, ts(70), 2, "view", 3.0))
    q.processAllAvailable()
    val out = spark.table("win_out").collect()
    q.stop()
    val clickRow = out.find(_.getAs[String]("event_type") == "click").get
    assert(clickRow.getAs[Long]("n") === 2)
    assert(out.exists(_.getAs[String]("event_type") == "view"))
  }

  test("stateful sessionization splits on 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    input.addData(
      Streams.Event(1, ts(0), 7, "click", 1.0),
      Streams.Event(2, ts(10), 7, "click", 1.0),
      Streams.Event(3, ts(60), 7, "click", 1.0)) // 50-min gap -> new session
    q.processAllAvailable()
    val out = spark.table("sess_out").as[Streams.SessionUpdate].collect()
    q.stop()
    assert(out.exists(u => u.sessionId == 0 && u.nEvents == 2 && u.closed))
    assert(out.exists(u => u.sessionId == 1 && u.nEvents == 1 && !u.closed))
  }

  test("streaming exact dedup drops same-content docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.streamingExactDedup(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(
      (1L, "Hello, World", ts(0)),
      (2L, "hello world!", ts(1)),  // same normalized content as 1
      (3L, "another doc", ts(2)))
    q.processAllAvailable()
    input.addData(
      (4L, "HELLO world", ts(3)),   // still a duplicate, later batch
      (5L, "fresh content", ts(4)))
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    q.stop()
    assert(out.contains(3L) && out.contains(5L))
    // exactly ONE of the three hello-world variants survived
    assert(out.intersect(Set(1L, 2L, 4L)).size === 1)
    assert(out.size === 3)
  }

  test("AvailableNow ingestion drains files once and checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    val events = graft.Tables.events(spark, sf)
    events.limit(100).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    Streams.ingestAvailableNow(spark, s"$dir/in", schema, s"$dir/out", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() === 100)
    // second invocation: no new files -> no duplicates
    Streams.ingestAvailableNow(spark, s"$dir/in", schema, s"$dir/out", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() === 100)
  }
}
