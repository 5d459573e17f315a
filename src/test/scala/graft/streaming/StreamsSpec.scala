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

  test("NTZ parquet events bind to the typed file stream and sessionize") {
    // the batch loaders normalize TIMESTAMP_NTZ at the scan boundary; the
    // file-stream entry must ride the same seam or a pandas/pyarrow-written
    // events.parquet (no tz) breaks the typed Event binding
    val dir = java.nio.file.Files.createTempDirectory("ntz_stream").toString
    Seq(
      (1L, 7L, 1700000000000000L, "view", 1.0),
      (2L, 7L, 1700000060000000L, "click", 1.0),
      (3L, 7L, 1700003700000000L, "view", 1.0), // 60.7-min gap -> new session
      (4L, 8L, 1700000000000000L, "click", 1.0))
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = Streams.sessionize(Streams.eventFileStream(spark, dir))
      .writeStream.format("memory").queryName("ntz_sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val out = spark.table("ntz_sess_out").as[Streams.SessionUpdate].collect()
    q.stop()
    assert(out.exists(u => u.userId == 7 && u.sessionId == 0 &&
      u.nEvents == 2 && u.closed))
    assert(out.exists(u => u.userId == 7 && u.sessionId == 1 && !u.closed))
    assert(out.exists(u => u.userId == 8 && u.nEvents == 1))
  }

  test("streaming DSIR gate: stream weights equal batch, cutoff filters") {
    import graft.text.Dsir
    val raw = Seq(
      (1L, "int main return int main return"),
      (2L, "void loop break void loop break"),
      (3L, "the cat sat on the mat"),
      (4L, "the dog sat on the rug"))
      .toDF("doc_id", "text")
    val target = Seq(
      (10L, "the cat sat on the rug"),
      (11L, "the dog sat on the mat"))
      .toDF("doc_id", "text")
    // batch truth: per-doc integer weights
    val batch = Dsir.weightsMicro(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // cutoff between the code docs and the prose docs
    val cutoff = (Seq(1L, 2L).map(batch).max + Seq(3L, 4L).map(batch).min) / 2
    val rawModel = Dsir.modelFrames(raw, "text", "r")
    val targetModel = Dsir.modelFrames(target, "text", "t")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.streamingDsirGate(stream, "doc_id", "text", "ts",
        rawModel, targetModel, cutoff)
      .writeStream.format("memory").queryName("dsir_gate_out")
      .outputMode("update").start()
    input.addData(
      (1L, "int main return int main return", ts(0)),
      (2L, "void loop break void loop break", ts(1)),
      (3L, "the cat sat on the mat", ts(2)),
      (4L, "the dog sat on the rug", ts(3)))
    q.processAllAvailable()
    val out = spark.table("dsir_gate_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_micro"))
      .toMap
    q.stop()
    assert(out.keySet === Set(3L, 4L), "only target-like docs pass the gate")
    assert(out(3L) === batch(3L) && out(4L) === batch(4L),
      "stream weights == batch weights, micro-nat exact")
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

  test("streaming simhash pairs: near-dups across batches, distant docs silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.streamingSimhashPairs(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("simdup_out")
      .outputMode("append").start()
    val base = "spark shuffle partition executor batch query scan filter " +
      "join table column row group window sort merge"
    // dropping the first token flips 4 signature bits spread over 2 bands
    // (probed): within maxHamming AND banding-detectable — an edit that
    // flips ≥1 bit in every band is invisible to 4-band blocking by design
    val nearDup = base.split(" ").drop(1).mkString(" ")
    input.addData((1L, base))
    q.processAllAvailable()
    // near-copy arrives in a LATER batch: state must remember doc 1;
    // an unrelated doc must pair with nothing
    input.addData(
      (2L, nearDup),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
    q.processAllAvailable()
    val out = spark.table("simdup_out").as[Streams.NearDupPair].collect()
    q.stop()
    assert(out.nonEmpty, "near-dup pair (1,2) not emitted")
    assert(out.forall(p => p.ida == 1L && p.idb == 2L))
    assert(out.forall(_.hamming <= 12))
    // batch parity: the batch operator finds the same pair on the same docs
    val batch = graft.dedup.DedupOps.simhashPairs(
      Seq((1L, base), (2L, nearDup),
        (3L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(batch === Set((1L, 2L)))
  }

  test("streaming simhash pairs: bucket cap evicts oldest signatures") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.streamingSimhashPairs(docs, "doc_id", "text",
      maxPerBucket = 1)
      .writeStream.format("memory").queryName("simcap_out")
      .outputMode("append").start()
    val base = "spark shuffle partition executor batch query scan filter " +
      "join table column row group window sort merge"
    input.addData((1L, base))
    q.processAllAvailable()
    input.addData((2L, base)) // pairs with 1, then evicts it (cap 1)
    q.processAllAvailable()
    input.addData((3L, base)) // 1 evicted: pairs ONLY with 2
    q.processAllAvailable()
    val out = spark.table("simcap_out").as[Streams.NearDupPair].collect()
    q.stop()
    val pairs = out.map(p => (p.ida, p.idb)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)), "evicted signature still matching")
  }

  test("streaming packing: cursor persists across triggers, straddlers split") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // 2 shards (even/odd ids), budget 4
    val q = Streams.streamingPackSequences(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        budget = 4L, shards = 2)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    input.addData((0L, "a b c"), (1L, "x y"))       // shard0: 3; shard1: 2
    q.processAllAvailable()
    input.addData((2L, "d e f"), (3L, "z"))         // shard0: +3; shard1: +1
    q.processAllAvailable()
    val out = spark.table("pack_out").as[Streams.PackedDoc].collect()
      .map(p => p.docId -> p).toMap
    q.stop()
    // shard 0 stream: doc0 [0,3) bin 0; doc2 [3,6) straddles bins 0-1 —
    // the cursor carried 3 across the trigger boundary
    assert(out(0L).startTok === 0L && out(0L).binFirst === 0L
      && out(0L).binLast === 0L)
    assert(out(2L).startTok === 3L && out(2L).binFirst === 0L
      && out(2L).binLast === 1L, "state cursor lost across triggers")
    // shard 1 is independent: doc1 [0,2), doc3 [2,3) — both bin 0
    assert(out(1L).startTok === 0L && out(3L).startTok === 2L)
    assert(out(3L).binFirst === 0L && out(3L).binLast === 0L)
    assert(out(1L).shard === 1L && out(3L).shard === 1L)
  }

  test("stream-static incremental dedup: corpus twins and stream twins drop") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("existing corpus document one",
      "existing corpus document two").toDF("text")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streams.streamingIncrementalDedup(
        input.toDF().toDF("doc_id", "text", "ts"), corpus, "text", "ts")
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    input.addData(
      (1L, "existing corpus document one", ts(0)), // corpus twin → dropped
      (2L, "brand new fresh document", ts(1)),     // survives
      (3L, "brand new fresh document", ts(2)),     // stream twin → dropped
      (4L, "another novel one", ts(3)))            // survives
    q.processAllAvailable()
    val kept = spark.table("incdedup_out").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    q.stop()
    assert(kept === Set(2L, 4L))
  }

  test("streaming decontamination flags gram-sharing docs once, cleans pass silently") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val bench = Seq("the secret eval answer key").toDF("text")
    val q = Streams.streamingDecontaminate(docs, "doc_id", "text", "ts",
        bench, "text")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    input.addData(
      (1L, "prefix the secret eval answer key suffix", ts(0)), // contaminated
      (2L, "a perfectly clean document with many words", ts(1)),
      (3L, "too short", ts(2)))
    q.processAllAvailable()
    input.addData(
      // contaminated twice over (two bench grams) — must still emit ONCE
      (4L, "the secret eval answer key the secret eval answer key", ts(3)))
    q.processAllAvailable()
    val out = spark.table("decon_out").collect()
      .map(_.getAs[Long]("doc_id"))
    q.stop()
    assert(out.sorted.toSeq === Seq(1L, 4L))
  }

  test("gopher rule gate runs unchanged on a stream (stream == batch)") {
    // the rule battery is a stateless scan-stage projection, so the SAME
    // DataFrame code must bind to a streaming frame with no changes and
    // agree with the batch result row-for-row
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "the quick brown foxes jumped over many lazy sleeping dogs " +
        "while the farmer watched from his barn door in quiet amazement " +
        "until every single animal finally wandered home again after dark"),
      (2L, "too few words here"),
      (3L, Seq.fill(30)("wordy").mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val q = graft.text.TextOps.gopherRules(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Boolean]("r_stop"),
          r.getAs[Boolean]("keep"))).toMap
    val stream = key(spark.table("gopher_out").collect())
    q.stop()
    val batch = key(graft.text.TextOps.gopherRules(
      rows.toDF("doc_id", "text"), "doc_id", "text").collect())
    assert(stream === batch)
    assert(stream(1L)._3 && !stream(2L)._3 && !stream(3L)._3)
  }

  test("streaming dedup state survives a restart from the checkpoint") {
    // production crash-recovery: the file source is replayable and the
    // dropDuplicatesWithinWatermark state lives in the checkpoint, so a
    // duplicate arriving AFTER a full stop/start is still dropped
    val dir = java.nio.file.Files.createTempDirectory("ckpt-recovery").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    def runOnce(): Unit = {
      val q = Streams.streamingExactDedup(
          spark.readStream.schema(schema).parquet(s"$dir/in"), "text", "ts")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((1L, "Hello, World", ts(0)), (2L, "other content", ts(1)))
      .toDF("doc_id", "text", "ts").write.mode("append").parquet(s"$dir/in")
    runOnce()
    // new file after the restart: doc 3 duplicates doc 1's content
    Seq((3L, "HELLO world!", ts(2)), (4L, "fresh one", ts(3)))
      .toDF("doc_id", "text", "ts").write.mode("append").parquet(s"$dir/in")
    runOnce()
    val out = spark.read.parquet(s"$dir/out")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out === Set(1L, 2L, 4L),
      s"state must survive the restart (got $out)")
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

  test("stream-stream interval join: in-window views only, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Streams.Event]
    val vIn = MemoryStream[Streams.Event]
    val q = Streams.streamStreamAttribution(pIn.toDF(), vIn.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    // views at minute 5 and 50; purchase at minute 60 with 1 h lookback
    vIn.addData(Streams.Event(1, ts(5), 1, "view", 0),
      Streams.Event(2, ts(50), 1, "view", 0),
      Streams.Event(3, ts(50), 2, "view", 0)) // other user: no match
    q.processAllAvailable()
    pIn.addData(Streams.Event(10, ts(60), 1, "purchase", 0))
    q.processAllAvailable()
    // a view ARRIVING after the purchase still joins (both-sides state)
    vIn.addData(Streams.Event(4, ts(59), 1, "view", 0))
    q.processAllAvailable()
    val out = spark.table("ssj_out")
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(out === Set((10L, 1L), (10L, 2L), (10L, 4L)))
    // batch twin agrees on the same events
    val all = Seq(
      Streams.Event(1, ts(5), 1, "view", 0), Streams.Event(2, ts(50), 1, "view", 0),
      Streams.Event(3, ts(50), 2, "view", 0), Streams.Event(4, ts(59), 1, "view", 0),
      Streams.Event(10, ts(60), 1, "purchase", 0)).toDF()
    val batch = graft.etl.EventAnalytics.attribution(all, 3600000000L)
      .filter(col("conv_id") === 10).head()
    assert(batch.getAs[Long]("n_touch") === 3)
  }

  test("streaming funnel: strict order, and stream == batch on real events") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "purchase")
    // strictness within a drain: user 2's purchase PRECEDES its view
    val input = MemoryStream[Streams.Event]
    val q = Streams.streamingFunnel(input.toDS(), steps)
      .writeStream.format("memory").queryName("fun_out")
      .outputMode("append").start()
    input.addData(
      Streams.Event(1, ts(0), 1, "signup", 0), Streams.Event(2, ts(1), 1, "view", 0),
      Streams.Event(3, ts(2), 1, "purchase", 0),
      Streams.Event(4, ts(0), 2, "signup", 0), Streams.Event(5, ts(1), 2, "purchase", 0),
      Streams.Event(6, ts(2), 2, "view", 0))
    q.processAllAvailable()
    // state carries ACROSS batches: user 2's purchase arrives later
    input.addData(Streams.Event(7, ts(9), 2, "purchase", 0))
    q.processAllAvailable()
    val adv = spark.table("fun_out").as[Streams.FunnelAdvance].collect()
    q.stop()
    assert(adv.count(_.step == 3) === 2) // both users eventually convert
    assert(adv.filter(a => a.userId == 2 && a.step == 3)
      .forall(_.atUs == ts(9).getTime * 1000L)) // not the early purchase
    // stream == batch on the sf0.001 events table, full drain (the file
    // stream needs a directory source, so stage the single-file table)
    val fsteps = Seq("signup", "view", "click", "purchase")
    val staged = java.nio.file.Files.createTempDirectory("funnel_sf").toString
    graft.Tables.events(spark, sf).write.parquet(s"$staged/events.parquet")
    val q2 = Streams.streamingFunnel(
      Streams.eventFileStream(spark, staged), fsteps)
      .writeStream.format("memory").queryName("fun_out_sf")
      .outputMode("append").start()
    q2.processAllAvailable()
    val streamCounts = spark.table("fun_out_sf")
      .groupBy("step").agg(countDistinct("userId").as("n"))
      .as[(Int, Long)].collect().toMap
    q2.stop()
    val batch = graft.etl.EventAnalytics.funnel(
      graft.Tables.events(spark, sf), fsteps)
      .select("step", "n_users").as[(Int, Long)].collect().toMap
    assert(streamCounts === batch)
  }

  test("session_window twin: declarative sessions equal the stateful " +
      "sessionize's per-session event counts") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at minutes 0, 10, 55 (gap 45 > 30 splits) -> 2, 1;
    // user 2: 5, 20 -> one session of 2
    val evs = Seq(
      Streams.Event(1, ts(0), 1, "a", 1.0),
      Streams.Event(2, ts(10), 1, "a", 1.0),
      Streams.Event(3, ts(55), 1, "a", 1.0),
      Streams.Event(4, ts(5), 2, "a", 1.0),
      Streams.Event(5, ts(20), 2, "a", 1.0))
    // declarative: batch evaluation of the same aggregation
    val declarative = Streams.sessionWindowCounts(evs.toDF())
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events")))
      .groupBy(identity).view.mapValues(_.size).toMap
    // stateful: drain the same events as a stream, count events per
    // (user, session id)
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sw_twin")
      .outputMode("append").start()
    input.addData(evs: _*)
    q.processAllAvailable()
    input.addData(Streams.Event(99, ts(600), 9, "flush", 1.0))
    q.processAllAvailable()
    q.stop()
    val stateful = spark.table("sw_twin")
      .filter(col("userId").isin(1L, 2L))
      .collect().map(r => (r.getAs[Long]("userId"),
        r.getAs[Long]("nEvents")))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(declarative === Map((1L, 2L) -> 1, (1L, 1L) -> 1,
      (2L, 2L) -> 1))
    assert(stateful === declarative)
  }

  test("windowed distinct users: bounded HLL state; the stream's final " +
      "estimate equals the batch sketch EXACTLY (order-insensitive merge)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.windowedDistinctUsers(input.toDF())
      .writeStream.format("memory").queryName("wdu_out")
      .outputMode("update").start()
    // 40 events, 25 distinct users, one hour-0 'click' window; users
    // repeat ACROSS the two micro-batches, so the merge must dedupe
    val evs = (0 until 40).map(i =>
      Streams.Event(i.toLong, ts(i % 50), (i % 25).toLong, "click", 1.0))
    input.addData(evs.take(20): _*)
    q.processAllAvailable()
    input.addData(evs.drop(20): _*)
    q.processAllAvailable()
    // update mode re-emits the window as it grows: the final state is the
    // row with the largest estimate (HLL registers only ever fill up)
    val streamEst = spark.table("wdu_out")
      .groupBy("window_start", "event_type")
      .agg(max("n_users_est").as("est"))
      .collect().map(_.getAs[Long]("est")).toSeq
    q.stop()
    val batchEst = Streams.windowedDistinctUsers(evs.toDF())
      .collect().map(_.getAs[Long]("n_users_est")).toSeq
    assert(streamEst === batchEst, "stream must equal batch bit-exactly")
    assert(batchEst.size === 1 &&
      math.abs(batchEst.head - 25L) <= (25 * 0.10).ceil.toLong,
      s"estimate ${batchEst.head} vs exact 25")
  }

  test("streaming cdc apply: a changelog stream maintains the " +
      "keyed-bucket table across micro-batches via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scdc").toString
    val dir = s"$root/table"
    val init = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
    graft.pipeline.Sinks.writeKeyedBuckets(init, dir, "k", 8)
    val input = MemoryStream[(Long, String, String, Long)]
    val q = input.toDF().toDF("k", "v", "op", "seq")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.pipeline.Sinks.applyCdc(
          batch.sparkSession, dir, batch, "k", "op", "seq", 8)
      }
      .option("checkpointLocation", s"$root/cp")
      .start()
    // micro-batch 1: update + insert; micro-batch 2 must see batch 1's
    // result (the later seq on k=1 wins WITHIN a batch; across batches
    // the later BATCH wins)
    input.addData((1L, "x1", "U", 1L), (200L, "new", "I", 1L))
    q.processAllAvailable()
    input.addData((1L, "x2", "U", 2L), (2L, "gone", "D", 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir).drop("bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (0L until 100L).map(k => k -> s"v$k").toMap -
      2L + (1L -> "x2") + (200L -> "new")
    assert(got === expected)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming cluster maintenance: candidate-pair micro-batches fold " +
      "into the persisted union-find index via foreachBatch; final index " +
      "equals from-scratch CC over every edge ever seen") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scc").toString
    val dir = s"$root/clusters"
    // persisted index seeded from an initial corpus closure
    val initEdges = Seq((10L, 11L), (20L, 21L), (21L, 22L))
    graft.dedup.DupClusters.connectedComponents(
        initEdges.toDF("ida", "idb"))
      .write.parquet(dir)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("ida", "idb")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        // read-modify-swap: updateClusters only broadcast-remaps the
        // index, so the batch cost is CC over root-contracted batch
        // edges + one map-side rewrite of the index — the history's
        // edge list is never kept, never rescanned
        val assign = s.read.parquet(dir)
        val updated = graft.dedup.DupClusters
          .updateClusters(assign, batch).localCheckpoint(eager = true)
        updated.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(dir)
      }
      .option("checkpointLocation", s"$root/cp")
      .start()
    // batch 1 bridges the two initial clusters through new node 15;
    // batch 2 brings a smaller-id newcomer (5) that takes over as root,
    // plus an unrelated new pair
    input.addData((11L, 15L), (15L, 20L))
    q.processAllAvailable()
    input.addData((5L, 22L), (40L, 41L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allEdges = initEdges ++ Seq((11L, 15L), (15L, 20L), (5L, 22L), (40L, 41L))
    val scratch = graft.dedup.DupClusters.connectedComponents(
        allEdges.toDF("ida", "idb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === scratch)
    assert(got(10L) === 5L && got(40L) === 40L) // takeover + new singleton pair
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming KMV distinct state: bounded per-key k-min digests " +
      "across micro-batches equal the batch sketch EXACTLY") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("skmv").toString
    val k = 16
    val input = MemoryStream[(String, Long)]
    val q = Streams.streamingKmvDistinct(input.toDS(), k)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_updates")
      .option("checkpointLocation", s"$root/cp")
      .start()
    // two batches, overlapping values, two keys — arrival order and
    // batch boundaries must not matter (min-merge is commutative)
    val b1 = (1L to 40L).map(("click", _)) ++ (1L to 5L).map(("view", _))
    val b2 = (30L to 80L).map(("click", _)) ++ Seq(("view", 3L))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val last = spark.table("kmv_updates")
      .groupBy("key").agg(org.apache.spark.sql.functions
        .max_by(org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("est"),
          org.apache.spark.sql.functions.col("retained")),
          org.apache.spark.sql.functions.col("retained")).as("b"))
      .select(col("key"), col("b.est").as("est"),
        col("b.retained").as("retained"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2))).toMap
    // batch twin over ALL the data
    val all = (b1 ++ b2).toDF("key", "v")
    val batch = graft.sketch.ThetaKmv.kmvState(all, "key", "v", k)
    val est = batch.select(col("grp"),
        graft.sketch.ThetaKmv.kmvEstimate(col("kmv"), k).as("est"),
        org.apache.spark.sql.functions.size(col("kmv")).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2))).toMap
    assert(last === est)
    // the small key fit entirely -> exact count 5
    assert(last("view")._1 === 5L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming drift gate: per-micro-batch KS against a frozen " +
      "reference distribution; in-family batch reads D=0, disjoint " +
      "batch trips at D=1") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sdrift").toString
    val refDir = s"$root/ref"
    val logDir = s"$root/log"
    // frozen reference: values 1..100, 5 observations each — aggregated
    // once, persisted as counts, never rescanned as rows
    (1L to 100L).map(v => (v, 5L)).toDF("v", "c").write.parquet(refDir)
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("x")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val s = batch.sparkSession
        graft.stats.TwoSample
          .ksVsReference(batch, "x", s.read.parquet(refDir), "v", "c")
          .withColumn("batch_id", lit(bid))
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(logDir)
      }
      .option("checkpointLocation", s"$root/cp")
      .start()
    input.addData(1L to 100L: _*)   // same shape as the reference
    q.processAllAvailable()
    input.addData(201L to 300L: _*) // fully shifted above the reference
    q.processAllAvailable()
    q.stop()
    val log = spark.read.parquet(logDir).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("d_micro"))).toMap
    assert(log(0L) === ((100L, 500L, 0L)))
    assert(log(1L) === ((100L, 500L, 1000000L)))
    // the stream log row equals the batch-side computation exactly
    val direct = graft.stats.TwoSample.ksVsReference(
        (201L to 300L).toDF("x"), "x",
        spark.read.parquet(refDir), "v", "c").collect().head
    assert(direct.getAs[Long]("d_num") === 100L * 500L &&
      direct.getAs[Long]("d_micro") === 1000000L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming FDR drift gate: per-micro-batch KS-vs-rest across " +
      "groups with BH control; uniform batch rejects nothing, a batch " +
      "with one small shifted group flags exactly that group") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sfdr").toString
    val logDir = s"$root/log"
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("g", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        graft.stats.FdrSweep.bhStepUp(
            graft.stats.FdrSweep.ksRestSweep(batch, "g", "v"),
            "g", alphaMicro = 50000L)
          .withColumn("batch_id", lit(bid))
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(logDir)
      }
      .option("checkpointLocation", s"$root/cp")
      .start()
    // batch 0: three groups, identical distributions
    input.addData((1 to 30).map(i => (s"g${i % 3}", (i % 5).toLong)): _*)
    q.processAllAvailable()
    // batch 1: two healthy groups plus a SMALL fully-shifted one
    input.addData(((1 to 40).map(i => ("A", (i % 10).toLong)) ++
      (1 to 40).map(i => ("B", (i % 10).toLong)) ++
      (1 to 4).map(i => ("C", 1000L + i))): _*)
    q.processAllAvailable()
    q.stop()
    val log = spark.read.parquet(logDir).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("g")) ->
        r.getAs[Boolean]("rejected")).toMap
    assert(Seq("g0", "g1", "g2").forall(g => !log((0L, g))))
    assert(log((1L, "C")))
    assert(!log((1L, "A")) && !log((1L, "B")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming conformal gate: out-of-band rows flag, stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    // calibration batch: group a centered at 50 (residuals spread 0..45),
    // 10 points so k = ceil(11*0.9) = 10 -> qhat = max residual
    val calib = ((0L until 10L).map(v => ("a", v * 10L)) ++
      (0L until 10L).map(v => ("b", 1000L + v))).toDF("grp", "v")
    val bands = graft.stats.Conformal.conformalBand(calib, "grp", "v")
    val bA = bands.filter(col("grp") === "a").collect()(0)
    assert(bA.getAs[Long]("mean_floor") === 45L &&
      bA.getAs[Long]("qhat") === 45L)
    val input = MemoryStream[(String, Long)]
    val q = Streams.streamingConformalGate(
        input.toDF().toDF("g", "v"), "g", "v", bands)
      .writeStream.format("memory").queryName("conformal_out")
      .outputMode("append").start()
    input.addData(
      ("a", 50L),   // inside band [0, 90] -> silent
      ("a", 91L),   // |91-45| = 46 > 45 -> flagged
      ("a", -1L),   // |−1−45| = 46 -> flagged
      ("b", 1004L), // inside b's band -> silent
      ("c", 7L))    // group never calibrated -> flagged uncalibrated
    q.processAllAvailable()
    val out = spark.table("conformal_out").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("v"),
        r.getAs[Boolean]("uncalibrated"))).toSet
    q.stop()
    assert(out === Set(("a", 91L, false), ("a", -1L, false),
      ("c", 7L, true)))
    // twin parity: the same filter on a batch frame flags the same rows
    val batch = Seq(("a", 50L), ("a", 91L), ("a", -1L), ("b", 1004L),
      ("c", 7L)).toDF("g", "v")
    val batchOut = Streams.streamingConformalGate(batch, "g", "v", bands)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v"))).toSet
    assert(batchOut === out.map(t => (t._1, t._2)))
  }

  test("streaming mSPRT gate: per-trigger evidence equals batch prefixes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Boolean)]
    val q = Streams.streamingMsprtGate(
        input.toDF().toDF("arm", "won"), "arm", "won")
      .writeStream.format("memory").queryName("msprt_out")
      .outputMode("complete").start()
    def batchAt(rows: Seq[(String, Boolean)]) =
      Streams.streamingMsprtGate(rows.toDF("arm", "won"), "arm", "won")
        .collect()(0)
    val b1 = (1 to 50).map(i => ("a", i <= 20)) ++
      (1 to 50).map(i => ("b", i <= 10))
    val b2 = (1 to 50).map(i => ("a", i <= 25)) ++
      (1 to 50).map(i => ("b", i <= 8))
    input.addData(b1: _*)
    q.processAllAvailable()
    val t1 = spark.table("msprt_out").collect()(0)
    val e1 = batchAt(b1)
    assert(t1.getAs[Long]("log_e_micro") === e1.getAs[Long]("log_e_micro"))
    input.addData(b2: _*)
    q.processAllAvailable()
    val t2 = spark.table("msprt_out").collect()(0)
    val e2 = batchAt(b1 ++ b2)
    q.stop()
    assert(t2.getAs[Long]("log_e_micro") === e2.getAs[Long]("log_e_micro"))
    // accumulating one-sided evidence: the monitor's p tightened
    assert(t2.getAs[Long]("p_micro") < t1.getAs[Long]("p_micro"))
  }

  test("streaming EWMA gate: cross-batch integer state replays the " +
      "batch fold bit-for-bit and alarms on the forecast break") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sewma").toString
    val input = MemoryStream[(String, Long, Long)]
    val q = Streams.streamingEwmaGate(input.toDS(), thresholdMilli = 3000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_updates")
      .option("checkpointLocation", s"$root/cp")
      .start()
    // batch 1: level 10 warm-up; batch 2: the shift to 20 then back
    input.addData(("a", 1L, 10L), ("a", 2L, 10L), ("b", 1L, 5L))
    q.processAllAvailable()
    input.addData(("a", 3L, 20L), ("a", 4L, 10L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_updates")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // first cell: no forecast, never an alarm
    assert(rows(("a", 1L)) === ((10000L, -1L, false)))
    // t=3 arrives against level 10000: dev 10000 > 3000 -> alarm;
    // e = (30000 + 20000) / 4 = 12500
    assert(rows(("a", 3L)) === ((12500L, 10000L, true)))
    // t=4: dev |10000 - 12500| = 2500 under threshold; e = 11875
    assert(rows(("a", 4L)) === ((11875L, 2500L, false)))
    // bit-parity with the batch operator over the same cells
    val batch = graft.etl.Ewma.chart(
      Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 20L), ("a", 4L, 10L))
        .toDF("s", "t", "x"), "s", "t", "x").collect()(0)
    assert(batch.getAs[Long]("ewma_milli") === rows(("a", 4L))._1)
    assert(batch.getAs[Long]("peak_dev_milli") === 10000L)
    assert(batch.getAs[Long]("peak_t") === 3L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming Misra-Gries gate: bounded state, the planted heavy " +
      "value survives across batches within the deficiency bound") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("smg").toString
    val input = MemoryStream[String]
    val q = Streams.streamingHeavyHitters(input.toDS(), nShards = 1,
      capacity = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("mg_updates")
      .option("checkpointLocation", s"$root/cp")
      .start()
    // batch 1: hot x30 + 20 distinct tail values; batch 2: hot x20 + 15
    input.addData(Seq.fill(30)("hot") ++ (1 to 20).map("t" + _): _*)
    q.processAllAvailable()
    input.addData(Seq.fill(20)("hot") ++ (21 to 35).map("t" + _): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mg_updates").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    val latestSeq = rows.map(_._1).max
    val latest = rows.filter(_._1 == latestSeq)
      .map(r => r._2 -> r._3).toMap
    // bounded state: never more than capacity entries
    assert(latest.size <= 4)
    // n = 85, capacity 4 -> deficiency <= 85/5 = 17; hot true count 50
    assert(latest.contains("hot"))
    assert(latest("hot") <= 50L && latest("hot") >= 50L - 17L)
    // no tail value can outrank the heavy one
    latest.foreach { case (v, c) => if (v != "hot") assert(c < latest("hot")) }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming Misra-Gries gate: value-hash shards hold disjoint " +
      "key sets, each within its own capacity") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("smgs").toString
    val input = MemoryStream[String]
    val q = Streams.streamingHeavyHitters(input.toDS(), nShards = 4,
      capacity = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("mg_shards")
      .option("checkpointLocation", s"$root/cp")
      .start()
    input.addData((1 to 200).map(i => "v" + (i % 40)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mg_shards").collect()
      .map(r => (r.getInt(0), r.getString(2)))
    // a value lives in exactly one shard
    assert(rows.groupBy(_._2).forall(_._2.map(_._1).distinct.length == 1))
    // per-shard entry count bounded by capacity
    rows.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.map(_._2).distinct.length <= 8)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming EWMA gate: a cell arriving in a later batch with an " +
      "earlier t is dropped, not folded in arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sewmal").toString
    val input = MemoryStream[(String, Long, Long)]
    val q = Streams.streamingEwmaGate(input.toDS(), thresholdMilli = 3000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_late")
      .option("checkpointLocation", s"$root/cp")
      .start()
    input.addData(("a", 1L, 10L), ("a", 3L, 10L))
    q.processAllAvailable()
    // t=2 is late (last folded t = 3) and t=3 is a replay: both dropped
    input.addData(("a", 2L, 99L), ("a", 3L, 99L), ("a", 4L, 10L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_late")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(!rows.contains(("a", 2L)))
    assert(rows(("a", 3L)) === ((10000L, 0L, false))) // the in-order t=3
    // t=4 folds against the level untouched by the dropped 99s
    assert(rows(("a", 4L)) === ((10000L, 0L, false)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
