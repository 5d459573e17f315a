package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming layer. The reference is batch-only (SURVEY.md §2.9) —
  * its closest stream is the polled work queue. This package provides the
  * streaming twins of the batch event operators:
  *
  *  - windowed aggregation with watermarking (the q_e_window_agg batch query
  *    in streaming form),
  *  - gap-based sessionization via flatMapGroupsWithState (the
  *    q_e_sessionize twin, with real state + event-time timeouts),
  *  - Trigger.AvailableNow file ingestion for the queue-poll pattern (S9):
  *    each invocation drains exactly the files present, then stops —
  *    incremental batch with checkpointed exactly-once bookkeeping.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(userId: Long, sessionId: Long, nEvents: Long,
      closed: Boolean)

  /** Tumbling 1-hour windowed counts with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("v"))

  /** Declarative session windows (the built-in `session_window` — gap
    * starts a new window) — the twin of the stateful [[sessionize]]:
    * when the per-session output is plain aggregates, this form needs NO
    * custom state code, gets watermark-driven eviction for free, and
    * stays whole-stage-planned. [[sessionize]] remains the shape for
    * custom state (running session ids, mid-session emission). The spec
    * pins that both produce the SAME (user, session-event-count)
    * multiset on a shared fixture. */
  def sessionWindowCounts(events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Watermarked per-window approximate DISTINCT users — the streaming
    * face of the mergeable HLL state
    * ([[graft.sketch.HeavyHitters.buildHllState]]): a streaming
    * `countDistinct` would need unbounded per-window user sets; the HLL
    * register array is fixed-size (~2^lgK bytes per window×type group)
    * and max-merges, so state stays bounded AND the estimate is
    * ORDER-INSENSITIVE — a stream drained in any batching produces the
    * exact same estimate as the batch build (spec-pinned equality, not
    * just closeness). */
  def windowedDistinctUsers(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("hll"))
      .select(col("window.start").as("window_start"), col("event_type"),
        hll_sketch_estimate(col("hll")).as("n_users_est"))

  /** Stream-STREAM event-time interval join: purchases matched to the same
    * user's views from the trailing `lookback` — both sides are unbounded
    * streams, so the watermark + the time-range predicate are what let
    * Spark EVICT join state (a view older than the purchase watermark
    * minus the lookback can never match again; without the range
    * condition state grows forever). The batch twin of the shape is
    * [[graft.etl.EventAnalytics.attribution]]'s windowed join.
    *
    * Inner join: a purchase emits once per qualifying view, as soon as
    * both sides have arrived. */
  def streamStreamAttribution(purchases: DataFrame, views: DataFrame,
      lookback: String = "interval 1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(lookback) &&
        col("v_ts") < col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("view_id"), col("p_ts"), col("v_ts"))
  }

  /** Public: Catalyst's generated code constructs/reads state instances. */
  final case class SessionState(sessionId: Long, nEvents: Long, lastTs: Long)

  /** 30-minute-gap sessionization with explicit state. A session closes
    * when a later event of the same user arrives past the gap; the last
    * session per user stays open in state (an event-time timeout would close
    * it in production — kept timeout-free so `processAllAvailable` drains
    * deterministically in tests). */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[SessionUpdate]()
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (s.lastTs != Long.MinValue && t - s.lastTs > gapMs) {
              out += SessionUpdate(userId, s.sessionId, s.nEvents, closed = true)
              s = SessionState(s.sessionId + 1, 0L, t)
            }
            s = s.copy(nEvents = s.nEvents + 1, lastTs = t)
          }
          state.update(s)
          out += SessionUpdate(userId, s.sessionId, s.nEvents, closed = false)
          out.iterator
      }
  }

  final case class KmvUpdate(key: String, est: Long, retained: Int)

  /** Streaming KMV/theta distinct state — the stream twin of
    * [[graft.sketch.ThetaKmv]] (as [[windowedDistinctUsers]] is for
    * HLL, but with the INTERSECT-capable state): per key the k
    * lexicographically smallest md5 digests of the values seen so far
    * live in group state (bounded: k hex strings per key, however many
    * values stream through), and each micro-batch emits the refreshed
    * estimate. KMV union is a commutative, idempotent min-merge, so
    * the stream-maintained state equals the batch sketch over all data
    * EXACTLY regardless of batch boundaries or arrival order — the
    * spec pins stream == batch against [[graft.sketch.ThetaKmv]]'s
    * column-expression estimate, digest for digest. */
  def streamingKmvDistinct(pairs: Dataset[(String, Long)], k: Int)
      : Dataset[KmvUpdate] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Seq[String]]) =>
          // identical digest to the batch sketch: md5 over the UTF-8
          // string form of the value (Spark's md5(cast(v as string)))
          val md = java.security.MessageDigest.getInstance("MD5")
          val fresh = rows.map { case (_, v) =>
            md.reset()
            md.digest(v.toString.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
          }
          val merged = (state.getOption.getOrElse(Nil) ++ fresh)
            .distinct.sorted.take(k)
          state.update(merged)
          KmvUpdate(key,
            graft.sketch.ThetaKmv.estimateFromDigests(merged, k),
            merged.size)
      }
  }

  /** Streaming twin of [[graft.dedup.DedupOps.exactDedup]]: keep the FIRST
    * document per normalized content hash. A training-data ingest pipeline
    * runs this at the stream edge so duplicates never reach storage. State
    * is keyed by the 16-byte hash only and bounded by the watermark
    * (`dropDuplicatesWithinWatermark`): duplicates arriving inside the
    * horizon are dropped, older state evicts — at 100 TB/day the state is
    * (docs-per-horizon × 16 B), not unbounded. */
  def streamingExactDedup(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__h", md5(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
        .cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  final case class BandedSig(id: Long, sig: Long, bucket: Long)
  final case class NearDupPair(ida: Long, idb: Long, hamming: Int)

  /** Per-bucket signature memory for [[streamingSimhashPairs]]: parallel
    * id/sig arrays (Catalyst-encodable), FIFO-capped. */
  final case class BucketState(ids: Array[Long], sigs: Array[Long])

  /** Streaming twin of [[graft.dedup.DedupOps.simhashPairs]]: a stateful
    * near-duplicate candidate-PAIR generator. Each arriving document's
    * 64-bit SimHash is banded into 4×16-bit bucket keys (the batch
    * operator's exact banding); state per (band, key16) bucket remembers
    * recent signatures, and an arrival emits a pair for every remembered
    * in-bucket signature within `maxHamming`. Downstream consumes pairs
    * exactly as it consumes the batch generator's output (dedup across
    * bands, then cluster/canonicalize).
    *
    * State bound: `maxPerBucket` FIFO-caps each bucket at 16 B/signature —
    * the streaming analog of the batch operator's banding guarantee, traded
    * against recall beyond the cap horizon (the same trade
    * [[streamingExactDedup]] makes with its watermark). A pair duplicated
    * across bands is emitted once per shared band, exactly like the batch
    * candidate join before its distinct. */
  def streamingSimhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 12, maxPerBucket: Int = 64): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.SimHash64
    val sig = docs.select(col(idCol).cast("long").as("id"),
      SimHash64.simhash64(
        filter(split(lower(col(textCol)), " "), t => t =!= "")).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        (lit(b.toLong * (1L << 16)) + shiftrightunsigned(col("sig"), b * 16)
          .bitwiseAND(lit(0xffffL))).as(s"b$b")): _*)).as("bucket"))
      .as[BandedSig]
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BandedSig], state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(Array.empty, Array.empty))
          val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
          rows.toSeq.sortBy(_.id).foreach { e =>
            var i = 0
            while (i < s.ids.length) {
              val d = java.lang.Long.bitCount(s.sigs(i) ^ e.sig)
              if (d <= maxHamming && s.ids(i) != e.id)
                out += NearDupPair(math.min(s.ids(i), e.id),
                  math.max(s.ids(i), e.id), d)
              i += 1
            }
            val ids = s.ids :+ e.id
            val sigs = s.sigs :+ e.sig
            val from = math.max(0, ids.length - maxPerBucket)
            s = BucketState(ids.drop(from), sigs.drop(from))
          }
          state.update(s)
          out.iterator
      }
  }

  final case class DocTokens(shard: Long, doc_id: Long, n_tokens: Long)
  final case class PackedDoc(shard: Long, docId: Long, nTokens: Long,
      startTok: Long, binFirst: Long, binLast: Long)
  /** Running token cursor for [[streamingPackSequences]]. */
  final case class PackState(cursor: Long)

  /** Streaming twin of [[graft.text.TextOps.packSequences]]: online
    * pack-and-chop at the ingest edge. Each of `shards` independent
    * packers owns a token stream and a persistent CURSOR in state; an
    * arriving doc is appended at the cursor, its `budget`-token bin span
    * reported, and the cursor advanced — offsets keep flowing seamlessly
    * across triggers. Bin ids are SHARD-LOCAL (a training sequence is
    * (shard, bin)): sharding is what makes online packing parallel — one
    * global cursor would serialize the stream through a single state key.
    * Docs are packed in doc-id order within a trigger; cross-trigger order
    * is arrival order, as for any online packer. State is ONE long per
    * shard. */
  def streamingPackSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, shards: Int = 8): Dataset[PackedDoc] = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs.select(
      pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
      col(idCol).cast("long").as("doc_id"),
      coalesce(graft.text.TextOps.bpeTokenCount(col(textCol)), lit(0L))
        .as("n_tokens")).as[DocTokens]
    counted.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[DocTokens], state: GroupState[PackState]) =>
          var cursor = state.getOption.getOrElse(PackState(0L)).cursor
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = cursor
            val last = start + math.max(d.n_tokens, 1L) - 1
            cursor += d.n_tokens
            PackedDoc(shard, d.doc_id, d.n_tokens, start,
              start / budget, last / budget)
          }
          state.update(PackState(cursor))
          out.iterator
      }
  }

  /** Streaming twin of [[graft.dedup.DedupOps.incrementalDedup]]'s exact
    * half: documents stream in and are arbitrated against the STATIC
    * curated corpus via a stream-static left join on the content hash
    * (the corpus hash index never changes within a run, so Spark
    * broadcasts or re-scans it per micro-batch without state), while
    * within-stream duplicates drop through watermark-bounded
    * `dropDuplicatesWithinWatermark` exactly as [[streamingExactDedup]].
    * Output: the stream rows that survive BOTH checks — the ingest-edge
    * filter a production increment runs. */
  def streamingIncrementalDedup(docs: DataFrame, corpus: DataFrame,
      textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    def h(c: org.apache.spark.sql.Column) =
      md5(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9 ]", "")
        .cast("binary"))
    val corpusHashes = corpus
      .select(h(col(textCol)).as("__h")).distinct()
      .withColumn("__in_corpus", lit(true))
    docs
      .withColumn("__h", h(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .join(corpusHashes, Seq("__h"), "left")
      .filter(col("__in_corpus").isNull)
      .drop("__h", "__in_corpus")
  }

  /** Streaming twin of [[graft.dedup.DedupOps.decontaminate]]: documents
    * stream in; each is exploded to its distinct n-grams, which
    * stream-static inner-join the STATIC eval-suite gram set (tiny at any
    * corpus scale — Spark broadcasts it per micro-batch, no state); a doc
    * matching on ANY gram emits once, deduplicated by id within the
    * watermark. Output: (idCol, tsCol) — the contaminated-doc stream a
    * production ingest routes to quarantine (the keep-side is the
    * stream's anti-join at the sink). */
  def streamingDecontaminate(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, bench: DataFrame,
      benchTextCol: String, n: Int = 5,
      watermark: String = "10 minutes"): DataFrame = {
    def gramArray(text: org.apache.spark.sql.Column) = {
      val t = graft.text.TextOps.tokens(lower(text))
      when(size(t) >= n,
        array_distinct(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>"))
    }
    val bg = bench.select(explode(gramArray(col(benchTextCol))).as("__g"))
      .distinct()
    docs.withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        explode(gramArray(col(textCol))).as("__g"))
      .join(bg, Seq("__g")) // stream-static inner: any shared gram hits
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))
  }

  /** Streaming DSIR quality gate — the stream-edge twin of
    * [[graft.text.Dsir]]: documents stream in; each is scored by the
    * importance weight log p_target − log p_raw under STATIC add-k bigram
    * models ([[graft.text.Dsir.modelFrames]], fitted offline on the raw
    * and target corpora — cache them, they re-evaluate per micro-batch
    * otherwise), and only docs at or above `cutoffMicro` pass. A stream
    * cannot rank globally, so the top-fraction cut is calibrated in BATCH
    * (read the weight at the selection boundary of the last batch run)
    * and applied here as a pure integer filter.
    *
    * State bound: the per-doc score aggregation groups by (event-time
    * window, id) under the watermark — closed windows evict, so state is
    * (docs-per-horizon) rows, never corpus-sized. The model joins are
    * stream-static equi-joins on the bigram/unigram key; the 1-row
    * vocabulary sizes attach on a constant key.
    *
    * Output: (idCol, n_bigrams, weight_micro) for PASSING docs —
    * micro-nat integers, exactly the batch operator's weights (spec pins
    * stream == batch). */
  def streamingDsirGate(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, rawModel: (DataFrame, DataFrame, DataFrame),
      targetModel: (DataFrame, DataFrame, DataFrame), cutoffMicro: Long,
      k: Double = 1.0, watermark: String = "10 minutes",
      windowDur: String = "10 minutes"): DataFrame = {
    import graft.text.{Dsir, TextOps}
    val (uniR, vocR, bcR) = rawModel
    val (uniT, vocT, bcT) = targetModel
    // the ts column must survive the bigram explode (it carries the
    // window), so the explode is inlined rather than Dsir.bigramsOf
    val exploded = docs.withWatermark(tsCol, watermark)
      .select(col(idCol).as("__id"), col(tsCol).as("__ts"),
        TextOps.tokens(col(textCol)).as("__t"))
      .select(col("__id"), col("__ts"), explode(
          when(size(col("__t")) >= 2,
            transform(sequence(lit(0), size(col("__t")) - 2),
              i => struct(element_at(col("__t"), i + 1).as("x"),
                element_at(col("__t"), i + 2).as("y"))))
            .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("b"))
      .select(col("__id"), col("__ts"), col("b.x").as("x"), col("b.y").as("y"))
    val one = lit(1).as("__one")
    val scored = exploded
      .join(bcR, Seq("x", "y"), "left")
      .join(bcT, Seq("x", "y"), "left")
      .join(uniR, Seq("x"), "left")
      .join(uniT, Seq("x"), "left")
      .withColumn("__one", one)
      .join(vocR.withColumn("__one", one), Seq("__one"))
      .join(vocT.withColumn("__one", one), Seq("__one"))
      .withColumn("__nl_r", Dsir.nlMicroExpr("cxy_r", "cx_r", "v_r", k))
      .withColumn("__nl_t", Dsir.nlMicroExpr("cxy_t", "cx_t", "v_t", k))
    scored
      .groupBy(window(col("__ts"), windowDur), col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum("__nl_r") - sum("__nl_t")).as("weight_micro"))
      .filter(col("weight_micro") >= cutoffMicro)
      .select(col("__id").as(idCol), col("n_bigrams"), col("weight_micro"))
  }

  /** Streaming twin of [[graft.stats.Conformal.conformalBand]] as an
    * anomaly gate: `bands` is the FROZEN calibration output
    * (grp, mean_floor, qhat) — fit once on a calibration batch and
    * persisted, the ksVsReference pattern — and each live row is
    * flagged when its value leaves the group's conformal band
    * |v − mean_floor| > q̂. By the split-conformal guarantee the
    * flag's false-positive rate on exchangeable data is ≤ α of the
    * calibration fit — a DISTRIBUTION-FREE paging threshold, vs the
    * z-score gates that assume normal tails. Groups the calibration
    * never saw (no band row) or whose band was null (k > n) pass
    * through flagged as `uncalibrated` rather than silently dropped —
    * a monitor must not mask exactly the novel traffic it exists to
    * catch. Stateless: one broadcast stream-static join + filter, no
    * watermark, no state store; per-batch cost is |batch|. */
  def streamingConformalGate(rows: DataFrame, grpCol: String,
      valCol: String, bands: DataFrame): DataFrame = {
    val b = broadcast(bands.select(col("grp"), col("mean_floor"),
      col("qhat")))
    rows.join(b, col(grpCol) === col("grp"), "left")
      .withColumn("uncalibrated",
        col("mean_floor").isNull || col("qhat").isNull)
      .filter(col("uncalibrated") ||
        abs(col(valCol) - col("mean_floor")) > col("qhat"))
      .drop("grp", "mean_floor", "qhat")
  }

  /** Streaming twin of [[graft.stats.ExperimentOps.msprtColumns]]: the
    * always-valid A/B monitor as a live gate — a GLOBAL streaming
    * aggregation keeps the four cumulative counts (state: one row), and
    * every trigger re-emits the mSPRT evidence on the totals so far.
    * Because the mixture likelihood ratio is a test martingale under
    * H₀, acting the first time p_micro crosses the alarm line is valid
    * with NO peeking penalty — the legitimacy a fixed-horizon z-test
    * replayed per trigger does not have. Complete-output mode: the
    * state is four longs, the output one row per trigger. */
  def streamingMsprtGate(obs: DataFrame, armCol: String,
      successCol: String, tauSq: Double = 0.0001): DataFrame =
    graft.stats.ExperimentOps.msprtColumns(
      obs.groupBy().agg(
        sum(when(col(armCol) === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col(armCol) === "a" && col(successCol), 1L)
          .otherwise(0L)).as("sa"),
        sum(when(col(armCol) === "b", 1L).otherwise(0L)).as("nb"),
        sum(when(col(armCol) === "b" && col(successCol), 1L)
          .otherwise(0L)).as("sb")),
      tauSq)

  final case class FunnelState(stage: Int, atUs: Long)
  final case class FunnelAdvance(userId: Long, step: Int, stepName: String,
      atUs: Long)

  /** Streaming twin of [[graft.etl.EventAnalytics.funnel]]: per-user state
    * is (funnel stage reached, µs it was reached at); an advance row is
    * emitted the moment a user completes the next step STRICTLY after the
    * previous one — the live drop-off counter, without re-scanning history.
    * State is two longs per user regardless of event volume.
    *
    * In-order parity: within a micro-batch events sort by (ts, event_id),
    * so a single-drain run reproduces the batch min-chain exactly (the
    * spec pins stream == batch). Across batches the advance is greedy —
    * production ingestion orders by watermark before this operator if
    * cross-batch ties matter. */
  def streamingFunnel(events: Dataset[Event], steps: Seq[String])
      : Dataset[FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
          sorted.foreach { e =>
            if (s.stage < steps.length && e.event_type == steps(s.stage) &&
                (s.stage == 0 || micros(e.ts) > s.atUs)) {
              s = FunnelState(s.stage + 1, micros(e.ts))
              out += FunnelAdvance(userId, s.stage, steps(s.stage - 1),
                micros(e.ts))
            }
          }
          state.update(s)
          out.iterator
      }
  }

  final case class EwmaState(e: Long, lastT: Long)
  final case class EwmaUpdate(series: String, t: Long, ewmaMilli: Long,
      devMilli: Long, alarm: Boolean)

  /** Streaming twin of [[graft.etl.Ewma.chart]]: per-series state is TWO
    * longs — the milli fixed-point EWMA level and the last folded t —
    * updated with the IDENTICAL integer recursion e' = (3e + 1000x)
    * div 4, so a single-drain stream reproduces the batch fold
    * bit-for-bit (spec-pinned). Each arriving (series, t, x) cell first
    * emits its one-step forecast deviation |1000x − e| and an alarm
    * when it exceeds `thresholdMilli`, then folds in — the live
    * small-shift monitor at O(16 bytes) state per series regardless of
    * volume. The first cell of a series has no forecast: devMilli = −1,
    * never an alarm. Within a micro-batch cells sort by t (the
    * batch-fold order); ACROSS batches a cell whose t does not advance
    * past the last folded t (a late or replayed arrival) is DROPPED —
    * not folded, not emitted — so the state remains the fold of a
    * time-monotone prefix instead of silently folding arrival order.
    * Cross-batch bit-parity with the batch chart therefore holds
    * exactly for streams that arrive time-ordered across batches; late
    * cells narrow the folded set but never corrupt the recursion. */
  def streamingEwmaGate(cells: Dataset[(String, Long, Long)],
      thresholdMilli: Long): Dataset[EwmaUpdate] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[EwmaState]) =>
          val s0 = state.getOption.getOrElse(EwmaState(-1L, Long.MinValue))
          var e = s0.e
          var lastT = s0.lastT
          val out = rows.toSeq.sortBy(_._2).flatMap { case (_, t, x) =>
            if (t <= lastT) None // late/replayed cell: drop, don't fold
            else {
              lastT = t
              val xs = x * 1000L
              val dev = if (e < 0L) -1L else math.abs(xs - e)
              e = if (e < 0L) xs else (3L * e + xs) / 4L
              Some(EwmaUpdate(series, t, e, dev, dev > thresholdMilli))
            }
          }
          state.update(EwmaState(e, lastT))
          out.iterator
      }
  }

  /** Typed event stream from a parquet events directory — the file-sourced
    * entry to [[sessionize]]/[[windowedCounts]]. A file stream needs its
    * schema declared up front, so the footer is read once (driver-side,
    * batch) and the event-time column is normalized through
    * [[graft.Tables.normalizeTs]] — the SAME boundary the batch loaders use,
    * so a TIMESTAMP_NTZ or nanos-as-long events.parquet binds to the typed
    * `Event` (java.sql.Timestamp) identically in both engines. */
  def eventFileStream(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(path))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
  }

  final case class MgState(entries: Map[String, Long], seq: Long)
  final case class MgUpdate(shard: Int, batchSeq: Long, value: String,
      mgCount: Long)

  /** Streaming twin of [[graft.sketch.HeavyHitters]]'s Misra–Gries
    * pass: live heavy-hitter candidates over an unbounded
    * high-cardinality stream in BOUNDED state. Values shard by hash
    * (value-disjoint shards, so per-shard summaries concern disjoint
    * key sets and their union needs no cross-shard subtraction); each
    * shard's state is a capacity-`capacity` MG summary folded with the
    * IDENTICAL decrement rule as the batch sketch
    * (HeavyHitters.sketch), updated per micro-batch, re-emitted in
    * full stamped with a per-shard batch sequence — the latest stamp
    * IS the current summary, earlier stamps are its history. State is
    * ≤ capacity entries per shard FOREVER, whatever the distinct-value
    * count; the classic deficiency bound holds per shard: any value
    * whose true count in its shard exceeds n_shard/(capacity+1)
    * survives, and every reported count sits within
    * [true − n_shard/(capacity+1), true] (spec-pinned). Feed the
    * survivors to an exact recount — the batch operator's step 3 —
    * when exact figures are needed. */
  def streamingHeavyHitters(values: Dataset[String], nShards: Int,
      capacity: Int): Dataset[MgUpdate] = {
    require(nShards >= 1 && capacity >= 1)
    val spark = values.sparkSession
    import spark.implicits._
    values.groupByKey(v => math.floorMod(v.##, nShards))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String], state: GroupState[MgState]) =>
          val s0 = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val m = scala.collection.mutable.HashMap[String, Long](
            s0.entries.toSeq: _*)
          rows.foreach { v =>
            if (m.contains(v)) m(v) += 1L
            else if (m.size < capacity) m(v) = 1L
            else {
              val dead = m.keysIterator.filter(k => m(k) == 1L).toList
              m.mapValuesInPlace((_, c) => c - 1L)
              dead.foreach(m.remove)
            }
          }
          val seq = s0.seq + 1
          state.update(MgState(m.toMap, seq))
          m.iterator.map { case (v, c) => MgUpdate(shard, seq, v, c) }
      }
  }

  final case class MeterState(docs: Long, words: Long, pieces: Long,
      chars: Long, oovWords: Long, seq: Long)
  final case class MeterUpdate(source: String, batchSeq: Long, docs: Long,
      words: Long, pieces: Long, chars: Long, oovWords: Long)

  /** Streaming twin of [[graft.text.UnigramLm.encodeCorpus]]: a live
    * token METER over arriving documents under a FIXED batch-learned
    * unigram model — the "how many tokens has each source contributed
    * so far" gauge a streaming ingest publishes against its budget.
    * The model (piece → micro-nat score) is config-sized and rides the
    * task closure; each doc's words segment with the IDENTICAL Viterbi
    * recurrence as the batch encode
    * ([[graft.text.UnigramLm.viterbiPieceCount]], parity spec-pinned),
    * and running totals fold per source in mapGroupsWithState —
    * state is ONE row per source forever.
    *
    * Streaming-only surface the batch encode lacks: a word with a
    * character outside the model's inventory (the batch vocab join
    * silently drops it) counts here as `oov_words` — the live signal
    * that the tokenizer under-serves what is arriving. */
  def streamingTokenMeter(docs: Dataset[(String, String)],
      scores: Map[String, Long], maxPieceLen: Int): Dataset[MeterUpdate] = {
    require(maxPieceLen >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, String)],
            state: GroupState[MeterState]) =>
          val s0 = state.getOption.getOrElse(MeterState(0, 0, 0, 0, 0, 0))
          var (d, w, p, c, o) =
            (s0.docs, s0.words, s0.pieces, s0.chars, s0.oovWords)
          rows.foreach { case (_, text) =>
            d += 1
            text.split(" ").iterator.filter(_.nonEmpty).foreach { word =>
              w += 1
              c += word.length
              val n = graft.text.UnigramLm.viterbiPieceCount(
                word, scores, maxPieceLen)
              if (n < 0) o += 1 else p += n
            }
          }
          val s1 = MeterState(d, w, p, c, o, s0.seq + 1)
          state.update(s1)
          MeterUpdate(source, s1.seq, d, w, p, c, o)
      }
  }

  final case class ChatState(nTurns: Long, badRole: Long,
      parityBreaks: Long, emptyTurns: Long, oversizeTurns: Long,
      maxIdx: Long)
  final case class ChatUpdate(convId: String, nTurns: Long, badRole: Long,
      parityBreaks: Long, emptyTurns: Long, oversizeTurns: Long,
      indexGaps: Long, valid: Boolean)

  /** Streaming twin of [[graft.text.ChatPrep.validateAlternation]]: a
    * live structural gate over ARRIVING conversation turns (convId,
    * turnIdx, role, turnWords) — the check an SFT ingest runs before a
    * conversation ever reaches a training shard. Within a micro-batch
    * a conversation's turns sort by index; across batches the state
    * carries only the per-conversation counters plus the maximum turn
    * index seen (ONE row per conversation forever). `indexGaps` is the
    * SAME order-insensitive statistic the batch validator computes —
    * max_index − n_turns + 1 — so once every turn has arrived the
    * streaming number EQUALS the batch `index_gap` whatever the
    * arrival order (late arrivals converge, duplicates go negative,
    * exactly as in batch; spec-pinned), rather than a monotone desync
    * counter that never recovers. Violation classes are IDENTICAL to
    * the batch gate: unknown role, alternation break, empty turn,
    * oversize turn. */
  def streamingChatValidator(turns: Dataset[(String, Long, String, Long)],
      maxTurnWords: Long = 1000L): Dataset[ChatUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (conv: String, rows: Iterator[(String, Long, String, Long)],
            state: GroupState[ChatState]) =>
          val s0 = state.getOption.getOrElse(
            ChatState(0, 0, 0, 0, 0, Long.MinValue))
          var (n, br, pb, et, ov, mx) = (s0.nTurns, s0.badRole,
            s0.parityBreaks, s0.emptyTurns, s0.oversizeTurns, s0.maxIdx)
          rows.toSeq.sortBy(_._2).foreach { case (_, idx, role, words) =>
            val roleOk = role == "user" || role == "assistant"
            if (!roleOk) br += 1
            else if ((idx % 2 == 0) != (role == "user")) pb += 1
            if (words <= 0) et += 1
            if (words > maxTurnWords) ov += 1
            if (idx > mx) mx = idx
            n += 1
          }
          val s1 = ChatState(n, br, pb, et, ov, mx)
          state.update(s1)
          val ig = mx - n + 1 // = the batch validator's index_gap
          ChatUpdate(conv, n, br, pb, et, ov, ig,
            br == 0 && pb == 0 && et == 0 && ov == 0 && ig == 0)
      }
  }

  final case class CapState(seen: Long)
  final case class CapDecision(domain: String, docId: String, rank: Long,
      kept: Boolean)

  /** Streaming twin of [[graft.text.UrlOps.capDocuments]] — the
    * FineWeb per-domain share cap as a LIVE ingest gate: every
    * arriving document gets an immediate keep/drop verdict against
    * its domain's quota, instead of waiting for a corpus-wide count.
    * Quotas are config DATA (the collected q_p33 domainCaps table, or
    * an operator-set budget) riding the closure; `defaultQuota`
    * covers domains the map has never seen. State is ONE counter per
    * domain forever, whatever the document volume.
    *
    * Determinism: within a micro-batch a domain's docs rank in docId
    * order (the chat-validator convention); across batches ranks
    * follow ARRIVAL order, so the gate equals the batch
    * [[graft.text.UrlOps.capDocuments]] kept set exactly when docs
    * arrive in the batch order column's order (spec-pinned on a
    * replayed stream). */
  def streamingDomainCap(docs: Dataset[(String, String)],
      quotas: Map[String, Long],
      defaultQuota: Long): Dataset[CapDecision] = {
    require(defaultQuota >= 0, "defaultQuota >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[(String, String)],
            state: GroupState[CapState]) =>
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          val quota = quotas.getOrElse(domain, defaultQuota)
          val out = rows.map(_._2).toSeq.sorted.map { id =>
            seen += 1
            CapDecision(domain, id, seen, seen <= quota)
          }
          state.update(CapState(seen))
          out.iterator
      }
  }

  /** S9 as a stream: drain all currently-present files once
    * (Trigger.AvailableNow), land them at `outPath`, checkpoint so already-
    * seen files are never reprocessed across invocations. */
  def ingestAvailableNow(spark: SparkSession, inPath: String,
      schema: org.apache.spark.sql.types.StructType, outPath: String,
      checkpoint: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(inPath)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
