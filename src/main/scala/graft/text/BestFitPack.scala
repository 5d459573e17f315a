package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Best-fit-decreasing sequence packing (Zhao et al. 2024, "Fewer
  * Truncations Improve Language Modeling" — best-fit packing) — the
  * ACTING half of the two r14 batch-economics reports: pack-and-chop
  * ([[TextOps.packCountedReleasable]], priced by
  * [[PackContamination]]) wastes nothing but SPLITS documents at
  * every window boundary; best-fit packing first chunks each document
  * at the budget (docs ≤ budget stay whole), then bin-packs the
  * pieces, so the only split documents are those longer than the
  * budget — at the price of per-bin padding waste. This operator
  * computes BOTH layouts' exact economics on the same corpus: one row
  * per policy with segment/bin counts, padding waste, and cross-doc
  * attention contamination, all exact integers.
  *
  * Pinned packing semantics (replayed verbatim by the oracle):
  *   - docs with n ≤ 0 are excluded from both policies;
  *   - `chop`: the [[TextOps.packCountedReleasable]] layout in id
  *     order — one token stream cut every `budget` tokens;
  *   - `bestfit`: each doc emits ⌊n/budget⌋ full chunks (each exactly
  *     fills its own bin: zero waste, zero cross pairs) plus one
  *     residual of n mod budget tokens when nonzero; residuals are
  *     packed best-fit in DECREASING (length, then id) order — each
  *     item goes to the bin with the SMALLEST remaining capacity that
  *     fits (tie: the most recently changed bin), or opens a new bin.
  *
  * Envelope: per-bin pair counts are < budget²/2, so corpus totals
  * are ≈ stream tokens · budget / 2 — cross/total pairs · 10⁶ stays
  * exact in long up to 9.2·10¹² pairs
  * (graft.tools.NumericEnvelopes pins the bound).
  *
  * Scale shape: the corpus is touched twice — the chop leg is the one
  * distributed prefix sum plus two keyed aggs (the PackContamination
  * shape), the bestfit leg ONE aggregation to the residual-length
  * histogram (≤ budget rows — CONFIG-sized whatever the corpus) plus
  * one scalar reduce. The best-fit simulation itself runs on the
  * collected histogram in O(classes²) driver time, batching
  * same-length items and identical-composition bin classes — the
  * exact algorithm, never a per-item or per-bin corpus-sized loop
  * (itemwise ≡ class-batched is spec-pinned on randomized
  * histograms). */
object BestFitPack {

  /** A run of consecutive bin ids inside a class, stored in
    * consumption-priority order: the run's bins are visited
    * first, first+dir, first+2·dir, … — `dir` is −1 when the newest
    * (highest last-change step) bin has the highest id, +1 after a
    * conversion reverses the order. */
  final case class Run(first: Long, count: Long, dir: Long)

  /** A class of interchangeable bins: identical remaining capacity AND
    * segment composition (lSum/l2Sum/nSeg are PER BIN; count = how
    * many such bins). `step` orders classes for the tie-break; `runs`
    * carry the physical bin ids in consumption-priority order (Σ run
    * counts = count). */
  final case class BinClass(rem: Long, lSum: Long, l2Sum: Long,
      nSeg: Long, count: Long, step: Long, runs: Vector[Run])

  /** One arithmetic block of the item→bin assignment for a length
    * class: items with class rank in [crStart, crStart+nItems) map to
    * bin binFirst + ((rank − crStart) div a) · dir. */
  final case class Segment(len: Long, crStart: Long, nItems: Long,
      binFirst: Long, a: Long, dir: Long)

  /** One summary row of the report. */
  final case class PackPolicy(policy: String, n_docs: Long,
      n_split_docs: Long, n_segments: Long, n_bins: Long,
      total_tokens: Long, padded_tokens: Long, waste_tokens: Long,
      waste_micro: Long, cross_pairs: Long, total_pairs: Long,
      contamination_micro: Long)

  /** Exact best-fit-decreasing over a (length, count) histogram —
    * lengths must be in [1, budget]. Equivalent to the itemwise
    * simulation under the pinned tie-break, but each round moves WHOLE
    * batches of items into WHOLE batches of interchangeable bins, so
    * the cost is O(length classes × bin classes), independent of item
    * count: once best-fit picks the tightest class, that bin keeps
    * winning the tie (its remaining only shrinks) until it cannot fit
    * another item — absorbing exactly ⌊rem/len⌋ items — and the class
    * mates behave identically. */
  private[text] def simulate(hist: Seq[(Long, Long)],
      budget: Long): Vector[BinClass] =
    simulateAssign(hist, budget)._1

  /** [[simulate]] plus the item→bin ASSIGNMENT: returns (final
    * classes, assignment segments, bins opened). Bin ids number in
    * creation order from 0 (= the itemwise algorithm's list position);
    * an item's bin follows from its within-length-class rank through
    * its covering [[Segment]] — both outputs are config-sized, so the
    * per-doc manifest attaches to the corpus by broadcast. Splitting a
    * consumption run keeps ids exact: a converted batch's bins were
    * last changed in run order, so the NEW class's runs are the
    * consumed chunks reversed with direction flipped (LIFO by
    * last-change step, matching the itemwise tie-break — spec-pinned
    * per item on randomized histograms). */
  private[text] def simulateAssign(hist: Seq[(Long, Long)],
      budget: Long): (Vector[BinClass], Vector[Segment], Long) = {
    require(budget >= 1, "budget >= 1")
    var classes = Vector.empty[BinClass]
    var segs = Vector.empty[Segment]
    var step = 0L
    var nextBin = 0L
    // take the first n bins off a priority-ordered run list
    def takeRuns(runs: Vector[Run], n: Long): (Vector[Run], Vector[Run]) = {
      var need = n
      var rest = runs
      var taken = Vector.empty[Run]
      while (need > 0) {
        val h = rest.head
        val t = math.min(h.count, need)
        taken :+= Run(h.first, t, h.dir)
        rest = if (t == h.count) rest.tail
          else Run(h.first + t * h.dir, h.count - t, h.dir) +: rest.tail
        need -= t
      }
      (taken, rest)
    }
    for ((len, cnt) <- hist.sortBy { case (l, _) => -l }) {
      require(len >= 1 && len <= budget, s"length $len outside [1, budget]")
      require(cnt >= 1, "histogram counts must be positive")
      var c = cnt
      var cr = 0L // class-rank cursor within this length class
      while (c > 0) {
        val elig = classes.filter(_.rem >= len)
        if (elig.isEmpty) {
          // open new bins: each absorbs floor(budget/len) items; ids
          // ascend with consumption, so ONE segment covers the full
          // batch and the partial tail bin
          val a = budget / len
          val nFull = c / a
          val rest = c - nFull * a
          segs :+= Segment(len, cr, c, nextBin, a, 1L)
          if (nFull > 0) {
            step += 1
            classes :+= BinClass(budget - a * len, a * len,
              a * len * len, a, nFull, step,
              Vector(Run(nextBin + nFull - 1, nFull, -1L)))
          }
          if (rest > 0) {
            step += 1
            classes :+= BinClass(budget - rest * len, rest * len,
              rest * len * len, rest, 1, step,
              Vector(Run(nextBin + nFull, 1, -1L)))
          }
          nextBin += nFull + (if (rest > 0) 1L else 0L)
          cr += c
          c = 0
        } else {
          val target = elig.minBy(k => (k.rem, -k.step))
          val a = target.rem / len // >= 1
          val nFull = math.min(target.count, c / a)
          val tail = c - nFull * a
          val hasPartial = tail > 0 && target.count > nFull
          val consumed = nFull + (if (hasPartial) 1L else 0L)
          val eventItems = nFull * a + (if (hasPartial) tail else 0L)
          val (chunks, remainingRuns) = takeRuns(target.runs, consumed)
          // emit one segment per consumed chunk; only the event's
          // last bin may absorb fewer than a items, and the div-a
          // mapping lands it in the same bin either way
          var itemsLeft = eventItems
          var crc = cr
          chunks.foreach { ch =>
            val ni = math.min(itemsLeft, ch.count * a)
            if (ni > 0) segs :+= Segment(len, crc, ni, ch.first, a, ch.dir)
            crc += ni; itemsLeft -= ni
          }
          var created = Vector.empty[BinClass]
          if (nFull > 0) {
            val (fullChunks, _) = takeRuns(chunks, nFull)
            step += 1
            created :+= BinClass(target.rem - a * len,
              target.lSum + a * len, target.l2Sum + a * len * len,
              target.nSeg + a, nFull, step,
              fullChunks.reverse.map(ch =>
                Run(ch.first + (ch.count - 1) * ch.dir, ch.count, -ch.dir)))
          }
          if (hasPartial) {
            val (_, afterFull) = takeRuns(chunks, nFull)
            val pb = afterFull.head // exactly one bin remains
            step += 1
            created :+= BinClass(target.rem - tail * len,
              target.lSum + tail * len, target.l2Sum + tail * len * len,
              target.nSeg + tail, 1, step, Vector(Run(pb.first, 1, -1L)))
          }
          classes = classes.map(k =>
            if (k eq target)
              k.copy(count = k.count - consumed, runs = remainingRuns)
            else k)
            .filter(_.count > 0) ++ created
          cr += eventItems
          c -= eventItems
        }
      }
    }
    (classes, segs, nextBin)
  }

  /** Itemwise reference simulation (the oracle's recurrence, and the
    * equivalence baseline for [[simulate]]): lengths processed in the
    * given order; returns per-bin (rem, lSum, l2Sum, nSeg). */
  private[text] def simulateItemwise(lens: Seq[Long],
      budget: Long): Seq[(Long, Long, Long, Long)] =
    simulateItemwiseAssign(lens, budget)._1

  /** Itemwise reference WITH per-item assignment: also returns each
    * item's bin id (creation order, 0-based). */
  private[text] def simulateItemwiseAssign(lens: Seq[Long],
      budget: Long): (Seq[(Long, Long, Long, Long)], Seq[Long]) = {
    final case class Bin(id: Long, var rem: Long, var st: Long,
      var ls: Long, var l2: Long, var ns: Long)
    val bins = scala.collection.mutable.ArrayBuffer.empty[Bin]
    val asg = scala.collection.mutable.ArrayBuffer.empty[Long]
    var step = 0L
    for (len <- lens) {
      step += 1
      var best: Bin = null
      bins.foreach { b =>
        if (b.rem >= len && (best == null || b.rem < best.rem ||
            (b.rem == best.rem && b.st > best.st))) best = b
      }
      if (best == null) {
        bins += Bin(bins.length, budget - len, step, len, len * len, 1)
        asg += bins.length - 1L
      } else {
        best.rem -= len; best.st = step
        best.ls += len; best.l2 += len * len; best.ns += 1
        asg += best.id
      }
    }
    (bins.map(b => (b.rem, b.ls, b.l2, b.ns)).toSeq, asg.toSeq)
  }

  /** The two-policy economics report over a precomputed
    * (idCol, n_tokens) frame. */
  def packBestFitReport(counted: DataFrame, idCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val spark = counted.sparkSession
    import spark.implicits._
    val filtered = counted
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)

    // ---- chop leg: the packCounted layout, priced like q_t_pack ----
    val (packed, release) = TextOps.packCountedReleasable(
      filtered, idCol, budget)
    val segs = packed.select(col("start_tok"), col("n_tokens"),
        explode(sequence(col("bin_first"), col("bin_last"))).as("__b"))
      .select(col("__b"),
        (least(col("start_tok") + col("n_tokens"), (col("__b") + 1) * budget)
          - greatest(col("start_tok"), col("__b") * budget)).as("__sl"))
    val chopBins = segs.groupBy("__b")
      .agg(sum("__sl").as("L"), sum(expr("__sl * __sl")).as("ss"),
        count(lit(1)).as("nseg"))
      .agg(count(lit(1)).as("nb"), sum("nseg").as("nsegs"),
        sum("L").as("tot"),
        sum(expr("(L * L - ss) div 2")).as("cross"),
        sum(expr("(L * L - L) div 2")).as("pairs"))
      .collect()(0)
    val chopSplit = packed
      .agg(sum(when(col("bin_last") > col("bin_first"), 1L).otherwise(0L))
        .as("s")).collect()(0)
    release()

    // ---- bestfit leg: full chunks closed-form + histogram BFD ----
    val b0 = filtered.agg(
      count(lit(1)).as("nd"), sum("n_tokens").as("tot"),
      sum(expr(s"n_tokens div $budget")).as("fullc"),
      sum(when(col("n_tokens") > budget, 1L).otherwise(0L)).as("split"))
      .collect()(0)
    val hist = filtered
      .select(expr(s"n_tokens % $budget").as("r"))
      .filter(col("r") > 0)
      .groupBy("r").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getAs[Long]("r"), r.getAs[Long]("c"))).toSeq
    val classes = simulate(hist, budget)

    def zl(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    def row(policy: String, nDocs: Long, split: Long, nSegs: Long,
        nBins: Long, total: Long, cross: Long, pairs: Long): PackPolicy = {
      val padded = nBins * budget
      val waste = padded - total
      PackPolicy(policy, nDocs, split, nSegs, nBins, total, padded, waste,
        if (padded > 0) waste * 1000000L / padded else 0L,
        cross, pairs,
        if (pairs > 0) cross * 1000000L / pairs else 0L)
    }
    val chop = row("chop", zl(b0, 0), zl(chopSplit, 0), zl(chopBins, 1),
      zl(chopBins, 0), zl(chopBins, 2), zl(chopBins, 3), zl(chopBins, 4))
    val fullc = zl(b0, 2)
    val best = row("bestfit", zl(b0, 0), zl(b0, 3),
      fullc + classes.map(k => k.nSeg * k.count).sum,
      fullc + classes.map(_.count).sum,
      zl(b0, 1),
      classes.map(k => k.count * (k.lSum * k.lSum - k.l2Sum) / 2).sum,
      fullc * (budget * (budget - 1) / 2) +
        classes.map(k => k.count * (k.lSum * (k.lSum - 1) / 2)).sum)
    Seq(chop, best).toDF()
  }

  /** Per-document manifest: one row per SEGMENT the doc contributes —
    * (idCol, seg_idx, bin, seg_tokens). Full chunks occupy seg_idx
    * 0..⌊n/budget⌋−1 in bins numbered by doc order; the residual (if
    * any) is seg_idx ⌊n/budget⌋ in a best-fit bin numbered
    * fullChunksTotal + creation order. This is what a data loader
    * consumes; hash-gated per row against the itemwise oracle.
    *
    * Scale shape: full-chunk bin bases are ONE distributed prefix sum
    * (GlobalIndex, doc order); residual ranks one more (length, id)
    * prefix-sum pass; the assignment itself is the histogram
    * simulation's SEGMENT table — config-sized, broadcast-joined on
    * (length, rank-range), so the corpus never meets a per-bin
    * structure. */
  def packBestFitAssign(counted: DataFrame, idCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val spark = counted.sparkSession
    import spark.implicits._
    val filtered = counted
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val (cum, relCum) = graft.etl.GlobalIndex.withGlobalCumsumReleasable(
      filtered, Seq(col(idCol)), expr(s"n_tokens div $budget"), "__fb")
    val fullSegs = cum.filter(expr(s"n_tokens div $budget") > 0)
      .select(col(idCol), col("__fb"),
        explode(sequence(lit(0L), expr(s"n_tokens div $budget") - 1))
          .as("seg_idx"))
      .select(col(idCol), col("seg_idx"),
        (col("__fb") + col("seg_idx")).as("bin"),
        lit(budget).as("seg_tokens"))
    val fullTotal = {
      val r = filtered.agg(sum(expr(s"n_tokens div $budget"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val resid = filtered.select(col(idCol),
        expr(s"n_tokens div $budget").as("__f"),
        expr(s"n_tokens % $budget").as("r"))
      .filter(col("r") > 0)
    val (ranked, relIdx) = graft.etl.GlobalIndex.withGlobalIndexReleasable(
      resid, Seq(col("r"), col(idCol)), "__rn")
    val hist = resid.groupBy("r").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getAs[Long]("r"), x.getAs[Long]("c"))).toSeq
    // class offsets under the ASCENDING (r, id) rank order
    val offs = hist.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (r, c)) => (r, acc + c) }
      .sliding(2).collect { case Seq((_, acc), (r, _)) => (r, acc) }.toSeq
    val (_, segments, _) = simulateAssign(hist, budget)
    val offDf = (if (offs.isEmpty) Seq((-1L, 0L)) else offs)
      .toDF("r", "__off")
    val segDf = (if (segments.isEmpty)
        Seq((-1L, 0L, -1L, 0L, 1L, 1L))
      else segments.map(s =>
        (s.len, s.crStart, s.crStart + s.nItems - 1, s.binFirst, s.a,
          s.dir)))
      .toDF("__sr", "__lo", "__hi", "__bf", "__a", "__dir")
    val residSegs = ranked.join(broadcast(offDf), Seq("r"))
      .withColumn("__cr", col("__rn") - 1 - col("__off"))
      .join(broadcast(segDf),
        col("r") === col("__sr") && col("__cr") >= col("__lo") &&
          col("__cr") <= col("__hi"))
      .select(col(idCol), col("__f").as("seg_idx"),
        (lit(fullTotal) + col("__bf") +
          expr("((__cr - __lo) div __a) * __dir")).as("bin"),
        col("r").as("seg_tokens"))
    val out = fullSegs.unionByName(residSegs)
      .localCheckpoint(eager = true)
    relCum(); relIdx()
    out
  }

  /** The regex-token-count source CTE for the registered document
    * queries. */
  private def regexCountCte: String =
    """t AS (SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT)
                AS n
              FROM documents)"""

  /** Shared oracle chain over any `src(doc_id, n)` CTE: the n>0 corpus
    * (f), residual items in (len desc, id) order (it, nit), and the
    * itemwise best-fit recursion pk carrying the live bin list PLUS
    * each item's chosen bin position (asg). private[graft]: the SFT
    * batch-plan capstone composes it over unigram chat-token totals. */
  private[graft] def bfdCtes(src: String, budget: Long): String =
    s"""f AS MATERIALIZED (SELECT doc_id, n FROM $src WHERE n > 0),
            it AS MATERIALIZED (SELECT row_number()
                  OVER (ORDER BY n % $budget DESC,
                  doc_id) AS rn,
                doc_id,
                CAST(n % $budget AS BIGINT) AS len,
                CAST(n // $budget AS BIGINT) AS nf
              FROM f WHERE n % $budget > 0),
            nit AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM it),
            pk AS (
              SELECT CAST(0 AS BIGINT) AS k,
                CAST([] AS STRUCT(rem BIGINT, st BIGINT, ls BIGINT,
                  l2 BIGINT, ns BIGINT)[]) AS bins,
                CAST([] AS BIGINT[]) AS asg,
                (SELECT COALESCE(list(len ORDER BY rn),
                  CAST([] AS BIGINT[])) FROM it) AS lens
              UNION ALL
              SELECT s.k + 1,
                CASE WHEN ch.tst IS NULL THEN list_append(s.bins,
                    {'rem': $budget - cl.len, 'st': s.k + 1, 'ls': cl.len,
                     'l2': cl.len * cl.len, 'ns': CAST(1 AS BIGINT)})
                  ELSE list_transform(s.bins, b ->
                    CASE WHEN b.st = ch.tst THEN
                      {'rem': b.rem - cl.len, 'st': s.k + 1,
                       'ls': b.ls + cl.len, 'l2': b.l2 + cl.len * cl.len,
                       'ns': b.ns + 1}
                    ELSE b END)
                END AS bins,
                list_append(s.asg, CASE WHEN ch.tst IS NULL
                  THEN CAST(len(s.bins) + 1 AS BIGINT)
                  ELSE CAST(list_position(list_transform(s.bins,
                    b -> b.st), ch.tst) AS BIGINT) END) AS asg,
                s.lens AS lens
              FROM pk s,
              LATERAL (SELECT s.lens[CAST(s.k + 1 AS INT)] AS len) cl,
              LATERAL (SELECT list_max(list_transform(list_filter(s.bins,
                  b -> b.rem >= cl.len AND b.rem = list_min(list_transform(
                    list_filter(s.bins, b2 -> b2.rem >= cl.len),
                    b2 -> b2.rem))),
                b -> b.st)) AS tst) ch
              WHERE s.k < len(s.lens))"""

  /** q_t_pack_bestfit: both policies priced over documents at a
    * 64-token budget (regex token counts — docs run 10..100 tokens,
    * so both the full-chunk path and the residual bin-packing are
    * exercised), hash-pinned against a full itemwise best-fit replay
    * in a DuckDB recursive CTE. */
  private val tBestFit = Q(
    (s, d) => packBestFitReport(
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(TextOps.bpeTokenCount(col("text")), lit(0L))
          .as("n_tokens")),
      "doc_id", 64L).orderBy("policy"),
    Some(s"""WITH RECURSIVE $regexCountCte,
            ${bfdCtes("t", 64L)},
            c AS (SELECT doc_id, n,
                CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_tok
              FROM f),
            p AS (SELECT doc_id, n, start_tok, start_tok // 64 AS bf,
                (start_tok + n - 1) // 64 AS bl
              FROM c),
            segs AS (SELECT b.b AS b,
                LEAST(start_tok + n, (b.b + 1) * 64)
                  - GREATEST(start_tok, b.b * 64) AS sl
              FROM p, LATERAL (SELECT unnest(range(bf, bl + 1)) AS b) b),
            cb AS (SELECT b, CAST(SUM(sl) AS BIGINT) AS L,
                CAST(SUM(sl * sl) AS BIGINT) AS ss,
                CAST(COUNT(*) AS BIGINT) AS nseg
              FROM segs GROUP BY 1),
            chop AS (SELECT 'chop' AS policy,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS n_docs,
                (SELECT CAST(SUM(CASE WHEN bl > bf THEN 1 ELSE 0 END)
                  AS BIGINT) FROM p) AS n_split_docs,
                CAST(SUM(nseg) AS BIGINT) AS n_segments,
                CAST(COUNT(*) AS BIGINT) AS n_bins,
                CAST(SUM(L) AS BIGINT) AS total_tokens,
                CAST(SUM((L * L - ss) // 2) AS BIGINT) AS cross_pairs,
                CAST(SUM((L * L - L) // 2) AS BIGINT) AS total_pairs
              FROM cb),
            fin AS (SELECT unnest(bins) AS b FROM pk, nit
              WHERE k = nit.cnt),
            rstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS rbins,
                CAST(COALESCE(SUM(b.ns), 0) AS BIGINT) AS rsegs,
                CAST(COALESCE(SUM((b.ls * b.ls - b.l2) // 2), 0)
                  AS BIGINT) AS rcross,
                CAST(COALESCE(SUM((b.ls * b.ls - b.ls) // 2), 0)
                  AS BIGINT) AS rpairs
              FROM fin),
            bstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n) AS BIGINT) AS total,
                CAST(SUM(n // 64) AS BIGINT) AS fullc,
                CAST(SUM(CASE WHEN n > 64 THEN 1 ELSE 0 END) AS BIGINT)
                  AS split_docs
              FROM f),
            best AS (SELECT 'bestfit' AS policy, bstat.n_docs,
                bstat.split_docs AS n_split_docs,
                bstat.fullc + rstat.rsegs AS n_segments,
                bstat.fullc + rstat.rbins AS n_bins,
                bstat.total AS total_tokens,
                rstat.rcross AS cross_pairs,
                bstat.fullc * (64 * 63 // 2) + rstat.rpairs AS total_pairs
              FROM bstat, rstat),
            u AS (SELECT * FROM chop UNION ALL SELECT * FROM best)
            SELECT policy, n_docs, n_split_docs, n_segments, n_bins,
              CAST(total_tokens AS BIGINT) AS total_tokens,
              CAST(n_bins * 64 AS BIGINT) AS padded_tokens,
              CAST(n_bins * 64 - total_tokens AS BIGINT) AS waste_tokens,
              CAST(CASE WHEN n_bins > 0
                THEN (n_bins * 64 - total_tokens) * 1000000 // (n_bins * 64)
                ELSE 0 END AS BIGINT) AS waste_micro,
              CAST(cross_pairs AS BIGINT) AS cross_pairs,
              CAST(total_pairs AS BIGINT) AS total_pairs,
              CAST(CASE WHEN total_pairs > 0
                THEN cross_pairs * 1000000 // total_pairs
                ELSE 0 END AS BIGINT) AS contamination_micro
            FROM u ORDER BY policy"""))

  /** q_t_pack_bestfit_assign: the loader-facing manifest — every
    * document's segments with their PHYSICAL bin ids under the same
    * 64-token best-fit layout, hash-pinned per row against the
    * itemwise oracle's assignment list. */
  private val tAssign = Q(
    (s, d) => packBestFitAssign(
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(TextOps.bpeTokenCount(col("text")), lit(0L))
          .as("n_tokens")),
      "doc_id", 64L).orderBy("doc_id", "seg_idx"),
    Some(s"""WITH RECURSIVE $regexCountCte,
            ${bfdCtes("t", 64L)},
            ${assignTailSql(64L)}"""))

  /** The assignment oracle's tail over the [[bfdCtes]] chain: doc-order
    * full-chunk bins, then residual bins from the recursion's
    * assignment list. */
  private[graft] def assignTailSql(budget: Long): String =
    s"""${assignManifestCtes(budget)}
            SELECT doc_id, seg_idx, bin, seg_tokens
            FROM manifest
            ORDER BY doc_id, seg_idx"""

  /** [[assignTailSql]]'s CTE half, ending in
    * `manifest(doc_id, seg_idx, bin, seg_tokens)` — the composition
    * surface for per-bin derivations (mask spans). */
  private[graft] def assignManifestCtes(budget: Long): String =
    s"""fullb AS (SELECT doc_id, n, n // $budget AS nfc,
                CAST(COALESCE(SUM(n // $budget) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS fb
              FROM f),
            fullsegs AS (SELECT doc_id, CAST(i.i AS BIGINT) AS seg_idx,
                CAST(fb + i.i AS BIGINT) AS bin,
                CAST($budget AS BIGINT) AS seg_tokens
              FROM fullb, LATERAL (SELECT unnest(range(nfc)) AS i) i),
            ftot AS (SELECT CAST(COALESCE(SUM(n // $budget), 0) AS BIGINT)
                AS tot FROM f),
            residsegs AS (SELECT it.doc_id, it.nf AS seg_idx,
                CAST(ftot.tot + pk.asg[CAST(it.rn AS INT)] - 1
                  AS BIGINT) AS bin,
                it.len AS seg_tokens
              FROM pk, nit, it, ftot WHERE pk.k = nit.cnt),
            manifest AS (SELECT * FROM fullsegs
              UNION ALL SELECT * FROM residsegs)"""

  /** Per-bin attention-mask spans over an assignment manifest — the
    * other half of the Zhao et al. recipe (best-fit packing works
    * BECAUSE training masks cross-document attention): for every bin,
    * its segments in pinned (doc, seg) order with exact
    * [start_off, end_off) token offsets inside the padded sequence.
    * This is the block-diagonal attention-mask table a trainer feeds.
    *
    * Scale shape: one bin-keyed aggregation; offsets are a per-bin
    * array fold over the bin's OWN segment list (a bin holds ≤ budget
    * segments by construction — bounded, the ChatPrep fold
    * discipline), never a corpus window. */
  def packMaskSpans(manifest: DataFrame, idCol: String): DataFrame = {
    val folded = manifest.groupBy("bin")
      .agg(sort_array(collect_list(struct(col(idCol), col("seg_idx"),
        col("seg_tokens")))).as("__s"))
      .select(col("bin"), explode(transform(col("__s"), (t, i) => struct(
        i.cast("long").as("seg_rank"),
        t.getField(idCol).as(idCol),
        t.getField("seg_idx").as("seg_idx"),
        aggregate(slice(col("__s"), lit(1), i), lit(0L),
          (a, x) => a + x.getField("seg_tokens")).as("start_off"),
        t.getField("seg_tokens").as("__n")))).as("__t"))
    folded.select(col("bin"),
      col("__t.seg_rank").as("seg_rank"),
      col(s"__t.$idCol").as(idCol),
      col("__t.seg_idx").as("seg_idx"),
      col("__t.start_off").as("start_off"),
      (col("__t.start_off") + col("__t.__n")).as("end_off"))
  }

  /** q_t_pack_bestfit_masks: the mask-span table of the registered
    * 64-token manifest — every bin's block boundaries hash-pinned. */
  private val tMasks = Q(
    (s, d) => packMaskSpans(packBestFitAssign(
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(TextOps.bpeTokenCount(col("text")), lit(0L))
          .as("n_tokens")),
      "doc_id", 64L), "doc_id")
      .orderBy("bin", "seg_rank"),
    Some(s"""WITH RECURSIVE $regexCountCte,
            ${bfdCtes("t", 64L)},
            ${assignManifestCtes(64L)}
            SELECT bin,
              CAST(row_number() OVER (PARTITION BY bin
                ORDER BY doc_id, seg_idx) - 1 AS BIGINT) AS seg_rank,
              doc_id, seg_idx,
              CAST(COALESCE(SUM(seg_tokens) OVER (PARTITION BY bin
                ORDER BY doc_id, seg_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_off,
              CAST(SUM(seg_tokens) OVER (PARTITION BY bin
                ORDER BY doc_id, seg_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS end_off
            FROM manifest
            ORDER BY bin, seg_rank"""))

  val queries: Map[String, Q] = Map(
    "q_t_pack_bestfit" -> tBestFit,
    "q_t_pack_bestfit_assign" -> tAssign,
    "q_t_pack_bestfit_masks" -> tMasks)
}
