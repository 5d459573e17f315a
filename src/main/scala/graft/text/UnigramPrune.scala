package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Likelihood-loss vocabulary pruning — the SentencePiece prune
  * criterion (Kudo, ACL 2018 §3.2) beside [[UnigramLm]]'s count-top-K
  * M-step (the one documented divergence from the paper): instead of
  * keeping the most-USED pieces, keep the pieces whose REMOVAL would
  * cost the most total corpus Viterbi log-likelihood. A piece can be
  * frequent yet redundant (an equal-score alternative segmentation
  * exists — loss ≈ 0) or rare yet load-bearing (its words fall back to
  * far-worse single-char paths — loss large); the loss criterion tells
  * them apart, the count criterion cannot (spec-pinned on a planted
  * corpus).
  *
  * Pinned semantics (replayed verbatim by the oracle, exact integer
  * micro-nats — the [[UnigramLm]] frame):
  *   loss(p) = Σ_{w : p ∈ bestpath(w)} freq_w · (best_w − alt_w(¬p))
  * where best_w is the word's Viterbi total under the SEED-scored
  * model and alt_w(¬p) the best total over paths avoiding p (always
  * defined: single-char pieces are never candidates and never pruned,
  * so every word stays segmentable). Words whose best path does not
  * use p contribute EXACTLY zero (their path survives removal), so
  * the sum over path-containing words is the exact corpus-likelihood
  * change. kept = top `vocabKeep` multi-char candidates by
  * (loss desc, piece asc).
  *
  * Envelope: a piece's loss sum is ≤ corpus tokens · wordLen ·
  * ceil(ln(T+N)·10⁶) micro-nats — exact in long for 10¹⁰ corpus
  * tokens of 16-char words (graft.tools.NumericEnvelopes pins the
  * bound); widen to decimal(38) beyond.
  *
  * Scale shape (the learnState discipline): ONE corpus aggregation
  * (word freqs); everything after is vocabulary-sized — the candidate
  * set is (word, multi-char-path-piece) pairs (≤ Σ path lengths over
  * the VOCAB, not the corpus), each carrying one more DP fold over the
  * word's own edge list with the candidate's edges filtered out;
  * piece losses aggregate on the piece key; the keep flag is a
  * vocab-sized top-K attach. */
object UnigramPrune {

  /** Prune report over the seed-scored model: one row per multi-char
    * candidate — (piece, cnt, loss_micro, kept). */
  def pruneReport(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      vocabExtra: Int = 60, vocabKeep: Int = 40): DataFrame = {
    require(vocabKeep >= 0, "vocabKeep >= 0")
    import graft.functions.ViterbiSegment
    val words = UnigramLm.wordFreqs(docs, textCol).persist()
    words.count()
    // seed model collected config-sized; the DP runs as the compiled
    // expression carrying the score map (r15 — the former lattice
    // explode + broadcast join + two persisted edge frames are gone)
    val pieces = UnigramLm.seedModel(words, maxPieceLen, vocabExtra)
    val scores = ViterbiSegment.buildScores(
      pieces.map(p => p.piece -> p.scoreMicro))
    // the (word, multi-char-path-piece) candidate pairs, freq riding
    // along (array_distinct ≡ the former explode-then-distinct)
    val pairs = words.select(col("w"), col("freq"),
      explode(array_distinct(filter(
        ViterbiSegment.viterbiPieces(col("w"), scores, maxPieceLen),
        p => length(p) > 1))).as("px"))
    // best_w = the DP best total (≡ the former path score re-sum);
    // alt_w(¬px) = the same DP skipping the candidate's edges
    val losses = pairs.select(col("px").as("piece"),
      (col("freq") *
        (ViterbiSegment.viterbiTotal(col("w"), scores, maxPieceLen) -
          ViterbiSegment.viterbiAltTotal(col("w"), col("px"), scores,
            maxPieceLen))).as("__l"))
      .groupBy("piece").agg(sum("__l").as("loss_micro"))
    val sp = docs.sparkSession
    import sp.implicits._
    val multi = pieces
      .filter(p => p.piece.codePointCount(0, p.piece.length) > 1)
      .map(p => (p.piece, p.cnt)).toDF("piece", "cnt")
      .join(losses, Seq("piece"), "left")
      .na.fill(0L, Seq("loss_micro"))
      .select("piece", "cnt", "loss_micro")
    val keep = multi.orderBy(col("loss_micro").desc, col("piece"))
      .limit(vocabKeep).select(col("piece"), lit(true).as("__k"))
    val out = multi.join(broadcast(keep), Seq("piece"), "left")
      .withColumn("kept", coalesce(col("__k"), lit(false)))
      .drop("__k")
      .localCheckpoint(eager = true)
    words.unpersist(blocking = false)
    out
  }

  /** q_t_unigram_prune: the likelihood-loss prune table over the
    * documents seed model (maxPieceLen 4, top-60 seed, keep 40) —
    * every loss and keep flag hash-pinned against the full seed +
    * Viterbi + per-candidate exclusion-DP replay in DuckDB. */
  private val tPrune = Q(
    (s, d) => pruneReport(Tables.documents(s, d), "text")
      .orderBy("piece"),
    Some(s"""WITH RECURSIVE ${UnigramLm.seedCtes(4, 60)},
      ${UnigramLm.viterbiCtes(1, 0, 4)},
      ex AS (SELECT x.w, x.j, x.i, x.piece, p.score_micro AS score
        FROM (SELECT s.w AS w, CAST(j.j AS BIGINT) AS j,
                CAST(j.j + l.l AS BIGINT) AS i,
                substr(s.w, CAST(j.j AS INT) + 1, CAST(l.l AS INT)) AS piece
              FROM w0 s,
                LATERAL (SELECT unnest(range(1,
                  least(4, len(s.w)) + 1)) AS l) l,
                LATERAL (SELECT unnest(range(len(s.w) - l.l + 1)) AS j) j
             ) x
        JOIN ps0 p ON p.piece = x.piece),
      up AS (SELECT w, unnest(pieces) AS px FROM seg1),
      bw AS (SELECT u.w, CAST(SUM(p.score_micro) AS BIGINT) AS best
        FROM up u JOIN ps0 p ON p.piece = u.px GROUP BY 1),
      prs AS (SELECT DISTINCT w, px FROM up WHERE len(px) > 1),
      exl AS (SELECT w, list(struct_pack(j := j, i := i, s := score,
          p := piece)) AS edges
        FROM ex GROUP BY w),
      vx AS (
        SELECT prs.w AS w, prs.px AS px, 0 AS i,
          [CAST(0 AS BIGINT)] AS best, exl.edges AS edges
        FROM prs JOIN exl ON exl.w = prs.w
        UNION ALL
        SELECT v.w, v.px, v.i + 1 AS i,
          list_append(v.best, mx.t) AS best, v.edges AS edges
        FROM vx v, LATERAL (
          SELECT list_max(list_transform(list_filter(v.edges,
              e -> e.i = v.i + 1 AND e.p <> v.px),
            e -> v.best[CAST(e.j AS INT) + 1] + e.s)) AS t) mx
        WHERE v.i < len(v.w)),
      ax AS (SELECT w, px, best[len(w) + 1] AS alt FROM vx
        WHERE i = len(w)),
      ls AS (SELECT a.px AS piece,
          CAST(SUM(w0.freq * (bw.best - a.alt)) AS BIGINT) AS loss_micro
        FROM ax a JOIN bw ON a.w = bw.w JOIN w0 ON a.w = w0.w
        GROUP BY 1),
      mp AS (SELECT p.piece, p.cnt,
          COALESCE(ls.loss_micro, CAST(0 AS BIGINT)) AS loss_micro
        FROM ps0 p LEFT JOIN ls ON p.piece = ls.piece
        WHERE len(p.piece) > 1),
      kq AS (SELECT piece FROM mp
        ORDER BY loss_micro DESC, piece LIMIT 40)
      SELECT mp.piece, mp.cnt, mp.loss_micro,
        kq.piece IS NOT NULL AS kept
      FROM mp LEFT JOIN kq ON mp.piece = kq.piece
      ORDER BY mp.piece"""))

  val queries: Map[String, Q] = Map("q_t_unigram_prune" -> tPrune)
}
