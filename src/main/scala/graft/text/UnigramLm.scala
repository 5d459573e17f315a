package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction + Viterbi corpus encode — the
  * SentencePiece family's other half (Kudo, ACL 2018, arXiv:1804.10959):
  * where BPE ([[BpeMerge]]) grows a vocabulary bottom-up by merging, the
  * unigram model starts from a large seed piece inventory and
  * iteratively re-estimates piece probabilities, segmenting each word
  * into the pieces that maximize total log-probability.
  *
  * VARIANT PINNED HERE: hard (Viterbi) EM — the E-step counts pieces in
  * each word's single BEST segmentation rather than expectation over
  * all segmentations. Kudo's soft E-step needs forward–backward
  * logsumexp (transcendental per lattice node — unhashable across
  * engines); Viterbi-EM is the standard hard-assignment variant and
  * keeps the entire loop in EXACT integer micro-nats: scores are
  * floor(ln((cnt+1)/(T+N))·1e6) longs (the [[NgramLm]] micro-nat
  * convention, add-one smoothed so a zero-count piece never hits
  * ln 0), path totals are long sums, and the DP argmax breaks ties
  * deterministically (highest total, then longest piece = smallest
  * start). Both engines replay the identical recurrence, so the merge
  * tables hash exactly.
  *
  * Inventory discipline: single-character pieces are NEVER pruned
  * (every word stays segmentable — sentencepiece's required-char rule);
  * multi-char pieces keep the top `vocabExtra` by (count desc, piece
  * asc) with count ≥ 1.
  *
  * Scale shape (the BPE learnState discipline): ONE corpus-sized
  * aggregation up front (word frequencies); every EM iteration touches
  * only the VOCABULARY (w, freq) — window generation is a map-side
  * explode over words, the piece-score attach is a BROADCAST equi-join
  * (piece table is config-sized: chars + top-K), the Viterbi DP is one
  * higher-order fold per word (CodegenFallback, but vocab-bounded),
  * and the M-step is a piece-keyed aggregation of vocab-sized
  * segment lists. The corpus is touched exactly once more at encode
  * (explode → word-key equi-join → per-doc agg).
  *
  * Envelope: a DP path total is ≤ wordLen · ceil(ln(T+N)·10⁶)
  * micro-nats — exact in long for 2¹⁶-char words at T ≤ 10¹⁸ corpus
  * tokens (graft.tools.NumericEnvelopes pins the bound). */
object UnigramLm {

  import TextOps.tokens

  /** Word-frequency table (w, freq) — the bounded table every
    * iteration runs on. */
  private[text] def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Seed counts: every substring of length 1..maxPieceLen of every
    * word, weighted by word frequency (overlapping occurrences all
    * count). Map-side explode + one piece-keyed aggregation. */
  private[text] def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least($maxPieceLen, length(w))),
           l -> transform(sequence(0, length(w) - l),
           j -> substr(w, j + 1, l))))""")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Prune + score: all single-char pieces survive regardless of
    * count; multi-char pieces keep the top `vocabExtra` by (cnt desc,
    * piece asc) with cnt ≥ 1. score_micro = floor(ln((cnt+1)/(T+N))
    * ·1e6) with T = Σ kept counts, N = kept pieces — add-one
    * smoothing, micro-nat longs (exact on both engines: one IEEE
    * division, one ln, one multiply, one binary floor). */
  private[text] def scorePieces(counts: DataFrame, vocabExtra: Int): DataFrame = {
    val chars = counts.filter(length(col("piece")) === 1)
    val multi = counts
      .filter(length(col("piece")) > 1 && col("cnt") >= 1)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabExtra)
    val kept = chars.unionAll(multi)
    val tot = kept.agg(sum("cnt").as("__T"), count(lit(1)).as("__N"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(log((col("cnt") + 1).cast("double") /
          (col("__T") + col("__N")).cast("double")) * 1e6)
          .cast("long").as("score_micro"))
  }

  /** All (j, i, piece) windows of each word with piece length ≤
    * maxPieceLen — the Viterbi lattice edges before scoring. */
  private[text] def windows(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("w"), col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least($maxPieceLen, length(w))),
           l -> transform(sequence(0, length(w) - l),
           j -> struct(cast(j AS bigint) AS j, cast(j + l AS bigint) AS i,
                       substr(w, j + 1, l) AS p))))""")).as("e"))
      .select(col("w"), col("freq"), col("e.j").as("j"), col("e.i").as("i"),
        col("e.p").as("p"))

  /** Viterbi segmentation of every word under `pieces`: returns
    * (w, freq, pieces array) where the array is the best segmentation
    * (in back-to-front order — consumers only count). DP: best[i] =
    * max over in-edges of best[j] + score, tie → smallest j (longest
    * piece); backtrace walks the bp list. Both folds are higher-order
    * aggregates over the word's OWN collected edge list — no joins
    * inside the loop, vocab-sized rows only. */
  private[graft] def viterbiSegment(wins: DataFrame,
      pieces: DataFrame): DataFrame = {
    val scored = wins
      .join(broadcast(pieces.select(col("piece").as("p"),
        col("score_micro").as("s"))), Seq("p"))
      .groupBy("w", "freq")
      .agg(collect_list(struct(col("j"), col("i"), col("s"))).as("edges"))
    val wlen = length(col("w"))
    val dpInit = struct(array(lit(0L)).as("best"), array(lit(0L)).as("bp"))
    val dp = aggregate(sequence(lit(1), wlen), dpInit, (acc, i) => {
      val iL = i.cast("long")
      val cands = transform(
        filter(col("edges"), e => e.getField("i") === iL),
        e => struct(
          (element_at(acc.getField("best"),
            (e.getField("j") + 1).cast("int")) + e.getField("s")).as("t"),
          (-e.getField("j")).as("nj")))
      val m = array_max(cands)
      struct(
        concat(acc.getField("best"), array(m.getField("t"))).as("best"),
        concat(acc.getField("bp"), array(-m.getField("nj"))).as("bp"))
    })
    val withDp = scored.withColumn("__dp", dp)
      .select(col("w"), col("freq"), col("__dp.bp").as("bp"))
    val walk = aggregate(sequence(lit(1), wlen),
      struct(wlen.cast("long").as("pos"),
        array().cast("array<string>").as("pieces")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val j = element_at(col("bp"), (pos + 1).cast("int"))
        when(pos > 0, struct(
          j.as("pos"),
          concat(acc.getField("pieces"),
            array(substr(col("w"), (j + 1).cast("int"),
              (pos - j).cast("int")))).as("pieces")))
          .otherwise(acc)
      },
      acc => acc.getField("pieces"))
    withDp.select(col("w"), col("freq"), walk.as("pieces"))
  }

  /** The full learn loop: seed → score → `iters` × (Viterbi E-step →
    * re-count → prune+score M-step). Returns (final piece table
    * persisted, the persisted windows frame, release handle). */
  private[graft] def learnState(docs: DataFrame, textCol: String,
      maxPieceLen: Int, vocabExtra: Int, iters: Int)
      : (DataFrame, DataFrame, () => Unit) = {
    require(iters >= 1, "iters >= 1")
    val words = wordFreqs(docs, textCol).persist()
    words.count()
    val wins = windows(words, maxPieceLen).persist()
    wins.count()
    var pieces = scorePieces(seedCounts(words, maxPieceLen), vocabExtra)
      .persist()
    pieces.count()
    for (_ <- 1 to iters) {
      val counts = viterbiSegment(wins, pieces)
        .select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val full = pieces.select("piece")
        .join(counts, Seq("piece"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val next = scorePieces(full, vocabExtra).persist()
      next.count()
      pieces.unpersist(blocking = false)
      pieces = next
    }
    val fin = pieces
    (fin, wins, () => {
      fin.unpersist(blocking = false)
      wins.unpersist(blocking = false)
      words.unpersist(blocking = false)
      ()
    })
  }

  /** Learned piece table after `iters` hard-EM iterations:
    * (piece, cnt, score_micro). */
  def learn(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      vocabExtra: Int = 60, iters: Int = 2): DataFrame = {
    val (pieces, _, release) = learnState(docs, textCol, maxPieceLen,
      vocabExtra, iters)
    val out = pieces.localCheckpoint(eager = true)
    release()
    out
  }

  /** Corpus-scale Viterbi ENCODE under the learned model: per doc
    * (n_words, n_pieces, n_chars) — the unigram twin of
    * [[BpeMerge.encodeCorpus]]. The vocabulary is segmented ONCE
    * (vocab-sized DP); the corpus is touched once: explode to
    * (doc_id, w), equi-join the segmented vocab on the word key, one
    * per-doc aggregation. Docs with no tokens produce no row. */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int = 4, vocabExtra: Int = 60,
      iters: Int = 2): DataFrame = {
    val (pieces, wins, release) = learnState(docs, textCol, maxPieceLen,
      vocabExtra, iters)
    val segged = viterbiSegment(wins, pieces)
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
    val corpusWords = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("w"))
    val out = corpusWords.join(segged, Seq("w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum(length(col("w"))).as("n_chars"))
      .localCheckpoint(eager = true)
    release()
    out
  }

  /** Plain-Scala Viterbi piece count for ONE word under a score map —
    * the streaming-side segmenter ([[graft.streaming.Streams
    * .streamingTokenMeter]] folds it per arriving doc, where the
    * column DP has no vocabulary to batch over). IDENTICAL recurrence
    * and tie-break as [[viterbiSegment]] (highest total, then smallest
    * start j — the ascending-j scan accepts only strict improvements,
    * which keeps the smallest-j argmax); parity is spec-pinned against
    * the batch encode. Returns -1 for a word the model cannot segment
    * (a character outside the training inventory — the streaming OOV
    * case the batch encode's vocab join silently drops). */
  def viterbiPieceCount(w: String, scores: collection.Map[String, Long],
      maxPieceLen: Int): Long = {
    val n = w.length
    if (n == 0) return 0L
    val NEG = Long.MinValue
    val best = Array.fill(n + 1)(NEG)
    val bp = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != NEG) {
          val s = scores.getOrElse(w.substring(j, i), Long.MinValue)
          if (s != Long.MinValue && best(j) + s > best(i)) {
            best(i) = best(j) + s
            bp(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == NEG) return -1L
    var pos = n
    var count = 0L
    while (pos > 0) { count += 1L; pos = bp(pos) }
    count
  }

  // -- oracle SQL generator (seeded-unroll, BpeMerge.iterCtes style) ----

  /** WITH RECURSIVE chain ending in `ps$iters` (piece, cnt,
    * score_micro): seed counts, then per iteration — lattice edges
    * against the previous piece table, the forward DP as a recursive
    * CTE carrying (best, bp) lists, the backtrace as a second
    * recursion, piece re-counts, prune + rescore. */
  private def pruneScoreCtes(t: Int, src: String, vocabExtra: Int): String =
    s"""k$t AS (SELECT piece, cnt FROM $src WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM $src WHERE len(piece) > 1 AND cnt >= 1
       |    ORDER BY cnt DESC, piece LIMIT $vocabExtra) q$t),
       |tt$t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS T,
       |    CAST(COUNT(*) AS BIGINT) AS N FROM k$t),
       |ps$t AS (SELECT piece, cnt,
       |    CAST(FLOOR(ln(CAST(cnt + 1 AS DOUBLE)
       |      / CAST(tt.T + tt.N AS DOUBLE)) * 1000000.0) AS BIGINT)
       |      AS score_micro
       |  FROM k$t, tt$t tt)""".stripMargin

  /** One Viterbi pass (edges → forward DP → backtrace → segments)
    * against piece table ps$prev, CTEs suffixed $t, ending in
    * `seg$t(w, pieces)`. private[graft]: [[UnigramPrune]]'s oracle
    * replays one pass against the seed table.
    *
    * The forward DP carries each word's FULL scored edge list in its
    * recursion state and argmaxes it with list lambdas — a recursive
    * member that referenced the edge CTE would re-evaluate the whole
    * upstream learn chain on EVERY iteration (DuckDB inlines CTE
    * references), which measured ~10-40x the total oracle cost at
    * sf0.01 (r15: q_t_unigram_encode 172 s → seconds). */
  private[graft] def viterbiCtes(t: Int, prev: Int, maxPieceLen: Int): String =
    s"""e$t AS (SELECT x.w, x.j, x.i, p.score_micro AS score
       |  FROM (SELECT s.w AS w, CAST(j.j AS BIGINT) AS j,
       |          CAST(j.j + l.l AS BIGINT) AS i,
       |          substr(s.w, CAST(j.j AS INT) + 1, CAST(l.l AS INT)) AS piece
       |        FROM w0 s,
       |          LATERAL (SELECT unnest(range(1,
       |            least($maxPieceLen, len(s.w)) + 1)) AS l) l,
       |          LATERAL (SELECT unnest(range(len(s.w) - l.l + 1)) AS j) j
       |       ) x
       |  JOIN ps$prev p ON p.piece = x.piece),
       |el$t AS (SELECT w,
       |    list(struct_pack(j := j, i := i, s := score)) AS edges
       |  FROM e$t GROUP BY w),
       |v$t AS (
       |  SELECT w0.w AS w, 0 AS i, [CAST(0 AS BIGINT)] AS best,
       |         [CAST(0 AS BIGINT)] AS bp, el.edges AS edges
       |  FROM w0 JOIN el$t el ON el.w = w0.w
       |  UNION ALL
       |  SELECT v.w, v.i + 1 AS i,
       |    list_append(v.best, mx.t) AS best,
       |    list_append(v.bp, mx.j) AS bp,
       |    v.edges AS edges
       |  FROM v$t v,
       |  LATERAL (SELECT list_filter(v.edges,
       |      e -> e.i = v.i + 1) AS cands) c0,
       |  LATERAL (SELECT list_max(list_transform(c0.cands,
       |      e -> v.best[CAST(e.j AS INT) + 1] + e.s)) AS t) c1,
       |  LATERAL (SELECT c1.t AS t, list_min(list_transform(
       |      list_filter(c0.cands,
       |        e -> v.best[CAST(e.j AS INT) + 1] + e.s = c1.t),
       |      e -> e.j)) AS j) mx
       |  WHERE v.i < len(v.w)),
       |vf$t AS (SELECT w, best, bp FROM v$t WHERE i = len(w)),
       |b$t AS (
       |  SELECT w, CAST(len(w) AS BIGINT) AS pos, bp,
       |         CAST([] AS VARCHAR[]) AS pieces
       |  FROM vf$t
       |  UNION ALL
       |  SELECT w, bp[CAST(pos AS INT) + 1] AS pos, bp,
       |    list_append(pieces, substr(w,
       |      CAST(bp[CAST(pos AS INT) + 1] AS INT) + 1,
       |      CAST(pos AS INT) - CAST(bp[CAST(pos AS INT) + 1] AS INT)))
       |  FROM b$t WHERE pos > 0),
       |seg$t AS (SELECT w, pieces FROM b$t WHERE pos = 0)""".stripMargin

  /** The learn chain's SEED prefix — word freqs (w0), seed counts
    * (sc0), seed piece table (ps0). private[graft]: [[UnigramPrune]]'s
    * oracle prunes directly off the seed model. */
  private[graft] def seedCtes(maxPieceLen: Int, vocabExtra: Int): String =
    s"""w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
       |          x -> x <> '')) AS w FROM documents)
       |  GROUP BY w),
       |sc0 AS (SELECT substr(s.w, CAST(j.j AS INT) + 1, CAST(l.l AS INT))
       |      AS piece,
       |    CAST(SUM(s.freq) AS BIGINT) AS cnt
       |  FROM w0 s,
       |    LATERAL (SELECT unnest(range(1,
       |      least($maxPieceLen, len(s.w)) + 1)) AS l) l,
       |    LATERAL (SELECT unnest(range(len(s.w) - l.l + 1)) AS j) j
       |  GROUP BY 1),
       |${pruneScoreCtes(0, "sc0", vocabExtra)}""".stripMargin

  private def learnCtes(maxPieceLen: Int, vocabExtra: Int,
      iters: Int): String = {
    val iterBlocks = (1 to iters).map { t =>
      s"""${viterbiCtes(t, t - 1, maxPieceLen)},
         |c$t AS (SELECT u.piece, CAST(SUM(w0.freq) AS BIGINT) AS cnt
         |  FROM (SELECT w, unnest(pieces) AS piece FROM seg$t) u
         |  JOIN w0 ON u.w = w0.w GROUP BY 1),
         |cf$t AS (SELECT p.piece, COALESCE(c$t.cnt, CAST(0 AS BIGINT))
         |    AS cnt
         |  FROM (SELECT piece FROM ps${t - 1}) p
         |  LEFT JOIN c$t ON p.piece = c$t.piece),
         |${pruneScoreCtes(t, s"cf$t", vocabExtra)}""".stripMargin
    }.mkString(",\n")
    s"""${seedCtes(maxPieceLen, vocabExtra)},
       |$iterBlocks""".stripMargin
  }

  private[text] def oracleSql(maxPieceLen: Int, vocabExtra: Int,
      iters: Int): String =
    s"""WITH RECURSIVE ${learnCtes(maxPieceLen, vocabExtra, iters)}
       |SELECT piece, cnt, score_micro FROM ps$iters
       |ORDER BY piece""".stripMargin

  private[text] def encodeOracleSql(maxPieceLen: Int, vocabExtra: Int,
      iters: Int): String = {
    val enc = iters + 1
    s"""WITH RECURSIVE ${learnCtes(maxPieceLen, vocabExtra, iters)},
       |${viterbiCtes(enc, iters, maxPieceLen)},
       |encw AS (SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest(list_filter(
       |          string_split(text, ' '), x -> x <> '')) AS w
       |        FROM documents)),
       |nsg AS (SELECT w, CAST(len(pieces) AS BIGINT) AS n_pieces
       |  FROM seg$enc)
       |SELECT e.doc_id AS doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(s.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(len(e.w)) AS BIGINT) AS n_chars
       |FROM encw e JOIN nsg s ON e.w = s.w
       |GROUP BY e.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** The learn+encode CTE prefix ending in `enc(doc_id, n_tokens)` —
    * the composition surface for downstream oracles
    * ([[graft.pipeline.TokenizerPipeline]]'s unigram leg). The caller
    * must open with `WITH RECURSIVE` (the Viterbi CTEs recurse). */
  private[graft] def encodePrefixCtes(maxPieceLen: Int, vocabExtra: Int,
      iters: Int): String = {
    val enc = iters + 1
    s"""${learnCtes(maxPieceLen, vocabExtra, iters)},
       |${viterbiCtes(enc, iters, maxPieceLen)},
       |encw AS (SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest(list_filter(
       |          string_split(text, ' '), x -> x <> '')) AS w
       |        FROM documents)),
       |nsg AS (SELECT w, CAST(len(pieces) AS BIGINT) AS n_pieces
       |  FROM seg$enc),
       |enc AS (SELECT e.doc_id,
       |    CAST(SUM(s.n_pieces) AS BIGINT) AS n_tokens
       |  FROM encw e JOIN nsg s ON e.w = s.w
       |  GROUP BY e.doc_id)""".stripMargin
  }

  /** q_t_unigram_lm: the learned piece table after 2 hard-EM
    * iterations (maxPieceLen 4, top-60 multi-char pieces). */
  private val tUnigram = Q(
    (s, d) => learn(Tables.documents(s, d), "text").orderBy("piece"),
    Some(oracleSql(4, 60, 2)))

  /** q_t_unigram_encode: per-doc Viterbi piece counts under the
    * learned model — the encode half of the lifecycle. */
  private val tUnigramEncode = Q(
    (s, d) => encodeCorpus(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some(encodeOracleSql(4, 60, 2)))

  val queries: Map[String, Q] = Map(
    "q_t_unigram_lm" -> tUnigram,
    "q_t_unigram_encode" -> tUnigramEncode)
}
