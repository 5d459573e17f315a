package graft.text

import graft.{Q, Tables}
import graft.etl.DataMix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-objective construction — the step between a curated corpus
  * and model batches, where the pretraining objective decides what
  * each document contributes as input vs target:
  *
  *  - SPAN CORRUPTION (Raffel et al., JMLR 2020 §3.1.4 "T5"; the UL2
  *    R-denoiser, Tay et al. 2022): mask contiguous word spans, feed
  *    the rest to the encoder, train the decoder to emit the masked
  *    spans behind sentinels. The report computes each document's
  *    exact encoder/decoder token budgets under the objective —
  *    what a batch planner packs on.
  *  - FILL-IN-THE-MIDDLE (Bavarian et al. 2022, "Efficient Training
  *    of Language Models to Fill in the Middle"): split a document
  *    into (prefix, middle, suffix), render PSM order
  *    prefix→suffix→middle behind sentinels, train autoregressively.
  *    The report pins the cut points and the exact char offsets of
  *    the middle span inside the rendered sequence — the loss-mask
  *    arithmetic a data loader needs.
  *
  * Both are DETERMINISTIC under the corpus PRNG convention
  * ([[graft.etl.DataMix.hash32]]: first 32 md5 bits of a seeded key as
  * a BIGINT) — no RNG state, reproducible under any partitioning, and
  * the DuckDB oracle replays the identical draws.
  *
  * Scale shape: both operators are PURE MAP-SIDE — every decision
  * (span starts, cut points) and every count (masked words, segment
  * chars) is computed with array higher-order functions on the
  * document's own row; nothing joins, nothing shuffles, the whole
  * report composes into the parquet scan stage (audit-pinned). At
  * 100 TB the cost is one corpus pass, embarrassingly parallel. */
object Objectives {

  private def h32(parts: Column*): Column = DataMix.hash32(concat(parts: _*))

  /** Per-document span-corruption budget report. Pinned semantics
    * (replayed verbatim by the oracle):
    *   - word positions i ∈ [0, n); a span STARTS at i iff
    *     hash32(id:":" :i) mod `startEvery` = 0 (default 1-in-20 ≈ 5%
    *     of positions, the T5 15% corruption rate at mean span 3);
    *   - a started span masks positions [i, i+spanLen) clipped at n;
    *     overlapping spans merge (a position is masked iff ANY start
    *     falls in its trailing window);
    *   - sentinel spans = maximal masked runs; encoder input =
    *     unmasked words + one sentinel per run; decoder target =
    *     masked words + one sentinel per run.
    * Output: (doc_id, n_words, n_starts, n_masked, n_spans,
    * enc_tokens, tgt_tokens, mask_share_micro) — pure integers, the
    * share in floor-micro. A document with no words emits NO row (the
    * [[cropPairReport]] convention, and what the oracle's LATERAL
    * unnest does implicitly — spec-pinned so the two engines agree on
    * empty docs, not just on fixtures that lack them). */
  def spanCorruptionReport(docs: DataFrame, idCol: String, textCol: String,
      startEvery: Int = 20, spanLen: Int = 3): DataFrame = {
    require(startEvery >= 1, "startEvery is a 1-in-k rate, k >= 1")
    require(spanLen >= 1, "spanLen >= 1")
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__pos", sequence(lit(0L), col("__n") - 1))
      .withColumn("__flag", transform(col("__pos"), i =>
        (h32(col(idCol).cast("string"), lit(":"), i.cast("string"))
          % startEvery) === 0))
      // masked(i) ⇔ a start exists in [max(0, i−spanLen+1), i]
      .withColumn("__masked", transform(col("__pos"), i =>
        exists(sequence(greatest(i - (spanLen - 1), lit(0L)), i),
          j => element_at(col("__flag"), (j + 1).cast("int")))))
    base.select(
      col(idCol),
      col("__n").as("n_words"),
      size(filter(col("__flag"), x => x)).cast("long").as("n_starts"),
      size(filter(col("__masked"), x => x)).cast("long").as("n_masked"),
      // a maximal run begins where masked(i) and not masked(i−1); the
      // i−1 probe clamps to index 1 so ANSI element_at never sees 0
      // (the i === 0 disjunct decides that row regardless)
      size(filter(col("__pos"), i =>
        element_at(col("__masked"), (i + 1).cast("int")) &&
          (i === 0 ||
            !element_at(col("__masked"), greatest(i, lit(1L)).cast("int")))))
        .cast("long").as("n_spans"))
      .withColumn("enc_tokens", col("n_words") - col("n_masked") + col("n_spans"))
      .withColumn("tgt_tokens", col("n_masked") + col("n_spans"))
      .withColumn("mask_share_micro",
        when(col("n_words") > 0,
          expr("n_masked * 1000000L div n_words")).otherwise(lit(0L)))
  }

  /** Per-document fill-in-the-middle split report. Pinned semantics
    * (replayed verbatim by the oracle):
    *   - a document is FIM-transformed iff hash32(id:":fa") is even
    *     (the paper's 50% FIM rate); otherwise it stays autoregressive
    *     (prefix = whole doc, middle = suffix = empty);
    *   - cut points c1 = hash32(id:":f1") mod (n+1) and
    *     c2 = hash32(id:":f2") mod (n+1); lo = min, hi = max; prefix =
    *     words [0, lo), middle = [lo, hi), suffix = [hi, n);
    *   - PSM render = "<|fim_pre|>" + prefix + "<|fim_suf|>" + suffix
    *     + "<|fim_mid|>" + middle (each segment its words joined by
    *     single spaces; sentinels 11 chars each);
    *   - (mid_start, mid_end) are the middle segment's char offsets in
    *     the render — the loss-mask span (FIM trains on the middle).
    * Char counts are exact: Σ word lengths + (k−1) joining spaces. */
  def fimSplitReport(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val segChars = (wl: Column, a: Column, b: Column) =>
      aggregate(slice(wl, (a + 1).cast("int"), (b - a).cast("int")),
        lit(0L), (acc, x) => acc + x) +
        greatest(b - a - 1, lit(0L))
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("__wl", transform(col("__w"), w => length(w).cast("long")))
      .withColumn("fim_applied",
        h32(col(idCol).cast("string"), lit(":fa")) % 2 === 0)
      .withColumn("__c1",
        h32(col(idCol).cast("string"), lit(":f1")) % (col("__n") + 1))
      .withColumn("__c2",
        h32(col(idCol).cast("string"), lit(":f2")) % (col("__n") + 1))
      .withColumn("__lo",
        when(col("fim_applied"), least(col("__c1"), col("__c2")))
          .otherwise(col("__n")))
      .withColumn("__hi",
        when(col("fim_applied"), greatest(col("__c1"), col("__c2")))
          .otherwise(col("__n")))
      .withColumn("pre_chars", segChars(col("__wl"), lit(0L), col("__lo")))
      .withColumn("mid_chars", segChars(col("__wl"), col("__lo"), col("__hi")))
      .withColumn("suf_chars", segChars(col("__wl"), col("__hi"), col("__n")))
    base.select(
      col(idCol),
      col("__n").as("n_words"),
      col("fim_applied"),
      col("__lo").as("pre_words"),
      (col("__hi") - col("__lo")).as("mid_words"),
      (col("__n") - col("__hi")).as("suf_words"),
      col("pre_chars"), col("mid_chars"), col("suf_chars"))
      .withColumn("psm_chars",
        lit(33L) + col("pre_chars") + col("suf_chars") + col("mid_chars"))
      .withColumn("mid_start",
        lit(33L) + col("pre_chars") + col("suf_chars"))
      .withColumn("mid_end", col("mid_start") + col("mid_chars"))
  }

  /** Per-document contrastive crop-pair report (Izacard et al. 2022
    * "Contriever": independent random crops of one document are the
    * positive pair for contrastive retrieval pretraining). Pinned
    * semantics (replayed verbatim by the oracle):
    *   - crop length L = max(1, n div 2) words;
    *   - starts a = hash32(id:":ca") mod (n−L+1),
    *     b = hash32(id:":cb") mod (n−L+1);
    *   - overlap = max(0, min(a,b)+L − max(a,b)); Jaccard of the two
    *     word-index sets in floor-micro (|∩|·10⁶ div |∪|,
    *     |∪| = 2L − |∩|);
    *   - `usable` iff 0 < overlap < L — identical crops teach nothing
    *     and disjoint crops are not reliable positives (the curation
    *     gate a contrastive pair generator applies).
    * Pure map-side, one corpus pass. */
  def cropPairReport(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("crop_len", greatest(lit(1L), expr("__n div 2")))
      .withColumn("__m", col("__n") - col("crop_len") + 1)
      .withColumn("a_start",
        h32(col(idCol).cast("string"), lit(":ca")) % col("__m"))
      .withColumn("b_start",
        h32(col(idCol).cast("string"), lit(":cb")) % col("__m"))
      .withColumn("overlap",
        greatest(lit(0L), least(col("a_start"), col("b_start"))
          + col("crop_len") - greatest(col("a_start"), col("b_start"))))
    base.select(col(idCol), col("__n").as("n_words"), col("crop_len"),
      col("a_start"), col("b_start"), col("overlap"))
      .withColumn("jaccard_micro",
        expr("overlap * 1000000L div (2 * crop_len - overlap)"))
      .withColumn("usable",
        col("overlap") > 0 && col("overlap") < col("crop_len"))
  }

  private def hashSql(key: String): String =
    DataMix.hash32SqlExpr(key)

  /** q_t_span_corruption: the T5/UL2 budget report over documents at
    * the pinned 1-in-20 start rate, span length 3. */
  private val tSpanCorruption = Q(
    (s, d) => spanCorruptionReport(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents),
            p AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
                CAST(i.i AS BIGINT) AS i,
                CASE WHEN ${hashSql(
      "CAST(doc_id AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)")}
                  % 20 = 0 THEN 1 ELSE 0 END AS flag
              FROM w, LATERAL (SELECT unnest(range(len(ws))) AS i) i),
            m AS (SELECT doc_id, n, i, flag,
                MAX(flag) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS masked
              FROM p),
            s AS (SELECT doc_id, n, i, flag, masked,
                CASE WHEN masked = 1 AND COALESCE(LAG(masked)
                    OVER (PARTITION BY doc_id ORDER BY i), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
              FROM m)
            SELECT doc_id,
              MIN(n) AS n_words,
              CAST(SUM(flag) AS BIGINT) AS n_starts,
              CAST(SUM(masked) AS BIGINT) AS n_masked,
              CAST(SUM(span_start) AS BIGINT) AS n_spans,
              CAST(MIN(n) - SUM(masked) + SUM(span_start) AS BIGINT)
                AS enc_tokens,
              CAST(SUM(masked) + SUM(span_start) AS BIGINT) AS tgt_tokens,
              CAST(SUM(masked) * 1000000 // MIN(n) AS BIGINT)
                AS mask_share_micro
            FROM s GROUP BY doc_id
            ORDER BY doc_id"""))

  /** q_t_fim_split: the FIM split + PSM offsets report at the pinned
    * 50% transform rate. */
  private val tFimSplit = Q(
    (s, d) => fimSplitReport(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents),
            base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
                list_transform(ws, x -> CAST(length(x) AS BIGINT)) AS wl,
                ${hashSql("CAST(doc_id AS VARCHAR) || ':fa'")} % 2 = 0
                  AS fim_applied,
                ${hashSql("CAST(doc_id AS VARCHAR) || ':f1'")}
                  % (CAST(len(ws) AS BIGINT) + 1) AS c1,
                ${hashSql("CAST(doc_id AS VARCHAR) || ':f2'")}
                  % (CAST(len(ws) AS BIGINT) + 1) AS c2
              FROM w),
            cuts AS (SELECT doc_id, n, wl, fim_applied,
                CASE WHEN fim_applied THEN LEAST(c1, c2) ELSE n END AS lo,
                CASE WHEN fim_applied THEN GREATEST(c1, c2) ELSE n END AS hi
              FROM base),
            segs AS (SELECT doc_id, n, fim_applied, lo, hi,
                COALESCE(list_aggregate(wl[1 : CAST(lo AS INT)], 'sum'), 0)
                  + GREATEST(lo - 1, 0) AS pre_chars,
                COALESCE(list_aggregate(
                    wl[CAST(lo AS INT) + 1 : CAST(hi AS INT)], 'sum'), 0)
                  + GREATEST(hi - lo - 1, 0) AS mid_chars,
                COALESCE(list_aggregate(
                    wl[CAST(hi AS INT) + 1 : CAST(n AS INT)], 'sum'), 0)
                  + GREATEST(n - hi - 1, 0) AS suf_chars
              FROM cuts)
            SELECT doc_id, n AS n_words, fim_applied,
              lo AS pre_words, hi - lo AS mid_words, n - hi AS suf_words,
              CAST(pre_chars AS BIGINT) AS pre_chars,
              CAST(mid_chars AS BIGINT) AS mid_chars,
              CAST(suf_chars AS BIGINT) AS suf_chars,
              CAST(33 + pre_chars + suf_chars + mid_chars AS BIGINT)
                AS psm_chars,
              CAST(33 + pre_chars + suf_chars AS BIGINT) AS mid_start,
              CAST(33 + pre_chars + suf_chars + mid_chars AS BIGINT)
                AS mid_end
            FROM segs ORDER BY doc_id"""))

  /** q_t_crop_pairs: the contrastive positive-pair table over
    * documents — half-doc crops, overlap Jaccard, usability gate. */
  private val tCropPairs = Q(
    (s, d) => cropPairReport(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some(s"""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents),
            base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
                GREATEST(1, CAST(len(ws) AS BIGINT) // 2) AS crop_len
              FROM w WHERE len(ws) > 0),
            cuts AS (SELECT doc_id, n, crop_len,
                ${hashSql("CAST(doc_id AS VARCHAR) || ':ca'")}
                  % (n - crop_len + 1) AS a_start,
                ${hashSql("CAST(doc_id AS VARCHAR) || ':cb'")}
                  % (n - crop_len + 1) AS b_start
              FROM base),
            ov AS (SELECT doc_id, n, crop_len, a_start, b_start,
                GREATEST(0, LEAST(a_start, b_start) + crop_len
                  - GREATEST(a_start, b_start)) AS overlap
              FROM cuts)
            SELECT doc_id, n AS n_words, crop_len, a_start, b_start,
              overlap,
              CAST(overlap * 1000000 // (2 * crop_len - overlap)
                AS BIGINT) AS jaccard_micro,
              overlap > 0 AND overlap < crop_len AS usable
            FROM ov ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_t_span_corruption" -> tSpanCorruption,
    "q_t_fim_split" -> tFimSplit,
    "q_t_crop_pairs" -> tCropPairs)
}
