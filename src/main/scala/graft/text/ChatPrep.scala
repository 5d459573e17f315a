package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT / chat-format data preparation — the supervised-fine-tuning
  * twin of the pretraining objectives ([[Objectives]]): documents
  * become multi-turn conversations, conversations render under a
  * pinned chat template, and each assistant turn yields the exact
  * character span the loss mask covers (instruction tuning trains on
  * responses only — Ouyang et al. 2022 "InstructGPT"; the masked-turn
  * convention every open SFT stack implements).
  *
  * Pinned template (replayed verbatim by the oracle):
  *   each turn renders as "<|" + role + "|>\n" + text + "\n<|end|>\n"
  *   — header 9 chars for user, 14 for assistant; trailer 9 chars;
  *   roles alternate user/assistant from user; the loss mask of an
  *   assistant turn covers its TEXT plus the trailer (the model must
  *   learn to emit the end-of-turn tag), never the header.
  *
  * Scale shape: turn splitting, per-turn char accounting, and the
  * running render offsets are ALL computed with array higher-order
  * functions on the document's own row — a per-doc fold in the scan
  * stage, NO window function, NO keyed shuffle (the offsets a window
  * over (doc, turn) would need are a slice-sum over the doc's own
  * turns array — conversations are bounded, corpora are not). The
  * only exchange in the registered plan is the output sort
  * (audit-pinned). */
object ChatPrep {

  /** Split each document into consecutive `wordsPerTurn`-word turns
    * with alternating roles and compute the pinned template's exact
    * offsets. One row per turn: (idCol, turn_idx, role, turn_words,
    * turn_chars, render_start, render_end, mask_start, mask_end) —
    * mask bounds are null on user turns. A document with no words
    * emits no turns. */
  def chatTurns(docs: DataFrame, idCol: String, textCol: String,
      wordsPerTurn: Int = 8): DataFrame = {
    require(wordsPerTurn >= 1, "wordsPerTurn >= 1")
    val W = wordsPerTurn.toLong
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__wl", transform(col("__w"), w => length(w).cast("long")))
      .withColumn("__nt", expr(s"(__n + ${W - 1}) div $W"))
      .withColumn("__ts", sequence(lit(0L), col("__nt") - 1))
      // turn chars = Σ word lengths in the turn + (k−1) joining spaces
      .withColumn("__tch", transform(col("__ts"), t => {
        val tw = least(lit(W), col("__n") - t * W)
        aggregate(slice(col("__wl"), (t * W + 1).cast("int"), tw.cast("int")),
          lit(0L), (a, x) => a + x) + (tw - 1)
      }))
      .withColumn("__rlen", transform(col("__ts"), t =>
        when(t % 2 === 0, lit(9L)).otherwise(lit(14L)) +
          element_at(col("__tch"), (t + 1).cast("int")) + lit(9L)))
    val turns = base.withColumn("__turn",
      explode(transform(col("__ts"), t => struct(
        t.as("turn_idx"),
        when(t % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        least(lit(W), col("__n") - t * W).as("turn_words"),
        element_at(col("__tch"), (t + 1).cast("int")).as("turn_chars"),
        // running offset = slice-sum of the doc's OWN render lengths —
        // the per-doc fold that replaces a window over (doc, turn)
        aggregate(slice(col("__rlen"), lit(1), t.cast("int")), lit(0L),
          (a, x) => a + x).as("render_start")))))
    turns.select(
      col(idCol),
      col("__turn.turn_idx").as("turn_idx"),
      col("__turn.role").as("role"),
      col("__turn.turn_words").as("turn_words"),
      col("__turn.turn_chars").as("turn_chars"),
      col("__turn.render_start").as("render_start"),
      (col("__turn.render_start") +
        element_at(col("__rlen"), (col("__turn.turn_idx") + 1).cast("int")))
        .as("render_end"))
      .withColumn("mask_start",
        when(col("role") === "assistant", col("render_start") + 14L))
      .withColumn("mask_end",
        when(col("role") === "assistant", col("render_end")))
  }

  /** The full rendered conversation per document under the same
    * template — (idCol, rendered). Kept separate from [[chatTurns]] so
    * the offsets query stays integer-only; the spec certifies that
    * substring(rendered, mask_start, mask_end) is exactly the turn
    * text plus the trailer. */
  def renderConversations(docs: DataFrame, idCol: String, textCol: String,
      wordsPerTurn: Int = 8): DataFrame = {
    require(wordsPerTurn >= 1, "wordsPerTurn >= 1")
    val W = wordsPerTurn.toLong
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__nt", expr(s"(__n + ${W - 1}) div $W"))
      .select(col(idCol),
        array_join(transform(sequence(lit(0L), col("__nt") - 1), t =>
          concat(
            when(t % 2 === 0, lit("<|user|>\n")).otherwise(lit("<|assistant|>\n")),
            array_join(slice(col("__w"), (t * W + 1).cast("int"),
              least(lit(W), col("__n") - t * W).cast("int")), " "),
            lit("\n<|end|>\n"))), "").as("rendered"))
  }

  /** Structural validation for an ARBITRARY per-turn frame (not just
    * [[chatTurns]] output — imported SFT corpora arrive pre-turned):
    * one row per conversation with counts of each violation class —
    * unknown roles, parity breaks (role ≠ the alternation its index
    * demands), empty turns, oversize turns, and non-contiguous turn
    * indexes. A conversation passes iff every count is zero. */
  def validateAlternation(turns: DataFrame, idCol: String,
      maxTurnWords: Long = 1000L): DataFrame = {
    val roleOk = col("role").isin("user", "assistant")
    val parityOk = (col("turn_idx") % 2 === 0 && col("role") === "user") ||
      (col("turn_idx") % 2 === 1 && col("role") === "assistant")
    turns.groupBy(idCol)
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(!roleOk, 1L).otherwise(0L)).as("bad_role"),
        sum(when(roleOk && !parityOk, 1L).otherwise(0L)).as("parity_breaks"),
        sum(when(col("turn_words") <= 0, 1L).otherwise(0L)).as("empty_turns"),
        sum(when(col("turn_words") > maxTurnWords, 1L).otherwise(0L))
          .as("oversize_turns"),
        (max("turn_idx") - count(lit(1)) + 1).as("index_gap"))
      .withColumn("valid",
        col("bad_role") === 0 && col("parity_breaks") === 0 &&
          col("empty_turns") === 0 && col("oversize_turns") === 0 &&
          col("index_gap") === 0)
  }

  /** q_t_chat_render: the per-turn template-offset table over
    * documents at 8 words/turn — every offset, char count, and
    * assistant mask span hash-pinned. */
  private val tChatRender = Q(
    (s, d) => chatTurns(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id", "turn_idx"),
    Some("""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents),
            t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n, ws,
                CAST(tt.t AS BIGINT) AS turn_idx
              FROM w, LATERAL (SELECT unnest(range((len(ws) + 7) // 8))
                AS t) tt
              WHERE len(ws) > 0),
            d AS (SELECT doc_id, turn_idx,
                CASE WHEN turn_idx % 2 = 0 THEN 'user'
                     ELSE 'assistant' END AS role,
                LEAST(8, n - turn_idx * 8) AS turn_words,
                COALESCE(list_aggregate(list_transform(
                    ws[CAST(turn_idx * 8 AS INT) + 1 :
                       CAST(LEAST(turn_idx * 8 + 8, n) AS INT)],
                    x -> CAST(length(x) AS BIGINT)), 'sum'), 0)
                  + LEAST(8, n - turn_idx * 8) - 1 AS turn_chars
              FROM t),
            r AS (SELECT doc_id, turn_idx, role, turn_words, turn_chars,
                (CASE WHEN turn_idx % 2 = 0 THEN 9 ELSE 14 END)
                  + turn_chars + 9 AS rlen
              FROM d),
            o AS (SELECT *, CAST(COALESCE(SUM(rlen) OVER (
                  PARTITION BY doc_id ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS render_start
              FROM r)
            SELECT doc_id, turn_idx, role,
              CAST(turn_words AS BIGINT) AS turn_words,
              CAST(turn_chars AS BIGINT) AS turn_chars,
              render_start,
              CAST(render_start + rlen AS BIGINT) AS render_end,
              CASE WHEN role = 'assistant'
                THEN CAST(render_start + 14 AS BIGINT) END AS mask_start,
              CASE WHEN role = 'assistant'
                THEN CAST(render_start + rlen AS BIGINT) END AS mask_end
            FROM o ORDER BY doc_id, turn_idx"""))

  val queries: Map[String, Q] = Map("q_t_chat_render" -> tChatRender)
}
