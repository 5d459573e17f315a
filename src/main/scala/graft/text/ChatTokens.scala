package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TOKEN-level loss-mask spans — [[ChatPrep]] composed with the
  * unigram tokenizer ([[UnigramLm]]): the chat template's char offsets
  * (q_t_chat_render) are what a renderer needs, but a data loader
  * masks TOKENS, so the certified span must survive the tokenizer.
  * This operator carries each turn through template → tokenizer →
  * mask in one table: per turn, its exact token extent inside the
  * tokenized conversation and, for assistant turns, the
  * (mask_start_tok, mask_end_tok) half-open span the loss covers.
  *
  * Pinned token layout (replayed verbatim by the oracle, the
  * convention every open SFT stack implements):
  *   - template tags are SPECIAL TOKENS — atomic, never segmented:
  *     each turn costs 1 header token + its text tokens + 1 end token;
  *   - a turn's text tokens are its words segmented under the
  *     corpus-learned unigram model — the IDENTICAL Viterbi
  *     segmentation as [[UnigramLm.encodeCorpus]] (spec-pinned: per-doc
  *     Σ n_text_tokens equals the batch encode's n_pieces);
  *   - the assistant mask covers the turn's text tokens plus its end
  *     token, never the header — the token twin of the char mask
  *     (text + trailer) in [[ChatPrep.chatTurns]].
  *
  * Scale shape: the model learn + vocab segmentation is the
  * [[UnigramLm.learnState]] discipline (corpus aggregated once, every
  * EM iteration vocab-sized); the conversation pass touches the corpus
  * exactly once — posexplode to (doc, pos, word), ONE word-key
  * equi-join against the segmented vocabulary, one (doc, turn) keyed
  * aggregation, and the running token offsets are a per-doc array fold
  * over the doc's OWN turn list (conversations are bounded, corpora
  * are not — NO window over the corpus, the ChatPrep discipline). */
object ChatTokens {

  /** Per-turn token spans: (idCol, turn_idx, role, turn_words,
    * n_text_tokens, turn_tokens, tok_start, tok_end, mask_start_tok,
    * mask_end_tok) — mask bounds null on user turns; a document with
    * no words emits no turns. */
  def chatTokenSpans(docs: DataFrame, idCol: String, textCol: String,
      wordsPerTurn: Int = 8, maxPieceLen: Int = 4, vocabExtra: Int = 60,
      iters: Int = 2): DataFrame = {
    require(wordsPerTurn >= 1, "wordsPerTurn >= 1")
    val st = UnigramLm.learnState(docs, textCol,
      maxPieceLen, vocabExtra, iters)
    val segged = st.words.select(col("w"),
      size(graft.functions.ViterbiSegment.viterbiPieces(col("w"),
        st.scores, maxPieceLen)).cast("long").as("__np"))
    val posWords = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "w")))
    val perTurn = posWords.join(segged, Seq("w"))
      .groupBy(col(idCol), expr(s"__pos div $wordsPerTurn").as("turn_idx"))
      .agg(count(lit(1)).as("turn_words"),
        sum("__np").as("n_text_tokens"))
    // running offsets WITHOUT a window: collect the doc's own (bounded)
    // turn list, slice-sum it per turn — the ChatPrep render_start fold
    val folded = perTurn.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("turn_idx"),
        col("turn_words"), col("n_text_tokens")))).as("__ts"))
      .select(col(idCol), explode(transform(col("__ts"), (t, i) => struct(
        t.getField("turn_idx").as("turn_idx"),
        t.getField("turn_words").as("turn_words"),
        t.getField("n_text_tokens").as("n_text_tokens"),
        aggregate(slice(col("__ts"), lit(1), i), lit(0L),
          (a, x) => a + x.getField("n_text_tokens") + 2L).as("tok_start"))))
        .as("__t"))
    val out = folded.select(col(idCol),
      col("__t.turn_idx").as("turn_idx"),
      when(col("__t.turn_idx") % 2 === 0, lit("user"))
        .otherwise(lit("assistant")).as("role"),
      col("__t.turn_words").as("turn_words"),
      col("__t.n_text_tokens").as("n_text_tokens"),
      (col("__t.n_text_tokens") + 2L).as("turn_tokens"),
      col("__t.tok_start").as("tok_start"))
      .withColumn("tok_end", col("tok_start") + col("turn_tokens"))
      .withColumn("mask_start_tok",
        when(col("role") === "assistant", col("tok_start") + 1L))
      .withColumn("mask_end_tok",
        when(col("role") === "assistant", col("tok_end")))
      .localCheckpoint(eager = true)
    st.release()
    out
  }

  /** q_t_chat_tokens: the token-span table over documents at
    * 8 words/turn under the registered unigram model (maxPieceLen 4,
    * top-60 multi-char pieces, 2 EM iterations) — every offset and
    * assistant mask span hash-pinned against the full learn + segment
    * + template replay in DuckDB. */
  /** The oracle prefix ending in `ct(doc_id, turn_idx, turn_words,
    * n_text_tokens)` — the unigram learn chain plus the per-turn
    * chat-token sums. private[graft]: the SFT batch-plan capstone
    * composes conversation totals on top of it. The caller must open
    * with WITH RECURSIVE. */
  private[graft] def chatCtes(maxPieceLen: Int, vocabExtra: Int,
      iters: Int, wordsPerTurn: Int): String =
    s"""${UnigramLm.encodePrefixCtes(maxPieceLen, vocabExtra, iters)},
      cwrd AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      cw AS (SELECT doc_id, CAST(i.i AS BIGINT) AS pos,
          ws[CAST(i.i AS INT) + 1] AS wd
        FROM cwrd, LATERAL (SELECT unnest(range(len(ws))) AS i) i),
      ct AS (SELECT cw.doc_id, cw.pos // $wordsPerTurn AS turn_idx,
          CAST(COUNT(*) AS BIGINT) AS turn_words,
          CAST(SUM(nsg.n_pieces) AS BIGINT) AS n_text_tokens
        FROM cw JOIN nsg ON cw.wd = nsg.w GROUP BY 1, 2)"""

  private val tChatTokens = Q(
    (s, d) => chatTokenSpans(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id", "turn_idx"),
    Some(s"""WITH RECURSIVE ${chatCtes(4, 60, 2, 8)},
      co AS (SELECT doc_id, turn_idx, turn_words, n_text_tokens,
          n_text_tokens + 2 AS turn_tokens,
          CAST(COALESCE(SUM(n_text_tokens + 2) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_start
        FROM ct)
      SELECT doc_id, turn_idx,
        CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        turn_words, n_text_tokens,
        CAST(turn_tokens AS BIGINT) AS turn_tokens, tok_start,
        CAST(tok_start + turn_tokens AS BIGINT) AS tok_end,
        CASE WHEN turn_idx % 2 = 1
          THEN CAST(tok_start + 1 AS BIGINT) END AS mask_start_tok,
        CASE WHEN turn_idx % 2 = 1
          THEN CAST(tok_start + turn_tokens AS BIGINT) END AS mask_end_tok
      FROM co ORDER BY doc_id, turn_idx"""))

  val queries: Map[String, Q] = Map("q_t_chat_tokens" -> tChatTokens)
}
