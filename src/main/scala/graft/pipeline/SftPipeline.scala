package graft.pipeline

import graft.{Q, Tables}
import graft.text.{BestFitPack, ChatTokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SFT-side capstone: template → tokenizer → batch plan in one
  * registered path. Documents render as chat conversations under the
  * pinned template, each turn is costed by the corpus-learned unigram
  * tokenizer (1 header special + text pieces + 1 end special — the
  * [[ChatTokens]] layout whose mask spans a loader consumes), and the
  * CONVERSATION token totals drive best-fit batch planning
  * ([[BestFitPack.packBestFitAssign]]): SFT examples are atomic, so
  * the packer's no-split residual path is exactly what an SFT batch
  * builder wants — a conversation is only ever chunked when it alone
  * exceeds the sequence budget.
  *
  * Scale: the composition adds nothing beyond its stages' own
  * shuffles — the vocab-bounded unigram learn, one corpus explode +
  * word-key equi-join + (doc, turn) agg (chat tokens), one doc-keyed
  * agg (conversation totals), and the two prefix-sum passes + the
  * config-sized broadcast segment attach (assignment). Registering it
  * (q_pipeline_sft) certifies the stage boundary: the (id, n_tokens)
  * surface the chat costing emits is the one the batch planner
  * consumes. */
object SftPipeline {

  /** One row per conversation segment: (idCol, seg_idx, bin,
    * seg_tokens) — the SFT batch manifest. */
  def sftBatchPlan(docs: DataFrame, idCol: String, textCol: String,
      wordsPerTurn: Int = 8, budget: Long = 256L, maxPieceLen: Int = 4,
      vocabExtra: Int = 60, iters: Int = 2): DataFrame = {
    val spans = ChatTokens.chatTokenSpans(docs, idCol, textCol,
      wordsPerTurn, maxPieceLen, vocabExtra, iters)
    val totals = spans.groupBy(idCol)
      .agg(sum("turn_tokens").as("n_tokens"))
    BestFitPack.packBestFitAssign(totals, idCol, budget)
  }

  /** q_pipeline_sft: the batch manifest over documents — 8 words/turn,
    * the registered unigram model, 256-token sequences; the oracle
    * replays learn + segment + per-turn costing + conversation totals
    * + the itemwise best-fit assignment in one WITH RECURSIVE. */
  private val pSft = Q(
    (s, d) => sftBatchPlan(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id", "seg_idx"),
    Some(s"""WITH RECURSIVE ${ChatTokens.chatCtes(4, 60, 2, 8)},
      convtok AS MATERIALIZED (SELECT doc_id,
          CAST(SUM(n_text_tokens + 2) AS BIGINT) AS n
        FROM ct GROUP BY 1),
      ${BestFitPack.bfdCtes("convtok", 256L)},
      ${BestFitPack.assignTailSql(256L)}"""))

  val queries: Map[String, Q] = Map("q_pipeline_sft" -> pSft)
}
