package graft.pipeline

import graft.{Q, Tables}
import graft.etl.DataMix
import graft.text.{BpeMerge, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tokenizer-side capstone: learn BPE merges on the corpus, encode
  * every document under them, budget-mix sources on the REAL token
  * counts, and lay the selected docs out as fixed-budget training
  * sequences — the full path from raw text to a batch plan, with the
  * token-count column that the mix and the packer consume being the one
  * the tokenizer actually produces (not the whitespace estimate the
  * standalone operators default to).
  *
  * Scale: the composition adds nothing beyond its stages' own shuffles —
  * the vocab-bounded learn loop, one corpus explode + word-key equi-join
  * (encode), one source aggregation + broadcast rate attach (mix), and
  * the two-pass global prefix sum (pack). Registering it
  * (q_pipeline_tokenize) certifies the stages COMPOSE: the byCount
  * surfaces carry (id, source, n_tokens) across stage boundaries intact.
  */
object TokenizerPipeline {

  /** Returns one row per SELECTED doc: (idCol, sourceCol, n_tokens,
    * start_tok, bin_first, bin_last, n_segments). Token-less docs carry
    * no BPE tokens and are not part of the mix. The release handle drops
    * the encode vocab and the packer's range cache. */
  def tokenizeCurateReleasable(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String, nMerges: Int, budget: Long,
      targetShares: Map[String, Double]): (DataFrame, () => Unit) = {
    val (enc, relVocab) = BpeMerge.encodeCorpusReleasable(
      docs, idCol, textCol, nMerges)
    val counted = docs.select(col(idCol), col(sourceCol))
      .join(enc.select(col(idCol), col("n_bpe_tokens").as("n_tokens")),
        Seq(idCol))
    val mixed = DataMix.tokenBudgetMixByCount(
      counted, idCol, sourceCol, targetShares)
    val (packed, relPack) = TextOps.packCountedReleasable(
      mixed, idCol, budget)
    (packed, () => { relVocab(); relPack(); () })
  }

  def tokenizeCurate(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, nMerges: Int, budget: Long,
      targetShares: Map[String, Double]): DataFrame =
    tokenizeCurateReleasable(docs, idCol, textCol, sourceCol, nMerges,
      budget, targetShares)._1

  /** 3 learned merges, 50/30/20 source shares, 512-token sequences; the
    * oracle replays the learn chain, the encode join, the mix rates and
    * md5 keep decisions, and the exclusive prefix sum in one WITH. */
  private val pTokenize = Q(
    (s, d) => {
      val (out, release) = tokenizeCurateReleasable(
        Tables.documents(s, d), "doc_id", "text", "source",
        nMerges = 3, budget = 512L,
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some(s"""WITH ${BpeMerge.encodePrefixCtes(3)},
            t AS (SELECT d.doc_id, d.source, enc.n_tokens
                  FROM documents d JOIN enc ON d.doc_id = enc.doc_id),
            avail AS (SELECT source, SUM(n_tokens) AS a_s,
                CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                            WHEN 'src2' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS p_s
              FROM t GROUP BY source),
            pos AS (SELECT source, CAST(a_s AS BIGINT) AS a_s, p_s
                    FROM avail WHERE p_s > 0 AND a_s > 0),
            ts AS (SELECT MIN(CAST(a_s AS DOUBLE) / p_s) AS t_star FROM pos),
            rates AS (SELECT source,
                LEAST(1.0, p_s * t_star / CAST(a_s AS DOUBLE)) AS rate
              FROM pos CROSS JOIN ts),
            mixed AS (SELECT t.doc_id, t.source, t.n_tokens
              FROM t JOIN rates r ON t.source = r.source
              WHERE ${DataMix.uniformSqlExpr("t.doc_id")} < r.rate),
            c AS (SELECT doc_id, source, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok
              FROM mixed)
            SELECT doc_id, source, n_tokens, start_tok,
              CAST(start_tok // 512 AS BIGINT) AS bin_first,
              CAST((start_tok + GREATEST(n_tokens, 1) - 1) // 512 AS BIGINT)
                AS bin_last,
              CAST((start_tok + GREATEST(n_tokens, 1) - 1) // 512
                - start_tok // 512 + 1 AS BIGINT) AS n_segments
            FROM c ORDER BY doc_id"""))

  /** The unigram-LM twin of [[tokenizeCurateReleasable]]: identical
    * mix/pack stages, token counts from the Viterbi encode
    * ([[graft.text.UnigramLm.encodeCorpus]]) instead of BPE — the
    * composition that certifies BOTH tokenizers drive the same
    * curation surface (id, source, n_tokens). */
  def tokenizeCurateUnigramReleasable(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String, budget: Long,
      targetShares: Map[String, Double]): (DataFrame, () => Unit) = {
    val enc = graft.text.UnigramLm.encodeCorpus(docs, idCol, textCol)
    val counted = docs.select(col(idCol), col(sourceCol))
      .join(enc.select(col(idCol), col("n_pieces").as("n_tokens")),
        Seq(idCol))
    val mixed = DataMix.tokenBudgetMixByCount(
      counted, idCol, sourceCol, targetShares)
    TextOps.packCountedReleasable(mixed, idCol, budget)
  }

  /** q_pipeline_unigram: the same 50/30/20 mix + 512-token packing as
    * q_pipeline_tokenize, but budgeted on unigram-LM Viterbi piece
    * counts; the oracle swaps only the encode prefix (recursive
    * Viterbi CTEs), certifying the stage boundary carries either
    * tokenizer unchanged. */
  private val pUnigram = Q(
    (s, d) => {
      val (out, release) = tokenizeCurateUnigramReleasable(
        Tables.documents(s, d), "doc_id", "text", "source",
        budget = 512L,
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some(s"""WITH RECURSIVE ${graft.text.UnigramLm.encodePrefixCtes(4, 60, 2)},
            t AS (SELECT d.doc_id, d.source, enc.n_tokens
                  FROM documents d JOIN enc ON d.doc_id = enc.doc_id),
            avail AS (SELECT source, SUM(n_tokens) AS a_s,
                CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                            WHEN 'src2' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS p_s
              FROM t GROUP BY source),
            pos AS (SELECT source, CAST(a_s AS BIGINT) AS a_s, p_s
                    FROM avail WHERE p_s > 0 AND a_s > 0),
            ts AS (SELECT MIN(CAST(a_s AS DOUBLE) / p_s) AS t_star FROM pos),
            rates AS (SELECT source,
                LEAST(1.0, p_s * t_star / CAST(a_s AS DOUBLE)) AS rate
              FROM pos CROSS JOIN ts),
            mixed AS (SELECT t.doc_id, t.source, t.n_tokens
              FROM t JOIN rates r ON t.source = r.source
              WHERE ${DataMix.uniformSqlExpr("t.doc_id")} < r.rate),
            c AS (SELECT doc_id, source, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok
              FROM mixed)
            SELECT doc_id, source, n_tokens, start_tok,
              CAST(start_tok // 512 AS BIGINT) AS bin_first,
              CAST((start_tok + GREATEST(n_tokens, 1) - 1) // 512 AS BIGINT)
                AS bin_last,
              CAST((start_tok + GREATEST(n_tokens, 1) - 1) // 512
                - start_tok // 512 + 1 AS BIGINT) AS n_segments
            FROM c ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_pipeline_tokenize" -> pTokenize,
    "q_pipeline_unigram" -> pUnigram)
}
