package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-relevance feedback (the RM-style expansion of Lavrenko &
  * Croft SIGIR'01, in its classic TF-in-feedback-set form) — the
  * second round of the classical IR stack this engine now completes:
  * [[Bm25]] retrieves, the top-kFb documents are ASSUMED relevant,
  * their most frequent non-query terms expand the query, and a second
  * BM25 pass re-retrieves — the standard recall lever when the query
  * vocabulary misses how the corpus actually says it (and the lexical
  * sibling of the dense [[graft.sim.Matryoshka]] two-stage shape).
  *
  * Cross-engine determinism: stage 1 is the certified integer BM25;
  * expansion weights are exact term COUNTS over the feedback set with
  * (weight desc, term asc) ties — a total order — and stage 2 is the
  * same integer BM25 over the expanded term table. Zero new float
  * steps anywhere; the oracle replays retrieval → expansion →
  * re-retrieval end to end.
  *
  * Scale shape: stage 1 carries the inverted-index BM25 plan; the
  * feedback set is queries·kFb rows (broadcast onto the token explode,
  * so harvesting feedback terms is map-side pruning of one corpus
  * scan); expansion selection rides the bounded
  * [[graft.plans.GroupedTopK]] heap; stage 2 prunes postings by a
  * broadcast semi-join on the (still config-sized) expanded term set.
  * Two corpus passes total — the price of any PRF. */
object PseudoRelevance {

  /** The expanded query table: original terms plus the top `mExp`
    * non-query terms by frequency in each query's top-`kFb` feedback
    * docs. Output: (query_id, term). */
  def prfExpand(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, String)], kFb: Int, mExp: Int): DataFrame = {
    require(kFb >= 1 && mExp >= 1, "need kFb >= 1 and mExp >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = queryTerms.toDF("query_id", "term")
    val fb = Bm25.bm25TopK(df, idCol, textCol, queryTerms, kFb)
      .select(col("query_id"), col(idCol))
    val toks = df.select(col(idCol),
      explode(TextOps.tokens(lower(col(textCol)))).as("term"))
    val ft = toks.join(broadcast(fb), Seq(idCol))
      .join(broadcast(qdf), Seq("query_id", "term"), "left_anti")
      .groupBy("query_id", "term").agg(count(lit(1)).as("wt"))
    val exp = graft.plans.GroupedTopK.topK(ft, Seq("query_id"),
        Seq("wt" -> true, "term" -> false), mExp)
      .select("query_id", "term")
    qdf.unionByName(exp)
  }

  /** Full PRF retrieval: expand, then re-score.
    *
    * r15: the expanded-term table is eagerly materialized at the stage
    * boundary — it is config-sized (queries × (orig + mExp) rows), but
    * stage 2 references it TWICE (the postings semi-join and the score
    * attach), and without the cut each reference re-derived the entire
    * stage-1 plan (BM25 pass + feedback harvest) inside stage 2's tree:
    * the registered query's physical plan carried 23 corpus scans / 37
    * exchanges, most of them the same subtree replayed. With the
    * checkpoint stage 2 sees a literal-sized local frame and the plan
    * drops to the two honest corpus passes the scaladoc promises. */
  def prfTopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, String)], kFb: Int, mExp: Int, k: Int)
      : DataFrame =
    Bm25.bm25TopKFromTerms(df, idCol, textCol,
      prfExpand(df, idCol, textCol, queryTerms, kFb, mExp)
        .localCheckpoint(eager = true), k)

  /** q_t_prf: the shared retrieval workload, 5 feedback docs, 3
    * expansion terms, top-10 re-retrieval — the oracle replays both
    * BM25 passes (the suffixed [[Bm25.oracleScoreFrom]] chain) and the
    * expansion selection between them. */
  private val tPrf = Q(
    (s, d) => prfTopK(Tables.documents(s, d), "doc_id", "text",
        Bm25.queryWorkload, kFb = 5, mExp = 3, k = 10)
      .orderBy("query_id", "rank"),
    Some(s"""WITH ${Bm25.oracleRankedCtes(Bm25.workloadValues)},
            fb AS (SELECT query_id, doc_id FROM ranked WHERE rank <= 5),
            futok AS (SELECT doc_id, unnest(ts) AS term FROM toks),
            ft AS (SELECT fb.query_id, futok.term,
                CAST(COUNT(*) AS BIGINT) AS wt
              FROM fb JOIN futok ON futok.doc_id = fb.doc_id
              LEFT JOIN q ON q.query_id = fb.query_id
                AND q.term = futok.term
              WHERE q.term IS NULL
              GROUP BY 1, 2),
            exp AS (SELECT query_id, term FROM (
                SELECT query_id, term, row_number() OVER
                  (PARTITION BY query_id ORDER BY wt DESC, term) AS rn
                FROM ft) WHERE rn <= 3),
            q2 AS (SELECT query_id, term FROM q
                   UNION ALL SELECT query_id, term FROM exp),
            ${Bm25.oracleScoreFrom("2", "q2")}
            SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
                   CAST(score_micro AS BIGINT) AS score_micro
            FROM ranked2 WHERE rank <= 10
            ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_t_prf" -> tPrf)
}
