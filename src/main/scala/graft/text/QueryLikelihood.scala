package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft
  * SIGIR'98; Zhai & Lafferty SIGIR'01) — the language-modeling ranker
  * next to [[Bm25]]: score(q,d) = Σ_{t∈q} ln P(t|θ_d) with
  * θ_d the Dirichlet-smoothed document model
  * P(t|θ_d) = (tf + μ·cf_t/|C|) / (dl + μ). The two classical
  * first-stage rankers disagree exactly where their priors differ (QL's
  * length normalization is Bayesian, BM25's is heuristic), which is why
  * retrieval stacks run both into the RRF fusion (q_s_rrf). Decomposed
  * for sparse evaluation (Zhai'01 eq. 6): matched terms contribute
  * ln(1 + tf·|C|/(μ·cf_t)), plus a per-document constant
  * |q|·ln(μ/(dl+μ)) — only postings matching a query term are touched.
  *
  * Cross-engine determinism (rule 2, the KM/log-rank shape): both ln
  * terms are floored to micro-nats from identical trees of EXACT
  * integers — the matched-term ln argument is 1 + (tf·Σdl)/(μ·cf), a
  * ratio of exact longs whose IEEE division is correctly rounded, and
  * the length term depends only on (dl, μ); the per-(query,doc) score
  * is then an order-free INTEGER sum of those floors plus nq·ld.
  * Scores are negative log-likelihood-scaled integers; ranking ties
  * break on doc id.
  *
  * Scale shape: identical to [[Bm25]]'s inverted-index plan — the
  * explode is map-side, the query-term prune runs BEFORE the (doc,
  * term) aggregation, collection stats and per-term cf are
  * config-sized broadcasts, and the per-query ranking is the native
  * bounded-heap [[graft.plans.GroupedTopK]]. */
object QueryLikelihood {

  /** Top-k docs per query under the Dirichlet-smoothed QL model.
    * `queryTerms`: (query_id, term) — config-sized. `mu`: the Dirichlet
    * prior mass in tokens. Output: (query_id, rank, doc id,
    * score_micro). */
  def qlTopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, String)], k: Int, mu: Long = 100L)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = queryTerms.toDF("query_id", "term")
    val terms = queryTerms.map(_._2).distinct
    val toks = df.select(col(idCol),
      TextOps.tokens(lower(col(textCol))).as("__ts"))
    val dl = toks.select(col(idCol),
      size(col("__ts")).cast("long").as("__dl"))
    val stats = dl.agg(sum("__dl").as("__sumdl"))
    val rawPost = toks.select(col(idCol), explode(col("__ts")).as("term"))
      .filter(col("term").isin(terms.map(x => x: Any): _*))
    val post = rawPost.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // collection frequency per query term (pruned before this agg, so
    // the cf table is |query terms|-sized)
    val cf = rawPost.groupBy("term").agg(count(lit(1)).as("cf"))
    // per-query distinct term count (the length-term multiplier)
    val nq = qdf.groupBy("query_id").agg(
      countDistinct(col("term")).as("nq"))
    // per-doc length term: floor(1e6 * ln(mu / (dl + mu))) — one floor
    // per DOC, negative
    val ld = dl.select(col(idCol),
      floor(log(lit(mu.toDouble) /
        (col("__dl").cast("double") + lit(mu.toDouble))) * lit(1e6))
        .cast("long").as("__ld"))
    // matched-term contribution: floor(1e6 * ln(1 + tf*sumdl/(mu*cf)))
    val contrib = post
      .join(broadcast(qdf), "term")
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        floor(log(lit(1.0) +
          (col("tf") * col("__sumdl")).cast("double") /
            (lit(mu) * col("cf")).cast("double")) * lit(1e6))
          .cast("long").as("__c"))
      .groupBy("query_id", idCol)
      .agg(sum("__c").as("__m"))
    val scored = contrib
      .join(ld, Seq(idCol))
      .join(broadcast(nq), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        (col("__m") + col("nq") * col("__ld")).as("score_micro"))
    val top = graft.plans.GroupedTopK.topK(scored, Seq("query_id"),
      Seq("score_micro" -> true, idCol -> false), k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col(idCol))).cast("long"))
      .select(col("query_id"), col("rank"), col(idCol),
        col("score_micro"))
  }

  /** q_t_ql_dirichlet: the Bm25 query workload ranked under the QL
    * model (μ = 100, near the corpus mean document length) — the
    * second classical leg retrieval fusions need. The oracle replays
    * postings prune, cf, both floored ln trees and the integer sum. */
  private val tQl = Q(
    (s, d) => qlTopK(Tables.documents(s, d), "doc_id", "text",
      Bm25.queryWorkload, 10).orderBy("query_id", "rank"),
    Some(s"""WITH toks AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '')
                  AS ts
              FROM documents),
            dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl
              FROM toks),
            stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
            q(query_id, term) AS (VALUES ${Bm25.workloadValues}),
            rawpost AS (SELECT doc_id, term
              FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
              WHERE term IN (SELECT term FROM q)),
            post AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM rawpost GROUP BY 1, 2),
            cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
              FROM rawpost GROUP BY 1),
            nq AS (SELECT query_id,
                CAST(COUNT(DISTINCT term) AS BIGINT) AS nq
              FROM q GROUP BY 1),
            ld AS (SELECT doc_id,
                CAST(FLOOR(ln(100.0 / (CAST(dl AS DOUBLE) + 100.0))
                  * 1000000.0) AS BIGINT) AS ld
              FROM dl),
            contrib AS (SELECT qq.query_id, post.doc_id,
                CAST(FLOOR(ln(1.0 +
                    CAST(post.tf * (SELECT sumdl FROM stats) AS DOUBLE)
                    / CAST(100 * cf.cf AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS c
              FROM q qq JOIN post ON post.term = qq.term
              JOIN cf ON cf.term = qq.term),
            m AS (SELECT query_id, doc_id, SUM(c) AS m
              FROM contrib GROUP BY 1, 2),
            scored AS (SELECT m.query_id, m.doc_id,
                m.m + nq.nq * ld.ld AS score_micro
              FROM m JOIN ld ON ld.doc_id = m.doc_id
              JOIN nq ON nq.query_id = m.query_id),
            ranked AS (SELECT query_id, doc_id, score_micro,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score_micro DESC, doc_id) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
                   CAST(score_micro AS BIGINT) AS score_micro
            FROM ranked WHERE rank <= 10
            ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_t_ql_dirichlet" -> tQl)
}
