package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-fusion RERANK over the engine's three first-stage
  * retrievers — the cross-encoder-rerank COMPOSITION SHAPE of a RAG
  * candidate-generation chain (candidates from cheap rankers, one
  * scoring pass over the bounded union), with the learned cross-encoder
  * replaced by a deterministic linear judge so the whole chain stays
  * hash-provable: [[graft.text.Bm25]] (lexical), [[SimilarityOps
  * .bruteForceTopK]] (dense cosine), and [[MaxSim]] (late interaction)
  * each nominate their top-k; every candidate is scored on all three
  * features, per-query min-max normalized, and fused by fixed weights.
  * Where [[HybridRrf]] fuses RANKS (calibration-free, score-blind),
  * this reranks on the SCORES themselves — the two standard hybrid
  * combiners, both certified.
  *
  * Scale shape: the legs carry their own at-scale plans and emit
  * ≤ queries·k rows each; everything here — the candidate union, the
  * three feature joins, the per-query normalization windows — runs on
  * that bounded set. Nothing data-scale.
  *
  * Cross-engine determinism: leg scores arrive integer (BM25 micro) or
  * 6-dp fixed-point (cosine/maxsim, lifted to micro by
  * `floor(x·1e6 + 0.5)` — NUMERIC_CONVENTION rule 3/4: a 6-decimal
  * value times 1e6 sits within an ulp of an integer, so the half-up
  * spelling is exact in both engines). A candidate missing from a leg
  * scores the neutral 0. Normalization is pure integer division
  * `(x − min)·1e6 div (max − min)` (non-negative operands: truncating
  * div ≡ flooring //); the fusion `4·lex + 3·dense + 3·maxsim` is an
  * integer dot product. No float reaches the hashed path. */
object RerankFusion {

  /** Per-query 2-token probe bags for the MaxSim leg (query-by-example:
    * the [[HybridRrf.denseProbes]] doc plus its successor). */
  val maxSimProbes: Seq[(Int, Long)] =
    HybridRrf.denseProbes.flatMap { case (q, p) => Seq(q -> p, q -> (p + 1)) }

  /** Rerank the union of candidate lists. Inputs all keyed
    * (query_id, id) with one integer feature column each; `k` final
    * results per query. Output: (query_id, rank, id, fused_score,
    * n_lex, n_dense, n_maxsim). */
  def rerank(lex: DataFrame, dense: DataFrame, msim: DataFrame, k: Int)
      : DataFrame = {
    val cands = lex.select("query_id", "id")
      .unionByName(dense.select("query_id", "id"))
      .unionByName(msim.select("query_id", "id"))
      .distinct()
    val feat = cands
      .join(lex, Seq("query_id", "id"), "left")
      .join(dense, Seq("query_id", "id"), "left")
      .join(msim, Seq("query_id", "id"), "left")
      .select(col("query_id"), col("id"),
        coalesce(col("lex"), lit(0L)).as("lex"),
        coalesce(col("dns"), lit(0L)).as("dns"),
        coalesce(col("msm"), lit(0L)).as("msm"))
    // per-query min-max to [0, 1e6] in pure integer arithmetic; a
    // feature that is constant across the query's candidates carries no
    // signal and normalizes to 0
    def norm(c: String) =
      s"""case when max($c) over (partition by query_id)
                = min($c) over (partition by query_id) then 0L
          else ($c - min($c) over (partition by query_id)) * 1000000L
               div (max($c) over (partition by query_id)
                    - min($c) over (partition by query_id)) end as n_$c"""
    val normed = feat.selectExpr("query_id", "id",
      norm("lex"), norm("dns"), norm("msm"))
    val fused = normed.select(col("query_id"), col("id"),
      (col("n_lex") * 4 + col("n_dns") * 3 + col("n_msm") * 3)
        .as("fused_score"),
      col("n_lex"), col("n_dns").as("n_dense"), col("n_msm").as("n_maxsim"))
    fused.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("fused_score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("fused_score"),
        col("n_lex"), col("n_dense"), col("n_maxsim"))
  }

  /** 6-dp fixed-point → integer micro, exact in both engines (rule 3). */
  private def micro(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)).cast("long")

  private val sRerank = Q(
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val lex = graft.text.Bm25.bm25TopK(docs, "doc_id", "text",
          graft.text.Bm25.queryWorkload, 10)
        .select(col("query_id").cast("long").as("query_id"),
          col("doc_id").as("id"), col("score_micro").as("lex"))
      val qmap = HybridRrf.denseProbes.toDF("query_id", "qvec")
      val dense = SimilarityOps.bruteForceTopK(emb,
          emb.filter(col("vec_id")
            .isin(HybridRrf.denseProbes.map(_._2): _*)),
          "vec_id", "embedding", 10)
        .join(broadcast(qmap), col("qid") === col("qvec"))
        .select(col("query_id").cast("long").as("query_id"),
          col("neighbor").as("id"), micro(col("cosine")).as("dns"))
      val bag = maxSimProbes.toDF("qid", "tok")
      val qvecs = emb.join(broadcast(bag), col("vec_id") === col("tok"))
        .select(col("qid"), col("tok"), col("embedding").as("qv"))
      val msim = MaxSim.maxSimTopK(emb, "vec_id", "embedding", qvecs,
          "qid", "tok", "qv", 10)
        .select(col("query_id"), col("doc").as("id"),
          micro(col("maxsim")).as("msm"))
      rerank(lex, dense, msim, 8).orderBy("query_id", "rank")
    },
    Some(s"""WITH ${graft.text.Bm25.oracleRankedCtes(
              graft.text.Bm25.workloadValues)},
            lex AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                doc_id AS id, score_micro AS lex
              FROM ranked WHERE rank <= 10),
            v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            qm(query_id, qvec) AS (VALUES ${HybridRrf.denseProbes
                .map { case (q, p) => s"($q,$p)" }.mkString(",")}),
            dq AS (SELECT qm.query_id, qm.qvec, v.e AS qe
              FROM v JOIN qm ON v.vec_id = qm.qvec),
            dscored AS (SELECT dq.query_id, v.vec_id AS id,
                list_dot_product(v.e, dq.qe)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(dq.qe, dq.qe))) AS cosine
              FROM v, dq WHERE v.vec_id <> dq.qvec),
            dr AS (SELECT query_id, id, cosine, row_number() OVER
                    (PARTITION BY query_id ORDER BY cosine DESC, id)
                    AS rank
                  FROM dscored),
            dense AS (SELECT CAST(query_id AS BIGINT) AS query_id, id,
                CAST(floor(ROUND(cosine, 6) * 1000000.0 + 0.5) AS BIGINT)
                  AS dns
              FROM dr WHERE rank <= 10),
            mq(query_id, tok) AS (VALUES ${maxSimProbes
                .map { case (q, p) => s"($q,$p)" }.mkString(",")}),
            mqv AS (SELECT mq.query_id, mq.tok, v.e AS qe
              FROM v JOIN mq ON v.vec_id = mq.tok),
            mpt AS (SELECT mqv.query_id, mqv.tok, v.vec_id AS doc,
                MAX(list_dot_product(v.e, mqv.qe)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(mqv.qe, mqv.qe)))) AS m
              FROM v, mqv GROUP BY 1, 2, 3),
            msc AS (SELECT query_id, doc,
                list_reduce(list(m ORDER BY tok), (acc, x) -> acc + x)
                  AS score
              FROM mpt GROUP BY 1, 2),
            mr AS (SELECT query_id, doc, score, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc) AS rank
              FROM msc),
            msim AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                doc AS id,
                CAST(floor(ROUND(score, 6) * 1000000.0 + 0.5) AS BIGINT)
                  AS msm
              FROM mr WHERE rank <= 10),
            cands AS (SELECT DISTINCT query_id, id FROM (
                SELECT query_id, id FROM lex
                UNION ALL SELECT query_id, id FROM dense
                UNION ALL SELECT query_id, id FROM msim)),
            feat AS (SELECT c.query_id, c.id,
                COALESCE(l.lex, 0) AS lex, COALESCE(d.dns, 0) AS dns,
                COALESCE(m.msm, 0) AS msm
              FROM cands c
              LEFT JOIN lex l ON l.query_id = c.query_id AND l.id = c.id
              LEFT JOIN dense d ON d.query_id = c.query_id AND d.id = c.id
              LEFT JOIN msim m ON m.query_id = c.query_id AND m.id = c.id),
            normed AS (SELECT query_id, id,
                CASE WHEN MAX(lex) OVER w = MIN(lex) OVER w THEN 0
                  ELSE (lex - MIN(lex) OVER w) * 1000000
                       // (MAX(lex) OVER w - MIN(lex) OVER w) END AS n_lex,
                CASE WHEN MAX(dns) OVER w = MIN(dns) OVER w THEN 0
                  ELSE (dns - MIN(dns) OVER w) * 1000000
                       // (MAX(dns) OVER w - MIN(dns) OVER w) END AS n_dns,
                CASE WHEN MAX(msm) OVER w = MIN(msm) OVER w THEN 0
                  ELSE (msm - MIN(msm) OVER w) * 1000000
                       // (MAX(msm) OVER w - MIN(msm) OVER w) END AS n_msm
              FROM feat WINDOW w AS (PARTITION BY query_id)),
            fr AS (SELECT query_id, id,
                CAST(n_lex * 4 + n_dns * 3 + n_msm * 3 AS BIGINT)
                  AS fused_score,
                CAST(n_lex AS BIGINT) AS n_lex,
                CAST(n_dns AS BIGINT) AS n_dense,
                CAST(n_msm AS BIGINT) AS n_maxsim,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY n_lex * 4 + n_dns * 3 + n_msm * 3 DESC, id)
                  AS rank
              FROM normed)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, id,
                fused_score, n_lex, n_dense, n_maxsim
            FROM fr WHERE rank <= 8 ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_s_rerank" -> sRerank)
}
