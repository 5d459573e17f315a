package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack–Clarke–Büttcher SIGIR'09) —
  * the standard hybrid-retrieval combiner: each input ranking
  * contributes 1/(K + rank) per document and the fused score is the
  * sum, rewarding documents that rank well in ANY list without score
  * calibration between rankers. Registered as the fusion of the
  * engine's two first-stage retrievers over the same query workload:
  * [[graft.text.Bm25]] (lexical) and [[SimilarityOps.bruteForceTopK]]
  * (dense cosine) — the BM25+dense hybrid every retrieval-augmented
  * corpus pipeline runs.
  *
  * Scale shape: each input list is already per-query top-k (bounded:
  * queries·k rows — the heavy lifting happened inside the rankers,
  * which carry their own at-scale plans); fusion is a query-keyed
  * hash-agg over ≤ lists·k candidate rows per query and the final cut
  * rides the native [[graft.plans.GroupedTopK]] bounded heap. Nothing
  * here is data-scale.
  *
  * Cross-engine determinism: each contribution is the INTEGER division
  * `1e12 div (K + rank)` — no floats anywhere, the sum is order-free,
  * ties break on doc id. Ranks feeding the fusion are themselves
  * hash-proven (q_t_bm25's integer-micro scores; q_s_cosine_topk's
  * bit-matched cosine fold). */
object HybridRrf {

  /** Fuse ranked lists of shape (query_id, id, rank) — rank 1-based.
    * Output: (query_id, rank, id, rrf_score) with
    * rrf_score = Σ_lists 1e12 div (rrfK + rank), top `k` per query. */
  def fuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    val fused = lists.map(_.select(col("query_id"), col("id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionAll _)
      .select(col("query_id"), col("id"),
        expr(s"1000000000000L div (${rrfK}L + rank)").as("__c"))
      .groupBy("query_id", "id")
      .agg(sum("__c").as("rrf_score"))
    val top = graft.plans.GroupedTopK.topK(fused, Seq("query_id"),
      Seq("rrf_score" -> true, "id" -> false), k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("id"), col("rrf_score"))
  }

  /** Dense leg of the registered workload: per BM25 query_id, a probe
    * vector (query-by-example — the embedding of a fixed corpus doc). */
  val denseProbes: Seq[(Int, Long)] = Seq(0 -> 7L, 1 -> 42L, 2 -> 99L)

  private val sRrf = Q(
    (s, d) => {
      import s.implicits._
      val lex = graft.text.Bm25.bm25TopK(Tables.documents(s, d),
          "doc_id", "text", graft.text.Bm25.queryWorkload, 10)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val emb = Tables.embeddings(s, d)
      val qmap = denseProbes.toDF("query_id", "qvec")
      val dense = SimilarityOps.bruteForceTopK(emb,
          emb.filter(col("vec_id").isin(denseProbes.map(_._2): _*)),
          "vec_id", "embedding", 10)
        .join(broadcast(qmap), col("qid") === col("qvec"))
        .select(col("query_id"), col("neighbor").as("id"), col("rank"))
      fuse(Seq(lex, dense), 8).orderBy("query_id", "rank")
    },
    Some(s"""WITH ${graft.text.Bm25.oracleRankedCtes(
              graft.text.Bm25.workloadValues)},
            lex AS (SELECT query_id, doc_id AS id, rank
              FROM ranked WHERE rank <= 10),
            v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            qm(query_id, qvec) AS (VALUES ${denseProbes
                .map { case (q, p) => s"($q,$p)" }.mkString(",")}),
            dq AS (SELECT qm.query_id, qm.qvec, v.e AS qe
              FROM v JOIN qm ON v.vec_id = qm.qvec),
            dscored AS (SELECT dq.query_id, v.vec_id AS id,
                list_dot_product(v.e, dq.qe)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(dq.qe, dq.qe))) AS cosine
              FROM v, dq WHERE v.vec_id <> dq.qvec),
            dr AS (SELECT query_id, id, row_number() OVER
                    (PARTITION BY query_id ORDER BY cosine DESC, id)
                    AS rank
                  FROM dscored),
            dense AS (SELECT query_id, id, rank FROM dr WHERE rank <= 10),
            un AS (SELECT query_id, id, CAST(rank AS BIGINT) AS rank
                   FROM lex
                   UNION ALL
                   SELECT query_id, id, CAST(rank AS BIGINT) FROM dense),
            fused AS (SELECT query_id, id,
                CAST(SUM(1000000000000 // (60 + rank)) AS BIGINT)
                  AS rrf_score
              FROM un GROUP BY 1, 2),
            fr AS (SELECT query_id, id, rrf_score, row_number() OVER
                    (PARTITION BY query_id ORDER BY rrf_score DESC, id)
                    AS rank
                  FROM fused)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, id, rrf_score
            FROM fr WHERE rank <= 8 ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_s_rrf" -> sRrf)
}
