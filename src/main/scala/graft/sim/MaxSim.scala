package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity.cosineSim

/** MaxSim late-interaction scoring (Khattab & Zaharia, SIGIR'20
  * ColBERT): a query is a BAG of token vectors, a document a bag of
  * token vectors, and the score is Σ_{u∈query} max_{v∈doc} cos(u, v) —
  * each query token finds its best-matching document token
  * independently, which is what single-vector cosine
  * ([[SimilarityOps.bruteForceTopK]]) structurally cannot express.
  * The multi-vector retrieval rung between single-vector ANN and full
  * cross-encoder rescoring.
  *
  * Scale shape: query tokens are a config-sized broadcast onto the
  * corpus vector table (map-side cosine per (vector, token) — one
  * fused codegen loop per pair); the max-per-token reduction is an
  * order-free MAX aggregation keyed by (query, token, doc); the final
  * per-(query, doc) sum folds k-token arrays. Nothing doc×doc, nothing
  * beyond |corpus|·|query tokens| work, and the per-doc vector count
  * never needs to fit anywhere special. Per-query ranking rides
  * [[graft.plans.GroupedTopK]].
  *
  * Cross-engine determinism: per-pair cosine is the codegen'd
  * [[graft.functions.CosineSimilarity]] fold, bit-matched by DuckDB's
  * `list_dot_product` (the q_s_cosine_topk precedent); MAX is
  * order-free; the only float SUM is the per-(query,doc) token fold,
  * pinned to token order (`aggregate` over a token-sorted array /
  * `list_reduce(list(... ORDER BY tok))`). */
object MaxSim {

  /** Top-k docs per multi-vector query. `queries`: (query id, token id,
    * vector) — config-sized. Output: (query_id, rank, doc, maxsim)
    * ranked by (score desc, doc). */
  def maxSimTopK(corpus: DataFrame, docCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, tokCol: String,
      queryVecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(docCol).cast("long").as("doc"),
      col(vecCol).cast("array<double>").as("__v"))
    val q = queries.select(col(queryIdCol).cast("long").as("query_id"),
      col(tokCol).cast("long").as("__tok"),
      col(queryVecCol).cast("array<double>").as("__qv"))
    val perTok = c.join(broadcast(q))
      .withColumn("__cos", cosineSim(col("__v"), col("__qv")))
      .groupBy("query_id", "__tok", "doc")
      .agg(max("__cos").as("__m"))
    val scored = perTok.groupBy("query_id", "doc")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__tok").as("t"),
          col("__m").as("m")))), s => s.getField("m")),
        lit(0.0), (acc, x) => acc + x).as("__score"))
    val top = graft.plans.GroupedTopK.topK(scored, Seq("query_id"),
      Seq("__score" -> true, "doc" -> false), k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("__score").desc, col("doc"))).cast("long"))
      .select(col("query_id"), col("rank"), col("doc"),
        round(col("__score"), 6).as("maxsim"))
  }

  /** q_s_maxsim: labels are the multi-vector "documents" (10 bags of
    * 50–200 vectors each); queries are two 2-token bags drawn from the
    * first four corpus vectors. Top-5 docs per query. */
  private val sMaxSim = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 4)
        .select((col("vec_id") % 2).as("qid"), col("vec_id").as("tok"),
          col("embedding").as("qv"))
      maxSimTopK(emb, "label", "embedding", q, "qid", "tok", "qv", 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, label,
                CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            q AS (SELECT vec_id % 2 AS query_id, vec_id AS tok, e AS qe
              FROM v WHERE vec_id < 4),
            pt AS (SELECT q.query_id, q.tok, v.label AS doc,
                MAX(list_dot_product(v.e, q.qe)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(q.qe, q.qe)))) AS m
              FROM v, q GROUP BY 1, 2, 3),
            sc AS (SELECT query_id, CAST(doc AS BIGINT) AS doc,
                list_reduce(list(m ORDER BY tok), (acc, x) -> acc + x)
                  AS score
              FROM pt GROUP BY 1, 2),
            r AS (SELECT query_id, doc, score, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc) AS rank
              FROM sc)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, doc,
                   ROUND(score, 6) AS maxsim
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_s_maxsim" -> sMaxSim)
}
