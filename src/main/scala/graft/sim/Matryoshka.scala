package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matryoshka two-stage retrieval (Kusupati et al. NeurIPS'22 — MRL
  * embeddings): candidate generation on a PREFIX of the embedding
  * dimensions, exact rerank of the bounded candidate set on the full
  * vector. MRL-trained embeddings front-load information, so a d/8
  * prefix ranks well enough to feed a small-k rerank — the candidate
  * stage does 1/8 the multiply-adds per pair and (in a PQ/IVF layout)
  * reads 1/8 the bytes, while the final ordering is exact-by-
  * construction on whatever survives. The two-stage shape is the same
  * as [[RerankFusion]]'s: cheap stage bounds the work, exact stage
  * fixes the order.
  *
  * Honest geometry note: the testdata embeddings are NOT MRL-trained,
  * so here the prefix is a plain random projection — measured recall@3
  * of exact (sf0.001, MatryoshkaSpec): (d=8, kCand=12) 0.13,
  * (16, 12) 0.30, (32, 12) 0.47, (32, 24) 0.73, (32, 48) 0.80. With
  * MRL-trained vectors the front-loaded prefix moves these sharply up;
  * the OPERATOR's correctness (certified two-stage cut + reorder) is
  * independent of the embedding's training.
  *
  * Cross-engine determinism: both stages rank by raw cosine with id
  * tie-breaks ([[SimilarityOps.bruteForceTopK]]'s convention — the
  * codegen'd fold bit-matches list_dot_product); output cosine rounds
  * to 6 dp; ranks are integers.
  *
  * Scale shape: stage 1 is the broadcast-queries scan (or the IVF
  * probe at real scale — the prefix trick composes with any candidate
  * generator); stage 2 touches only queries·kCand rows. The corpus is
  * scanned once. */
object Matryoshka {

  /** Two-stage top-k: candidates by prefix-dim cosine (kCand per
    * query), exact rerank by full-dim cosine (k per query). Output:
    * (qid, rank, neighbor, cosine, prefix_rank) — prefix_rank is the
    * candidate stage's position, the reranking audit trail. */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dPrefix: Int, kCand: Int, k: Int): DataFrame = {
    require(k <= kCand, "rerank depth k must not exceed candidate depth")
    import graft.functions.CosineSimilarity.cosineSim
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("pv", slice(col("v"), 1, dPrefix))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qpv", slice(col("qv"), 1, dPrefix))
    val wPre = Window.partitionBy("qid")
      .orderBy(col("pcos").desc, col("id"))
    val cands = c.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("pcos", cosineSim(col("pv"), col("qpv")))
      .withColumn("prefix_rank", row_number().over(wPre))
      .filter(col("prefix_rank") <= kCand)
    val wFull = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id"))
    cands.withColumn("cosine", cosineSim(col("v"), col("qv")))
      .withColumn("rank", row_number().over(wFull).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"),
        round(col("cosine"), 6).as("cosine"),
        col("prefix_rank").cast("long").as("prefix_rank"))
  }

  /** q_s_matryoshka: 16-of-64-dim candidates at kCand=12, exact top-5
    * rerank, queries vec_id < 5 — the oracle replays both stages, so
    * the hash certifies the candidate cut AND the reorder. */
  private val sMatryoshka = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      matryoshkaTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", dPrefix = 16, kCand = 12, k = 5)
        .orderBy("qid", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            qs AS (SELECT vec_id AS qid, e AS qe, e[1:16] AS qpe
                   FROM v WHERE vec_id < 5),
            pre AS (SELECT qs.qid, v.vec_id AS id, v.e,  qs.qe,
                list_dot_product(v.e[1:16], qs.qpe)
                  / (SQRT(list_dot_product(v.e[1:16], v.e[1:16]))
                     * SQRT(list_dot_product(qs.qpe, qs.qpe))) AS pcos
              FROM v CROSS JOIN qs WHERE v.vec_id <> qs.qid),
            cand AS (SELECT qid, id, e, qe, row_number() OVER
                       (PARTITION BY qid ORDER BY pcos DESC, id)
                       AS prefix_rank
                     FROM pre QUALIFY prefix_rank <= 12),
            rr AS (SELECT qid, id, prefix_rank,
                list_dot_product(e, qe)
                  / (SQRT(list_dot_product(e, e))
                     * SQRT(list_dot_product(qe, qe))) AS cosine
              FROM cand),
            fin AS (SELECT qid, id, cosine, prefix_rank, row_number()
                      OVER (PARTITION BY qid ORDER BY cosine DESC, id)
                      AS rank
                    FROM rr QUALIFY rank <= 5)
            SELECT qid, rank, id AS neighbor, ROUND(cosine, 6) AS cosine,
                CAST(prefix_rank AS BIGINT) AS prefix_rank
            FROM fin ORDER BY qid, rank"""))

  val queries: Map[String, Q] = Map("q_s_matryoshka" -> sMatryoshka)
}
