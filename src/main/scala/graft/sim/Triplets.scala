package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-hard triplet mining (Schroff, Kalenichenko & Philbin, FaceNet
  * CVPR 2015) — the contrastive-TRAINING-DATA constructor that
  * composes the engine's proven retrieval legs into emitted triplets:
  * per anchor, the positive is its nearest SAME-label neighbor and
  * the negative the nearest DIFFERENT-label neighbor that is still
  * FARTHER than the positive (cos_n < cos_p — the semi-hard band:
  * hard negatives inside the positive radius collapse embeddings,
  * easy negatives are ~orthogonal and contribute no gradient). The
  * emitted margin cos_p − cos_n is the per-triplet difficulty a
  * curriculum sorts by.
  *
  * Determinism: candidates come from [[SimilarityOps.bruteForceTopK]]
  * (its 6-dp cosine already certified by the ANN family's gates);
  * positive/negative picks are lexicographic struct-MIN argmins over
  * (rank) — total orders; the margin is ONE floor of the difference
  * of the two certified doubles. Anchors lacking a same-label
  * neighbor in the top k, or any semi-hard negative, emit with nulls
  * (the caller decides to widen k), never drop.
  *
  * Scale shape: anchors broadcast against the corpus (the certified
  * brute-force/IVF rerank shape — at real scale the candidate
  * generator swaps to the IVF path, this stays the rerank); label
  * attach is an id-keyed join; the picks are per-anchor aggregations
  * over ≤ k candidate rows. */
object Triplets {

  /** Per-anchor semi-hard triplet over `emb` (idCol, vecCol, labelCol)
    * with anchors = rows matching `anchorPred`, candidates from the
    * top k. Output: (qid, anchor_label, pos_id, pos_rank, neg_id,
    * neg_rank, margin_micro). */
  def semiHard(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchorPred: org.apache.spark.sql.Column, k: Int)
      : DataFrame = {
    val lbl = emb.select(col(idCol).cast("long").as("__lid"),
      col(labelCol).cast("long").as("__lab"))
    val nn = SimilarityOps.bruteForceTopK(emb, emb.filter(anchorPred),
        idCol, vecCol, k)
      .join(lbl.select(col("__lid").as("neighbor"), col("__lab").as("nlab")),
        Seq("neighbor"))
      .join(lbl.select(col("__lid").as("qid"), col("__lab").as("alab")),
        Seq("qid"))
    val pos = nn.filter(col("nlab") === col("alab"))
      .groupBy("qid")
      .agg(min(struct(col("rank"), col("neighbor"), col("cosine"))).as("p"))
      .select(col("qid"), col("p.neighbor").as("pos_id"),
        col("p.rank").as("pos_rank"), col("p.cosine").as("pcos"))
    val neg = nn.join(pos, Seq("qid"))
      .filter(col("nlab") =!= col("alab") && col("cosine") < col("pcos"))
      .groupBy("qid")
      .agg(min(struct(col("rank"), col("neighbor"), col("cosine"))).as("n"))
      .select(col("qid"), col("n.neighbor").as("neg_id"),
        col("n.rank").as("neg_rank"), col("n.cosine").as("ncos"))
    nn.select(col("qid"), col("alab")).distinct()
      .join(pos, Seq("qid"), "left")
      .join(neg, Seq("qid"), "left")
      .select(col("qid"), col("alab").as("anchor_label"),
        col("pos_id"), col("pos_rank"), col("neg_id"), col("neg_rank"),
        floor((col("pcos") - col("ncos")) * lit(1e6)).cast("long")
          .as("margin_micro"))
      .orderBy("qid")
  }

  /** q_s_triplets: semi-hard triplets for the first five anchors over
    * the embeddings table at k = 10 — the contrastive-data capstone on
    * the same certified candidates as q_s_cosine_topk. */
  private val sTriplets = Q(
    (s, d) => semiHard(Tables.embeddings(s, d), "vec_id", "embedding",
      "label", col("vec_id") < 5, k = 10),
    Some("""WITH v AS (SELECT vec_id, label,
                CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            bf AS (SELECT q.vec_id AS qid, v.vec_id AS id,
                round(list_dot_product(v.e, q.e)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(q.e, q.e))), 6) AS cosine
              FROM v CROSS JOIN (SELECT * FROM v WHERE vec_id < 5) q
              WHERE v.vec_id <> q.vec_id),
            nn AS (SELECT qid, id AS neighbor, cosine, rank FROM
              (SELECT qid, id, cosine, row_number() OVER
                 (PARTITION BY qid ORDER BY cosine DESC, id) AS rank
               FROM bf) WHERE rank <= 10),
            nl AS (SELECT nn.qid, nn.neighbor, nn.rank, nn.cosine,
                a.label AS alab, b.label AS nlab
              FROM nn JOIN v a ON nn.qid = a.vec_id
                      JOIN v b ON nn.neighbor = b.vec_id),
            pos AS (SELECT qid, neighbor AS pos_id, rank AS pos_rank,
                cosine AS pcos FROM
              (SELECT *, row_number() OVER
                 (PARTITION BY qid ORDER BY rank) AS rn
               FROM nl WHERE nlab = alab) WHERE rn = 1),
            neg AS (SELECT qid, neighbor AS neg_id, rank AS neg_rank,
                cosine AS ncos FROM
              (SELECT nl.*, row_number() OVER
                 (PARTITION BY nl.qid ORDER BY nl.rank) AS rn
               FROM nl JOIN pos ON nl.qid = pos.qid
               WHERE nl.nlab <> nl.alab AND nl.cosine < pos.pcos)
              WHERE rn = 1)
            SELECT a.qid, CAST(a.alab AS BIGINT) AS anchor_label,
              CAST(pos.pos_id AS BIGINT) AS pos_id,
              CAST(pos.pos_rank AS BIGINT) AS pos_rank,
              CAST(neg.neg_id AS BIGINT) AS neg_id,
              CAST(neg.neg_rank AS BIGINT) AS neg_rank,
              CAST(floor((pos.pcos - neg.ncos) * 1e6) AS BIGINT)
                AS margin_micro
            FROM (SELECT DISTINCT qid, alab FROM nl) a
            LEFT JOIN pos ON a.qid = pos.qid
            LEFT JOIN neg ON a.qid = neg.qid
            ORDER BY a.qid"""))

  val queries: Map[String, Q] = Map("q_s_triplets" -> sTriplets)
}
