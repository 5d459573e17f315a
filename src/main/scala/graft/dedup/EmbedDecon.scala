package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-based benchmark decontamination — the SEMANTIC sibling of
  * the n-gram overlap gates (q_d_decontaminate / _scored / bloom):
  * n-grams catch verbatim leakage, but a paraphrased or reformatted
  * benchmark item shares few 5-grams with its source — its EMBEDDING
  * still sits next to it. Flag every corpus item whose max cosine
  * against any benchmark vector reaches the threshold (the
  * contamination definition used by modern eval-hygiene audits).
  *
  * Scale shape: the benchmark side is eval-sized — a BROADCAST; each
  * corpus vector scores |bench| fused codegen'd cosines in the scan
  * stage (no shuffle of the corpus), and the per-item max collapses
  * map-side. The corpus is read once; nothing is corpus×corpus.
  *
  * Cross-engine determinism: the cosine is the proven bit-matched fold
  * (q_s_cosine_topk precedent); scores quantize to FLOOR micro before
  * the max/argmax, so ranking and the threshold compare are pure
  * integer ops (ties break on the lower benchmark id). */
object EmbedDecon {

  /** Per-corpus-item verdict: (id, best_bench, cos_micro, flagged). */
  def embedDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, tauMicro: Long): DataFrame = {
    import graft.functions.CosineSimilarity.cosineSim
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val b = bench.select(col(idCol).as("bid"),
      col(vecCol).cast("array<double>").as("bv"))
    c.join(broadcast(b))
      .select(col("id"), col("bid"),
        floor(cosineSim(col("v"), col("bv")) * lit(1e6)).cast("long")
          .as("cm"))
      .groupBy("id")
      .agg(max_by(struct(col("cm"), (-col("bid")).as("nb")),
        struct(col("cm"), (-col("bid")).as("nb"))).as("best"))
      .select(col("id"), (-col("best.nb")).as("best_bench"),
        col("best.cm").as("cos_micro"),
        (col("best.cm") >= tauMicro).cast("int").as("flagged"))
  }

  private val dEmbedDecon = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      embedDecontaminate(emb.filter(col("vec_id") >= 10),
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        tauMicro = 350000L).orderBy("id")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            c AS (SELECT vec_id AS id, e FROM v WHERE vec_id >= 10),
            b AS (SELECT vec_id AS bid, e AS be FROM v WHERE vec_id < 10),
            scored AS (SELECT c.id, b.bid,
                CAST(floor(list_dot_product(c.e, b.be)
                  / (SQRT(list_dot_product(c.e, c.e))
                     * SQRT(list_dot_product(b.be, b.be))) * 1000000.0)
                  AS BIGINT) AS cm
              FROM c, b),
            best AS (SELECT id, bid AS best_bench, cm AS cos_micro
              FROM (SELECT id, bid, cm, row_number() OVER
                      (PARTITION BY id ORDER BY cm DESC, bid) AS rn
                    FROM scored)
              WHERE rn = 1)
            SELECT id, best_bench, cos_micro,
                   CAST(cos_micro >= 350000 AS INT) AS flagged
            FROM best ORDER BY id"""))

  val queries: Map[String, Q] = Map("q_d_embed_decon" -> dEmbedDecon)
}
