package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Expected Reciprocal Rank (Chapelle, Metlzer, Zhang & Grinspan,
  * CIKM 2009) — the CASCADE-model retrieval metric nDCG (q_s_retrieval_eval)
  * is not: nDCG assumes the user scans every position; ERR models a
  * user who STOPS at the first satisfying result, so a great hit at
  * rank 1 nearly saturates the score and later redundancy adds almost
  * nothing — exactly the objective for RAG candidate generation where
  * one sufficient passage ends the cascade:
  *   ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i),  R = (2^g − 1)/2^gmax.
  *
  * Exactness (rule 1, zero floats): with gains g ∈ {0..3} (gmax = 3),
  * the stop factors (1−R) = (9−2^g)/8 ∈ {8,7,5,1}/8, so every prefix
  * product decomposes into COUNTED prime powers — 7^a1·5^a2 over the
  * preceding gain-1/gain-2 hits — and clearing the denominator
  * M = 8^k·2520 (2520 = lcm(1..10) makes 2520/r integral) turns each
  * term into the exact integer
  *   (2^g−1) · 7^a1 · 5^a2 · 8^(k−1−a1−a2−a3) · (2520 div r),
  * an ORDER-FREE integer sum per query; err_micro = (Σ·1e6) div M.
  * Non-relevant results never enter (their stop factor is exactly 1).
  * Requires k ≤ 10 (the 2520 divisibility), enforced.
  *
  * Scale shape: run and qrels are per-query bounded (queries·k rows);
  * the evaluation is one (qid, neighbor) equi-join plus a qid-keyed
  * window over ≤ k hit rows. Nothing touches the corpus. */
object Err {

  /** Per-query ERR for `run` (qid, rank, neighbor) against graded
    * `qrels` (qid, neighbor, gain ∈ 0..3). Output: (qid, hits,
    * err_micro) — one row per qrels query, 0 when nothing relevant was
    * retrieved in the top k. */
  def errGraded(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"errGraded supports k in 1..10, got $k")
    val m = (1L << (3 * k)) * 2520L
    val wPrev = Window.partitionBy("qid").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, -1)
    def prevCnt(g: Int) = coalesce(
      sum(when(col("gain") === g, 1L).otherwise(0L)).over(wPrev), lit(0L))
    val hits = run.filter(col("rank") <= k)
      .join(qrels.filter(col("gain") > 0), Seq("qid", "neighbor"))
      .select(col("qid"), col("rank"), col("gain"))
      .withColumn("a1", prevCnt(1))
      .withColumn("a2", prevCnt(2))
      .withColumn("a3", prevCnt(3))
      .withColumn("term", expr(
        s"""(shiftleft(1L, cast(gain as int)) - 1L)
            * cast(power(7, a1) as long) * cast(power(5, a2) as long)
            * shiftleft(1L, 3 * (${k - 1} - cast(a1 + a2 + a3 as int)))
            * (2520L div rank)"""))
    val perQ = hits.groupBy("qid")
      .agg(count(lit(1)).as("hits"), sum("term").as("s"))
    qrels.select("qid").distinct()
      .join(perQ, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(expr(s"(s * 1000000L) div ${m}L"), lit(0L))
          .as("err_micro"))
      .orderBy("qid")
  }

  /** q_s_err: the seeded-IVF probe (16, 4, k=10) cascade-scored
    * against the exact brute-force top-3 with gains 3/2/1 — the
    * stop-model twin of q_s_retrieval_eval on the identical run. */
  private val sErr = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val run = SimilarityOps.ivfSeededTopK(emb, "vec_id", "embedding",
        nList = 16, nProbe = 4, k = 10, col("id") < 5)
      val qrels = SimilarityOps.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
        .select(col("qid"), col("neighbor"),
          (lit(4) - col("rank")).cast("long").as("gain"))
      errGraded(run.select("qid", "rank", "neighbor"), qrels, k = 10)
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            cent AS (SELECT vec_id AS cid, e AS cv FROM v WHERE vec_id < 16),
            dist AS (SELECT v.vec_id AS id, cent.cid,
                COALESCE(list_sum(list_transform(range(0, 64),
                  i -> (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1])
                     * (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1]))), 0)
                  AS d2
              FROM v CROSS JOIN cent),
            ar AS (SELECT id, cid, row_number() OVER
                     (PARTITION BY id ORDER BY d2, cid) AS r FROM dist),
            assigned AS (SELECT id, cid AS list FROM ar WHERE r = 1),
            probes AS (SELECT id AS qid, cid AS list FROM ar
                       WHERE r <= 4 AND id < 5),
            cand AS (SELECT DISTINCT qid, a.id
              FROM assigned a JOIN probes p ON a.list = p.list
              WHERE a.id <> p.qid),
            scored AS (SELECT cand.qid, cand.id,
                list_dot_product(a.e, b.e)
                  / (SQRT(list_dot_product(a.e, a.e))
                     * SQRT(list_dot_product(b.e, b.e))) AS cosine
              FROM cand JOIN v a ON a.vec_id = cand.id
                        JOIN v b ON b.vec_id = cand.qid),
            run AS (SELECT qid, id AS neighbor, row_number() OVER
                      (PARTITION BY qid ORDER BY cosine DESC, id) AS rank
                    FROM scored QUALIFY rank <= 10),
            bf AS (SELECT q.vec_id AS qid, v.vec_id AS id,
                list_dot_product(v.e, q.e)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(q.e, q.e))) AS cosine
              FROM v CROSS JOIN (SELECT * FROM v WHERE vec_id < 5) q
              WHERE v.vec_id <> q.vec_id),
            qrels AS (SELECT qid, id AS neighbor,
                CAST(4 - rank AS BIGINT) AS gain
              FROM (SELECT qid, id, row_number() OVER
                      (PARTITION BY qid ORDER BY cosine DESC, id) AS rank
                    FROM bf) WHERE rank <= 3),
            hits AS (SELECT r.qid, r.rank, q.gain
              FROM run r JOIN qrels q
                ON r.qid = q.qid AND r.neighbor = q.neighbor
              WHERE q.gain > 0),
            hw AS (SELECT qid, rank, gain,
                COALESCE(SUM(CASE WHEN gain = 1 THEN 1 ELSE 0 END)
                  OVER prev, 0) AS a1,
                COALESCE(SUM(CASE WHEN gain = 2 THEN 1 ELSE 0 END)
                  OVER prev, 0) AS a2,
                COALESCE(SUM(CASE WHEN gain = 3 THEN 1 ELSE 0 END)
                  OVER prev, 0) AS a3
              FROM hits
              WINDOW prev AS (PARTITION BY qid ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
            terms AS (SELECT qid,
                ((1 << CAST(gain AS INT)) - 1)
                  * CAST(power(7, a1) AS BIGINT)
                  * CAST(power(5, a2) AS BIGINT)
                  * (1::BIGINT << (3 * (9 - CAST(a1 + a2 + a3 AS INT))))
                  * (2520 // rank) AS term
              FROM hw),
            perq AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS hits,
                SUM(term) AS s FROM terms GROUP BY qid)
            SELECT q.qid, COALESCE(p.hits, 0) AS hits,
              CAST(COALESCE((p.s * 1000000) // 2705829396480, 0)
                AS BIGINT) AS err_micro
            FROM (SELECT DISTINCT qid FROM qrels) q
            LEFT JOIN perq p ON q.qid = p.qid
            ORDER BY q.qid"""))

  val queries: Map[String, Q] = Map("q_s_err" -> sErr)
}
