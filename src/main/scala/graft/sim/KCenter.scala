package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez's farthest-point
  * traversal, Theor. Comput. Sci. 1985; the "k-Center-Greedy" of
  * Sener & Savarese ICLR'18 active-learning coresets) on cosine
  * dissimilarity — the diversity-FIRST selection next to the
  * relevance-first rungs: [[MmrDiversify]] diversifies a per-query
  * candidate list, this picks a corpus-level representative subset —
  * the standard shape for seeding annotation batches, picking few-shot
  * exemplars, and data pruning (keep the cover, drop the redundant
  * interior). Each step picks the point LEAST similar to everything
  * already selected (min over points of max-sim-to-selected), the
  * 2-approximation to the optimal k-cover.
  *
  * Determinism: pair similarities enter as 6-dp-lifted integer micro
  * (the [[MmrDiversify]] convention, NUMERIC_CONVENTION rule 3); the
  * seed is the minimum id; every later step argmins the exact-integer
  * (maxsim, id) pair — a total order both engines replay exactly. The
  * oracle unrolls all k steps as CTEs, so the hash certifies every
  * selection decision. The seed row reports maxsim_micro = 0 (nothing
  * selected before it — the MMR first-pick convention).
  *
  * Scale shape: each of the k steps is ONE corpus scan — the newest
  * center attaches as a 1-row broadcast, the running max-sim updates
  * map-side (`greatest`), and the argmin is a scalar `min(struct)`
  * AGGREGATION (partial map-side, one row per partition over the
  * wire — never a global window). State (id, vector, maxsim) is
  * checkpointed per step, so step t never replays steps 1..t-1.
  * O(k · corpus) total with k config-sized; nothing is ever pairwise. */
object KCenter {

  /** 6-dp fixed-point → integer micro, exact in both engines (rule 3). */
  private def micro(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)).cast("long")

  /** ms sentinel before any center is scored: below the -1e6 cosine
    * floor, so the first update always replaces it. */
  private val NoSim = -2000000L

  /** Greedy selection of `k` cover points. Output: (pick = 1..k in
    * selection order, id, maxsim_micro — the picked point's max
    * similarity to the previously-selected set). */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val vecs = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val seed = vecs.agg(min("id").as("id")).join(vecs, Seq("id"))
    var result = seed.select(lit(1L).as("pick"), col("id"),
      lit(0L).as("maxsim_micro"))
    var center = seed
    var cand = vecs.join(seed.select("id"), Seq("id"), "left_anti")
      .withColumn("ms", lit(NoSim))
    var exhausted = false
    (2 to k).foreach { t =>
      if (!exhausted) {
        val cu = cand
          .crossJoin(broadcast(center.select(col("v").as("cv"))))
          .withColumn("s", micro(round(
            graft.functions.CosineSimilarity.cosineSim(col("v"), col("cv")),
            6)))
          .select(col("id"), col("v"),
            greatest(col("ms"), col("s")).as("ms"))
          .localCheckpoint(true)
        // cheap on the checkpointed frame; a pool smaller than k stops
        // cleanly (the MMR exhaustion convention)
        if (cu.isEmpty) exhausted = true
        else {
          val pick = cu.agg(min(struct(col("ms"), col("id"))).as("m"))
            .select(col("m.id").as("id"), col("m.ms").as("maxsim_micro"))
          result = result.unionByName(
            pick.select(lit(t.toLong).as("pick"), col("id"),
              col("maxsim_micro")))
          center = pick.select("id").join(vecs, Seq("id"))
          cand = cu.join(pick.select("id"), Seq("id"), "left_anti")
        }
      }
    }
    result
  }

  /** The k unrolled greedy steps as oracle CTEs mirroring
    * [[kCenterSelect]] exactly. */
  private def stepsSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
            seed AS (SELECT MIN(id) AS id FROM v),
            sel1 AS (SELECT 1 AS pick, id, CAST(0 AS BIGINT) AS ms
                     FROM seed),
            cent1 AS (SELECT v.id, v.e FROM v JOIN sel1 ON v.id = sel1.id),
            cand1 AS (SELECT v.id, v.e, CAST($NoSim AS BIGINT) AS ms
              FROM v WHERE v.id NOT IN (SELECT id FROM sel1))"""
    (2 to k).foreach { t =>
      val p = t - 1
      sb ++= s""",
            cu$t AS (SELECT c.id, c.e, GREATEST(c.ms,
                CAST(FLOOR(ROUND(list_dot_product(c.e, x.e)
                    / (SQRT(list_dot_product(c.e, c.e))
                       * SQRT(list_dot_product(x.e, x.e))), 6)
                  * 1000000.0 + 0.5) AS BIGINT)) AS ms
              FROM cand$p c CROSS JOIN cent$p x),
            sel$t AS (SELECT $t AS pick, id, ms FROM (
                SELECT id, ms, row_number() OVER (ORDER BY ms, id) AS rn
                FROM cu$t) WHERE rn = 1),
            cent$t AS (SELECT v.id, v.e FROM v JOIN sel$t ON v.id = sel$t.id),
            cand$t AS (SELECT id, e, ms FROM cu$t
              WHERE id NOT IN (SELECT id FROM sel$t))"""
    }
    sb ++= s""",
            kc_out AS (${(1 to k)
      .map(t => s"SELECT pick, id, ms FROM sel$t")
      .mkString("\n              UNION ALL ")})"""
    sb.toString
  }

  /** q_s_kcenter: a 6-point cover of the embeddings table — the oracle
    * unrolls all six greedy steps (MATERIALIZED: each step references
    * its predecessor twice — the kCore exponential-inline lesson). */
  private val sKCenter = Q(
    (s, d) => kCenterSelect(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 6)
      .select(col("pick"), col("id").as("vec_id"), col("maxsim_micro"))
      .orderBy("pick"),
    Some(("""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings)"""
      + stepsSql(6) + """
            SELECT CAST(pick AS BIGINT) AS pick, id AS vec_id,
                   ms AS maxsim_micro
            FROM kc_out ORDER BY pick""")
      .replace(" AS (", " AS MATERIALIZED (")))

  val queries: Map[String, Q] = Map("q_s_kcenter" -> sKCenter)
}
