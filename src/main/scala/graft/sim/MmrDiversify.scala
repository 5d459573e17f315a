package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
  * SIGIR'98) — the standard redundancy-aware rerank for RAG context
  * assembly: greedily pick the candidate maximizing
  * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so the
  * selected set trades raw relevance against novelty. The near-dup
  * suppression this buys is exactly why a retrieval stack that dedups
  * its corpus still needs MMR at query time: near-dups below every
  * OFFLINE threshold (the MinHash/SemDeDup passes) still crowd a
  * 5-slot context window.
  *
  * Cross-engine determinism: relevance and pairwise similarities enter
  * as 6-dp-lifted integer micro (NUMERIC_CONVENTION rule 3); the greedy
  * objective `lamNum·rel − (lamDen−lamNum)·maxsim` is pure integer
  * arithmetic with ties broken by candidate id, so every selection step
  * is a total order both engines replay exactly — the oracle unrolls
  * the k steps as CTEs (the q_s_graph_rank fixed-iteration convention).
  *
  * Scale shape: candidates arrive per-query bounded (queries·n rows
  * from any first-stage ranker); the pair-similarity frame is
  * queries·n² — still workload-bounded, never corpus-scale. Each of
  * the k steps is one anti-join + one keyed max + one per-query argmax
  * window over those bounded frames; k and n are config. The corpus is
  * touched only by the candidate generator, which carries its own
  * at-scale plan. */
object MmrDiversify {

  /** 6-dp fixed-point → integer micro, exact in both engines (rule 3). */
  private def micro(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)).cast("long")

  /** Greedy MMR selection of `k` items per query.
    * `cands`: (qid, id, rel_micro); `sims`: (qid, a, b, s_micro),
    * symmetric, self-pairs absent. λ = lamNum/lamDen. Output:
    * (qid, pick, id, mmr_micro) with pick = 1..k in selection order;
    * the first pick's objective counts maxsim as 0. */
  def mmrSelect(cands0: DataFrame, sims0: DataFrame, k: Int,
      lamNum: Int, lamDen: Int): DataFrame = {
    require(k >= 1 && lamNum > 0 && lamNum <= lamDen,
      "need k >= 1 and 0 < lamNum <= lamDen")
    // persist both inputs: the k-step greedy chain references them in
    // EVERY step's subtree, and without the cut the final plan re-runs
    // the candidate GENERATOR (a corpus-scale first-stage ranker) and
    // the pair-sim build once per step — k redundant corpus scans for
    // the registered brute-force-fed query. Both frames are
    // workload-bounded (queries*n / queries*n^2), never corpus-scale
    val cands = cands0.persist()
    val sims = sims0.persist()
    val w = Window.partitionBy("qid").orderBy(col("mmr").desc, col("id"))
    def argmax(scored: DataFrame, pick: Int): DataFrame =
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("qid"), lit(pick.toLong).as("pick"), col("id"),
          col("mmr").as("mmr_micro"))
    // r15: truncate each step's lineage (the connectedComponents loop
    // idiom — lazy localCheckpoint re-wrapped as a fresh LogicalRDD).
    // Each greedy step references the accumulated result TWICE (the
    // anti-join's picked set and the union), so the untruncated plan
    // doubled per step — ~2^k window/argmax subtrees, a 500 KB
    // formatted plan at k=4, re-analyzed and partially re-executed on
    // every step (measured: the registered query spent ~7 of its 9 s
    // there). With the cut, each step is one anti-join + one keyed max
    // + one argmax window over the persisted inputs. Lazy (not eager):
    // the single terminal action materializes all k steps in one job
    // chain. Per-step picks are workload-bounded (queries × k rows).
    def truncate(df: DataFrame): DataFrame =
      df.sparkSession.createDataFrame(
        df.localCheckpoint(eager = false).rdd, df.schema)
    var result = truncate(argmax(
      cands.withColumn("mmr", col("rel_micro") * lamNum), 1))
    (2 to k).foreach { t =>
      val picked = result.select(col("qid"), col("id"))
      val remaining = cands.join(picked, Seq("qid", "id"), "left_anti")
      val ms = sims.select(col("qid"), col("a").as("id"), col("b"),
          col("s_micro"))
        .join(picked.withColumnRenamed("id", "b"), Seq("qid", "b"))
        .groupBy("qid", "id").agg(max("s_micro").as("maxsim"))
      val scored = remaining.join(ms, Seq("qid", "id"), "left")
        .withColumn("mmr", col("rel_micro") * lamNum
          - coalesce(col("maxsim"), lit(0L)) * (lamDen - lamNum))
      result = truncate(result.unionByName(argmax(scored, t)))
    }
    result
  }

  /** The k unrolled selection steps as oracle CTEs, mirroring
    * [[mmrSelect]] exactly: assumes CTEs `cand` (qid, id, rel) and
    * `sim` (qid, a, b, s) are in scope; emits r1..rk and sel1..selk,
    * ending with a UNION ALL of all picks as CTE `mmr_out`. */
  private def mmrStepsSql(k: Int, lamNum: Int, lamDen: Int): String = {
    val lamRem = lamDen - lamNum
    val sb = new StringBuilder
    sb ++= s""",
            r1 AS (SELECT qid, 1 AS pick, id, $lamNum * rel AS mmr
              FROM (SELECT qid, id, rel, row_number() OVER
                      (PARTITION BY qid ORDER BY rel DESC, id) AS rn
                    FROM cand) WHERE rn = 1),
            sel1 AS (SELECT qid, id FROM r1)"""
    (2 to k).foreach { t =>
      sb ++= s""",
            m$t AS (SELECT c.qid, c.id, c.rel, MAX(s.s) AS ms
              FROM cand c
              JOIN sim s ON s.qid = c.qid AND s.a = c.id
              JOIN sel${t - 1} x ON x.qid = c.qid AND x.id = s.b
              WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} y
                                WHERE y.qid = c.qid AND y.id = c.id)
              GROUP BY c.qid, c.id, c.rel),
            r$t AS (SELECT qid, $t AS pick, id, mmr
              FROM (SELECT qid, id,
                      $lamNum * rel - $lamRem * ms AS mmr,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY $lamNum * rel - $lamRem * ms DESC, id)
                        AS rn
                    FROM m$t) WHERE rn = 1),
            sel$t AS (SELECT qid, id FROM sel${t - 1}
                      UNION ALL SELECT qid, id FROM r$t)"""
    }
    sb ++= s""",
            mmr_out AS (${(1 to k)
      .map(t => s"SELECT qid, pick, id, mmr FROM r$t")
      .mkString("\n              UNION ALL ")})"""
    sb.toString
  }

  /** q_s_mmr: brute-force top-8 per query (vec_id < 5) diversified to 4
    * picks at λ = 0.7 — the oracle unrolls all four greedy steps, so
    * the hash certifies every selection decision, not just the final
    * set. */
  private val sMmr = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cands = SimilarityOps.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 8)
        .select(col("qid"), col("neighbor").as("id"),
          micro(col("cosine")).as("rel_micro"))
      val vecs = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      val cv = cands.select("qid", "id").join(vecs, Seq("id"))
      val sims = cv.select(col("qid"), col("id").as("a"), col("v").as("va"))
        .join(cv.select(col("qid"), col("id").as("b"), col("v").as("vb")),
          Seq("qid"))
        .filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          micro(round(graft.functions.CosineSimilarity.cosineSim(
            col("va"), col("vb")), 6)).as("s_micro"))
      mmrSelect(cands, sims, k = 4, lamNum = 7, lamDen = 10)
        .orderBy("qid", "pick")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            bf AS (SELECT q.vec_id AS qid, v.vec_id AS id,
                list_dot_product(v.e, q.e)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(q.e, q.e))) AS cosine
              FROM v CROSS JOIN (SELECT * FROM v WHERE vec_id < 5) q
              WHERE v.vec_id <> q.vec_id),
            cand AS (SELECT qid, id,
                CAST(FLOOR(ROUND(cosine, 6) * 1000000.0 + 0.5) AS BIGINT)
                  AS rel
              FROM (SELECT qid, id, cosine, row_number() OVER
                      (PARTITION BY qid ORDER BY cosine DESC, id) AS rank
                    FROM bf) WHERE rank <= 8),
            cv AS (SELECT c.qid, c.id, v.e
              FROM cand c JOIN v ON v.vec_id = c.id),
            sim AS (SELECT a.qid, a.id AS a, b.id AS b,
                CAST(FLOOR(ROUND(
                  list_dot_product(a.e, b.e)
                    / (SQRT(list_dot_product(a.e, a.e))
                       * SQRT(list_dot_product(b.e, b.e))), 6)
                  * 1000000.0 + 0.5) AS BIGINT) AS s
              FROM cv a JOIN cv b ON a.qid = b.qid AND a.id <> b.id)"""
      + mmrStepsSql(4, 7, 10) + """
            SELECT qid, CAST(pick AS BIGINT) AS pick, id,
                CAST(mmr AS BIGINT) AS mmr_micro
            FROM mmr_out ORDER BY qid, pick"""))

  val queries: Map[String, Q] = Map("q_s_mmr" -> sMmr)
}
