package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs and authorities (Kleinberg, JACM 1999) over the DIRECTED
  * semantic kNN graph — the spectral rank PageRank (q_s_graph_rank)
  * is not: the kNN relation is asymmetric (every node POINTS at k
  * neighbors, but popular nodes are POINTED AT arbitrarily often), and
  * HITS separates the two roles — authorities are the documents many
  * others select as neighbors (semantic centroids worth sampling),
  * hubs are the documents whose neighbor lists cover the authorities
  * (good expansion seeds). PageRank mixes both into one score.
  *
  * Exactness (rule 1, zero floats): the classic algorithm normalizes
  * every round — pure float. Fixed-round UNNORMALIZED mutual
  * reinforcement instead: h_0 = 1,
  *   a_i(v) = Σ_{u→v} h_{i−1}(u),   h_i(u) = Σ_{u→v} a_i(v)
  * — after i rounds the scores are exact integer PATH COUNTS
  * (alternating back/forward walks), which carry the same RANKING as
  * the normalized iterates at every step. Two rounds, decimal(38,0)
  * accumulators (values bound by (k·d_max)^2·... — 38 digits of
  * headroom; an overflow fails loudly under ANSI).
  *
  * Scale shape per round: ONE dst-keyed and ONE src-keyed
  * map-side-combined aggregation over the persisted edge set — the
  * q_s_graph_rank loop shape; nothing is ever all-pairs. */
object Hits {

  /** `rounds` unnormalized HITS rounds over directed edges (src, dst)
    * and a `nodes` (id) frame. Output: (id, hub_scaled, auth_scaled) —
    * exact integers; isolated nodes score (1-round hub base, 0). */
  def hits(nodes: DataFrame, edges: DataFrame, srcCol: String,
      dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    var h = nodes.select(col("id"), lit(1L).cast("decimal(38,0)").as("h"))
    var a = nodes.select(col("id"), lit(0L).cast("decimal(38,0)").as("a"))
    (1 to rounds).foreach { _ =>
      val aNew = e.join(h.select(col("id").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("h").as("asum"))
      a = nodes.join(aNew, Seq("id"), "left")
        .select(col("id"), coalesce(col("asum"),
          lit(0L).cast("decimal(38,0)")).as("a"))
        .localCheckpoint(true)
      val hNew = e.join(a.select(col("id").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum("a").as("hsum"))
      h = nodes.join(hNew, Seq("id"), "left")
        .select(col("id"), coalesce(col("hsum"),
          lit(0L).cast("decimal(38,0)")).as("h"))
        .localCheckpoint(true)
    }
    h.join(a, Seq("id"))
      .select(col("id"), col("h").cast("long").as("hub_scaled"),
        col("a").cast("long").as("auth_scaled"))
  }

  /** q_s_hits: two HITS rounds on the directed (16, 4, 5) kNN graph —
    * authorities = semantic centroids, hubs = expansion seeds. The
    * oracle unrolls both rounds as CTEs (exact integers, zero float
    * tolerance). */
  private val sHits = Q(
    (s, d) => {
      val er = KnnGraphCache.edges(s, d, 16, 4, 5)
        .select(col("qid").as("src"), col("neighbor").as("dst"))
      val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"))
      hits(nodes, er, "src", "dst", rounds = 2)
        .select(col("id").as("vec_id"), col("hub_scaled"),
          col("auth_scaled"))
        .orderBy("vec_id")
    },
    Some(("WITH " + SimilarityOps.knnGraphSql + """,
            e AS (SELECT qid AS src, id AS dst FROM r WHERE rank <= 5),
            h0 AS (SELECT vec_id AS id, CAST(1 AS HUGEINT) AS h FROM v),
            a1 AS (SELECT v.vec_id AS id, COALESCE(s.asum, 0) AS a FROM v
              LEFT JOIN (SELECT e.dst, SUM(h0.h) AS asum
                         FROM e JOIN h0 ON e.src = h0.id
                         GROUP BY e.dst) s ON v.vec_id = s.dst),
            h1 AS (SELECT v.vec_id AS id, COALESCE(s.hsum, 0) AS h FROM v
              LEFT JOIN (SELECT e.src, SUM(a1.a) AS hsum
                         FROM e JOIN a1 ON e.dst = a1.id
                         GROUP BY e.src) s ON v.vec_id = s.src),
            a2 AS (SELECT v.vec_id AS id, COALESCE(s.asum, 0) AS a FROM v
              LEFT JOIN (SELECT e.dst, SUM(h1.h) AS asum
                         FROM e JOIN h1 ON e.src = h1.id
                         GROUP BY e.dst) s ON v.vec_id = s.dst),
            h2 AS (SELECT v.vec_id AS id, COALESCE(s.hsum, 0) AS h FROM v
              LEFT JOIN (SELECT e.src, SUM(a2.a) AS hsum
                         FROM e JOIN a2 ON e.dst = a2.id
                         GROUP BY e.src) s ON v.vec_id = s.src)
            SELECT h2.id AS vec_id, CAST(h2.h AS BIGINT) AS hub_scaled,
              CAST(a2.a AS BIGINT) AS auth_scaled
            FROM h2 JOIN a2 ON h2.id = a2.id
            ORDER BY vec_id""").replace(" AS (", " AS MATERIALIZED (")))

  val queries: Map[String, Q] = Map("q_s_hits" -> sHits)
}
