package graft.sim

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition over the semantic kNN graph — the third rung of
  * the graph-diagnostics family (q_s_graph_rank centrality,
  * q_s_triangles closure): the k-core is the maximal subgraph where
  * every node keeps ≥ k neighbors, the standard "dense semantic
  * region" extractor (a document outside every 3-core has at most two
  * sticky neighbors — tail content; the deep cores are the redundancy
  * hotspots cluster-balanced sampling should thin).
  *
  * Algorithm: the peel — repeatedly delete nodes of degree < k — run a
  * FIXED `rounds` times so the result is a deterministic function of
  * the edge set (the q_s_graph_rank fixed-unroll convention; no
  * convergence-threshold nondeterminism). A `converged` flag (edge
  * count unchanged in the final round) certifies the fixpoint — on the
  * kNN graph (degree ≤ 2k) the peel settles in a handful of rounds,
  * and the spec asserts convergence at the registered parameters.
  *
  * Scale shape per round: one map-side-combined degree aggregation +
  * two semi-joins keyed on the edge endpoints — never an all-pairs,
  * never a collect. Rounds are a small constant, so the whole peel is
  * O(rounds · |E|) shuffled on node ids. Everything is exact integer
  * counting — no float anywhere. */
object KCore {

  /** Nodes of the `k`-core after `rounds` peels. Output: (id,
    * deg_core — degree within the surviving subgraph, converged). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // materialize the symmetrized edge set once: the peel loop takes
    // three actions (two convergence counts + the final degrees) and
    // without the cut each would replay the upstream graph build (the
    // kNN construction) through a 6-round plan
    val und0 = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    def deg(e: DataFrame) =
      e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    def peel(e: DataFrame): DataFrame = {
      val keep = deg(e).filter(col("deg") >= k).select("id")
      e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
    }
    // lineage cut per round (the standard iterative-graph discipline):
    // without it the final actions carry a rounds-deep join tree and
    // the optimizer re-plans the whole peel history every time
    var e = und0
    var prev = und0
    for (_ <- 1 to rounds) { prev = e; e = peel(e).localCheckpoint(true) }
    // convergence certificate: the last peel removed nothing
    val converged = e.count() == prev.count()
    deg(e).select(col("id"), col("deg").as("deg_core"),
      lit(converged).as("converged"))
  }

  /** Registered on the MUTUAL kNN graph (edge kept only when each
    * endpoint ranks the other in its top-k — the reciprocal-neighbor
    * filter SemDeDup-style pipelines use): the symmetric union graph is
    * near-regular (everyone has ≥ k neighbors by construction) so no
    * peel bites; mutuality restores the degree variance the core
    * structure lives in. */
  private val sKCore = Q(
    (s, d) => {
      val er = KnnGraphCache.edges(s, d, 16, 4, 5)
        .select(col("qid"), col("neighbor"))
      val mutual = er.join(
        er.select(col("neighbor").as("qid"), col("qid").as("neighbor")),
        Seq("qid", "neighbor"), "left_semi")
      kCore(mutual, "qid", "neighbor", k = 3, rounds = 12).orderBy("id")
    },
    Some {
      val peels = (1 to 12).map { t =>
        val p = t - 1
        s"""n$t AS (SELECT id FROM (
                SELECT a AS id FROM e$p UNION ALL SELECT b FROM e$p)
              GROUP BY 1 HAVING COUNT(*) >= 3),
            e$t AS (SELECT a, b FROM e$p
              WHERE a IN (SELECT id FROM n$t)
                AND b IN (SELECT id FROM n$t))"""
      }.mkString(",\n            ")
      // MATERIALIZED pins every CTE to one evaluation — each peel round
      // references its predecessor three times, so inlining would
      // expand the graph build 3^rounds times (the QualityClassifier
      // oracle lesson, same failure mode: fd exhaustion)
      ("WITH " + SimilarityOps.knnGraphSql + s""",
            er AS (SELECT qid, id FROM r WHERE rank <= 5),
            em AS (SELECT a.qid, a.id FROM er a
              JOIN er b ON a.qid = b.id AND a.id = b.qid),
            e0 AS (SELECT DISTINCT least(qid, id) AS a,
                greatest(qid, id) AS b
              FROM em WHERE qid <> id),
            $peels,
            conv AS (SELECT (SELECT COUNT(*) FROM e12)
                = (SELECT COUNT(*) FROM e11) AS converged)
            SELECT id, CAST(COUNT(*) AS BIGINT) AS deg_core,
                   (SELECT converged FROM conv) AS converged
            FROM (SELECT a AS id FROM e12 UNION ALL SELECT b FROM e12)
            GROUP BY 1 ORDER BY id""")
        .replace(" AS (", " AS MATERIALIZED (")
    })

  val queries: Map[String, Q] = Map("q_s_kcore" -> sKCore)
}
