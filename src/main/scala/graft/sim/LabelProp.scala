package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation communities (Raghavan et al., Phys.
  * Rev. E 2007) over the mutual semantic kNN graph — the fourth rung of
  * the graph-diagnostics family: connected components
  * (q_s_semantic_clusters) answer "what is REACHABLE", k-core
  * (q_s_kcore) answers "what is DENSE", and label propagation answers
  * "what CLUSTERS" — communities denser inside than across, the
  * granularity a curation pipeline samples by when CC merges everything
  * through one weak bridge. Used for corpus domain discovery and as the
  * balancing key for cluster-aware mixture sampling.
  *
  * Determinism (the q_s_graph_rank fixed-unroll convention): the
  * classic algorithm breaks frequency ties at random and iterates to
  * convergence — both nondeterministic. Here every node starts labeled
  * with its own id, rounds are SYNCHRONOUS (all updates read the
  * previous round's labels) and FIXED in number, and the per-node
  * update takes the most frequent label among its neighbors PLUS ITS
  * OWN (the self-vote variant — pure synchronous updates oscillate
  * with period 2 on bipartite structure, a two-node edge never
  * converging; the self-vote is the standard inertia damping), ties to
  * the SMALLEST label — a total order both engines replay exactly. All
  * arithmetic is integer counting; the oracle unrolls every round as
  * CTEs, so the hash gate certifies each round's labels, not just the
  * final partition. Isolated nodes keep their own label (singleton
  * communities).
  *
  * Scale shape per round: ONE src-keyed equi-join (labels onto the
  * persisted edge set) + ONE map-side-combined (node, label) count +
  * ONE per-node argmax — expressed as `max(struct(count, -label))`, an
  * AGGREGATION (partial map-side) rather than a window, so no round
  * sorts anything node-scale. Labels are checkpointed per round (the
  * kCore lineage discipline) so round r never replays rounds 1..r-1.
  * O(rounds · |E|) total, shuffled on node ids — never all-pairs. */
object LabelProp {

  /** `rounds` synchronous min-tie label-propagation rounds. `nodes`:
    * one `id` column (every vertex, including isolated ones); `edges`:
    * directed adjacency (srcCol, dstCol) — pass a symmetric relation
    * for undirected semantics. Output: (id, community, community_size). */
  def labelPropagate(nodes: DataFrame, edges: DataFrame, srcCol: String,
      dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).localCheckpoint(true)
    var lab = nodes.select(col("id"), col("id").cast("long").as("lab"))
    (1 to rounds).foreach { _ =>
      // neighbor labels plus the node's own (self-vote)
      val contrib = e.join(lab.select(col("id").as("b"),
          col("lab").as("nlab")), Seq("b"))
        .select(col("a"), col("nlab"))
        .unionByName(lab.select(col("id").as("a"), col("lab").as("nlab")))
      val cnt = contrib.groupBy(col("a"), col("nlab"))
        .agg(count(lit(1)).as("c"))
      // argmax(count, min label) as a lexicographic struct MAX — one
      // aggregation with map-side partials; -label flips min to max
      val pick = cnt
        .groupBy(col("a").as("id"))
        .agg(max(struct(col("c"), (-col("nlab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("lab"))
      lab = pick.localCheckpoint(true)
    }
    val sizes = lab.groupBy("lab").agg(count(lit(1)).as("community_size"))
    lab.join(sizes, Seq("lab"))
      .select(col("id"), col("lab").as("community"), col("community_size"))
  }

  /** Oracle CTE chain for `rounds` unrolled LPA rounds: assumes `v`
    * (vec_id) and `em` (a, b — the symmetric mutual edge relation) are
    * in scope; emits l0..l`rounds`. */
  private[sim] def lpaStepsSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """,
            l0 AS (SELECT vec_id AS id, CAST(vec_id AS BIGINT) AS lab
                   FROM v)"""
    (1 to rounds).foreach { t =>
      val p = t - 1
      sb ++= s""",
            c$t AS (SELECT id, lab, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT em.a AS id, l.lab FROM em JOIN l$p l ON l.id = em.b
                UNION ALL SELECT id, lab FROM l$p
              ) GROUP BY 1, 2),
            l$t AS (SELECT id, lab FROM (
                SELECT id, lab, row_number() OVER
                  (PARTITION BY id ORDER BY c DESC, lab) AS rn
                FROM c$t) WHERE rn = 1)"""
    }
    sb.toString
  }

  /** q_s_lpa: 4 synchronous rounds on the MUTUAL (16, 4, 5) kNN graph
    * (the q_s_kcore reciprocal-neighbor filter — mutuality strips the
    * asymmetric hub edges that would otherwise glue communities). The
    * oracle unrolls all four rounds; MATERIALIZED pins each CTE to one
    * evaluation (each round references its predecessor twice — the
    * kCore exponential-inline lesson). */
  private val sLpa = Q(
    (s, d) => {
      val er = KnnGraphCache.edges(s, d, 16, 4, 5)
        .select(col("qid"), col("neighbor"))
      val mutual = er.join(
        er.select(col("neighbor").as("qid"), col("qid").as("neighbor")),
        Seq("qid", "neighbor"), "left_semi")
      val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"))
      labelPropagate(nodes, mutual, "qid", "neighbor", rounds = 4)
        .select(col("id").as("vec_id"), col("community"),
          col("community_size"))
        .orderBy("vec_id")
    },
    Some(("WITH " + SimilarityOps.knnGraphSql + """,
            er AS (SELECT qid, id FROM r WHERE rank <= 5),
            em AS (SELECT a.qid AS a, a.id AS b FROM er a
              JOIN er b ON a.qid = b.id AND a.id = b.qid
              WHERE a.qid <> a.id)"""
      + lpaStepsSql(4) + """,
            sz AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS community_size
                   FROM l4 GROUP BY 1)
            SELECT l4.id AS vec_id, l4.lab AS community, sz.community_size
            FROM l4 JOIN sz ON l4.lab = sz.lab
            ORDER BY vec_id""").replace(" AS (", " AS MATERIALIZED (")))

  val queries: Map[String, Q] = Map("q_s_lpa" -> sLpa)
}
