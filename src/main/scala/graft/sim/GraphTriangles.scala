package graft.sim

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient over the semantic
  * kNN graph — the graph-density diagnostics next to
  * [[SimilarityOps.knnGraph]]'s centrality ([[q_s_graph_rank]]): a
  * node's clustering coefficient separates documents sitting in a
  * COHESIVE semantic cluster (neighbors also neighbor each other —
  * redundancy candidates beyond pairwise near-dup) from hub documents
  * bridging unrelated regions (high degree, low closure — exactly the
  * docs SemDeDup-style pruning should keep).
  *
  * Scale shape — the degree-ordered orientation (Cohen 2009 / Suri &
  * Vassilvitskii WWW'11 "Counting triangles and the curse of the last
  * reducer"): every undirected edge is stored ONCE, directed from its
  * lower-(degree, id) endpoint, which bounds any node's out-degree by
  * O(√m) regardless of hub size — so the wedge self-join (keyed on the
  * apex) never explodes on a hub, and each triangle is generated
  * exactly once at its minimum vertex. The closing check is an equi-join
  * against the edge set on the (min, max) pair — a shuffle on edge keys,
  * never an all-pairs. Per-node counts then explode 3 rows per triangle.
  *
  * Cross-engine determinism: degrees, triangle counts and the doubled
  * closure ratio are exact integers end to end; the coefficient is
  * emitted in floor micro-units by integer division (2·T·1e6 div
  * deg·(deg−1)), null where degree < 2 leaves it undefined. */
object GraphTriangles {

  /** Per-node (id, deg, tri, cc_micro) from a directed edge list
    * (symmetrized and deduplicated here — kNN edges arrive directed). */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient each edge from its lower-(deg, id) endpoint; keep the
    // destination's (deg, id) for the wedge-side total order
    val ori = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("x"), col("b").as("y"), col("db").as("dy")))
          .otherwise(
            struct(col("b").as("x"), col("a").as("y"), col("da").as("dy")))
          .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.dy").as("dy"))
    // wedges at the apex x: unordered {y1, y2} pairs via the same
    // (deg, id) total order; closing edge looked up as (min, max)
    val e1 = ori.select(col("x"), col("y").as("y1"), col("dy").as("d1"))
    val e2 = ori.select(col("x"), col("y").as("y2"), col("dy").as("d2"))
    val tris = e1.join(e2, Seq("x"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("y1") < col("y2")))
      .join(und,
        least(col("y1"), col("y2")) === col("a") &&
          greatest(col("y1"), col("y2")) === col("b"))
    val tcnt = tris.select(explode(array(col("x"), col("y1"), col("y2")))
        .as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    deg.join(tcnt, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_micro",
        when(col("deg") > 1,
          expr("(tri * 2000000L) div (deg * (deg - 1))")))
  }

  private val sTriangles = Q(
    (s, d) => {
      val edges = KnnGraphCache.edges(s, d, 16, 4, 5)
      triangleStats(edges, "qid", "neighbor").orderBy("id")
    },
    Some("WITH " + SimilarityOps.knnGraphSql + """,
            er AS (SELECT qid, id FROM r WHERE rank <= 5),
            und AS (SELECT DISTINCT least(qid, id) AS a,
                greatest(qid, id) AS b
              FROM er WHERE qid <> id),
            deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
              FROM (SELECT a AS id FROM und
                    UNION ALL SELECT b FROM und)
              GROUP BY 1),
            ori AS (SELECT
                CASE WHEN da.deg < db.deg
                       OR (da.deg = db.deg AND und.a < und.b)
                     THEN und.a ELSE und.b END AS x,
                CASE WHEN da.deg < db.deg
                       OR (da.deg = db.deg AND und.a < und.b)
                     THEN und.b ELSE und.a END AS y,
                CASE WHEN da.deg < db.deg
                       OR (da.deg = db.deg AND und.a < und.b)
                     THEN db.deg ELSE da.deg END AS dy
              FROM und JOIN deg da ON da.id = und.a
                       JOIN deg db ON db.id = und.b),
            tris AS (SELECT e1.x, e1.y AS y1, e2.y AS y2
              FROM ori e1 JOIN ori e2 ON e1.x = e2.x
              JOIN und ON und.a = least(e1.y, e2.y)
                      AND und.b = greatest(e1.y, e2.y)
              WHERE e1.dy < e2.dy OR (e1.dy = e2.dy AND e1.y < e2.y)),
            nodes AS (SELECT x AS id FROM tris
                      UNION ALL SELECT y1 FROM tris
                      UNION ALL SELECT y2 FROM tris),
            tcnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS tri
              FROM nodes GROUP BY 1)
            SELECT deg.id, deg.deg,
                   COALESCE(tcnt.tri, 0) AS tri,
                   CASE WHEN deg.deg > 1 THEN
                     (COALESCE(tcnt.tri, 0) * 2000000) //
                       (deg.deg * (deg.deg - 1))
                   END AS cc_micro
            FROM deg LEFT JOIN tcnt ON tcnt.id = deg.id
            ORDER BY deg.id"""))

  val queries: Map[String, Q] = Map("q_s_triangles" -> sTriangles)
}
