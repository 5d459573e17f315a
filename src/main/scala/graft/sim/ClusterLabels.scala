package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic-cluster labeling by class-based TF-IDF (the BERTopic
  * c-TF-IDF idea, Grootendorst 2022): a clustering without labels is
  * unreviewable — per cluster, rank terms by in-cluster frequency
  * weighted by how few OTHER clusters use them, and the top terms ARE
  * the cluster's human-readable label. Composes two proven surfaces:
  * [[SimilarityOps.semanticClusters]] (embedding CC clusters) and the
  * token pipeline.
  *
  * Scale shape: cluster assignment rides the knn+CC plan; the term
  * pass is one explode + (cluster, term) map-side-combined count;
  * cluster-document frequencies derive from those cells (cell-scale,
  * not token-scale); per-cluster ranking is the bounded GroupedTopK
  * heap. Nothing token-scale shuffles twice.
  *
  * Cross-engine determinism: counts exact; each term score
  * ctf·ln(C/df) is an identical expression tree both engines (`ln` on
  * identical doubles — the q_t_bm25 precedent) FLOORED to micro before
  * ranking, ties on the term string. */
object ClusterLabels {

  /** Top-`k` label terms per cluster of size ≥ `minSize`. Output:
    * (cluster, rank, term, score_micro). */
  def labelClusters(clusters: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, k: Int, minSize: Long): DataFrame = {
    // materialize the assignment once: three consumers follow (the
    // cluster count, the term join, and the df derivation) and each
    // would otherwise re-evaluate the upstream knn+CC build
    val big = clusters.filter(col("cluster_size") >= minSize)
      .select(col("vec_id"), col("cluster"))
      .localCheckpoint(true)
    val terms = docs.select(col(idCol).as("vec_id"),
        explode(graft.text.TextOps.tokens(lower(col(textCol))))
          .as("term"))
      .join(big, Seq("vec_id"))
    val ctf = terms.groupBy("cluster", "term")
      .agg(count(lit(1)).as("ctf"))
    val nClusters = big.select("cluster").distinct().count()
    val df = ctf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = ctf.join(df, Seq("term"))
      .withColumn("score_micro",
        floor(col("ctf").cast("double") *
          log(lit(nClusters.toDouble) / col("df")) * lit(1e6))
          .cast("long"))
    val top = graft.plans.GroupedTopK.topK(scored, Seq("cluster"),
      Seq("score_micro" -> true, "term" -> false), k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster")
          .orderBy(col("score_micro").desc, col("term"))).cast("long"))
      .select(col("cluster"), col("rank"), col("term"), col("score_micro"))
  }

  private val sLabels = Q(
    (s, d) => {
      val clusters = SimilarityOps.semanticClusters(Tables.embeddings(s, d),
        "vec_id", "embedding", nList = 16, nProbe = 4, k = 5,
        minCosine = 0.38,
        graph = Some(KnnGraphCache.edges(s, d, 16, 4, 5)))
      labelClusters(clusters, Tables.documents(s, d), "doc_id", "text",
        k = 3, minSize = 3).orderBy("cluster", "rank")
    },
    Some("WITH RECURSIVE " + SimilarityOps.knnGraphSql + """,
            p AS (SELECT qid AS ida, id AS idb FROM r
                  WHERE rank <= 5 AND ROUND(cosine, 6) >= 0.38),
            e AS (SELECT ida AS a, idb AS b FROM p
                  UNION SELECT idb AS a, ida AS b FROM p),
            reach AS (SELECT a, b FROM e
                      UNION
                      SELECT rc.a, e2.b FROM reach rc JOIN e e2 ON rc.b = e2.a
                      WHERE e2.b <> rc.a),
            comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS comp
                     FROM reach GROUP BY a),
            lab AS (SELECT v.vec_id, COALESCE(c.comp, v.vec_id) AS cluster
                    FROM v LEFT JOIN comp c ON v.vec_id = c.id),
            sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
                   FROM lab GROUP BY 1),
            big AS (SELECT lab.vec_id, lab.cluster FROM lab
                    JOIN sz ON lab.cluster = sz.cluster WHERE sz.n >= 3),
            terms AS (SELECT big.cluster, tk.term
              FROM (SELECT doc_id, unnest(list_filter(
                      string_split(lower(text), ' '), x -> x <> ''))
                      AS term
                    FROM documents) tk
              JOIN big ON tk.doc_id = big.vec_id),
            ctf AS (SELECT cluster, term, CAST(COUNT(*) AS BIGINT) AS ctf
                    FROM terms GROUP BY 1, 2),
            nc AS (SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT) AS c
                   FROM big),
            dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                    FROM ctf GROUP BY 1),
            sc2 AS (SELECT ctf.cluster, ctf.term,
                CAST(floor(CAST(ctf.ctf AS DOUBLE)
                  * ln(CAST(nc.c AS DOUBLE) / dfq.df) * 1000000.0)
                  AS BIGINT) AS score_micro
              FROM ctf JOIN dfq ON ctf.term = dfq.term CROSS JOIN nc),
            rk AS (SELECT cluster, term, score_micro, row_number() OVER
                     (PARTITION BY cluster
                      ORDER BY score_micro DESC, term) AS rank
                   FROM sc2)
            SELECT cluster, CAST(rank AS BIGINT) AS rank, term,
                   score_micro
            FROM rk WHERE rank <= 3 ORDER BY cluster, rank"""))

  val queries: Map[String, Q] = Map("q_s_cluster_labels" -> sLabels)
}
