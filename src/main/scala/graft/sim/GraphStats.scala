package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-partition quality and degree-mixing diagnostics over the
  * mutual semantic kNN graph — the two numbers that certify the graph
  * family's OUTPUTS rather than its structure: Newman–Girvan
  * modularity (Newman & Girvan, Phys. Rev. E 2004) scores how much
  * denser the LPA communities (q_s_lpa) are inside than a degree-
  * preserving random graph (Q ≈ 0 → the "communities" are noise;
  * curation should not sample by them); Newman's degree assortativity
  * (Newman, Phys. Rev. Lett. 2002) is the Pearson correlation of
  * degrees across edges — hub-to-hub semantic cores score positive,
  * hub-and-spoke topologies (one centroid document glued to many
  * periphery docs — a dedup/boilerplate smell) score negative.
  *
  * Exactness (rule 1): both statistics clear denominators into exact
  * integers. With the symmetric edge relation (each undirected edge as
  * two rows, M2 rows total), per community intra2_c (internal rows)
  * and deg_c (rows leaving c):
  *   Q·M2² = Σ_c (intra2_c·M2 − deg_c²)
  * — one signed pmod floor-division. Assortativity over edge-endpoint
  * degrees (j, k): num = M·Σjk − Σj·Σk and d1/d2 the cleared
  * variances; r² emits as the exact rational sign(num)·num²/(d1·d2),
  * r as ONE identical √ tree floored micro. Degenerate (regular graph,
  * d1·d2 = 0) → null.
  *
  * Scale shape: modularity = two label-keyed equi-joins onto the edge
  * relation + ONE map-side community aggregation; assortativity = one
  * degree aggregation + two id-keyed joins + ONE scalar reduce.
  * Nothing is ever all-pairs; totals attach as broadcast 1-row
  * frames. */
object GraphStats {

  /** Newman–Girvan modularity of `labels` (id, community) over the
    * SYMMETRIC edge relation `edges` (a, b). Output one row:
    * (n_communities, m2, q_micro) — q_micro signed, null on an empty
    * edge set. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
      .join(labels.select(col("id").as("a"), col("community").as("ca")),
        Seq("a"))
      .join(labels.select(col("id").as("b"), col("community").as("cb")),
        Seq("b"))
    val perC = e.groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("degc"),
        sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("intra2"))
    val m2 = perC.agg(sum("degc").as("m2"))
    perC.join(broadcast(m2))
      .select(col("community"),
        (col("intra2").cast("decimal(38,0)") * col("m2")
          - col("degc").cast("decimal(38,0)") * col("degc")).as("term"),
        col("m2"))
      .groupBy("m2")
      .agg(count(lit(1)).as("n_communities"), sum("term").as("qnum"))
      .select(col("n_communities"), col("m2"),
        when(col("m2") === 0, lit(null).cast("long"))
          .otherwise(graft.stats.Agreement.floorDiv(
            col("qnum") * 1000000L,
            col("m2").cast("decimal(38,0)") * col("m2")))
          .as("q_micro"))
  }

  /** Degree assortativity over the SYMMETRIC edge relation `edges`
    * (a, b). Output one row: (m2, r_micro, r2_micro, direction) —
    * r2_micro is the exact rational sign(num)·num²·1e6/(d1·d2);
    * r_micro the floored √ tree; null for regular graphs. */
  def assortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    val jk = e
      .join(deg.select(col("id").as("a"), col("d").as("j")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("k")), Seq("b"))
    jk.agg(count(lit(1)).as("m2"),
        sum(col("j").cast("decimal(38,0)")).as("sj"),
        sum(col("k").cast("decimal(38,0)")).as("sk"),
        sum(col("j").cast("decimal(38,0)") * col("j")).as("sjj"),
        sum(col("k").cast("decimal(38,0)") * col("k")).as("skk"),
        sum(col("j").cast("decimal(38,0)") * col("k")).as("sjk"))
      .select(col("m2"),
        (col("m2").cast("decimal(38,0)") * col("sjk")
          - col("sj") * col("sk")).as("num"),
        (col("m2").cast("decimal(38,0)") * col("sjj")
          - col("sj") * col("sj")).as("d1"),
        (col("m2").cast("decimal(38,0)") * col("skk")
          - col("sk") * col("sk")).as("d2"))
      .select(col("m2"),
        when(col("d1") * col("d2") > 0,
          floor(col("num").cast("double")
            / sqrt(col("d1").cast("double") * col("d2").cast("double"))
            * lit(1e6)).cast("long")).as("r_micro"),
        when(col("d1") * col("d2") > 0,
          signum(col("num")).cast("long")
            * expr("cast((num * num * 1000000) div (d1 * d2) as long)"))
          .as("r2_micro"),
        signum(col("num")).cast("long").as("direction"))
  }

  private def mutualEdges(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    val er = KnnGraphCache.edges(s, d, 16, 4, 5)
      .select(col("qid"), col("neighbor"))
    er.join(
        er.select(col("neighbor").as("qid"), col("qid").as("neighbor")),
        Seq("qid", "neighbor"), "left_semi")
      .select(col("qid").as("a"), col("neighbor").as("b"))
  }

  private def mutualSql: String =
    """,
            er AS (SELECT qid, id FROM r WHERE rank <= 5),
            em AS (SELECT a.qid AS a, a.id AS b FROM er a
              JOIN er b ON a.qid = b.id AND a.id = b.qid
              WHERE a.qid <> a.id)"""

  /** q_s_modularity: is the q_s_lpa partition real structure? The
    * 4-round LPA labels scored against the degree-preserving null on
    * the same mutual (16, 4, 5) graph. */
  private val sModularity = Q(
    (s, d) => {
      val em = mutualEdges(s, d)
      val nodes = Tables.embeddings(s, d).select(col("vec_id").as("id"))
      val labels = LabelProp.labelPropagate(nodes, em, "a", "b", rounds = 4)
        .select(col("id"), col("community"))
      modularity(em, labels)
    },
    Some(("WITH " + SimilarityOps.knnGraphSql + mutualSql
      + LabelProp.lpaStepsSql(4) + """,
            el AS (SELECT em.a, em.b, la.lab AS ca, lb.lab AS cb
              FROM em JOIN l4 la ON em.a = la.id
                      JOIN l4 lb ON em.b = lb.id),
            perc AS (SELECT ca AS community,
                CAST(COUNT(*) AS BIGINT) AS degc,
                CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
                  AS intra2
              FROM el GROUP BY 1),
            mm AS (SELECT CAST(SUM(degc) AS BIGINT) AS m2 FROM perc),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                ANY_VALUE(m2) AS m2,
                SUM(CAST(intra2 AS HUGEINT) * m2
                  - CAST(degc AS HUGEINT) * degc) AS qnum
              FROM perc, mm)
            SELECT n_communities, m2,
              CASE WHEN m2 = 0 THEN NULL
                ELSE CAST(((qnum * 1000000)
                  - (((qnum * 1000000) % (CAST(m2 AS HUGEINT) * m2)
                      + CAST(m2 AS HUGEINT) * m2)
                    % (CAST(m2 AS HUGEINT) * m2)))
                  // (CAST(m2 AS HUGEINT) * m2) AS BIGINT)
                END AS q_micro
            FROM agg""").replace(" AS (", " AS MATERIALIZED (")))

  /** q_s_assort: degree mixing of the mutual semantic graph — negative
    * = hub-and-spoke (boilerplate/centroid smell), positive = dense
    * same-degree cores. */
  private val sAssort = Q(
    (s, d) => assortativity(mutualEdges(s, d)),
    Some(("WITH " + SimilarityOps.knnGraphSql + mutualSql + """,
            deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS d
              FROM em GROUP BY 1),
            jk AS (SELECT da.d AS j, db.d AS k FROM em
              JOIN deg da ON em.a = da.id
              JOIN deg db ON em.b = db.id),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                SUM(CAST(j AS HUGEINT)) AS sj, SUM(CAST(k AS HUGEINT)) AS sk,
                SUM(CAST(j AS HUGEINT) * j) AS sjj,
                SUM(CAST(k AS HUGEINT) * k) AS skk,
                SUM(CAST(j AS HUGEINT) * k) AS sjk
              FROM jk),
            fin AS (SELECT m2,
                CAST(m2 AS HUGEINT) * sjk - sj * sk AS num,
                CAST(m2 AS HUGEINT) * sjj - sj * sj AS d1,
                CAST(m2 AS HUGEINT) * skk - sk * sk AS d2
              FROM agg)
            SELECT m2,
              CASE WHEN d1 * d2 > 0
                THEN CAST(floor(CAST(num AS DOUBLE)
                  / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) * 1e6)
                  AS BIGINT) END AS r_micro,
              CASE WHEN d1 * d2 > 0
                THEN CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                    ELSE 0 END
                  * ((num * num * 1000000) // (d1 * d2)) AS BIGINT)
                END AS r2_micro,
              CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS direction
            FROM fin""").replace(" AS (", " AS MATERIALIZED (")))

  val queries: Map[String, Q] = Map(
    "q_s_modularity" -> sModularity,
    "q_s_assort" -> sAssort)
}
