package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual information between categorical column pairs — the
  * information-theoretic sibling of the χ² battery ([[ContingencyMath]]
  * answers "is there dependence?"; MI answers "how MUCH information
  * does one column carry about the other", in nats) plus the
  * √(H·H)-normalized NMI for cross-pair comparability. The standard
  * feature-dependence screen before encoding interactions or pruning
  * redundant categoricals.
  *
  * Scale shape: three map-side-combined aggregations — the (x,y) joint
  * counts (THE data pass) and the two marginals derived FROM the joint
  * counts (cell-cardinality input, not row-scale); everything after
  * operates on contingency cells. No row is read twice.
  *
  * Cross-engine determinism (the [[Anova]] convention): counts are
  * exact integers; each cell's term (p·ln ratio of exact-integer
  * ratios) is an identical expression tree both engines, and the three
  * float reductions — ΣMI terms, H(X), H(Y) — are SEQUENTIAL FOLDS over
  * key-sorted term lists (`aggregate` over `array_sort` ≡
  * `list_reduce(list(... ORDER BY ...))`), so every sum is
  * order-pinned; outputs floor to integer micro-nats. `ln` on
  * bit-identical doubles matches across engines (the q_t_bm25
  * precedent). */
object MutualInfo {

  /** One row per variable over (variable, x, y) string pairs:
    * (variable, n, cells, mi_micro, nmi_micro); degenerate variables
    * (single-valued either side → H = 0) report null NMI. */
  def pairwise(rows: DataFrame, varCol: String, xCol: String,
      yCol: String): DataFrame = {
    val xy = rows.groupBy(col(varCol).as("__var"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .agg(count(lit(1)).as("nxy"))
    val mx = xy.groupBy("__var", "__x").agg(sum("nxy").as("nx"))
    val my = xy.groupBy("__var", "__y").agg(sum("nxy").as("ny"))
    val nn = xy.groupBy("__var").agg(sum("nxy").as("n"))
    val dn = col("n").cast("double")
    val cells = xy
      .join(mx, Seq("__var", "__x"))
      .join(my, Seq("__var", "__y"))
      .join(broadcast(nn), Seq("__var"))
      .withColumn("term",
        col("nxy").cast("double") / dn *
          log(dn * col("nxy") / (col("nx").cast("double") * col("ny"))))
    def fold(df: DataFrame, keyCols: Seq[String], cCol: String,
        out: String) =
      df.groupBy("__var")
        .agg(collect_list(struct(
          keyCols.map(col) :+
            (col(cCol).cast("double") / dn *
              log(col(cCol).cast("double") / dn)).as("t"): _*)).as("__l"))
        .withColumn(out,
          -aggregate(transform(array_sort(col("__l")), s => s.getField("t")),
            lit(0.0), (acc, x) => acc + x))
        .select(col("__var"), col(out))
    val mi = cells.groupBy(col("__var"), col("n"))
      .agg(count(lit(1)).as("cells"),
        collect_list(struct(col("__x"), col("__y"), col("term").as("t")))
          .as("__l"))
      .withColumn("mi",
        aggregate(transform(array_sort(col("__l")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x))
    val hx = fold(mx.join(broadcast(nn), Seq("__var")), Seq("__x"), "nx", "hx")
    val hy = fold(my.join(broadcast(nn), Seq("__var")), Seq("__y"), "ny", "hy")
    mi.join(hx, Seq("__var")).join(hy, Seq("__var"))
      .select(col("__var").as("variable"), col("n"), col("cells"),
        floor(col("mi") * lit(1e6)).cast("long").as("mi_micro"),
        when(col("hx") * col("hy") > 0,
          floor(col("mi") / sqrt(col("hx") * col("hy")) * lit(1e6))
            .cast("long")).as("nmi_micro"))
  }

  private def workload(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    def slice(v: String, df: DataFrame,
        x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      df.select(lit(v).as("v"), x.cast("string").as("x"),
        y.cast("string").as("y"))
    slice("mktsegment_x_nation", Tables.customer(s, d),
        col("c_mktsegment"), col("c_nationkey"))
      .unionAll(slice("returnflag_x_linestatus", Tables.lineitem(s, d),
        col("l_returnflag"), col("l_linestatus")))
      .unionAll(slice("lang_x_source", Tables.documents(s, d),
        col("lang"), col("source")))
      .unionAll(slice("type_x_usermod", Tables.events(s, d),
        col("event_type"), col("user_id") % 7))
  }

  private val mMi = Q(
    (s, d) => pairwise(workload(s, d), "v", "x", "y").orderBy("variable"),
    Some("""WITH rows0 AS (
              SELECT 'mktsegment_x_nation' AS v, c_mktsegment AS x,
                     CAST(c_nationkey AS VARCHAR) AS y FROM customer
              UNION ALL
              SELECT 'returnflag_x_linestatus', l_returnflag, l_linestatus
              FROM lineitem
              UNION ALL
              SELECT 'lang_x_source', lang, source FROM documents
              UNION ALL
              SELECT 'type_x_usermod', event_type,
                     CAST(user_id % 7 AS VARCHAR) FROM events),
            xy AS (SELECT v, x, y, CAST(COUNT(*) AS BIGINT) AS nxy
              FROM rows0 GROUP BY 1, 2, 3),
            mx AS (SELECT v, x, CAST(SUM(nxy) AS BIGINT) AS nx
              FROM xy GROUP BY 1, 2),
            my AS (SELECT v, y, CAST(SUM(nxy) AS BIGINT) AS ny
              FROM xy GROUP BY 1, 2),
            nn AS (SELECT v, CAST(SUM(nxy) AS BIGINT) AS n
              FROM xy GROUP BY 1),
            cells AS (SELECT xy.v, xy.x, xy.y, xy.nxy, nn.n,
                CAST(xy.nxy AS DOUBLE) / CAST(nn.n AS DOUBLE)
                  * ln(CAST(nn.n AS DOUBLE) * xy.nxy
                       / (CAST(mx.nx AS DOUBLE) * my.ny)) AS term
              FROM xy JOIN mx ON xy.v = mx.v AND xy.x = mx.x
                      JOIN my ON xy.v = my.v AND xy.y = my.y
                      JOIN nn ON xy.v = nn.v),
            mi AS (SELECT v, ANY_VALUE(n) AS n,
                CAST(COUNT(*) AS BIGINT) AS cells,
                list_reduce(list(term ORDER BY x, y),
                  (acc, t) -> acc + t) AS mi
              FROM cells GROUP BY 1),
            hx AS (SELECT mx.v,
                -list_reduce(list(CAST(nx AS DOUBLE) / CAST(nn.n AS DOUBLE)
                    * ln(CAST(nx AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  ORDER BY mx.x), (acc, t) -> acc + t) AS hx
              FROM mx JOIN nn ON mx.v = nn.v GROUP BY 1),
            hy AS (SELECT my.v,
                -list_reduce(list(CAST(ny AS DOUBLE) / CAST(nn.n AS DOUBLE)
                    * ln(CAST(ny AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  ORDER BY my.y), (acc, t) -> acc + t) AS hy
              FROM my JOIN nn ON my.v = nn.v GROUP BY 1)
            SELECT mi.v AS variable, mi.n, mi.cells,
                   CAST(floor(mi.mi * 1000000.0) AS BIGINT) AS mi_micro,
                   CASE WHEN hx.hx * hy.hy > 0 THEN
                     CAST(floor(mi.mi / sqrt(hx.hx * hy.hy) * 1000000.0)
                       AS BIGINT)
                   END AS nmi_micro
            FROM mi JOIN hx ON mi.v = hx.v JOIN hy ON mi.v = hy.v
            ORDER BY variable"""))

  val queries: Map[String, Q] = Map("q_m40_mutual_info" -> mMi)
}
