package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical association effect sizes — Cramér's V (Cramér,
  * Mathematical Methods of Statistics 1946) and Theil's uncertainty
  * coefficient U (Theil, Statistical Decomposition Analysis 1972) —
  * the MAGNITUDE readouts the engine's dependence tests stop short of:
  * χ² (q_m20) and MI (q_m40) grow with n for a FIXED association, so
  * they rank variable pairs by sample size as much as by strength.
  * V² = χ²/(n·(min(r,c)−1)) is 0..1 and comparable across table
  * shapes; U(X|Y) = MI/H(X) is the PROPORTION of X's entropy explained
  * by Y — and unlike V it is asymmetric, exposing which direction the
  * information flows.
  *
  * Cross-engine determinism (the [[MutualInfo]] convention): exact
  * integer counts; each cell's χ²/MI/H terms are identical expression
  * trees; every float reduction is a SEQUENTIAL FOLD over key-sorted
  * terms; outputs floor to micro. Empty cells of the r×c grid
  * contribute to χ² in CLOSED FORM — Σ over absent cells of E equals
  * n − Σ_observed E, so the fold runs over observed cells only and
  * adds `+ n` once: χ² = fold[(O·n−E')²/(n·E') − E'/n] + n with
  * E' = nx·ny. No dense grid is materialized.
  *
  * Scale shape: one (x, y) joint-counts pass per variable (THE data
  * pass); marginals derive from the joint cells; everything after
  * operates on contingency cells. */
object Association {

  /** Per-variable effect sizes over (variable, x, y) string pairs:
    * (variable, n, r, c, chi2_micro, v2_micro, u_xy_micro,
    * u_yx_micro). v2 is null for degenerate 1×c / r×1 tables; the
    * uncertainty coefficients are null when the respective entropy is
    * zero. */
  def measures(rows: DataFrame, varCol: String, xCol: String,
      yCol: String): DataFrame = {
    val xy = rows.groupBy(col(varCol).as("__var"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .agg(count(lit(1)).as("nxy"))
    val mx = xy.groupBy("__var", "__x").agg(sum("nxy").as("nx"))
    val my = xy.groupBy("__var", "__y").agg(sum("nxy").as("ny"))
    val rc = mx.groupBy("__var").agg(count(lit(1)).as("r"))
      .join(my.groupBy("__var").agg(count(lit(1)).as("c")), Seq("__var"))
    val nn = xy.groupBy("__var").agg(sum("nxy").as("n"))
    val dn = col("n").cast("double")
    val cells = xy
      .join(mx, Seq("__var", "__x"))
      .join(my, Seq("__var", "__y"))
      .join(broadcast(nn), Seq("__var"))
      // χ² fold term: (O−E)²/E − E, with the absent-cell mass added in
      // closed form (+n) after the fold; MI term as in q_m40
      .withColumn("chiterm",
        (col("nxy").cast("double") * dn - col("nx").cast("double") * col("ny"))
          * (col("nxy").cast("double") * dn - col("nx").cast("double") * col("ny"))
          / (dn * col("nx").cast("double") * col("ny"))
          - col("nx").cast("double") * col("ny") / dn)
      .withColumn("miterm",
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
    val folded = cells.groupBy(col("__var"), col("n"))
      .agg(collect_list(struct(col("__x"), col("__y"),
          col("chiterm").as("ct"), col("miterm").as("mt"))).as("__l"))
      .withColumn("chi2",
        aggregate(transform(array_sort(col("__l")), s => s.getField("ct")),
          lit(0.0), (acc, x) => acc + x) + dn)
      .withColumn("mi",
        aggregate(transform(array_sort(col("__l")), s => s.getField("mt")),
          lit(0.0), (acc, x) => acc + x))
    val hx = fold(mx.join(broadcast(nn), Seq("__var")), Seq("__x"), "nx", "hx")
    val hy = fold(my.join(broadcast(nn), Seq("__var")), Seq("__y"), "ny", "hy")
    folded.join(hx, Seq("__var")).join(hy, Seq("__var"))
      .join(broadcast(rc), Seq("__var"))
      .select(col("__var").as("variable"), col("n"), col("r"), col("c"),
        floor(col("chi2") * lit(1e6)).cast("long").as("chi2_micro"),
        when(least(col("r"), col("c")) > 1,
          floor(col("chi2") / (dn * (least(col("r"), col("c")) - 1))
            * lit(1e6)).cast("long")).as("v2_micro"),
        when(col("hx") > 0,
          floor(col("mi") / col("hx") * lit(1e6)).cast("long"))
          .as("u_xy_micro"),
        when(col("hy") > 0,
          floor(col("mi") / col("hy") * lit(1e6)).cast("long"))
          .as("u_yx_micro"))
      .orderBy("variable")
  }

  private def slice(v: String, df: DataFrame, x: Column, y: Column) =
    df.select(lit(v).as("v"), x.cast("string").as("x"),
      y.cast("string").as("y"))

  /** q_m79_assoc: the q_m40 variable pairs re-read as effect sizes —
    * V² for comparability across table shapes, U for direction. */
  private val mAssoc = Q(
    (s, d) =>
      measures(
        slice("mktsegment_x_nation", Tables.customer(s, d),
            col("c_mktsegment"), col("c_nationkey"))
          .unionAll(slice("returnflag_x_linestatus", Tables.lineitem(s, d),
            col("l_returnflag"), col("l_linestatus")))
          .unionAll(slice("lang_x_source", Tables.documents(s, d),
            col("lang"), col("source"))),
        "v", "x", "y"),
    Some("""WITH rows0 AS (
              SELECT 'mktsegment_x_nation' AS v, c_mktsegment AS x,
                     CAST(c_nationkey AS VARCHAR) AS y FROM customer
              UNION ALL
              SELECT 'returnflag_x_linestatus', l_returnflag, l_linestatus
              FROM lineitem
              UNION ALL
              SELECT 'lang_x_source', lang, source FROM documents),
            xy AS (SELECT v, x, y, CAST(COUNT(*) AS BIGINT) AS nxy
              FROM rows0 GROUP BY 1, 2, 3),
            mx AS (SELECT v, x, SUM(nxy) AS nx FROM xy GROUP BY 1, 2),
            my AS (SELECT v, y, SUM(nxy) AS ny FROM xy GROUP BY 1, 2),
            rc AS (SELECT r.v, r.r, c.c FROM
              (SELECT v, CAST(COUNT(*) AS BIGINT) AS r FROM mx GROUP BY 1) r
              JOIN
              (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM my GROUP BY 1) c
              ON r.v = c.v),
            nn AS (SELECT v, CAST(SUM(nxy) AS BIGINT) AS n
              FROM xy GROUP BY 1),
            cells AS (SELECT xy.v, xy.x, xy.y, xy.nxy, mx.nx, my.ny, nn.n,
                (CAST(xy.nxy AS DOUBLE) * nn.n
                  - CAST(mx.nx AS DOUBLE) * my.ny)
                * (CAST(xy.nxy AS DOUBLE) * nn.n
                  - CAST(mx.nx AS DOUBLE) * my.ny)
                / (CAST(nn.n AS DOUBLE) * CAST(mx.nx AS DOUBLE) * my.ny)
                - CAST(mx.nx AS DOUBLE) * my.ny / CAST(nn.n AS DOUBLE)
                  AS ct,
                CAST(xy.nxy AS DOUBLE) / nn.n
                  * ln(CAST(nn.n AS DOUBLE) * xy.nxy
                    / (CAST(mx.nx AS DOUBLE) * my.ny)) AS mt
              FROM xy JOIN mx ON xy.v = mx.v AND xy.x = mx.x
                JOIN my ON xy.v = my.v AND xy.y = my.y
                JOIN nn ON xy.v = nn.v),
            folded AS (SELECT v, ANY_VALUE(n) AS n,
                list_reduce(list(ct ORDER BY x, y), (acc, e) -> acc + e)
                  + CAST(ANY_VALUE(n) AS DOUBLE) AS chi2,
                list_reduce(list(mt ORDER BY x, y), (acc, e) -> acc + e)
                  AS mi
              FROM cells GROUP BY v),
            hx AS (SELECT mx.v,
                -list_reduce(list(CAST(nx AS DOUBLE) / n
                    * ln(CAST(nx AS DOUBLE) / n) ORDER BY x),
                  (acc, e) -> acc + e) AS hx
              FROM mx JOIN nn ON mx.v = nn.v GROUP BY mx.v),
            hy AS (SELECT my.v,
                -list_reduce(list(CAST(ny AS DOUBLE) / n
                    * ln(CAST(ny AS DOUBLE) / n) ORDER BY y),
                  (acc, e) -> acc + e) AS hy
              FROM my JOIN nn ON my.v = nn.v GROUP BY my.v)
            SELECT f.v AS variable, f.n, rc.r, rc.c,
              CAST(floor(chi2 * 1e6) AS BIGINT) AS chi2_micro,
              CASE WHEN least(rc.r, rc.c) > 1
                THEN CAST(floor(chi2 / (CAST(f.n AS DOUBLE)
                  * (least(rc.r, rc.c) - 1)) * 1e6) AS BIGINT)
                END AS v2_micro,
              CASE WHEN hx.hx > 0
                THEN CAST(floor(mi / hx.hx * 1e6) AS BIGINT)
                END AS u_xy_micro,
              CASE WHEN hy.hy > 0
                THEN CAST(floor(mi / hy.hy * 1e6) AS BIGINT)
                END AS u_yx_micro
            FROM folded f JOIN hx ON f.v = hx.v JOIN hy ON f.v = hy.v
              JOIN rc ON f.v = rc.v"""))

  val queries: Map[String, Q] = Map("q_m79_assoc" -> mAssoc)
}
