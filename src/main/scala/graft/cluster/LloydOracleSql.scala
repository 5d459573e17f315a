package graft.cluster

/** DuckDB oracle SQL generators that replay [[KModes]] / [[KPrototypes]]
  * fits bit-for-bit at a FIXED maxIter = 2 parameterization — the same
  * seeded-deterministic-replay trick as the χ²-slicer loop unroll
  * (MlQueries.m26) and the seeded-IVF quantizer (SimilarityOps.annIvfSeeded):
  * every stage of the fit (Cao density init, per-iteration assignment,
  * mode/mean updates, the convergence flag) is deterministic arithmetic on
  * exact counts, so the whole Lloyd loop unrolls into CTEs.
  *
  * Correspondences with the Scala side (reference semantics in
  * clustering.py:328-363 via the kmodes library):
  *  - Cao init (KModes.caoInit): density = cnt · Σ_j freq_j(x_j); greedy
  *    pick maximizes min-dist-to-chosen × density; maxBy's tie-break on the
  *    NUL-joined pattern string ≡ ORDER BY v1 DESC, v2 DESC, … (string
  *    tuple order — values are ASCII and the separator sorts below them).
  *    Precondition: ≤ 256 distinct patterns, so caoInit's top-pattern cap
  *    never truncates and frequencies cover every row.
  *  - assignment (KModes.assign): array_position of the min distance picks
  *    the LOWEST centroid index on ties ≡ row_number ORDER BY dist, cid.
  *  - update: per-(cluster, column) mode, ties → smallest value
  *    (Ordering.String.reverse inside maxBy) ≡ ORDER BY w DESC, val;
  *    empty clusters keep their previous centroid ≡ LEFT JOIN + COALESCE.
  *  - loop: `while (iter < maxIter && changed)` with maxIter = 2 ⇒ final
  *    centroids are cent2 if the first update changed anything else cent1,
  *    and `iterations` is 2 or 1 correspondingly.
  */
object LloydOracleSql {

  /** DuckDB inlines every CTE reference by default; the centroid chain here
    * references predecessors multiply (c4 → dens + c1..c3, cent2 → cent1 …),
    * which expands exponentially — thousands of re-scans of the base parquet
    * ("too many open files" before it even runs). MATERIALIZED pins each CTE
    * to one evaluation; results are unchanged. */
  private def materialize(sql: String): String =
    sql.replace(" AS (", " AS MATERIALIZED (")

  /** Shared Cao-init CTE block over a `pat(v1..vm, cnt)` CTE: emits
    * `tot, freq, dens, c1..ck, cent0(cid, v1..vm)`. */
  private def caoSql(vs: Seq[String], k: Int): String = {
    val vList = vs.mkString(", ")
    def distExpr(a: String, b: String): String =
      vs.map(v => s"(CASE WHEN $a.$v <> $b.$v THEN 1 ELSE 0 END)")
        .mkString(" + ")
    val freqUnion = vs.zipWithIndex.map { case (v, j) =>
      s"SELECT ${j + 1} AS j, $v AS val, CAST(SUM(cnt) AS DOUBLE) AS s FROM pat GROUP BY 2"
    }.mkString("\n                 UNION ALL ")
    val densJoins = vs.indices.map(j =>
      s"JOIN freq f${j + 1} ON f${j + 1}.j = ${j + 1} AND f${j + 1}.val = p.v${j + 1}")
      .mkString(" ")
    val densSum = vs.indices.map(j => s"f${j + 1}.s / (SELECT n FROM tot)")
      .mkString(" + ")
    val picks = (1 to k).map { i =>
      if (i == 1)
        s"""c1 AS (SELECT $vList, density FROM dens
               ORDER BY density DESC, ${vs.map(_ + " DESC").mkString(", ")} LIMIT 1)"""
      else {
        val prevs = (1 until i).map(p => s"c$p")
        val dists = prevs.map(p => s"(${distExpr("d", p)})")
        val minDist =
          if (dists.size == 1) dists.head else s"LEAST(${dists.mkString(", ")})"
        val notEq = prevs.map(p =>
          s"NOT (${vs.map(v => s"d.$v = $p.$v").mkString(" AND ")})")
          .mkString(" AND ")
        s"""c$i AS (SELECT ${vs.map(v => s"d.$v AS $v").mkString(", ")}, d.density
               FROM dens d, ${prevs.mkString(", ")} WHERE $notEq
               ORDER BY $minDist * d.density DESC, ${vs.map(v => s"d.$v DESC").mkString(", ")} LIMIT 1)"""
      }
    }.mkString(",\n          ")
    val cent0 = (1 to k).map(i => s"SELECT ${i - 1} AS cid, $vList FROM c$i")
      .mkString("\n                 UNION ALL ")
    s"""tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM pat),
          freq AS ($freqUnion),
          dens AS (SELECT p.*, CAST(p.cnt AS DOUBLE) * ($densSum) AS density
                   FROM pat p $densJoins),
          $picks,
          cent0 AS ($cent0)"""
  }

  /** Replays `KModes.fit(df, cols, k, maxIter = 2)` where `baseSql` yields
    * the m categorical columns as v1..vm (non-null VARCHAR, ASCII). Output:
    * (cluster, n, cost, iterations) ordered by cluster. */
  def kmodes(baseSql: String, m: Int, k: Int): String = {
    val vs = (1 to m).map(i => s"v$i")
    val vList = vs.mkString(", ")
    def distExpr(a: String, b: String): String =
      vs.map(v => s"(CASE WHEN $a.$v <> $b.$v THEN 1 ELSE 0 END)")
        .mkString(" + ")

    def iteration(t: Int): String = {
      val prev = s"cent${t - 1}"
      val tallUnion = vs.zipWithIndex.map { case (v, j) =>
        s"SELECT cid, ${j + 1} AS j, $v AS val, SUM(cnt) AS w FROM a$t GROUP BY 1, 3"
      }.mkString("\n                 UNION ALL ")
      val modeJoins = vs.indices.map(j =>
        s"LEFT JOIN mode$t m${j + 1} ON m${j + 1}.cid = p.cid AND m${j + 1}.j = ${j + 1}")
        .mkString(" ")
      val centSel = vs.zipWithIndex.map { case (v, j) =>
        s"COALESCE(m${j + 1}.val, p.$v) AS $v" }.mkString(", ")
      val chg = vs.map(v => s"a.$v <> b.$v").mkString(" OR ")
      s"""d$t AS (SELECT ${vs.map(v => s"p.$v").mkString(", ")}, p.cnt, c.cid,
                     ${distExpr("p", "c")} AS dist
                 FROM pat p CROSS JOIN $prev c),
          a$t AS (SELECT * FROM (SELECT *, row_number() OVER
                     (PARTITION BY $vList ORDER BY dist, cid) AS rn FROM d$t)
                  WHERE rn = 1),
          tall$t AS ($tallUnion),
          mode$t AS (SELECT cid, j, val FROM (SELECT cid, j, val, row_number()
                       OVER (PARTITION BY cid, j ORDER BY w DESC, val) AS r
                     FROM tall$t) WHERE r = 1),
          cent$t AS (SELECT p.cid, $centSel FROM $prev p $modeJoins),
          chg$t AS (SELECT EXISTS (SELECT 1 FROM cent$t a JOIN cent${t - 1} b
                      ON a.cid = b.cid WHERE $chg) AS ch)"""
    }

    materialize(s"""WITH base AS ($baseSql),
          pat AS (SELECT $vList, COUNT(*) AS cnt FROM base
                  GROUP BY ${vs.indices.map(_ + 1).mkString(", ")}),
          ${caoSql(vs, k)},
          ${iteration(1)},
          ${iteration(2)},
          centf AS (SELECT * FROM cent2 WHERE (SELECT ch FROM chg1)
                    UNION ALL SELECT * FROM cent1 WHERE NOT (SELECT ch FROM chg1)),
          df AS (SELECT ${vs.map(v => s"p.$v").mkString(", ")}, p.cnt, c.cid,
                    ${distExpr("p", "c")} AS dist
                 FROM pat p CROSS JOIN centf c),
          af AS (SELECT * FROM (SELECT *, row_number() OVER
                    (PARTITION BY $vList ORDER BY dist, cid) AS rn FROM df)
                 WHERE rn = 1),
          cost AS (SELECT CAST(SUM(dist * cnt) AS DOUBLE) AS c FROM af)
        SELECT cid AS cluster, CAST(SUM(cnt) AS BIGINT) AS n,
               (SELECT c FROM cost) AS cost,
               CASE WHEN (SELECT ch FROM chg1) THEN 2 ELSE 1 END AS iterations
        FROM af GROUP BY 1 ORDER BY 1""")
  }

  /** Replays `KPrototypes.fit(df, Seq(num), Seq(cats...), k, maxIter = 2,
    * gammaOpt = Some(gamma), numInitOpt = Some(init), roundCentroids =
    * Some(6))` for ONE numeric column. `baseSql` yields (id, z, v1..vm)
    * with z already rounded identically on both sides; `numInit` are the
    * per-cluster seed means (plain literals — exact in both engines).
    * Output: (cluster, n, iterations) ordered by cluster. */
  def kprototypes(baseSql: String, m: Int, k: Int, gamma: String,
      numInit: Seq[Double]): String = {
    require(numInit.size == k)
    val vs = (1 to m).map(i => s"v$i")
    val vList = vs.mkString(", ")
    def catDist(a: String, b: String): String =
      vs.map(v => s"(CASE WHEN $a.$v <> $b.$v THEN 1.0 ELSE 0.0 END)")
        .mkString(" + ")
    // numeric + gamma·categorical, exactly KPrototypes.distTo's shape
    def dist(row: String, c: String): String =
      s"($row.z - $c.mu) * ($row.z - $c.mu) + $gamma * (${catDist(row, c)})"

    def iteration(t: Int, prev: String): String = {
      val tallUnion = vs.zipWithIndex.map { case (v, j) =>
        s"SELECT cid, ${j + 1} AS j, $v AS val, COUNT(*) AS w FROM a$t GROUP BY 1, 3"
      }.mkString("\n                 UNION ALL ")
      val modeJoins = vs.indices.map(j =>
        s"LEFT JOIN mode$t m${j + 1} ON m${j + 1}.cid = p.cid AND m${j + 1}.j = ${j + 1}")
        .mkString(" ")
      val centSel = vs.zipWithIndex.map { case (v, j) =>
        s"COALESCE(m${j + 1}.val, p.$v) AS $v" }.mkString(", ")
      val chg = (s"ABS(a.mu - b.mu) >= 1e-9" +: vs.map(v => s"a.$v <> b.$v"))
        .mkString(" OR ")
      s"""d$t AS (SELECT b.id, b.z, ${vs.map(v => s"b.$v").mkString(", ")}, c.cid,
                     ${dist("b", "c")} AS dist
                 FROM base b CROSS JOIN $prev c),
          a$t AS (SELECT * FROM (SELECT *, row_number() OVER
                     (PARTITION BY id ORDER BY dist, cid) AS rn FROM d$t)
                  WHERE rn = 1),
          nmu$t AS (SELECT cid, ROUND(AVG(z), 6) AS mu FROM a$t GROUP BY 1),
          tall$t AS ($tallUnion),
          mode$t AS (SELECT cid, j, val FROM (SELECT cid, j, val, row_number()
                       OVER (PARTITION BY cid, j ORDER BY w DESC, val) AS r
                     FROM tall$t) WHERE r = 1),
          cent$t AS (SELECT p.cid, COALESCE(n.mu, p.mu) AS mu, $centSel
                     FROM $prev p LEFT JOIN nmu$t n ON n.cid = p.cid $modeJoins),
          chg$t AS (SELECT EXISTS (SELECT 1 FROM cent$t a JOIN $prev b
                      ON a.cid = b.cid WHERE $chg) AS ch)"""
    }

    // numeric seed means join onto the Cao categorical centroids by cid
    val ninit = numInit.zipWithIndex.map { case (mu, i) =>
      s"SELECT $i AS cid, CAST($mu AS DOUBLE) AS mu"
    }.mkString("\n                 UNION ALL ")

    materialize(s"""WITH base AS ($baseSql),
          pat AS (SELECT $vList, COUNT(*) AS cnt FROM base
                  GROUP BY ${vs.indices.map(_ + 1).mkString(", ")}),
          ${caoSql(vs, k)},
          ninit AS ($ninit),
          centn0 AS (SELECT c.cid, n.mu, $vList
                     FROM cent0 c JOIN ninit n ON n.cid = c.cid),
          ${iteration(1, "centn0")},
          ${iteration(2, "cent1")},
          centf AS (SELECT * FROM cent2 WHERE (SELECT ch FROM chg1)
                    UNION ALL SELECT * FROM cent1 WHERE NOT (SELECT ch FROM chg1)),
          df AS (SELECT b.id, c.cid, ${dist("b", "c")} AS dist
                 FROM base b CROSS JOIN centf c),
          af AS (SELECT * FROM (SELECT *, row_number() OVER
                    (PARTITION BY id ORDER BY dist, cid) AS rn FROM df)
                 WHERE rn = 1)
        SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
               CASE WHEN (SELECT ch FROM chg1) THEN 2 ELSE 1 END AS iterations
        FROM af GROUP BY 1 ORDER BY 1""")
  }
}
