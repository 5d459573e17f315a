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

  /** One seeded numeric-Lloyd grid cell (suffix `_k$k`): replays
    * [[KMeansLloyd.fit]] at maxIter = 2 over `base(id, z)` where z is an
    * EXACT NON-NEGATIVE integer (micro-units/cents as BIGINT). Unlike the
    * kprototypes cell there is no float anywhere in the loop: distances are
    * integer squares (≤ ~3.6e15 per term — inside BIGINT; DuckDB errors,
    * not wraps, on overflow), sums promote to HUGEINT, and the mean update
    * is the half-up integer division (2·Σz + n) // (2·n) — floor ≡ truncate
    * for the non-negative inputs, matching Scala Long division bit-for-bit.
    * Emits `agg_k$k(cid, n)`, `centf_k$k(cid, mu)`, `cost_k$k(c DOUBLE)`
    * (exact HUGEINT total cast once to double, the same single rounding as
    * Scala's BigInt.toDouble). */
  private def kmeansCell(k: Int, init: Seq[Long], base: String = "base",
      suffix: String = null): String = {
    require(init.size == k)
    val sfx = if (suffix != null) suffix else s"_k$k"
    val cent0 = init.zipWithIndex.map { case (mu, i) =>
      s"SELECT $i AS cid, CAST($mu AS BIGINT) AS mu"
    }.mkString("\n                 UNION ALL ")
    def iteration(t: Int, prev: String): String =
      s"""d$t$sfx AS (SELECT b.id, b.z, c.cid,
                     (b.z - c.mu) * (b.z - c.mu) AS dist
                 FROM $base b CROSS JOIN $prev c),
          a$t$sfx AS (SELECT * FROM (SELECT *, row_number() OVER
                     (PARTITION BY id ORDER BY dist, cid) AS rn FROM d$t$sfx)
                  WHERE rn = 1),
          nmu$t$sfx AS (SELECT cid, (2 * SUM(z) + COUNT(*)) // (2 * COUNT(*)) AS mu
                 FROM a$t$sfx GROUP BY 1),
          cent$t$sfx AS (SELECT p.cid, CAST(COALESCE(n.mu, p.mu) AS BIGINT) AS mu
                 FROM $prev p LEFT JOIN nmu$t$sfx n ON n.cid = p.cid),
          chg$t$sfx AS (SELECT EXISTS (SELECT 1 FROM cent$t$sfx a JOIN $prev b
                      ON a.cid = b.cid WHERE a.mu <> b.mu) AS ch)"""
    s"""cent0$sfx AS ($cent0),
          ${iteration(1, s"cent0$sfx")},
          ${iteration(2, s"cent1$sfx")},
          centf$sfx AS (SELECT * FROM cent2$sfx WHERE (SELECT ch FROM chg1$sfx)
                    UNION ALL SELECT * FROM cent1$sfx WHERE NOT (SELECT ch FROM chg1$sfx)),
          df$sfx AS (SELECT b.id, c.cid, (b.z - c.mu) * (b.z - c.mu) AS dist
                 FROM $base b CROSS JOIN centf$sfx c),
          af$sfx AS (SELECT * FROM (SELECT *, row_number() OVER
                    (PARTITION BY id ORDER BY dist, cid) AS rn FROM df$sfx)
                 WHERE rn = 1),
          agg$sfx AS (SELECT cid, COUNT(*) AS n FROM af$sfx GROUP BY 1),
          cost$sfx AS (SELECT CAST(SUM(dist) AS DOUBLE) AS c FROM af$sfx)"""
  }

  /** Replays `KMeansLloyd.gridSearch(df, zCol, inits, maxIter = 2)`: one
    * Lloyd cell per k plus the elbow selection over the exact per-k costs —
    * the perpendicular-distance argmax written in EXACTLY the association
    * order of [[KMeansLloyd.elbowSqrt]] (parenthesized numerator, sqrt — not
    * hypot — denominator), so both engines evaluate the identical IEEE
    * expression on identical doubles; ties break to the lowest k on both
    * sides. Output: (cluster, n, mu, chosen_k) of the elbow-chosen fit,
    * ordered by cluster. */
  def kmeansGrid(baseSql: String, inits: Seq[(Int, Seq[Long])]): String = {
    require(inits.size >= 2)
    val ks = inits.map(_._1)
    require(ks == ks.sorted && ks.distinct == ks)
    val cells = inits.map { case (k, init) => kmeansCell(k, init) }
      .mkString(",\n          ")
    val costs = ks.map(k => s"SELECT $k AS k, (SELECT c FROM cost_k$k) AS c")
      .mkString("\n                 UNION ALL ")
    val (x1, x2) = (ks.head, ks.last)
    val outs = ks.map { k =>
      s"""SELECT g.cid AS cluster, g.n, cf.mu, $k AS k
             FROM agg_k$k g JOIN centf_k$k cf ON cf.cid = g.cid
             WHERE $k = (SELECT k FROM elbow)"""
    }.mkString("\n               UNION ALL ")
    materialize(s"""WITH base AS ($baseSql),
          $cells,
          costs AS ($costs),
          ends AS (SELECT (SELECT c FROM costs WHERE k = $x1) AS y1,
                          (SELECT c FROM costs WHERE k = $x2) AS y2),
          elbow AS (SELECT k FROM costs, ends
                    ORDER BY ABS(((y2 - y1) * k - ($x2.0 - $x1.0) * c)
                                 + ($x2.0 * y1 - y2 * $x1.0))
                             / SQRT(($x2.0 - $x1.0) * ($x2.0 - $x1.0)
                                    + (y2 - y1) * (y2 - y1)) DESC, k
                    LIMIT 1)
        SELECT CAST(o.cluster AS INT) AS cluster, CAST(o.n AS BIGINT) AS n,
               CAST(o.mu AS BIGINT) AS mu,
               CAST((SELECT k FROM elbow) AS INT) AS chosen_k
        FROM ($outs) o ORDER BY cluster""")
  }

  /** ARI of a contingency CTE `cont(a, b, nij)` as a scalar double —
    * integer pair counts (HUGEINT-exact) cast once to double, the identical
    * association order as ContingencyMath.adjustedRandIndex (whose double
    * sums are exact integers below 2⁵³, so cross-engine equality is exact
    * up to the single a2·b2 product rounding, performed identically). */
  private def ariSql(cont: String): String =
    s"""(SELECT CASE WHEN (CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE)) / 2.0
                      = (CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)) / CAST(c2n AS DOUBLE)
                 THEN 1.0
                 ELSE (CAST(sij AS DOUBLE)
                       - (CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)) / CAST(c2n AS DOUBLE))
                      / ((CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE)) / 2.0
                       - (CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)) / CAST(c2n AS DOUBLE))
                 END
        FROM (SELECT
          (SELECT SUM((nij * (nij - 1)) // 2) FROM $cont) AS sij,
          (SELECT SUM((ai * (ai - 1)) // 2)
             FROM (SELECT SUM(nij) AS ai FROM $cont GROUP BY a)) AS a2,
          (SELECT SUM((bj * (bj - 1)) // 2)
             FROM (SELECT SUM(nij) AS bj FROM $cont GROUP BY b)) AS b2,
          (SELECT (SUM(nij) * (SUM(nij) - 1)) // 2 FROM $cont) AS c2n))"""

  /** Replays `ModelMetrics.consistencyLloyd(df, idCol, zCol, init, 2)`:
    * full-data seeded Lloyd vs a 90% (id % 10 ≠ 0) refit, both unrolled via
    * [[kmeansCell]]; all rows relabeled against the refit centers; M18 =
    * ARI over every row, M19 = ARI over the train rows. Output one row
    * (model_consistency_ari, label_consistency_ari), both ROUND 6. */
  def consistency(baseSql: String, init: Seq[Long]): String =
    materialize(s"""WITH base AS ($baseSql),
          ${kmeansCell(init.size, init, base = "base", suffix = "_f")},
          train AS (SELECT id, z FROM base WHERE id % 10 <> 0),
          ${kmeansCell(init.size, init, base = "train", suffix = "_t")},
          dall AS (SELECT b.id, c.cid, (b.z - c.mu) * (b.z - c.mu) AS dist
                 FROM base b CROSS JOIN centf_t c),
          aall AS (SELECT * FROM (SELECT *, row_number() OVER
                    (PARTITION BY id ORDER BY dist, cid) AS rn FROM dall)
                 WHERE rn = 1),
          pair AS (SELECT f.cid AS a, g.cid AS b, f.id
                 FROM af_f f JOIN aall g ON g.id = f.id),
          cont18 AS (SELECT a, b, COUNT(*) AS nij FROM pair GROUP BY 1, 2),
          cont19 AS (SELECT a, b, COUNT(*) AS nij FROM pair
                 WHERE id % 10 <> 0 GROUP BY 1, 2)
        SELECT ROUND(${ariSql("cont18")}, 6) AS model_consistency_ari,
               ROUND(${ariSql("cont19")}, 6) AS label_consistency_ari""")

  /** Replays `Hierarchical.nestedSegment(df, grpCol, minRows, part =>
    * KMeansLloyd.fit(part, zCol, init, 2).labeled)` over a STATIC group
    * list: one seeded-Lloyd cell per group (same literal seed centers —
    * the nested fits are independent, clustering.py:119-155), then the
    * stitching arithmetic in plain SQL:
    *
    *  - groups sorted by their string value (Scala's sortBy(_._1) ≡
    *    ORDER BY g — the values are ASCII, so UTF-16 and binary-UTF-8
    *    orders agree);
    *  - per-group k = MAX(local cluster) + 1 of the fit, 0 when the group
    *    holds < minRows rows (it is then not fit at all);
    *  - global label = local label + running offset (window cumulative sum
    *    of preceding groups' k, Hierarchical.nestedSegment's loop);
    *  - < minRows groups emit one (-99, count) row (IgnoredLabel);
    *    empty groups emit nothing (they do not exist in the data).
    *
    * `baseSql` yields (id, g, z) with z the exact non-negative integer
    * feature ([[kmeansCell]]'s contract); `groups` must be pre-sorted and
    * cover every value `g` can take. Output: (grp, cluster, n) ordered. */
  def hierarchicalKmeans(baseSql: String, groups: Seq[String],
      init: Seq[Long], minRows: Long): String = {
    require(groups == groups.sorted && groups.distinct == groups)
    val idx = groups.indices
    val cells = idx.map { i =>
      s"""gbase$i AS (SELECT id, z FROM base WHERE g = '${groups(i)}'),
          cnt$i AS (SELECT COUNT(*) AS c FROM gbase$i),
          ${kmeansCell(init.size, init, base = s"gbase$i", suffix = s"_g$i")},
          lab$i AS (SELECT '${groups(i)}' AS grp, cid AS cluster, COUNT(*) AS n
                 FROM af_g$i GROUP BY 1, 2)"""
    }.mkString(",\n          ")
    val kk = idx.map { i =>
      s"""SELECT '${groups(i)}' AS g,
             CASE WHEN (SELECT c FROM cnt$i) >= $minRows
                  THEN (SELECT MAX(cluster) + 1 FROM lab$i) ELSE 0 END AS k"""
    }.mkString("\n                 UNION ALL ")
    val outs = idx.map { i =>
      s"""SELECT l.grp, l.cluster + o.o AS cluster, l.n
             FROM lab$i l JOIN off o ON o.g = l.grp
             WHERE (SELECT c FROM cnt$i) >= $minRows
           UNION ALL
           SELECT '${groups(i)}', -99, (SELECT c FROM cnt$i)
             WHERE (SELECT c FROM cnt$i) > 0
               AND (SELECT c FROM cnt$i) < $minRows"""
    }.mkString("\n               UNION ALL ")
    materialize(s"""WITH base AS ($baseSql),
          $cells,
          kk AS ($kk),
          off AS (SELECT g, COALESCE(SUM(k) OVER (ORDER BY g
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
                  FROM kk)
        SELECT o.grp, CAST(o.cluster AS INT) AS cluster, CAST(o.n AS BIGINT) AS n
        FROM ($outs) o ORDER BY grp, cluster""")
  }
}
