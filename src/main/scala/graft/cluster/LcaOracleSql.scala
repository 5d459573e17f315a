package graft.cluster

/** DuckDB oracle generator for the categorical LCA EM ([[LatentClassEM]])
  * at the oracle-replayable parameterization: single restart, maxIter = 2,
  * default smoothing — the same seeded-deterministic-replay registration
  * trick as the m5/m6 Lloyd oracles ([[LloydOracleSql]]).
  *
  * The two EM iterations are unrolled into CTEs:
  *
  *   E1: joint log-prob per (id, class) from the INIT θ (uniform priors),
  *       log-sum-exp softmax → responsibilities r0;
  *   M1: priors and Laplace-smoothed θ from r0-weighted counts;
  *   E2: the same softmax under (θ1, priors1) → r1, per-id max + normalizer
  *       (the log-likelihood pieces);
  *   output: argmax-of-r1 cluster sizes + BIC at 2 dp.
  *
  * The seeded init is BIT-exact on both sides: this generator calls the
  * very [[LatentClassEM.initTheta]] the Spark fit uses and embeds the
  * resulting log-probabilities as SQL literals via Double.toString (Java's
  * shortest round-trip representation, which DuckDB parses back to the
  * identical double). Levels are supplied by the caller and must match the
  * data's observed (sorted-distinct) level sets — true by construction for
  * the registered query's bounded TPC-H projections at every SF.
  *
  * Remaining cross-engine float risk is ulp-level (libm ln/exp vs
  * java.lang.Math): it perturbs responsibilities at ~1e-15 relative, which
  * only flips an argmax on a near-exact tie and is absorbed by the 2 dp
  * BIC rounding — the same accepted risk profile as the rounded-mean
  * KPrototypes oracle. */
object LcaOracleSql {

  /** Oracle SQL for `LatentClassEM.fit(..., k, maxIter = 2, seed)` on
    * categorical columns only.
    *
    * @param tallSql  CTE body producing the tall frame (id, var, value) —
    *                 must reproduce the Spark-side unpivot exactly
    * @param vars     (variable, sorted distinct levels) — the same level
    *                 sets the fit derives from the data
    */
  def categorical(tallSql: String, vars: Seq[(String, Seq[String])], k: Int,
      seed: Int = 42, smoothing: Double = 0.01): String = {
    val theta0 = LatentClassEM.initTheta(vars, k, seed)
    val rows = for {
      (v, levels) <- vars
      c <- 0 until k
      l <- levels
    } yield s"('$v', '$l', $c, ${math.log(theta0((v, l, c)))})"
    val logPrior0 = math.log(1.0 / k)
    s"""WITH tall AS ($tallSql),
        nn AS (SELECT COUNT(DISTINCT id) AS n FROM tall),
        lsz AS (SELECT var, COUNT(DISTINCT value) AS nl FROM tall GROUP BY 1),
        theta0 AS (SELECT * FROM (VALUES
          ${rows.mkString(",\n          ")})
          AS t(var, value, class, logp)),
        j0 AS (SELECT t.id, th.class, SUM(th.logp) + ($logPrior0) AS ll
               FROM tall t JOIN theta0 th
                 ON t.var = th.var AND t.value = th.value
               GROUP BY 1, 2),
        w0 AS (SELECT id, class, ll, MAX(ll) OVER (PARTITION BY id) AS mx
               FROM j0),
        r0 AS (SELECT id, class,
                 exp(ll - mx) / SUM(exp(ll - mx)) OVER (PARTITION BY id) AS r
               FROM w0),
        pri1 AS (SELECT class, SUM(r) / (SELECT n FROM nn) AS p
                 FROM r0 GROUP BY 1),
        cnt1 AS (SELECT t.var, t.value, r.class, SUM(r.r) AS w
                 FROM tall t JOIN r0 r ON t.id = r.id GROUP BY 1, 2, 3),
        th1 AS (SELECT c.var, c.value, c.class,
                  ln((c.w + $smoothing) /
                     (SUM(c.w) OVER (PARTITION BY c.var, c.class)
                      + $smoothing * l.nl)) AS logp
                FROM cnt1 c JOIN lsz l ON c.var = l.var),
        j1 AS (SELECT t.id, th.class, SUM(th.logp) AS s
               FROM tall t JOIN th1 th
                 ON t.var = th.var AND t.value = th.value
               GROUP BY 1, 2),
        j1p AS (SELECT j.id, j.class, j.s + ln(p.p) AS ll
                FROM j1 j JOIN pri1 p ON j.class = p.class),
        w1 AS (SELECT id, class, ll, MAX(ll) OVER (PARTITION BY id) AS mx
               FROM j1p),
        r1 AS (SELECT id, class,
                 exp(ll - mx) / SUM(exp(ll - mx)) OVER (PARTITION BY id) AS r,
                 mx, SUM(exp(ll - mx)) OVER (PARTITION BY id) AS z
               FROM w1),
        ll1 AS (SELECT SUM(mx + ln(z)) AS ll FROM r1 WHERE class = 0),
        np AS (SELECT (${k - 1}) + $k * SUM(nl - 1) AS p FROM lsz),
        lab AS (SELECT id, class AS cluster FROM (
                 SELECT id, class, row_number() OVER
                   (PARTITION BY id ORDER BY r DESC, class) AS rn
                 FROM r1) WHERE rn = 1)
        SELECT cluster, COUNT(*) AS n,
               ROUND(-2 * (SELECT ll FROM ll1)
                     + (SELECT p FROM np) * ln((SELECT n FROM nn)), 2) AS bic
        FROM lab GROUP BY 1 ORDER BY 1"""
  }
}
