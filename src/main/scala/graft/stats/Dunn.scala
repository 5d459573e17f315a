package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dunn's post-hoc pairwise comparisons (Dunn, Technometrics 1964;
  * tie correction per the standard Σ(t³−t) form) — the follow-up the
  * engine's Kruskal–Wallis (q_m47) omnibus needs: KW says "SOME group
  * differs"; Dunn says WHICH pairs, using the same shared global ranks
  * (not per-pair re-ranks, which is what distinguishes it from running
  * pairwise MWUs) with a Bonferroni budget of m = k(k−1)/2.
  *
  * Exactness: global average ranks in DOUBLED units from the
  * value-counts formulation (ρ_v = 2·cum − cnt + 1, exact integers —
  * the [[Spearman]]/[[KruskalWallis]] trick), and clearing denominators
  * makes each pairwise z² exactly rational:
  *   z²_ij = 3·(S_i n_j − S_j n_i)²·(N−1)
  *           / [ n_i n_j (n_i+n_j) · (N(N+1)(N−1) − ΣT) ]
  * with S_i = Σρ over group i and ΣT = Σ(t³−t) over tie groups — zero
  * floats (rule 1), one non-negative integral division per pair in
  * decimal(38,0)/HUGEINT. All-tied data (denominator 0) → null.
  * Headroom: the numerator's (2N n_i n_j)²·3N product overflows
  * decimal(38) only beyond ~10⁶ rows × 10⁵-row groups, and a breach
  * fails LOUDLY (ANSI decimal overflow), never silently.
  *
  * Scale shape: one (group, value) cells pass (THE data pass), the
  * rank window runs over DISTINCT-VALUE cells, per-group sums
  * map-side-combine to k rows, and the pair frame is the k×k/2
  * self-join of a k-row frame — trivially broadcast. */
object Dunn {

  /** Pairwise Dunn z² over (groupCol, integer valueCol) rows. Output
    * one row per unordered pair (g1 < g2):
    * (g1, g2, n1, n2, m, z2_micro, direction) — m = number of
    * comparisons (Bonferroni divisor), direction = sign(R̄₁ − R̄₂). */
  def dunn(rows: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val base = rows.select(col(groupCol).cast("string").as("__g"),
      col(valueCol).cast("long").as("__v"))
    val gv = base.groupBy("__g", "__v").agg(count(lit(1)).as("cgv"))
    val vtot = gv.groupBy("__v").agg(sum("cgv").as("cv"))
    // r16 (guide §2.2): the midrank cumulative formerly ran through a
    // single-partition Window.orderBy over the distinct-value cells;
    // the distributed prefix sum computes the identical integers
    val vr = graft.etl.GlobalIndex.withGlobalRunning(
        vtot, Seq(col("__v")), Seq(col("cv") -> "cx"))._1
      .withColumn("cum", col("cx") + col("cv"))
      .withColumn("rho", col("cum") * 2 - col("cv") + 1)
    val tot = vtot.agg(sum("cv").as("nn"),
      sum(col("cv").cast("decimal(38,0)") * col("cv") * col("cv")
        - col("cv")).as("tt"))
    val gi = gv.join(vr.select("__v", "rho"), Seq("__v"))
      .groupBy("__g")
      .agg(sum("cgv").as("ni"),
        sum(col("cgv").cast("decimal(38,0)") * col("rho")).as("si"))
    val k1 = gi.agg(count(lit(1)).as("k"))
    val a = gi.select(col("__g").as("g1"), col("ni").as("n1"),
      col("si").as("s1"))
    val b = gi.select(col("__g").as("g2"), col("ni").as("n2"),
      col("si").as("s2"))
    // broadcast the k-row side explicitly: gi is |groups|-sized by
    // construction, and without the hint the ranged cache's missing size
    // stats let the planner fall back to a shuffled CartesianProduct
    a.join(broadcast(b), col("g1") < col("g2"))
      .join(broadcast(tot)).join(broadcast(k1))
      .select(col("g1"), col("g2"), col("n1"), col("n2"), col("nn"),
        expr("k * (k - 1) div 2").as("m"),
        (col("s1") * col("n2") - col("s2") * col("n1")).as("dnum"),
        (col("n1").cast("decimal(38,0)") * col("n2") * (col("n1") + col("n2"))
          * (col("nn").cast("decimal(38,0)") * (col("nn") + 1) * (col("nn") - 1)
            - col("tt"))).as("dden"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"), col("m"),
        when(col("dden") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "cast((3 * dnum * dnum * (nn - 1) * 1000000) div dden as long)"))
          .as("z2_micro"),
        signum(col("dnum")).cast("long").as("direction"))
      .orderBy("g1", "g2")
  }

  /** q_m77_dunn: which market-segment pairs differ in customer balance
    * — the pairwise drill-down of the q_m47 omnibus on the same
    * (segment, floor-cents acctbal) frame. */
  private val mDunn = Q(
    (s, d) => dunn(
      Tables.customer(s, d).select(col("c_mktsegment").as("g"),
        Anova.cents(col("c_acctbal")).as("v")),
      "g", "v"),
    Some("""WITH base AS (SELECT c_mktsegment AS g,
                CAST(round(c_acctbal * 100) AS BIGINT) AS v
              FROM customer),
            gv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cgv
              FROM base GROUP BY 1, 2),
            vtot AS (SELECT v, SUM(cgv) AS cv FROM gv GROUP BY 1),
            vr AS (SELECT v, cv,
                2 * SUM(cv) OVER (ORDER BY v) - cv + 1 AS rho FROM vtot),
            tot AS (SELECT CAST(SUM(cv) AS BIGINT) AS nn,
                SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS tt FROM vtot),
            gi AS (SELECT g, CAST(SUM(cgv) AS BIGINT) AS ni,
                SUM(CAST(cgv AS HUGEINT) * rho) AS si
              FROM gv JOIN vr USING (v) GROUP BY g),
            k1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM gi),
            pairs AS (SELECT a.g AS g1, b.g AS g2, a.ni AS n1, b.ni AS n2,
                nn,
                a.si * b.ni - b.si * a.ni AS dnum,
                CAST(a.ni AS HUGEINT) * b.ni * (a.ni + b.ni)
                  * (CAST(nn AS HUGEINT) * (nn + 1) * (nn - 1) - tt) AS dden
              FROM gi a, gi b, tot WHERE a.g < b.g)
            SELECT g1, g2, n1, n2,
              (SELECT k * (k - 1) // 2 FROM k1) AS m,
              CASE WHEN dden = 0 THEN NULL
                ELSE CAST((3 * dnum * dnum * (nn - 1) * 1000000) // dden
                  AS BIGINT) END AS z2_micro,
              CAST(CASE WHEN dnum > 0 THEN 1 WHEN dnum < 0 THEN -1
                ELSE 0 END AS BIGINT) AS direction
            FROM pairs"""))

  val queries: Map[String, Q] = Map("q_m77_dunn" -> mDunn)
}
