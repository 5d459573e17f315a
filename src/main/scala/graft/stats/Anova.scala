package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-way ANOVA (Fisher's F) over grouped numeric variables — the
  * numeric sibling of the engine's χ² battery ([[ContingencyMath]]):
  * the reference's segment-profiling asks "does this variable differ
  * across clusters?"; χ² answers it for categoricals, the F-test for
  * means. Emits F and η² (effect size, SSB/SST) per variable.
  *
  * Scale shape: one map-side-combined aggregation per (variable, group)
  * computes exact integer sufficient statistics (n, Σv, Σv²) — the
  * entire data pass; everything after operates on k group rows per
  * variable. No second pass, no per-group scans.
  *
  * Cross-engine determinism: values enter as exact integer CENTS, so
  * the sufficient statistics are exact longs (map-side sum order is
  * irrelevant to integers). The one float-sensitive reduction — the
  * between-group term Σ S_g²/n_g — is a SEQUENTIAL FOLD over the
  * group rows sorted by group key (`aggregate` over a sorted array in
  * Spark, `list_reduce(list(term ORDER BY g))` in DuckDB), so the
  * addition order is pinned on both engines and the F statistic is
  * bit-replayable; outputs FLOOR to integer micro-units (floor is the
  * binary-value floor in both engines, where `round`'s half-way
  * semantics diverge — the round-11 q_t_bm25 hazard). The Σv and Σv²
  * sufficient statistics accumulate in decimal(38,0) (oracle:
  * HUGEINT), so there is NO long-overflow cap at any corpus size —
  * the former ~3·10⁹·√rows scaladoc caveat is retired by construction. */
object Anova {

  /** One F-test row per variable over a pre-unpivoted frame of
    * (variable, group, cents). Output: (variable, k, n, f_micro,
    * eta2_micro). Degrees of freedom are (k−1, n−k); a degenerate
    * variable (zero within-group variance, or zero total variance)
    * reports null for the undefined statistic instead of tripping an
    * ANSI divide-by-zero. */
  def oneWay(rows: DataFrame, varCol: String, groupCol: String,
      centsCol: String): DataFrame = {
    val grp = rows.groupBy(col(varCol).as("__var"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("ng"),
        sum(col(centsCol).cast("decimal(38,0)")).as("sg"),
        sum(col(centsCol).cast("decimal(38,0)") * col(centsCol)).as("qg"))
      .withColumn("term",
        col("sg").cast("double") * col("sg") / col("ng"))
    val agg = grp.groupBy("__var").agg(
      count(lit(1)).as("k"),
      sum("ng").as("n"), sum("sg").as("s"), sum("qg").as("q"),
      collect_list(struct(col("__g").as("g"), col("term").as("term")))
        .as("__terms"))
      // the pinned-order fold: sort by group key, then a left fold —
      // the only float summation in the operator, made order-free
      .withColumn("t", aggregate(
        transform(array_sort(col("__terms")), s => s.getField("term")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("ssb", col("t") - col("s").cast("double") * col("s") / col("n"))
      .withColumn("ssw", col("q").cast("double") - col("t"))
    agg.select(col("__var").as("variable"), col("k"), col("n"),
      // zero within-group variance -> F undefined: explicit null (ANSI
      // sessions raise on the 0-divide; the guard is the semantics)
      when(col("ssw") > 0,
        floor(col("ssb") / (col("k") - 1) /
          (col("ssw") / (col("n") - col("k"))) * lit(1e6)).cast("long"))
        .as("f_micro"),
      when(col("ssb") + col("ssw") > 0,
        floor(col("ssb") / (col("ssb") + col("ssw")) * lit(1e6))
          .cast("long"))
        .as("eta2_micro"))
  }

  /** Exact integer cents from a 2-decimal double column. `round` is SAFE
    * here (unlike on transcendental-derived values): x·100 for a
    * 2-decimal x lands within an ulp of an integer — ~0.5 away from the
    * half-way boundary where the engines' round semantics diverge. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  private val mAnova = Q(
    (s, d) => {
      val cust = Tables.customer(s, d)
      val rows = cust.select(lit("acctbal_by_mktsegment").as("v"),
          col("c_mktsegment").as("g"), cents(col("c_acctbal")).as("c"))
        .unionAll(cust.select(lit("acctbal_by_nation").as("v"),
          col("c_nationkey").cast("string").as("g"),
          cents(col("c_acctbal")).as("c")))
        .unionAll(Tables.lineitem(s, d)
          .select(lit("quantity_by_returnflag").as("v"),
            col("l_returnflag").as("g"), cents(col("l_quantity")).as("c")))
      oneWay(rows, "v", "g", "c").orderBy("variable")
    },
    Some("""WITH rows0 AS (
              SELECT 'acctbal_by_mktsegment' AS var, c_mktsegment AS g,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS v
              FROM customer
              UNION ALL
              SELECT 'acctbal_by_nation', CAST(c_nationkey AS VARCHAR),
                     CAST(round(c_acctbal * 100) AS BIGINT)
              FROM customer
              UNION ALL
              SELECT 'quantity_by_returnflag', l_returnflag,
                     CAST(round(l_quantity * 100) AS BIGINT)
              FROM lineitem),
            grp AS (SELECT var, g, COUNT(*) AS ng,
                CAST(SUM(v) AS HUGEINT) AS sg,
                SUM(CAST(v AS HUGEINT) * v) AS qg
              FROM rows0 GROUP BY 1, 2),
            terms AS (SELECT var, g, ng, sg, qg,
                CAST(sg AS DOUBLE) * sg / ng AS term FROM grp),
            agg AS (SELECT var, COUNT(*) AS k,
                CAST(SUM(ng) AS BIGINT) AS n,
                SUM(sg) AS s,
                SUM(qg) AS q,
                list_reduce(list(term ORDER BY g),
                  (acc, x) -> acc + x) AS t
              FROM terms GROUP BY 1),
            fin AS (SELECT var, k, n,
                t - CAST(s AS DOUBLE) * s / n AS ssb,
                CAST(q AS DOUBLE) - t AS ssw
              FROM agg)
            SELECT var AS variable, CAST(k AS BIGINT) AS k, n,
                   CASE WHEN ssw > 0 THEN
                     CAST(floor(ssb / (k - 1) / (ssw / (n - k)) * 1000000.0)
                       AS BIGINT) END AS f_micro,
                   CASE WHEN ssb + ssw > 0 THEN
                     CAST(floor(ssb / (ssb + ssw) * 1000000.0) AS BIGINT)
                     END AS eta2_micro
            FROM fin ORDER BY variable"""))

  val queries: Map[String, Q] = Map("q_m37_anova" -> mAnova)
}
