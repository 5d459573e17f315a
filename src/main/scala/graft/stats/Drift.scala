package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population Stability Index between two corpus snapshots — the
  * standard "did my mixture shift?" monitor (credit-scoring lineage;
  * the binned, symmetric sibling of the KL divergence):
  * `PSI = Σ_bins (p_b − q_b)·ln(p_b / q_b)`, conventionally read as
  * < 0.1 stable / 0.1–0.25 drifting / > 0.25 shifted. In a training-data
  * pipeline this runs between ANY two populations — yesterday's corpus
  * and today's, a [[graft.pipeline.VersionedTable]] version v and v+1
  * (DriftSpec proves the time-travel composition), a source before and
  * after a filter change — over melted (variable, value) rows, so one
  * pass monitors language mix, length profile, source mix, quality
  * buckets together.
  *
  * Unseen-value handling is Laplace: counts +1 against `n + V` where V
  * is the variable's DISTINCT value count across BOTH snapshots — a
  * value present only on one side contributes a finite, documented
  * term instead of ±∞.
  *
  * Cross-engine determinism: counts and V are exact integers; each
  * bin's p, q are IEEE divisions of those integers (identical both
  * engines), the term `(p−q)·ln(p/q)` is one identical literal tree
  * (the ln precedent) FLOORED to micro per bin, so the per-variable
  * PSI is an order-free integer sum.
  *
  * Scale shape: ONE map-side-combined (variable, value) counts
  * aggregate per snapshot is the only data-scale work; the outer join,
  * V attach, and term arithmetic run over DISTINCT-VALUE cells (the
  * KS/quantile-map pattern). Quantized variables only — continuous
  * metrics pre-bin (the registered query buckets n_chars to 100s). */
object Drift {

  /** PSI detail per (variable, value) with the variable's total
    * attached: (variable, value, cnt_ref, cnt_cur, term_micro,
    * psi_micro). `ref`/`cur`: melted (variable, value) rows, one per
    * item occurrence. */
  def psi(ref: DataFrame, cur: DataFrame, variableCol: String,
      valueCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.groupBy(col(variableCol).as("variable"), col(valueCol).as("value"))
        .agg(count(lit(1)).as(as))
    val joined = counts(ref, "cnt_ref")
      .join(counts(cur, "cnt_cur"), Seq("variable", "value"), "full_outer")
      .select(col("variable"), col("value"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
    val perVar = joined.groupBy("variable").agg(
      count(lit(1)).as("v_distinct"),
      sum("cnt_ref").as("n_ref"), sum("cnt_cur").as("n_cur"))
    val terms = joined.join(perVar, Seq("variable"))
      .withColumn("p", (col("cnt_ref") + lit(1)).cast("double")
        / (col("n_ref") + col("v_distinct")).cast("double"))
      .withColumn("q", (col("cnt_cur") + lit(1)).cast("double")
        / (col("n_cur") + col("v_distinct")).cast("double"))
      .withColumn("term_micro",
        floor((col("p") - col("q")) * log(col("p") / col("q"))
          * lit(1000000.0)).cast("long"))
    val totals = terms.groupBy("variable")
      .agg(sum("term_micro").as("psi_micro"))
    terms.join(totals, Seq("variable"))
      .select("variable", "value", "cnt_ref", "cnt_cur", "term_micro",
        "psi_micro")
  }

  /** Melt the documents frame to the monitored (variable, value) rows:
    * language mix and the 100-char length profile. */
  private[graft] def meltDocs(docs: DataFrame): DataFrame =
    docs.select(explode(array(
      struct(lit("lang").as("variable"), col("lang").as("value")),
      struct(lit("len_100").as("variable"),
        expr("cast(n_chars div 100 as string)").as("value"))))
      .as("m")).select("m.variable", "m.value")

  /** q_m44_psi: drift between the even-id and odd-id halves of the
    * documents corpus over language mix and length profile — a
    * same-distribution pair, so the certified PSI values sit near 0
    * (every term's sign and magnitude still exact-checked; DriftSpec
    * plants real shifts and the VersionedTable composition). */
  private val mPsi = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      psi(meltDocs(docs.filter(pmod(col("doc_id"), lit(2)) === 0)),
          meltDocs(docs.filter(pmod(col("doc_id"), lit(2)) === 1)),
          "variable", "value")
        .orderBy("variable", "value")
    },
    Some("""WITH m AS (SELECT doc_id, variable, value FROM (
              SELECT doc_id, 'lang' AS variable, lang AS value
                FROM documents
              UNION ALL
              SELECT doc_id, 'len_100' AS variable,
                  CAST(n_chars // 100 AS VARCHAR) AS value
                FROM documents)),
            cr AS (SELECT variable, value,
                CAST(COUNT(*) AS BIGINT) AS cnt_ref
              FROM m WHERE doc_id % 2 = 0 GROUP BY 1, 2),
            cc AS (SELECT variable, value,
                CAST(COUNT(*) AS BIGINT) AS cnt_cur
              FROM m WHERE doc_id % 2 = 1 GROUP BY 1, 2),
            j AS (SELECT COALESCE(cr.variable, cc.variable) AS variable,
                COALESCE(cr.value, cc.value) AS value,
                COALESCE(cnt_ref, 0) AS cnt_ref,
                COALESCE(cnt_cur, 0) AS cnt_cur
              FROM cr FULL OUTER JOIN cc
                ON cr.variable = cc.variable AND cr.value = cc.value),
            pv AS (SELECT variable,
                CAST(COUNT(*) AS BIGINT) AS v_distinct,
                CAST(SUM(cnt_ref) AS BIGINT) AS n_ref,
                CAST(SUM(cnt_cur) AS BIGINT) AS n_cur
              FROM j GROUP BY variable),
            t AS (SELECT j.variable, j.value, j.cnt_ref, j.cnt_cur,
                CAST(FLOOR(
                  (CAST(j.cnt_ref + 1 AS DOUBLE)
                     / CAST(pv.n_ref + pv.v_distinct AS DOUBLE)
                   - CAST(j.cnt_cur + 1 AS DOUBLE)
                     / CAST(pv.n_cur + pv.v_distinct AS DOUBLE))
                  * ln((CAST(j.cnt_ref + 1 AS DOUBLE)
                        / CAST(pv.n_ref + pv.v_distinct AS DOUBLE))
                       / (CAST(j.cnt_cur + 1 AS DOUBLE)
                          / CAST(pv.n_cur + pv.v_distinct AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS term_micro
              FROM j JOIN pv ON j.variable = pv.variable),
            tot AS (SELECT variable,
                CAST(SUM(term_micro) AS BIGINT) AS psi_micro
              FROM t GROUP BY variable)
            SELECT t.variable, t.value, t.cnt_ref, t.cnt_cur,
                t.term_micro, tot.psi_micro
            FROM t JOIN tot ON t.variable = tot.variable
            ORDER BY t.variable, t.value"""))

  val queries: Map[String, Q] = Map("q_m44_psi" -> mPsi)
}
