package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit (Sweeney, IJUFKS 2002; Machanavajjhala
  * et al., ICDE 2006) — the release-gate metrics for quasi-identifier
  * re-identification risk: a table is k-anonymous when every
  * equivalence class over the quasi-identifier columns holds ≥ k rows,
  * and l-diverse when every class carries ≥ l distinct values of the
  * sensitive attribute. A training-data pipeline runs this BEFORE
  * publishing per-user derived tables (session roll-ups, survey
  * segment artifacts): PII redaction (q_t_pii_redact) scrubs direct
  * identifiers, this audits the indirect ones.
  *
  * Pure integers end-to-end: class sizes, the minimum class size
  * (k_min), distinct-sensitive minima (l_min), the count and row mass
  * of classes below the target k, and the at-risk row share in
  * floor-micro — one integral division.
  *
  * Scale shape: ONE map-side groupBy(quasi-identifiers) pass carrying
  * a count plus an exact distinct over the sensitive column (classes
  * are the unit of the audit, so the shuffle key IS the class); the
  * summary is a scalar reduce over CLASS cells. At 100 TB the class
  * table is the data-sized object only when the quasi-set nears a key
  * — which is exactly the k_min = 1 finding the audit exists to
  * surface. */
object Privacy {

  /** One-row audit: (n_rows, n_classes, k_min, l_min,
    * classes_below_k, rows_below_k, below_k_micro) for the given
    * target k. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    classes.agg(
      sum("sz").as("n_rows"),
      count(lit(1)).as("n_classes"),
      min("sz").as("k_min"),
      min("ldiv").as("l_min"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L))
        .as("rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("k_min"), col("l_min"),
        col("classes_below_k"), col("rows_below_k"),
        expr("rows_below_k * 1000000L div n_rows").as("below_k_micro"))
  }

  /** q_p28_kanon: re-identification audit of the customer table under
    * quasi-identifiers (nation, market segment) with account-balance
    * sign as the sensitive attribute, target k = 5. */
  private val pKanon = Q(
    (s, d) => kAnonymityAudit(
      Tables.customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        (col("c_acctbal") > 0).as("positive_bal")),
      Seq("c_nationkey", "c_mktsegment"), "positive_bal", k = 5),
    Some("""WITH classes AS (SELECT c_nationkey, c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(COUNT(DISTINCT c_acctbal > 0) AS BIGINT) AS ldiv
              FROM customer GROUP BY 1, 2)
            SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_classes,
              MIN(sz) AS k_min, MIN(ldiv) AS l_min,
              CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS classes_below_k,
              CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                AS rows_below_k,
              CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1000000
                // SUM(sz) AS BIGINT) AS below_k_micro
            FROM classes"""))

  val queries: Map[String, Q] = Map("q_p28_kanon" -> pKanon)
}
