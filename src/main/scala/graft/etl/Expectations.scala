package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a pipeline
  * runs before promoting a batch (the published Deequ/"unit tests for
  * data" idea, rebuilt on plain aggregates). Row-level checks compile
  * into ONE aggregation pass over the table regardless of how many are
  * declared (each is a conditional sum — map-side combined, no per-check
  * scans); uniqueness is one keyed groupBy; referential integrity is one
  * anti-join per foreign key with the dimension side broadcast when
  * small. The report is one row per check: measured value, threshold,
  * verdict — config-sized at any input scale.
  */
object Expectations {

  sealed trait Check
  /** Fraction of non-null values in `col` must reach `minRate`. */
  final case class NonNullRate(col: String, minRate: Double) extends Check
  /** Fraction of ALL rows whose `col` lies inside [lo, hi] must reach
    * `minRate` — a null counts as a MISS (pair with [[NonNullRate]] when
    * nullity should be gated separately from range). */
  final case class InRange(col: String, lo: Double, hi: Double,
      minRate: Double) extends Check
  /** Fraction of ALL rows whose `col` is in the accepted set must reach
    * `minRate` — a null counts as a MISS, same denominator rule as
    * [[InRange]]. */
  final case class InSet(col: String, accepted: Seq[String],
      minRate: Double) extends Check
  /** The column tuple must be a candidate key: zero duplicated tuples. */
  final case class Unique(cols: Seq[String]) extends Check
  /** Every (non-null) value of `col` must exist in `dimCol` of the
    * dimension frame: zero orphans. */
  final case class RefIntegrity(col: String, dim: DataFrame,
      dimCol: String) extends Check

  /** Evaluate all checks; returns (check, column, value, threshold,
    * pass). `value` is the measured rate for rate checks and the raw
    * VIOLATION COUNT for Unique/RefIntegrity (threshold 0). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowChecks = checks.collect {
      case c: NonNullRate => c: Check
      case c: InRange => c
      case c: InSet => c
    }
    val rowReport: Seq[(String, String, Double, Double)] =
      if (rowChecks.isEmpty) Nil
      else {
        val aggs: Seq[Column] = count(lit(1)).as("__n") +: rowChecks
          .zipWithIndex.map {
            case (NonNullRate(c, _), i) =>
              sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__c$i")
            case (InRange(c, lo, hi, _), i) =>
              sum(when(col(c).isNotNull &&
                col(c) >= lo && col(c) <= hi, 1L).otherwise(0L))
                .as(s"__c$i")
            case (InSet(c, vs, _), i) =>
              sum(when(col(c).isin(vs: _*), 1L).otherwise(0L)).as(s"__c$i")
            case (other, _) =>
              throw new IllegalStateException(other.toString)
          }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("__n").toDouble
        rowChecks.zipWithIndex.map { case (c, i) =>
          val hits = row.getAs[Long](s"__c$i").toDouble
          val rate = if (n == 0) 1.0 else
            BigDecimal(hits / n).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble
          c match {
            case NonNullRate(cl, m) => ("non_null_rate", cl, rate, m)
            case InRange(cl, _, _, m) => ("in_range_rate", cl, rate, m)
            case InSet(cl, _, m) => ("in_set_rate", cl, rate, m)
            case other => throw new IllegalStateException(other.toString)
          }
        }
      }
    val keyReports = checks.collect {
      case Unique(cols) =>
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L))).head().getLong(0)
        ("unique", cols.mkString("+"), dups.toDouble, 0.0)
      case RefIntegrity(c, dim, dimCol) =>
        val orphans = df.select(col(c)).filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)), Seq(c), "left_anti")
          .count()
        ("ref_integrity", c, orphans.toDouble, 0.0)
    }
    (rowReport ++ keyReports)
      .toDF("check", "column", "value", "threshold")
      .withColumn("pass",
        when(col("check").isin("unique", "ref_integrity"),
          col("value") <= col("threshold"))
          .otherwise(col("value") >= col("threshold")))
  }

  /** The lineitem promotion gate: null-free measures, sane quantity
    * domain, closed flag vocabulary, candidate-key lines, and no orphan
    * orders. The oracle recomputes every measured value in SQL; a check
    * regressing (or a threshold silently moving) hash-mismatches. */
  private val pExpectations = Q(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      run(li, Seq(
        NonNullRate("l_quantity", 1.0),
        NonNullRate("l_extendedprice", 1.0),
        InRange("l_quantity", 1, 50, 1.0),
        InSet("l_returnflag", Seq("A", "N", "R"), 1.0),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_orderkey", Tables.orders(s, d), "o_orderkey")))
        .orderBy("check", "column")
    },
    Some("""WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lineitem)
            SELECT * FROM (
              SELECT 'non_null_rate' AS "check", 'l_quantity' AS "column",
                ROUND(SUM(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0
                  END) / n.n, 6) AS value,
                CAST(1.0 AS DOUBLE) AS threshold,
                ROUND(SUM(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0
                  END) / n.n, 6) >= 1.0 AS pass
              FROM lineitem, n GROUP BY n.n
              UNION ALL
              SELECT 'non_null_rate', 'l_extendedprice',
                ROUND(SUM(CASE WHEN l_extendedprice IS NOT NULL THEN 1
                  ELSE 0 END) / n.n, 6), 1.0,
                ROUND(SUM(CASE WHEN l_extendedprice IS NOT NULL THEN 1
                  ELSE 0 END) / n.n, 6) >= 1.0
              FROM lineitem, n GROUP BY n.n
              UNION ALL
              SELECT 'in_range_rate', 'l_quantity',
                ROUND(SUM(CASE WHEN l_quantity IS NOT NULL
                  AND l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0
                  END) / n.n, 6), 1.0,
                ROUND(SUM(CASE WHEN l_quantity IS NOT NULL
                  AND l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0
                  END) / n.n, 6) >= 1.0
              FROM lineitem, n GROUP BY n.n
              UNION ALL
              SELECT 'in_set_rate', 'l_returnflag',
                ROUND(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                  THEN 1 ELSE 0 END) / n.n, 6), 1.0,
                ROUND(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                  THEN 1 ELSE 0 END) / n.n, 6) >= 1.0
              FROM lineitem, n GROUP BY n.n
              UNION ALL
              SELECT 'unique', 'l_orderkey+l_linenumber',
                CAST(COALESCE(SUM(c - 1), 0) AS DOUBLE), 0.0,
                COALESCE(SUM(c - 1), 0) <= 0
              FROM (SELECT COUNT(*) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
              UNION ALL
              SELECT 'ref_integrity', 'l_orderkey',
                CAST(COUNT(*) AS DOUBLE), 0.0, COUNT(*) <= 0
              FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
            ) ORDER BY "check", "column""""))

  val queries: Map[String, Q] = Map("q_p24_expectations" -> pExpectations)
}
