package graft.inference

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Survey raking — iterative proportional fitting of sample weights to
  * known population margins (Deming & Stephan, Ann.Math.Stat. 1940;
  * the standard post-stratification weighting in every survey shop,
  * e.g. DeBell & Krosnick's ANES weighting memos): a realized sample
  * over-represents some cells of (dim1 × dim2); IPF alternately scales
  * cell weights so each dimension's weighted margin matches its
  * population target, converging to the minimum-discrimination
  * adjustment. THE missing weighting step in front of this engine's
  * weighted survey machinery (q_a3 weighted aggregates,
  * q_inf_deliver_weighted, q_m50 Kish ESS — which prices exactly the
  * weights raking produces).
  *
  * All-integer IPF (the q_m59/q_m62 discipline): cell weights live on
  * a micro grid; each scaling step multiplies a cell weight by its
  * margin's target mass and floor-divides by the current weighted
  * mass — one integral division per (cell, step) in
  * decimal(38,0)/HUGEINT, order-free sums, fixed sweep count. The
  * oracle replays the identical recursion as generated unrolled CTEs
  * (the Dawid–Skene pattern); no float exists on either side.
  * Quantization error per sweep is ≤ 1 micro-unit per cell — far
  * inside survey-weighting tolerance.
  *
  * Scale shape: the data pass is ONE map-side groupBy(dim1, dim2)
  * count of the sample plus one of the population (or published
  * margin tables instead); the IPF loop runs on the collected CELL
  * table (levels₁ × levels₂ — config-sized, the centroid precedent).
  * Row-level weights attach back by one broadcast join on the cell
  * key. */
object Raking {

  /** Rake sample cell weights to the population's dim1/dim2 margins.
    * `sample`/`population`: row frames carrying both dimension columns.
    * Output per sample cell: (d1, d2, n, weight_micro) with
    * Σ n·weight_micro ≈ 1e6·|population| after `iters` sweeps
    * (exactly, up to floor quantization). Population margin levels
    * absent from the sample are unreachable mass (standard IPF
    * caveat) — they simply stay short; sample cells whose dim level
    * carries ZERO population mass are zeroed by the first sweep. */
  def rakeWeights(sample: DataFrame, population: DataFrame,
      d1Col: String, d2Col: String, iters: Int = 10): DataFrame = {
    val spark = sample.sparkSession
    import spark.implicits._
    val M = BigInt(1000000L)
    val cells = sample.groupBy(col(d1Col).cast("string").as("d1"),
        col(d2Col).cast("string").as("d2"))
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect()
    require(cells.nonEmpty, "rakeWeights: empty sample")
    val t1 = population.groupBy(col(d1Col).cast("string").as("d1"))
      .agg(count(lit(1)).as("c")).as[(String, Long)].collect()
      .map { case (k, c) => k -> (BigInt(c) * M) }.toMap
      .withDefaultValue(BigInt(0))
    val t2 = population.groupBy(col(d2Col).cast("string").as("d2"))
      .agg(count(lit(1)).as("c")).as[(String, Long)].collect()
      .map { case (k, c) => k -> (BigInt(c) * M) }.toMap
      .withDefaultValue(BigInt(0))
    // weight per cell in micro, uniform start
    var w: Map[(String, String), BigInt] =
      cells.map(c => (c._1, c._2) -> M).toMap
    for (_ <- 0 until iters) {
      val cur1 = cells.groupBy(_._1).map { case (g, cs) =>
        g -> cs.map(c => w((c._1, c._2)) * c._3).sum }
      w = cells.map { c =>
        val key = (c._1, c._2)
        val d = cur1(c._1)
        key -> (if (d > 0) w(key) * t1(c._1) / d else BigInt(0))
      }.toMap
      val cur2 = cells.groupBy(_._2).map { case (g, cs) =>
        g -> cs.map(c => w((c._1, c._2)) * c._3).sum }
      w = cells.map { c =>
        val key = (c._1, c._2)
        val d = cur2(c._2)
        key -> (if (d > 0) w(key) * t2(c._2) / d else BigInt(0))
      }.toMap
    }
    spark.createDataFrame(cells.map(c =>
        (c._1, c._2, c._3, w((c._1, c._2)).toLong)).toSeq)
      .toDF("d1", "d2", "n", "weight_micro")
  }

  /** Generated DuckDB oracle: `sampleSql`/`popSql` must produce rows
    * with columns d1, d2 (strings) matching the Spark frames. Unrolled
    * chained CTEs, all HUGEINT — the q_m62 pattern. */
  def rakingOracleSql(sampleSql: String, popSql: String,
      iters: Int = 10): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH samp AS MATERIALIZED ($sampleSql),
        pop AS MATERIALIZED ($popSql),
        cells AS MATERIALIZED (SELECT d1, d2,
            CAST(COUNT(*) AS HUGEINT) AS n
          FROM samp GROUP BY 1, 2),
        t1 AS MATERIALIZED (SELECT d1,
            CAST(COUNT(*) AS HUGEINT) * 1000000 AS t
          FROM pop GROUP BY 1),
        t2 AS MATERIALIZED (SELECT d2,
            CAST(COUNT(*) AS HUGEINT) * 1000000 AS t
          FROM pop GROUP BY 1),
        w0 AS MATERIALIZED (SELECT d1, d2, n,
            CAST(1000000 AS HUGEINT) AS w FROM cells)""")
    for (it <- 0 until iters) {
      val a = s"w${it}"
      val b = s"wa${it}"
      val c = s"w${it + 1}"
      sb.append(s""",
        m${it}_1 AS MATERIALIZED (SELECT d1, SUM(w * n) AS cur
          FROM $a GROUP BY 1),
        $b AS MATERIALIZED (SELECT $a.d1, $a.d2, $a.n,
            CASE WHEN m.cur > 0
              THEN $a.w * COALESCE(t1.t, 0) // m.cur
              ELSE CAST(0 AS HUGEINT) END AS w
          FROM $a JOIN m${it}_1 m ON m.d1 = $a.d1
          LEFT JOIN t1 ON t1.d1 = $a.d1),
        m${it}_2 AS MATERIALIZED (SELECT d2, SUM(w * n) AS cur
          FROM $b GROUP BY 1),
        $c AS MATERIALIZED (SELECT $b.d1, $b.d2, $b.n,
            CASE WHEN m.cur > 0
              THEN $b.w * COALESCE(t2.t, 0) // m.cur
              ELSE CAST(0 AS HUGEINT) END AS w
          FROM $b JOIN m${it}_2 m ON m.d2 = $b.d2
          LEFT JOIN t2 ON t2.d2 = $b.d2)""")
    }
    sb.append(s"""
        SELECT d1, d2, CAST(n AS BIGINT) AS n,
          CAST(w AS BIGINT) AS weight_micro
        FROM w$iters ORDER BY d1, d2""")
    sb.toString
  }

  /** q_inf_raking: a deliberately biased subsample of the customer
    * table (every third customer — parity with c_custkey keeps the
    * bias deterministic) raked back to the FULL table's
    * nation × market-segment margins. The weights this produces are
    * exactly what q_a3/q_m50 downstream consume. */
  private val infRaking = Q(
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_nationkey").cast("string").as("d1"),
          col("c_mktsegment").as("d2"), col("c_custkey"))
      rakeWeights(cust.filter(col("c_custkey") % 3 === 0), cust,
        "d1", "d2").orderBy("d1", "d2")
    },
    Some(rakingOracleSql(
      """SELECT CAST(c_nationkey AS VARCHAR) AS d1,
           c_mktsegment AS d2
         FROM customer WHERE c_custkey % 3 = 0""",
      """SELECT CAST(c_nationkey AS VARCHAR) AS d1,
           c_mktsegment AS d2
         FROM customer""")))

  val queries: Map[String, Q] = Map("q_inf_raking" -> infRaking)
}
