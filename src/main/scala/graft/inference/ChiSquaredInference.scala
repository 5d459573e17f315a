package graft.inference

import graft.stats.ContingencyMath
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** χ² deliver-stats kernel (SURVEY.md §3.3, reference entry point C:
  * chisquared_tester.py `return_API_data` 1733-1793).
  *
  * One distributed tall-crosstab job ([[CrosstabJob]]) feeds driver-side
  * matrix math ([[ContingencyMath]]); output is the "deliver stats" frame —
  * one row per (cluster, variable) that is significant, carrying the
  * positively-associated categories and their in-cluster percentages —
  * sorted by p ascending (chisquared_tester.py:1651).
  */
object ChiSquaredInference {

  val deliverSchema: StructType = StructType(Seq(
    StructField("cluster", StringType),
    StructField("variable", StringType),
    StructField("chi2_stat", DoubleType),
    StructField("p_value", DoubleType),
    StructField("dof", LongType),
    StructField("yates", BooleanType),
    StructField("mode_category", StringType),
    StructField("sig_more_category", ArrayType(StringType)),
    StructField("category_percentages", ArrayType(DoubleType)),
    StructField("weighted_category_percentages", ArrayType(DoubleType))))

  /** Full inference pass. `alpha` gates both the table-level test (p > α →
    * variable skipped for that cluster, the reference's "lazy" path,
    * chisquared_tester.py:1496-1497) and the Bonferroni post-hoc.
    * `'not selected'` sentinel categories are scrubbed from the significant
    * lists AFTER the test, as the reference does
    * (helper_functions.py:24-30; order matters — SURVEY §7.4).
    *
    * `weighted = true` is the reference's weighted test mode
    * (chisquared_tester.py:871,964,1051-1064): the χ² statistic, Yates
    * trigger, post-hoc directions, and modal category are all computed on
    * the WEIGHT-summed crosstab instead of the row-count crosstab; both
    * percentage arrays are still delivered. */
  def deliverStats(spark: SparkSession, df: DataFrame, variables: Seq[String],
      clusterCol: String, weightCol: Option[String] = None,
      alpha: Double = 0.05, weighted: Boolean = false): DataFrame = {
    val tall = CrosstabJob.tallCounts(df, variables, clusterCol, weightCol)
    val tables = CrosstabJob.collectCrosstabs(tall)

    val rows = for {
      t <- tables
      m = if (weighted) t.wobs else t.obs
      yates = ContingencyMath.needsYates(m)
      res = ContingencyMath.chiSquare(m, yates)
      if res.p <= alpha
      dirs = ContingencyMath.posthocDirections(m, alpha)
      colTot = t.colTotals
      wColTot = t.wobs.transpose.map(_.sum)
      (cluster, j) <- t.clusters.zipWithIndex
      sig = t.categories.indices
        .filter(i => dirs(i)(j) == "pos" && t.categories(i) != "not selected")
      if sig.nonEmpty
      modeIdx = t.categories.indices.maxBy(i => (m(i)(j), t.categories(i)))
    } yield Row(
      cluster, t.variable, res.stat, res.p, res.dof.toLong, yates,
      t.categories(modeIdx),
      sig.map(t.categories(_)),
      sig.map(i => math.rint(t.obs(i)(j) / colTot(j) * 10000) / 100.0),
      // weighted variant (chisquared_tester.py:1533-1564): same categories,
      // shares of the cluster's weight mass instead of its row count
      sig.map(i => math.rint(t.wobs(i)(j) / wColTot(j) * 10000) / 100.0))

    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), deliverSchema)
      .orderBy(col("p_value"), col("cluster"), col("variable"))
  }

  /** Discover view: top-k variables per cluster by ascending p
    * (chisquared_tester.py:1671-1731). */
  def discoverTopK(deliver: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy(col("p_value"), col("variable"))
    deliver.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn").orderBy("cluster", "p_value", "variable")
  }

  /** Population modes table (M33, chisquared_tester.py:695-838): per
    * (cluster, variable) the weighted and unweighted modal category with its
    * weighted proportion. Fully distributed — tall counts + one window. */
  def populationModes(df: DataFrame, variables: Seq[String], clusterCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val tall = CrosstabJob.tallCounts(df, variables, clusterCol, weightCol)
      .filter(col("category") =!= "not selected")
    val byCount = org.apache.spark.sql.expressions.Window
      .partitionBy("variable", "cluster")
      .orderBy(col("n").desc, col("category"))
    val byWeight = org.apache.spark.sql.expressions.Window
      .partitionBy("variable", "cluster")
      .orderBy(col("wn").desc, col("category"))
    tall
      .withColumn("mode_category",
        first("category").over(byCount.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("wmode_category",
        first("category").over(byWeight.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .groupBy("variable", "cluster", "mode_category", "wmode_category")
      .agg(round(max("wn") / sum("wn"), 6).as("wmode_share"))
      .orderBy("variable", "cluster")
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
