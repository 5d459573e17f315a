package graft.inference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The distributed half of the χ² inference kernel.
  *
  * The reference recomputes a pandas crosstab per (cluster × variable) inside
  * a per-cluster process pool (chisquared_tester.py:1486-1499). Here ALL
  * variables are unpivoted to a tall (variable, category, cluster) frame and
  * counted in ONE shuffle — the aggregate is |variables|·|categories|·k rows
  * (tiny), after which the per-table matrix math runs on the driver. At 100 TB
  * this is a single map-side-combined aggregation whose output is KBs; nothing
  * else leaves the executors.
  */
object CrosstabJob {

  /** Tall weighted+unweighted contingency counts for many variables in one
    * shuffle: (variable, category, cluster, n, wn).
    *
    * `"Not shown"` categories (question not displayed) are filtered before
    * counting, mirroring chisquared_tester.py:229-234.
    */
  def tallCounts(df: DataFrame, variables: Seq[String], clusterCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    df.withColumn("__w", w)
      .select(col(clusterCol).cast("string").as("cluster") +: col("__w") +:
        variables.map(v => col(v).cast("string").as(v)): _*)
      .unpivot(Array(col("cluster"), col("__w")),
        variables.map(col).toArray, "variable", "category")
      .filter(col("category") =!= "Not shown" && col("category").isNotNull)
      .groupBy("variable", "category", "cluster")
      .agg(count(lit(1)).as("n"), sum("__w").as("wn"))
  }

  /** One collected crosstab: categories × clusters observed counts (rows =
    * categories, cols = clusters, both sorted for determinism). */
  final case class Crosstab(variable: String, categories: Array[String],
      clusters: Array[String], obs: Array[Array[Double]],
      wobs: Array[Array[Double]]) {
    def colTotals: Array[Double] = obs.transpose.map(_.sum)
  }

  /** Collect the tall aggregate into per-variable matrices (driver-side;
    * the collected frame is |vars|·|cats|·k rows, not data-scale). */
  def collectCrosstabs(tall: DataFrame): Seq[Crosstab] = {
    val rows = tall.collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(3).toDouble,
        r.getDouble(4))
    }
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (variable, rs) =>
      val categories = rs.map(_._2).distinct.sorted
      val clusters = rs.map(_._3).distinct.sorted
      val catIdx = categories.zipWithIndex.toMap
      val cluIdx = clusters.zipWithIndex.toMap
      val obs = Array.ofDim[Double](categories.length, clusters.length)
      val wobs = Array.ofDim[Double](categories.length, clusters.length)
      rs.foreach { case (_, cat, clu, n, wn) =>
        obs(catIdx(cat))(cluIdx(clu)) = n
        wobs(catIdx(cat))(cluIdx(clu)) = wn
      }
      Crosstab(variable, categories, clusters, obs, wobs)
    }
  }
}
