package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical (nested) segmentation (SURVEY.md M12;
  * clustering.py:119-155, 567-625): group rows by a parent column, run a
  * clustering within each group with small k, offset the labels so they are
  * globally unique, and assign -99 to rows of groups too small to cluster.
  *
  * The per-group loop collects only the distinct parent values (few); each
  * group's clustering is itself a distributed job over the filtered frame.
  * The reference stitches via a join on alchemer_id — here each group keeps
  * its rows and only gains the `cluster` column, then groups union back.
  */
object Hierarchical {

  val IgnoredLabel: Int = -99

  /** `clusterFn` returns the group's frame with an Int `cluster` column
    * labeled 0..k-1. */
  def nestedSegment(df: DataFrame, parentCol: String, minRows: Long,
      clusterFn: DataFrame => DataFrame): DataFrame = {
    val groups = df.groupBy(parentCol).count().collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull, r.getLong(1)))
      .sortBy(_._1)
    // heavy per-group fits run as concurrent Spark jobs (graft.Par, the
    // reference's per-group joblib loop, clustering.py:620-624); the
    // label-offset arithmetic is order-dependent, so it stays sequential
    // over the order-preserved results
    val fitted = graft.Par.grid(groups.toSeq) { case (gv, cnt) =>
      val part = df.filter(col(parentCol) <=> lit(gv))
      if (cnt < minRows) (part.withColumn("cluster", lit(IgnoredLabel)), 0)
      else {
        val labeled = clusterFn(part)
        val k = labeled.agg(max("cluster")).head().getInt(0) + 1
        (labeled, k)
      }
    }
    var offset = 0
    val parts = fitted.map { case (labeled, k) =>
      if (k == 0) labeled
      else {
        val shifted = labeled.withColumn("cluster", col("cluster") + lit(offset))
        offset += k
        shifted
      }
    }
    parts.reduce(_ unionByName _)
  }
}
