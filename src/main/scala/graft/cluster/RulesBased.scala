package graft.cluster

import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rules-based segmentation (SURVEY.md M11; clustering.py:1028-1077):
  * the segment IS an existing answer column, label-encoded; the source
  * question's columns are dropped from the downstream feature set.
  */
object RulesBased {

  final case class RulesSegmentation(labeled: DataFrame,
      labelMapping: Map[String, Int], droppedCols: Seq[String])

  def segment(df: DataFrame, segCol: String): RulesSegmentation = {
    val indexed = new StringIndexer().setInputCol(segCol).setOutputCol("cluster_d")
      .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
      .fit(df).transform(df)
      .withColumn("cluster", col("cluster_d").cast("int")).drop("cluster_d")
    val mapping = indexed.select(segCol, "cluster").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // drop sibling columns that share the q_code prefix of the rule column
    val qPrefix = segCol.split("_").take(2).mkString("_")
    val dropped = df.columns.filter(c => c != segCol && c.startsWith(qPrefix)).toSeq
    RulesSegmentation(indexed.drop(dropped: _*), mapping, dropped)
  }
}
