package graft.cluster

import org.apache.spark.ml.feature.{PCA, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature preparation for clustering (SURVEY.md §2.8 M1-M3; reference
  * clustering.py:101-109, 236-291).
  *
  * - M1 label encoding: `StringIndexer` with `alphabetAsc` ordering to mirror
  *   sklearn LabelEncoder's sorted-classes semantics (SURVEY §7.4).
  * - M2 standardization: `StandardScaler(withMean=true)` over the assembled
  *   vector.
  * - M3 PCA: MLlib fit; the component count is the smallest n with
  *   cumulative explained variance ≥ `varianceThreshold` — the cumsum runs on
  *   the tiny driver-side explainedVariance vector (W5).
  *
  * All stages are MLlib estimators — distributed fit, no collect of data.
  */
object FeaturePipeline {

  /** Ordinal-encode every listed column to `<col>_enc` (alphabetical order,
    * matching sklearn's sorted classes). */
  def labelEncode(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_enc")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
        .fit(acc).transform(acc)
    }

  /** Assemble + z-score the given (numeric) columns into `features`. */
  def standardize(df: DataFrame, cols: Seq[String],
      outputCol: String = "features"): DataFrame = {
    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("__raw").transform(df)
    val scaled = new StandardScaler().setInputCol("__raw").setOutputCol(outputCol)
      .setWithMean(true).setWithStd(true).fit(assembled).transform(assembled)
    scaled.drop("__raw")
  }

  /** PCA keeping the smallest component count whose cumulative explained
    * variance reaches the threshold (clustering.py:259-291). Returns the
    * transformed frame and the chosen n. */
  def pcaAtVariance(df: DataFrame, inputCol: String, outputCol: String,
      varianceThreshold: Double = 0.5, maxK: Int = 20): (DataFrame, Int) = {
    val dim = df.select(inputCol).head().getAs[Vector](0).size
    val probe = new PCA().setK(math.min(maxK, dim)).setInputCol(inputCol)
      .setOutputCol("__pca_probe").fit(df)
    val cum = probe.explainedVariance.toArray.scanLeft(0.0)(_ + _).tail
    val n = math.max(1, cum.indexWhere(_ >= varianceThreshold) match {
      case -1 => cum.length
      case i => i + 1
    })
    val model = new PCA().setK(n).setInputCol(inputCol).setOutputCol(outputCol)
      .fit(df)
    (model.transform(df), n)
  }

  /** Full categorical-survey-to-vector prep: encode, assemble, scale, PCA. */
  def prepare(df: DataFrame, cols: Seq[String], varianceThreshold: Double = 0.5)
      : (DataFrame, Int) = {
    val stringCols = cols.filter(c => df.schema(c).dataType ==
      org.apache.spark.sql.types.StringType)
    val encoded = labelEncode(df, stringCols)
    val encNames = cols.map(c => if (stringCols.contains(c)) s"${c}_enc" else c)
    val scaled = standardize(encoded, encNames, "__scaled")
    pcaAtVariance(scaled, "__scaled", "features", varianceThreshold)
  }
}
