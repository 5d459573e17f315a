package graft.metrics

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** classificationMetrics must agree with MLlib's
  * MulticlassClassificationEvaluator (the evaluator rfSignal reports
  * through) — same accuracy / weighted precision / recall / F1 definitions
  * (reference metrics.py:714-811). */
class ClassificationMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("matches MulticlassClassificationEvaluator on a noisy 3-class frame") {
    // deterministic noisy classifier: flip label on every 3rd/7th row,
    // giving an asymmetric confusion matrix with all metric branches live
    val df = (0 until 300).map { i =>
      val label = i % 3
      val pred =
        if (i % 7 == 0) (label + 1) % 3
        else if (i % 13 == 0) (label + 2) % 3
        else label
      (label.toDouble, pred.toDouble)
    }.toDF("label", "prediction")
    val got = ModelMetrics.classificationMetrics(df, "label", "prediction")
      .head()
    def ev(metric: String): Double =
      new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName(metric).evaluate(df)
    assert(got.getLong(0) === 300L)
    assert(math.abs(got.getDouble(1) - ev("accuracy")) < 1e-12)
    assert(math.abs(got.getDouble(2) - ev("f1")) < 1e-12)
    assert(math.abs(got.getDouble(3) - ev("weightedPrecision")) < 1e-12)
    assert(math.abs(got.getDouble(4) - ev("weightedRecall")) < 1e-12)
  }

  test("degenerate prediction column: all-one-class keeps metrics defined") {
    val df = (0 until 60).map(i => ((i % 3).toDouble, 0.0))
      .toDF("label", "prediction")
    val got = ModelMetrics.classificationMetrics(df, "label", "prediction")
      .head()
    // accuracy = share of true class 0; weighted precision counts only
    // class 0's precision at weight 1/3; nothing NaNs
    assert(math.abs(got.getDouble(1) - 1.0 / 3) < 1e-12)
    assert((1 to 4).forall(i => !got.getDouble(i).isNaN))
  }
}
