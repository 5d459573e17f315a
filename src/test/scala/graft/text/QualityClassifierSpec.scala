package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  test("fit separates a linearly-separable toy exactly") {
    // y = 1 iff f1 > 0.5 — cleanly separable on one feature
    val df = ((1 to 50).map(i => (0.8 + (i % 5) * 0.01, 1.0)) ++
      (1 to 50).map(i => (0.1 + (i % 5) * 0.01, 0.0)))
      .toDF("f1", "yy")
    val r = QualityClassifier.fit(df, Seq("f1"), col("yy") === 1.0,
      iters = 25, lr = 4.0)
    assert(r.n === 100)
    assert(r.correct === 100, s"only ${r.correct}/100 after 25 iters")
  }

  test("langid distillation beats the majority class by a wide margin") {
    val scored = TextOps.langId(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    val r = QualityClassifier.fit(scored, Seq("s_en", "s_spark", "s_sql"),
      col("lang_pred") === "en", iters = 20, lr = 1.0)
    val pos = scored.filter(col("lang_pred") === "en").count()
    val majority = math.max(pos, r.n - pos)
    assert(r.correct > majority,
      s"accuracy ${r.correct}/${r.n} does not beat majority $majority")
    // the fit must actually recover the rule's shape: positive weight on
    // the en score, non-positive on the competitors
    assert(r.weights(1) > 0 && r.weights(2) <= 0 && r.weights(3) <= 0,
      s"weights ${r.weights.toList} do not reflect the distilled rule")
    spark.catalog.clearCache()
  }
}
