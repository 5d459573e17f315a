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

  test("combo fast path returns the bit-identical Fit of the distributed loop") {
    // r16 value-counts rewrite: one groupBy(y, features).count() pass +
    // driver iterations must reproduce the per-iteration aggregation loop
    // EXACTLY — same float-op order, same floored gradient integers —
    // on both the transfer features (fractional doubles) and the langid
    // scores (long features, exercising the cast-to-double path)
    val docs = graft.Tables.documents(spark, sf)
    for ((feats, cols, label) <- Seq(
      (QualityClassifier.charClassFeatures(docs, "doc_id", "text"),
        Seq("f1", "f2", "f3"), col("y_sw")),
      (TextOps.langId(docs, "doc_id", "text"),
        Seq("s_en", "s_spark", "s_sql"), col("lang_pred") === "en"))) {
      val fast = QualityClassifier.fit(feats, cols, label,
        iters = 20, lr = 1.0)
      val slow = QualityClassifier.fitDistributed(
        feats.select((label.cast("double").as("y") +: cols.map(col)): _*),
        cols, iters = 20, lr = 1.0)
      assert(fast.n === slow.n && fast.pos === slow.pos &&
        fast.correct === slow.correct)
      assert(fast.weights.toSeq === slow.weights.toSeq,
        s"weights diverge: ${fast.weights.toList} vs ${slow.weights.toList}")
    }
    spark.catalog.clearCache()
  }

  test("char-class transfer fit beats majority on an independent label") {
    // label = stopword density (token membership); features = char-class
    // ratios only — nothing the label is defined from, so accuracy above
    // the majority class demonstrates TRANSFER, not self-prediction
    val feats = QualityClassifier.charClassFeatures(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    val r = QualityClassifier.fit(feats, Seq("f1", "f2", "f3"),
      col("y_sw"), iters = 20, lr = 1.0)
    val majority = math.max(r.pos, r.n - r.pos)
    assert(r.correct > majority,
      s"accuracy ${r.correct}/${r.n} does not beat majority $majority")
    // both classes must actually be present, or the test is vacuous
    assert(r.pos > 0 && r.pos < r.n, s"degenerate label split: ${r.pos}/${r.n}")
    spark.catalog.clearCache()
  }
}
