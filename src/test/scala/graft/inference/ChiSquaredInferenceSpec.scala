package graft.inference

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChiSquaredInferenceSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 planted segments with distinct answer distributions + sentinels.
  private lazy val survey = {
    val rows = (0 until 300).map { i =>
      val seg = i % 3
      val q1 = seg match { // strong signal
        case 0 => if (i % 10 < 8) "agree" else "disagree"
        case 1 => if (i % 10 < 8) "disagree" else "agree"
        case _ => if (i % 10 < 5) "neutral" else "agree"
      }
      val q2 = if (i % 7 == 0) "not selected" else if (i % 11 == 0) "Not shown"
        else Seq("red", "green", "blue", "gold", "gray")(i % 5) // i%5 vs seg=i%3: independent
      (i.toLong, s"s$seg", q1, q2, 1.0 + (i % 4) * 0.5)
    }
    rows.toDF("id", "segment", "q1_opinion", "q2_color", "weight")
  }

  test("tall crosstab counts match direct groupBy and drop 'Not shown'") {
    val tall = CrosstabJob.tallCounts(survey, Seq("q1_opinion", "q2_color"), "segment")
    val direct = survey.filter($"q1_opinion" === "agree" && $"segment" === "s0").count()
    val fromTall = tall.filter($"variable" === "q1_opinion" &&
      $"category" === "agree" && $"cluster" === "s0")
      .select("n").as[Long].head()
    assert(fromTall === direct)
    assert(tall.filter($"category" === "Not shown").count() === 0)
  }

  test("weighted counts sum the weight column") {
    val tall = CrosstabJob.tallCounts(survey, Seq("q1_opinion"), "segment", Some("weight"))
    val w = tall.filter($"category" === "agree" && $"cluster" === "s0")
      .select("wn").as[Double].head()
    val direct = survey.filter($"q1_opinion" === "agree" && $"segment" === "s0")
      .agg(sum("weight")).as[Double].head()
    assert(math.abs(w - direct) < 1e-9)
  }

  test("deliverStats finds the planted signal and only the planted signal") {
    val out = ChiSquaredInference.deliverStats(
      spark, survey, Seq("q1_opinion", "q2_color"), "segment").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("variable") == "q1_opinion"))
    assert(out.forall(_.getAs[Double]("p_value") <= 0.05))
    // s0's positively-associated category is 'agree'
    val s0 = out.filter(_.getAs[String]("cluster") == "s0")
    assert(s0.exists(_.getAs[Seq[String]]("sig_more_category").contains("agree")))
    // 'not selected' never appears in sig lists (scrubbed after the test)
    assert(out.forall(!_.getAs[Seq[String]]("sig_more_category").contains("not selected")))
    // weighted percentages align 1:1 with sig categories and stay in (0,100]
    out.foreach { r =>
      val sig = r.getAs[scala.collection.Seq[String]]("sig_more_category")
      val wp = r.getAs[scala.collection.Seq[Double]]("weighted_category_percentages")
      assert(wp.length === sig.length)
      assert(wp.forall(p => p > 0 && p <= 100))
    }
  }

  test("deliverStats is sorted by ascending p") {
    val ps = ChiSquaredInference.deliverStats(
      spark, survey, Seq("q1_opinion", "q2_color"), "segment")
      .select("p_value").as[Double].collect()
    assert(ps.sameElements(ps.sorted))
  }

  test("populationModes emits a mode per (variable, cluster)") {
    val modes = ChiSquaredInference.populationModes(
      survey, Seq("q1_opinion", "q2_color"), "segment", Some("weight")).collect()
    assert(modes.length === 6) // 2 variables x 3 segments
    val s0q1 = modes.find(r => r.getAs[String]("variable") == "q1_opinion" &&
      r.getAs[String]("cluster") == "s0").get
    assert(s0q1.getAs[String]("mode_category") === "agree")
    assert(s0q1.getAs[Double]("wmode_share") > 0.5)
  }
}
