package graft.pipeline

import graft.SparkSpecBase
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Composition pins for the survey capstone: the cleaning conventions must
  * actually reach the inference pass, and the debug path's sanity signal —
  * the segmenting variable testing perfectly dependent against its own
  * segments — must be delivered. */
class SurveyCurationSpec extends SparkSpecBase {

  private lazy val out =
    SparkEntry.queries("q_pipeline_survey")(spark, sf).collect()

  test("segmenting variable is delivered with perfect dependence per cluster") {
    val techRows = out.filter(_.getAs[String]("variable") == "techcomfort_rb_ord")
    // dense-rank segments: one significant row per cluster, p ≈ 0, and the
    // cluster's own level is the (only) positively-associated category
    assert(techRows.map(_.getAs[String]("cluster")).sorted.toSeq ===
      Seq("0", "1", "2"))
    techRows.foreach { r =>
      assert(r.getAs[Double]("p_value") <= 1e-9)
      val sig = r.getAs[String]("sig_more_category")
      assert(Seq("""["F"]""", """["O"]""", """["P"]""").contains(sig),
        s"expected the cluster's own level, got $sig")
    }
  }

  test("cleaning conventions reach inference: _time/_id excluded, sentinel scrubbed") {
    val vars = out.map(_.getAs[String]("variable")).distinct.toSet
    assert(!vars.exists(v => v.contains("_time") || v.contains("_id")),
      "time/id columns must not be tested")
    assert(vars.subsetOf(
      Set("techcomfort_rb_ord", "priority", "spend_band", "adoption")))
    // the planted dependent variable must be significant somewhere
    assert(vars.contains("adoption"))
    // 'not selected' (the null sentinel) is tested but never delivered as a
    // significant category (helper_functions.py:24-30 scrub-after-test)
    assert(!out.exists(_.getAs[String]("sig_more_category")
      .contains("not selected")))
  }

  test("deliver frame is p-ascending with valid stats") {
    val ps = out.map(_.getAs[Double]("p_value")).toSeq
    assert(ps === ps.sorted)
    assert(out.forall(r => r.getAs[Double]("chi2_stat") >= 0.0))
    assert(out.forall(r => r.getAs[Long]("dof") % 2 == 0 &&
      r.getAs[Long]("dof") >= 2), "3-cluster design keeps dof even")
    // orders-derived survey: spot-check row counts came from real data
    assert(out.nonEmpty)
    assert(Tables.orders(spark, sf).count() > 0)
  }
}
