package graft.metrics

import graft.SparkSpecBase
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** SMOTE + sampler-battery specs (reference metrics.py:714-811): class
  * balance after each sampler, convex-combination property of synthetic
  * points, and winner-count selection over the battery. */
class SamplerSpec extends SparkSpecBase {
  import spark.implicits._

  /** Imbalanced 2-D blobs: class 0 around (0,0) ×40, class 1 around (10,10)
    * ×12, class 2 around (-8,5) ×8 — deterministic lattice offsets. */
  private lazy val blobs = {
    val rows =
      (0 until 40).map(i => (i.toLong, 0, Array(i % 5 * 0.1, i / 5 * 0.1))) ++
      (0 until 12).map(i => (100L + i, 1, Array(10 + i % 4 * 0.2, 10 + i / 4 * 0.2))) ++
      (0 until 8).map(i => (200L + i, 2, Array(-8 + i % 3 * 0.3, 5 + i / 3 * 0.3)))
    rows.toDF("id", "cluster", "arr")
  }

  test("smote balances every minority class to the majority size exactly") {
    val out = ModelMetrics.smote(blobs, "id", "cluster", "arr", k = 3)
    val counts = out.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(0 -> 40L, 1 -> 40L, 2 -> 40L))
  }

  test("synthetic points are convex combinations inside the class bounding box") {
    val out = ModelMetrics.smote(blobs, "id", "cluster", "arr", k = 3)
    val synth = out.filter($"id" < 0).collect()
    assert(synth.nonEmpty)
    val boxes = blobs.collect()
      .map(r => (r.getInt(1), r.getAs[scala.collection.Seq[Double]](2)))
      .groupBy(_._1).map { case (c, rs) =>
        val vs = rs.map(_._2)
        c -> (0 until 2).map(d =>
          (vs.map(_(d)).min - 1e-9, vs.map(_(d)).max + 1e-9))
      }
    synth.foreach { r =>
      val c = r.getInt(1)
      val v = r.getAs[scala.collection.Seq[Double]](2)
      boxes(c).zipWithIndex.foreach { case ((lo, hi), d) =>
        assert(v(d) >= lo && v(d) <= hi,
          s"synthetic coord $d=${v(d)} outside class-$c box [$lo,$hi]")
      }
    }
  }

  test("smote plan has no single-partition exchange (trim is distributed)") {
    val out = ModelMetrics.smote(blobs, "id", "cluster", "arr", k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "final-replica trim must use the distributed global index")
    spark.catalog.clearCache()
  }

  test("smote is deterministic across invocations") {
    def run() = ModelMetrics.smote(blobs, "id", "cluster", "arr", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]](2).toList)).toSet
    assert(run() === run())
  }

  test("rfSignal battery: every sampler yields the 4 metrics; winner-count selects one") {
    val labeled = blobs.withColumn("features", array_to_vector($"arr"))
    val (winner, results) = ModelMetrics.selectSampler(labeled, "features")
    assert(Set("none", "under", "over", "smote").contains(winner))
    results.foreach { case (_, m) =>
      assert(m.keySet === Set("accuracy", "f1", "precision", "recall",
        "kappa", "majority_baseline", "n_test"))
      Seq("accuracy", "f1", "precision", "recall", "majority_baseline")
        .foreach(k => assert(m(k) >= 0.0 && m(k) <= 1.0))
      assert(m("kappa") >= -1.0 && m("kappa") <= 1.0)
      assert(m("n_test") > 0)
    }
    // the blobs are linearly separable — every sampler should classify well,
    // beating the majority baseline with positive chance-corrected agreement
    assert(results("smote")("accuracy") > 0.6)
    assert(results("smote")("accuracy") > results("smote")("majority_baseline"))
    assert(results("smote")("kappa") > 0.0)
  }
}
