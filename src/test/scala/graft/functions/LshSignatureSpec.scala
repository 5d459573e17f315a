package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The fused codegen'd LSH signature must be BIT-IDENTICAL to the composed
  * aggregate(zip_with(...)) form it replaced — the DuckDB oracles replay
  * the candidate sets, so a single flipped sign bit breaks hashes. */
class LshSignatureSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 16
  private val nBits = 6

  /** The pre-round-6 composed form, verbatim. */
  private def composed(vecCol: String, planes: Seq[Array[Double]])
      : org.apache.spark.sql.Column = {
    val v = col(vecCol).cast("array<double>")
    planes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(zip_with(v, lit(plane), _ * _), lit(0.0), (a, x) => a + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("fused expression matches the composed form on random vectors") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))).toDF("id", "v")
    val planes = (0 until nBits).map(p =>
      graft.sim.SimilarityOps.hyperplane(p, dim))
    val flat = planes.flatten.toIndexedSeq
    val out = df.select(
      LshSignature.signature(col("v"), flat, nBits, dim).as("fused"),
      composed("v", planes).as("old")).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    // signatures are non-degenerate (not all zero / not all equal)
    assert(out.map(_.getLong(0)).distinct.length > 10)
  }

  test("null vector, wrong length, and null element all yield 0L like the composed form") {
    val planes = (0 until nBits).map(p =>
      graft.sim.SimilarityOps.hyperplane(p, dim))
    val flat = planes.flatten.toIndexedSeq
    val df = Seq(
      (1L, null.asInstanceOf[Array[Double]]),
      (2L, Array.fill(dim - 3)(1.0)),
      (3L, Array.fill(dim + 2)(1.0))).toDF("id", "v")
      .union(Seq((4L, Array.fill(dim)(1.0))).toDF("id", "v")
        .select(col("id"), transform(col("v"),
          (x, i) => when(i === 2, lit(null)).otherwise(x)).as("v")))
    val out = df.select(col("id"),
      LshSignature.signature(col("v"), flat, nBits, dim).as("fused"),
      composed("v", planes).as("old")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id)._1 === 0L, s"id $id fused")
      assert(out(id)._1 === out(id)._2, s"id $id parity")
    }
  }

  test("whole-stage codegen and interpreted paths agree") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))).toDF("id", "v")
    val planes = (0 until nBits)
      .flatMap(p => graft.sim.SimilarityOps.hyperplane(p, dim))
      .toIndexedSeq
    def run(): Array[Long] = df.select(
      LshSignature.signature(col("v"), planes, nBits, dim)).collect()
      .map(_.getLong(0))
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run().toSeq === on.toSeq)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
