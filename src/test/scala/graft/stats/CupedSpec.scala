package graft.stats

import graft.SparkSpecBase

class CupedSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfect pre/post correlation removes the between-arm gap") {
    // y = 2x exactly: theta = 2, rho^2 = 1, both adjusted means collapse
    // to the grand adjusted mean (50) and the adjusted diff is 0
    val users = Seq(("a", 10L, 20L), ("a", 20L, 40L),
        ("b", 30L, 60L), ("b", 40L, 80L))
      .toDF("variant", "x", "y")
    val r = Cuped.cupedAdjust(users, "variant", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("theta_micro") === 2000000L)
    assert(r.getAs[Long]("adj_mean_a_milli") === 50L)
    assert(r.getAs[Long]("adj_mean_b_milli") === 50L)
    assert(r.getAs[Long]("diff_adj_milli") === 0L)
    assert(r.getAs[Long]("raw_mean_a_milli") === 30L)
    assert(r.getAs[Long]("raw_mean_b_milli") === 70L)
    assert(r.getAs[Long]("rho2_micro") === 1000000L)
  }

  test("negative theta floors like DuckDB's // (sign-safe floor-div)") {
    // x and y perfectly anti-correlated: theta = -1 exactly
    val users = Seq(("a", 10L, 0L), ("b", 0L, 10L))
      .toDF("variant", "x", "y")
    val r = Cuped.cupedAdjust(users, "variant", "x", "y").collect()(0)
    assert(r.getAs[Long]("theta_micro") === -1000000L)
    assert(r.getAs[Long]("adj_mean_a_milli") === 5L)
    assert(r.getAs[Long]("adj_mean_b_milli") === 5L)
    assert(r.getAs[Long]("diff_adj_milli") === 0L)
    assert(r.getAs[Long]("rho2_micro") === 1000000L)
  }

  test("constant pre-period metric degrades to nulls, raw means survive") {
    val users = Seq(("a", 5L, 10L), ("b", 5L, 30L))
      .toDF("variant", "x", "y")
    val r = Cuped.cupedAdjust(users, "variant", "x", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("theta_micro")))
    assert(r.isNullAt(r.fieldIndex("adj_mean_a_milli")))
    assert(r.isNullAt(r.fieldIndex("diff_adj_milli")))
    assert(r.isNullAt(r.fieldIndex("rho2_micro")))
    assert(r.getAs[Long]("raw_mean_a_milli") === 10L)
    assert(r.getAs[Long]("raw_mean_b_milli") === 30L)
  }

  test("uncorrelated covariate leaves the raw difference in place") {
    // x identical across arms and orthogonal to y: theta = 0, adjusted
    // means equal raw means
    val users = Seq(("a", 1L, 10L), ("a", 2L, 10L),
        ("b", 1L, 20L), ("b", 2L, 20L))
      .toDF("variant", "x", "y")
    val r = Cuped.cupedAdjust(users, "variant", "x", "y").collect()(0)
    assert(r.getAs[Long]("theta_micro") === 0L)
    assert(r.getAs[Long]("adj_mean_a_milli") === 10L)
    assert(r.getAs[Long]("adj_mean_b_milli") === 20L)
    assert(r.getAs[Long]("diff_adj_milli") === -10L)
  }
}
