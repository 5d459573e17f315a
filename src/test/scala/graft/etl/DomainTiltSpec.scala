package graft.etl

import graft.SparkSpecBase

class DomainTiltSpec extends SparkSpecBase {
  import spark.implicits._

  test("above-baseline domains tilt up, at-or-below stay neutral, " +
      "weights normalize to ~1e6") {
    // domain a: 2 docs, 10 units, loss 30e6 -> mean 3e6
    // domain b: 1 doc, 10 units, loss 10e6 -> mean 1e6
    // baseline = 40e6 div 20 = 2e6 -> a excess 1e6, b excess 0
    val scored = Seq(
      ("a", 5L, 15000000L), ("a", 5L, 15000000L), ("b", 10L, 10000000L))
      .toDF("src", "n", "loss")
    val out = DataMix.exponentialTiltWeights(scored, "src", "n", "loss",
        etaMicro = 2000000L)
      .orderBy("src").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("loss_micro") === 3000000L)
    assert(b.getAs[Long]("loss_micro") === 1000000L)
    assert(a.getAs[Long]("excess_micro") === 1000000L)
    assert(b.getAs[Long]("excess_micro") === 0L)
    // tilt = floor(exp(eta * excess / 1e12) * 1e6): e^2 for a, e^0 for b
    val tiltA = math.floor(math.exp(2.0) * 1e6).toLong
    assert(a.getAs[Long]("tilt_micro") === tiltA)
    assert(b.getAs[Long]("tilt_micro") === 1000000L)
    val tot = tiltA + 1000000L
    assert(a.getAs[Long]("weight_micro") === tiltA * 1000000L / tot)
    assert(b.getAs[Long]("weight_micro") === 1000000L * 1000000L / tot)
    // floor-normalized weights sum to 1e6 within |domains| micro
    val ws = out.map(_.getAs[Long]("weight_micro")).sum
    assert(ws <= 1000000L && ws > 1000000L - out.length)
  }

  test("a domain with zero scorable units carries no loss evidence and " +
      "stays at the neutral tilt") {
    val scored = Seq(("a", 10L, 30000000L), ("z", 0L, 0L))
      .toDF("src", "n", "loss")
    val out = DataMix.exponentialTiltWeights(scored, "src", "n", "loss",
        etaMicro = 2000000L)
      .orderBy("src").collect()
    val z = out(1)
    assert(z.isNullAt(z.fieldIndex("loss_micro")))
    assert(z.getAs[Long]("excess_micro") === 0L)
    assert(z.getAs[Long]("tilt_micro") === 1000000L)
  }

  test("uniform losses tilt nothing: every weight equal") {
    val scored = Seq(("a", 10L, 20000000L), ("b", 10L, 20000000L),
        ("c", 10L, 20000000L))
      .toDF("src", "n", "loss")
    val out = DataMix.exponentialTiltWeights(scored, "src", "n", "loss",
        etaMicro = 2000000L).collect()
    assert(out.map(_.getAs[Long]("weight_micro")).toSet.size === 1)
    assert(out.head.getAs[Long]("weight_micro") === 333333L)
  }
}
