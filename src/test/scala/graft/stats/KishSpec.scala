package graft.stats

import graft.SparkSpecBase

class KishSpec extends SparkSpecBase {
  import spark.implicits._

  test("uniform weights: ESS equals n exactly, deff exactly 1") {
    val rows = Seq(("g", 70L), ("g", 70L), ("g", 70L), ("g", 70L))
      .toDF("grp", "w")
    val r = Kish.effectiveSampleSize(rows, "grp", "w").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("ess_milli") === 4000L)
    assert(r.getAs[Long]("deff_micro") === 1000000L)
  }

  test("one dominant weight collapses ESS toward 1") {
    val ws = Seq(1000000L, 1L, 1L)
    val rows = ws.map(("g", _)).toDF("grp", "w")
    val r = Kish.effectiveSampleSize(rows, "grp", "w").collect()(0)
    val sw = BigInt(ws.sum)
    val sww = ws.map(w => BigInt(w) * w).sum
    assert(r.getAs[Long]("ess_milli") === (sw * sw * 1000 / sww).toLong)
    assert(r.getAs[Long]("deff_micro") ===
      (BigInt(3) * sww * 1000000 / (sw * sw)).toLong)
    // ~1.000004 effective respondents out of 3
    assert(r.getAs[Long]("ess_milli") < 1001L)
  }

  test("groups compute independently") {
    val rows = Seq(("a", 10L), ("a", 10L), ("b", 5L), ("b", 15L))
      .toDF("grp", "w")
    val out = Kish.effectiveSampleSize(rows, "grp", "w")
      .orderBy("group").collect()
    assert(out(0).getAs[Long]("ess_milli") === 2000L)
    // (20)^2*1000 / (25+225) = 400000/250 = 1600
    assert(out(1).getAs[Long]("ess_milli") === 1600L)
  }
}
