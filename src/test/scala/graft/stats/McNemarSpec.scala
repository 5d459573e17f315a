package graft.stats

import graft.SparkSpecBase

class McNemarSpec extends SparkSpecBase {
  import spark.implicits._

  private def mc(rows: (Boolean, Boolean)*) = McNemar.mcnemar(
    rows.toDF("a", "b"), "a", "b").collect()(0)

  test("hand table: b=10, c=0 gives chi2_cc = 81/10") {
    val r = mc(Seq.fill(10)(true -> false) ++ Seq.fill(5)(true -> true): _*)
    assert(r.getAs[Long]("n10") === 10L)
    assert(r.getAs[Long]("n01") === 0L)
    assert(r.getAs[Long]("chi2_cc_micro") === 8100000L)
    assert(r.getAs[Long]("direction") === 1L)
  }

  test("balanced discordance clamps to exactly zero, not 1/(b+c)") {
    val r = mc(true -> false, false -> true, true -> true, false -> false)
    assert(r.getAs[Long]("chi2_cc_micro") === 0L)
    assert(r.getAs[Long]("direction") === 0L)
  }

  test("one-off discordance (|b-c|=1) also clamps to zero") {
    val r = mc(true -> false, true -> false, false -> true)
    assert(r.getAs[Long]("chi2_cc_micro") === 0L)
    assert(r.getAs[Long]("direction") === 1L)
  }

  test("fully concordant pairs leave the statistic undefined (null)") {
    val r = mc(true -> true, false -> false, true -> true)
    assert(r.isNullAt(r.fieldIndex("chi2_cc_micro")))
    assert(r.getAs[Long]("n") === 3L)
  }

  test("direction follows the larger discordant arm") {
    val r = mc(false -> true, false -> true, false -> true, true -> false)
    assert(r.getAs[Long]("direction") === -1L)
    // chi2_cc = (3-1-1)^2... |b-c|=2 -> (2-1)^2/4 = 0.25
    assert(r.getAs[Long]("chi2_cc_micro") === 250000L)
  }

  test("concordant counts do not move the statistic") {
    val base = mc(true -> false, true -> false, false -> true)
    val padded = mc(Seq(true -> false, true -> false, false -> true) ++
      Seq.fill(50)(true -> true) ++ Seq.fill(50)(false -> false): _*)
    assert(base.getAs[Long]("chi2_cc_micro") ===
      padded.getAs[Long]("chi2_cc_micro"))
  }
}
