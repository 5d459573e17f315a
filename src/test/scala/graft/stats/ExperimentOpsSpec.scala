package graft.stats

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExperimentOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("SRM: balanced split silent, broken split alarms") {
    val ok = ExperimentOps.srmCheck(
      (Seq.fill(500)("a") ++ Seq.fill(510)("b")).toDF("arm"), "arm")
      .collect()(0)
    // chi2 = 100/1010 = 0.099 -> far under 3.84
    assert(ok.getAs[Long]("chi2_micro") === 100L * 1000000L / 1010L)
    assert(!ok.getAs[Boolean]("srm_flag"))
    val bad = ExperimentOps.srmCheck(
      (Seq.fill(500)("a") ++ Seq.fill(400)("b")).toDF("arm"), "arm")
      .collect()(0)
    // chi2 = 10000/900 = 11.1 -> alarm
    assert(bad.getAs[Boolean]("srm_flag"))
  }

  test("power: required n replays the closed form and shrinks with MDE") {
    val df = Seq((100L, 1000L)).toDF("s", "n")
    val n10 = df.select(ExperimentOps.requiredN(col("s"), col("n"), 10)
      .as("r")).collect()(0).getAs[Long]("r")
    val n20 = df.select(ExperimentOps.requiredN(col("s"), col("n"), 20)
      .as("r")).collect()(0).getAs[Long]("r")
    val p1 = 0.1; val p2 = 0.1 * 1.1
    val z = 1.959964 + 0.841621
    val expected = math.floor(z * z * (p1 * (1 - p1) + p2 * (1 - p2)) /
      ((p2 - p1) * (p2 - p1)) + 1.0).toLong
    assert(n10 === expected)
    assert(n20 < n10) // bigger effect, fewer samples
  }

  test("mSPRT: no effect keeps p at 1, a real effect drives p down") {
    def cum(sa: Long, sb: Long) = Seq((1L, 1000L, sa, 1000L, sb))
      .toDF("day", "na", "sa", "nb", "sb")
    val nul = ExperimentOps.msprtColumns(cum(100L, 100L), 0.0001)
      .collect()(0)
    assert(nul.getAs[Long]("p_micro") === 1000000L)
    val eff = ExperimentOps.msprtColumns(cum(200L, 100L), 0.0001)
      .collect()(0)
    assert(eff.getAs[Long]("p_micro") < 10000L) // overwhelming evidence
    // evidence is monotone in the gap at fixed n
    val mid = ExperimentOps.msprtColumns(cum(130L, 100L), 0.0001)
      .collect()(0)
    assert(mid.getAs[Long]("log_e_micro") <
      eff.getAs[Long]("log_e_micro"))
  }

  test("mSPRT: degenerate inputs (empty arm, zero variance) give null") {
    val r = ExperimentOps.msprtColumns(
      Seq((1L, 0L, 0L, 10L, 5L)).toDF("day", "na", "sa", "nb", "sb"),
      0.0001).collect()(0)
    assert(r.isNullAt(r.fieldIndex("log_e_micro")))
    val z = ExperimentOps.msprtColumns(
      Seq((1L, 10L, 0L, 10L, 0L)).toDF("day", "na", "sa", "nb", "sb"),
      0.0001).collect()(0)
    assert(z.isNullAt(z.fieldIndex("log_e_micro"))) // pooled p = 0
  }
}
