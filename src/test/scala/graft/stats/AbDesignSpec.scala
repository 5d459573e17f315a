package graft.stats

import graft.SparkSpecBase

class AbDesignSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfectly balanced arms give SMD exactly 0") {
    val rows = Seq(("v", "a", 1L), ("v", "a", 3L),
      ("v", "b", 1L), ("v", "b", 3L)).toDF("v", "arm", "x")
    val r = AbDesign.smdBalance(rows, "v", "arm", "x").collect()(0)
    assert(r.getAs[Long]("dmean_micro") === 0L)
    assert(r.getAs[Long]("smd_micro") === 0L)
  }

  test("hand SMD: means 3 vs 1, both variances 2 -> SMD sqrt(2)") {
    // a: {2,4} mean 3 var 2; b: {0,2} mean 1 var 2; pooled 2
    val rows = Seq(("v", "a", 2L), ("v", "a", 4L),
      ("v", "b", 0L), ("v", "b", 2L)).toDF("v", "arm", "x")
    val r = AbDesign.smdBalance(rows, "v", "arm", "x").collect()(0)
    assert(r.getAs[Long]("dmean_micro") === 2000000L)
    assert(r.getAs[Long]("smd_micro") ===
      math.floor(2.0 / math.sqrt(2.0) * 1e6).toLong)
  }

  test("degenerate variance yields null SMD, mean gap survives") {
    val rows = Seq(("v", "a", 5L), ("v", "a", 5L),
      ("v", "b", 3L), ("v", "b", 3L)).toDF("v", "arm", "x")
    val r = AbDesign.smdBalance(rows, "v", "arm", "x").collect()(0)
    assert(r.getAs[Long]("dmean_micro") === 2000000L)
    assert(r.isNullAt(r.fieldIndex("smd_micro")))
  }

  private def ps(rows: (String, String, Long)*) =
    AbDesign.postStratEffect(rows.toDF("st", "arm", "y"), "st", "arm",
      "y").collect()
      .map(r => r.getAs[String]("stratum") ->
        Option(r.get(r.fieldIndex("diff_micro")))
          .map(_.asInstanceOf[Long])).toMap

  test("post-stratification: hand per-stratum gaps and weighted total") {
    // s1: a mean 10, b mean 6 -> +4e6 (n=4); s2: a 2, b 4 -> -2e6 (n=2)
    val m = ps(("s1", "a", 8L), ("s1", "a", 12L), ("s1", "b", 5L),
      ("s1", "b", 7L), ("s2", "a", 2L), ("s2", "b", 4L))
    assert(m("s1") === Some(4000000L))
    assert(m("s2") === Some(-2000000L))
    // total = (4*4e6 + 2*(-2e6)) / 6 = 2e6
    assert(m("__total") === Some(2000000L))
  }

  test("a stratum missing an arm is null and excluded from the total") {
    val m = ps(("s1", "a", 4L), ("s1", "b", 2L), ("s2", "a", 9L))
    assert(m("s1") === Some(2000000L))
    assert(m("s2") === None)
    assert(m("__total") === Some(2000000L))
  }

  test("negative gaps floor toward -inf (sign-safe division)") {
    // a mean 0, b mean 1/3: diff = -1/3 -> floor micro -333334
    val m = ps(("s", "a", 0L), ("s", "b", 0L), ("s", "b", 0L),
      ("s", "b", 1L))
    assert(m("s") === Some(-333334L))
  }
}
