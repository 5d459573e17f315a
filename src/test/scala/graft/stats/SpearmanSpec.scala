package graft.stats

import graft.SparkSpecBase

class SpearmanSpec extends SparkSpecBase {
  import spark.implicits._

  private def rho(rows: (Long, Long)*) = {
    val r = Spearman.spearman(
      rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"),
      "g", "x", "y").collect()(0)
    Option(r.get(r.fieldIndex("rho_micro"))).map(_.asInstanceOf[Long])
  }

  test("perfect monotone gives exactly 1 even under a nonlinear map") {
    assert(rho(1L -> 1L, 2L -> 100L, 3L -> 101L, 4L -> 10000L)
      === Some(1000000L))
  }

  test("perfect inverse gives exactly -1") {
    assert(rho(1L -> 9L, 2L -> 7L, 3L -> 5L, 4L -> 1L)
      === Some(-1000000L))
  }

  test("ties rank by averages: jointly tied pairs stay exactly 1") {
    assert(rho(1L -> 5L, 1L -> 5L, 2L -> 9L) === Some(1000000L))
  }

  test("a constant metric has no rank variance: null") {
    assert(rho(1L -> 7L, 2L -> 7L, 3L -> 7L) === None)
  }

  test("groups compute independently") {
    val out = Spearman.spearman(
      Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
        ("b", 1L, 3L), ("b", 2L, 2L), ("b", 3L, 1L))
        .toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("rho_micro")).toMap
    assert(out("a") === 1000000L && out("b") === -1000000L)
  }
}
