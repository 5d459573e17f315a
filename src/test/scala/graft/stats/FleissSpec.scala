package graft.stats

import graft.SparkSpecBase

class FleissSpec extends SparkSpecBase {
  import spark.implicits._

  private def kappa(rows: (Int, String)*) = Fleiss.fleissKappa(
    rows.toDF("item", "cat"), "item", "cat").collect()(0)

  test("perfect agreement on distinct categories gives kappa exactly 1") {
    // 2 items, 3 raters, unanimous per item but different across items
    val r = kappa(1 -> "a", 1 -> "a", 1 -> "a",
      2 -> "b", 2 -> "b", 2 -> "b")
    assert(r.getAs[Long]("n") === 2L && r.getAs[Long]("r") === 3L)
    assert(r.getAs[Long]("pbar_micro") === 1000000L)
    assert(r.getAs[Long]("kappa_micro") === 1000000L)
  }

  test("unanimous constant raters carry no information: kappa null") {
    val r = kappa(1 -> "a", 1 -> "a", 1 -> "a",
      2 -> "a", 2 -> "a", 2 -> "a")
    assert(r.isNullAt(r.fieldIndex("kappa_micro")))
  }

  test("perfect disagreement with 2 raters gives kappa exactly -1") {
    val r = kappa(1 -> "a", 1 -> "b", 2 -> "b", 2 -> "a")
    assert(r.getAs[Long]("pbar_micro") === 0L)
    assert(r.getAs[Long]("kappa_micro") === -1000000L)
  }

  test("hand example: S and C sufficient statistics are exact") {
    // items: (a,a,b) and (a,b,b): S = (4+1)+(1+4) = 10, c_a=3, c_b=3
    val r = kappa(1 -> "a", 1 -> "a", 1 -> "b",
      2 -> "a", 2 -> "b", 2 -> "b")
    assert(r.getAs[Long]("s_sq") === 10L)
    assert(r.getAs[Long]("c_sq") === 18L)
    // pbar = (10-6)/(6*2) = 1/3; pe = 18/36 = 1/2
    assert(r.getAs[Long]("pbar_micro") === 333333L)
    assert(r.getAs[Long]("pe_micro") === 500000L)
    // kappa = (1/3 - 1/2)/(1 - 1/2) = -1/3 (floor micro)
    assert(r.getAs[Long]("kappa_micro") === -333334L)
  }

  test("ragged panel (unequal raters per item) fails loudly") {
    val e = intercept[Exception] {
      kappa(1 -> "a", 1 -> "a", 1 -> "a", 2 -> "a", 2 -> "b")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("ragged panel"))))
  }
}
