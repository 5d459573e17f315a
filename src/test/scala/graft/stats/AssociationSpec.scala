package graft.stats

import graft.SparkSpecBase

class AssociationSpec extends SparkSpecBase {
  import spark.implicits._

  private def as(rows: (String, String)*) = Association.measures(
    rows.map { case (x, y) => ("v", x, y) }.toDF("var", "x", "y"),
    "var", "x", "y").collect()(0)

  test("perfect 2x2 association: V^2 = 1 and U = 1 both ways") {
    val r = as("a" -> "a", "a" -> "a", "b" -> "b", "b" -> "b")
    assert(r.getAs[Long]("chi2_micro") === 4000000L)
    assert(r.getAs[Long]("v2_micro") === 1000000L)
    assert(r.getAs[Long]("u_xy_micro") === 1000000L)
    assert(r.getAs[Long]("u_yx_micro") === 1000000L)
  }

  test("independence: chi2, V^2 and U all exactly 0") {
    val r = as("a" -> "p", "a" -> "q", "b" -> "p", "b" -> "q")
    assert(r.getAs[Long]("chi2_micro") === 0L)
    assert(r.getAs[Long]("v2_micro") === 0L)
    assert(r.getAs[Long]("u_xy_micro") === 0L)
    assert(r.getAs[Long]("u_yx_micro") === 0L)
  }

  test("degenerate single-row table: V^2 and U(X|Y) are null") {
    val r = as("a" -> "p", "a" -> "q", "a" -> "p")
    assert(r.isNullAt(r.fieldIndex("v2_micro")))
    // H(X) = 0 -> U(X|Y) undefined
    assert(r.isNullAt(r.fieldIndex("u_xy_micro")))
    assert(r.getAs[Long]("r") === 1L)
    assert(r.getAs[Long]("c") === 2L)
  }

  test("asymmetric structure: U(X|Y) and U(Y|X) differ") {
    // y determines x exactly, but x leaves y ambiguous:
    // x=a <- y in {p,q}, x=b <- y=r
    val r = as("a" -> "p", "a" -> "q", "b" -> "r", "b" -> "r")
    assert(r.getAs[Long]("u_xy_micro") === 1000000L)
    assert(r.getAs[Long]("u_yx_micro") < 1000000L)
    assert(r.getAs[Long]("u_yx_micro") > 0L)
  }

  test("empty cells enter chi2 through the closed-form mass term") {
    // 2x2 with one empty cell: O = {(a,p):1, (a,q):1, (b,p):2}
    // E: n=4, rows a:2 b:2, cols p:3 q:1
    // chi2 = sum (O-E)^2/E over ALL 4 cells:
    // (1-1.5)^2/1.5 + (1-0.5)^2/0.5 + (2-1.5)^2/1.5 + (0-0.5)^2/0.5
    // = 1/6 + 1/2 + 1/6 + 1/2 = 4/3
    val r = as("a" -> "p", "a" -> "q", "b" -> "p", "b" -> "p")
    assert(r.getAs[Long]("chi2_micro") === 1333333L)
  }
}
