package graft.stats

import graft.SparkSpecBase

class KruskalWallisSpec extends SparkSpecBase {
  import spark.implicits._

  test("textbook no-tie fixture matches the hand-computed H") {
    // values 1..6, groups A={1,2,3}, B={4,5,6}: rank sums 6 and 15,
    // H = 12/(6*7)*(36/3 + 225/3) - 3*7 = 27/7 = 3.857142...
    // floored per-group decomposition: t_A = 144e6 div 126 = 1142857,
    // t_B = 900e6 div 126 = 7142857 -> h = 3*(t_A+t_B) - 21e6 = 3857142
    val rows = Seq(("m", "A", 1L), ("m", "A", 2L), ("m", "A", 3L),
        ("m", "B", 4L), ("m", "B", 5L), ("m", "B", 6L))
      .toDF("variable", "grp", "value")
    val r = KruskalWallis.kruskalWallis(rows, "variable", "grp", "value")
      .collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("h_micro") === 3857142L)
    assert(r.getAs[Long]("t_tie") === 0L)
    // no ties: corrected equals uncorrected
    assert(r.getAs[Long]("hc_micro") === 3857142L)
  }

  test("identical group distributions give H = 0") {
    // every group holds the same single value: all ranks tied, D_g
    // proportional to n_g -> H exactly 0; full tie -> hc null
    val rows = Seq(("m", "A", 7L), ("m", "A", 7L),
        ("m", "B", 7L), ("m", "B", 7L))
      .toDF("variable", "grp", "value")
    val r = KruskalWallis.kruskalWallis(rows, "variable", "grp", "value")
      .collect()(0)
    assert(r.getAs[Long]("h_micro") === 0L)
    assert(r.getAs[Long]("t_tie") === 4L * 4L * 4L - 4L)
    assert(r.isNullAt(r.fieldIndex("hc_micro")))
  }

  test("tie correction scales H by (1 - T/(N^3-N)) as integer division") {
    // A={1,2}, B={2,3}: sorted values 1,(2,2),3 -> avg rank of the 2s
    // is 2.5. Doubled rank sums: D_A = 2+5=7 doubled = 2*1+2*2.5 = 7;
    // use the operator's own definition for the expectation
    val rows = Seq(("m", "A", 1L), ("m", "A", 2L),
        ("m", "B", 2L), ("m", "B", 3L))
      .toDF("variable", "grp", "value")
    val r = KruskalWallis.kruskalWallis(rows, "variable", "grp", "value")
      .collect()(0)
    // D_A (doubled) = (2*0+1+1) + (2*1+2+1) = 2+5 = 7; D_B = 5+8=13
    // t_A = 1e6*49 div (2*4*5=40) = 1225000; t_B = 1e6*169 div 40
    //     = 4225000; h = 3*(1225000+4225000) - 3e6*5 = 1350000
    assert(r.getAs[Long]("h_micro") === 1350000L)
    // T = 2^3-2 = 6 over the tied pair; N^3-N = 60
    assert(r.getAs[Long]("t_tie") === 6L)
    assert(r.getAs[Long]("hc_micro") === 1350000L * 60L / 54L)
  }

  test("variables compute independently") {
    val rows = Seq(("m1", "A", 1L), ("m1", "B", 2L),
        ("m2", "A", 5L), ("m2", "A", 6L), ("m2", "B", 7L))
      .toDF("variable", "grp", "value")
    val out = KruskalWallis.kruskalWallis(rows, "variable", "grp", "value")
      .orderBy("variable").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(1).getAs[Long]("n") === 3L)
  }
}
