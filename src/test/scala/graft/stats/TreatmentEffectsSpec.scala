package graft.stats

import graft.SparkSpecBase

class TreatmentEffectsSpec extends SparkSpecBase {
  import spark.implicits._

  test("QTE: nearest-rank quantiles per arm, gaps are data values") {
    // arm a: 10..100 by 10; arm b: the same shifted down by 5
    val rows = (1L to 10L).map(i => ("a", i * 10L)) ++
      (1L to 10L).map(i => ("b", i * 10L - 5L))
    val m = TreatmentEffects.quantileTreatmentEffects(
      rows.toDF("arm", "y"), "arm", "y")
      .collect().map(r => r.getAs[Long]("pct") ->
        (r.getAs[Long]("ya"), r.getAs[Long]("yb"),
          r.getAs[Long]("qte"))).toMap
    // k = ceil(10*p/100): p50 -> rank 5 -> a 50, b 45
    assert(m(50L) === ((50L, 45L, 5L)))
    assert(m(90L) === ((90L, 85L, 5L)))
    assert(m(10L) === ((10L, 5L, 5L)))
  }

  test("QTE: a tail-only effect is invisible at the median") {
    val rows = (1L to 9L).map(i => ("a", i)) ++ Seq(("a", 100L)) ++
      (1L to 9L).map(i => ("b", i)) ++ Seq(("b", 10L))
    val m = TreatmentEffects.quantileTreatmentEffects(
      rows.toDF("arm", "y"), "arm", "y", Seq(50, 100))
      .collect().map(r => r.getAs[Long]("pct") ->
        r.getAs[Long]("qte")).toMap
    assert(m(50L) === 0L)
    assert(m(100L) === 90L)
  }

  private def did(rows: (String, String, Long)*) =
    TreatmentEffects.diffInDiff(rows.toDF("arm", "p", "y"), "arm", "p",
      "y").collect()(0)

  test("DiD: hand 2x2 — a +3 vs b +1 gives exactly +2e6") {
    val r = did(("a", "pre", 10L), ("a", "post", 13L),
      ("b", "pre", 20L), ("b", "post", 21L))
    assert(r.getAs[Long]("did_micro") === 2000000L)
  }

  test("DiD: parallel trends give exactly 0; exact rational thirds") {
    val zero = did(("a", "pre", 5L), ("a", "post", 8L),
      ("b", "pre", 1L), ("b", "post", 4L))
    assert(zero.getAs[Long]("did_micro") === 0L)
    // a: pre {0}, post {0,0,1} mean 1/3; b flat -> DiD = 1/3 floored
    val third = did(("a", "pre", 0L), ("a", "post", 0L),
      ("a", "post", 0L), ("a", "post", 1L),
      ("b", "pre", 7L), ("b", "post", 7L))
    assert(third.getAs[Long]("did_micro") === 333333L)
  }

  test("DiD: an empty cell yields one row with null, not no rows") {
    val r = did(("a", "post", 1L), ("b", "pre", 2L), ("b", "post", 3L))
    assert(r.getAs[Long]("n_aq") === 0L)
    assert(r.isNullAt(r.fieldIndex("did_micro")))
  }

  test("DiD: negative effects floor toward -inf") {
    // a: 0 -> 0; b: 0 -> 1/3: DiD = -1/3 -> -333334
    val r = did(("a", "pre", 0L), ("a", "post", 0L),
      ("b", "pre", 0L), ("b", "post", 0L), ("b", "post", 0L),
      ("b", "post", 1L))
    assert(r.getAs[Long]("did_micro") === -333334L)
  }
}
