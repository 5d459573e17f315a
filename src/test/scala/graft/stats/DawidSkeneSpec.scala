package graft.stats

import graft.SparkSpecBase

class DawidSkeneSpec extends SparkSpecBase {
  import spark.implicits._

  private val classes = Seq("a", "b")

  private def fit(rows: (Long, String, String, String)*) =
    DawidSkene.fit(rows.toDF("item", "r1", "r2", "r3"), "item",
      Seq("r1", "r2", "r3"), classes)
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("label"), r.getAs[Long]("conf_micro"))).toMap

  test("unanimous raters: consensus is the unanimous label, high conf") {
    val m = fit((1L, "a", "a", "a"), (2L, "b", "b", "b"),
      (3L, "a", "a", "a"), (4L, "b", "b", "b"))
    assert(m(1L)._1 === "a" && m(2L)._1 === "b")
    assert(m.values.forall(_._2 > 900000L))
  }

  test("2-of-3 majority wins when the dissenter is unsystematic") {
    val m = fit((1L, "a", "a", "b"), (2L, "a", "a", "a"),
      (3L, "b", "b", "b"), (4L, "b", "a", "b"), (5L, "a", "a", "a"),
      (6L, "b", "b", "a"))
    assert(m(1L)._1 === "a")
    assert(m(4L)._1 === "b")
    assert(m(6L)._1 === "b")
  }

  test("exactly one output row per item, posterior in (0, 1e6]") {
    val m = fit((1L, "a", "b", "a"), (2L, "b", "a", "b"),
      (3L, "a", "a", "b"))
    assert(m.size === 3)
    assert(m.values.forall(v => v._2 > 0L && v._2 <= 1000000L))
  }

  test("deterministic: repeated fits are bit-identical") {
    val rows = Seq((1L, "a", "a", "b"), (2L, "b", "b", "a"),
      (3L, "a", "b", "a"), (4L, "b", "a", "b"))
    assert(fit(rows: _*) === fit(rows: _*))
  }

  test("perfect symmetry resolves by the lexicographic tiebreak") {
    // two raters a, one rater b vs mirrored: fully symmetric panel
    val wide = Seq((1L, "a", "b"), (2L, "b", "a")).toDF("item", "r1", "r2")
    val out = DawidSkene.fit(wide, "item", Seq("r1", "r2"), classes)
      .collect().map(r => r.getAs[Long]("item") ->
        r.getAs[String]("label")).toMap
    // posteriors are exactly tied by symmetry -> smallest class label
    assert(out(1L) === "a" && out(2L) === "a")
  }
}
