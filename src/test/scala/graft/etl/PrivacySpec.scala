package graft.etl

import graft.SparkSpecBase

class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("k-anonymity audit: hand-checked class profile") {
    // class a: 6 rows, 2 distinct sensitive; class b: 3 rows, 1 distinct
    val rows = Seq.fill(3)(("a", "s1")) ++ Seq.fill(3)(("a", "s2")) ++
      Seq.fill(3)(("b", "s1"))
    val r = Privacy.kAnonymityAudit(rows.toDF("q", "s"), Seq("q"), "s",
      k = 5).collect()(0)
    assert(r.getAs[Long]("n_rows") === 9L)
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("k_min") === 3L)
    assert(r.getAs[Long]("l_min") === 1L)
    assert(r.getAs[Long]("classes_below_k") === 1L)
    assert(r.getAs[Long]("rows_below_k") === 3L)
    assert(r.getAs[Long]("below_k_micro") === 333333L)
  }

  test("fully k-anonymous table reports zero risk mass") {
    val rows = Seq.fill(5)(("a", "s1")) ++ Seq.fill(7)(("b", "s2"))
    val r = Privacy.kAnonymityAudit(rows.toDF("q", "s"), Seq("q"), "s",
      k = 5).collect()(0)
    assert(r.getAs[Long]("k_min") === 5L)
    assert(r.getAs[Long]("classes_below_k") === 0L)
    assert(r.getAs[Long]("below_k_micro") === 0L)
  }

  test("multi-column quasi-identifiers form the class key") {
    val rows = Seq(("x", "1", "s"), ("x", "2", "s"), ("x", "1", "s"))
    val r = Privacy.kAnonymityAudit(rows.toDF("q1", "q2", "s"),
      Seq("q1", "q2"), "s", k = 2).collect()(0)
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("k_min") === 1L)
    assert(r.getAs[Long]("rows_below_k") === 1L)
  }
}
