package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class TripletsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tri(rows: (Long, Seq[Double], Long)*) = Triplets.semiHard(
    rows.toDF("vec_id", "embedding", "label"),
    "vec_id", "embedding", "label", col("vec_id") === 0L, k = 3)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("picks the nearest same-label positive and a semi-hard negative") {
    val m = tri(
      (0L, Seq(1.0, 0.0), 0L),
      (1L, Seq(4.0, 1.0), 0L),   // cos ~ .970 — the positive
      (2L, Seq(2.0, 1.0), 1L),   // cos ~ .894 — semi-hard negative
      (3L, Seq(0.0, 1.0), 1L))   // cos 0 — easier negative, not picked
    val r = m(0L)
    assert(r.getAs[Long]("pos_id") === 1L)
    assert(r.getAs[Long]("neg_id") === 2L)
    assert(r.getAs[Long]("margin_micro") > 0L)
  }

  test("negatives inside the positive radius are excluded (semi-hard band)") {
    val m = tri(
      (0L, Seq(1.0, 0.0), 0L),
      (1L, Seq(3.0, 1.0), 0L),   // cos ~ .949 positive
      (2L, Seq(9.0, 1.0), 1L),   // cos ~ .994 — HARD, excluded
      (3L, Seq(1.0, 1.0), 1L))   // cos ~ .707 — the semi-hard pick
    val r = m(0L)
    assert(r.getAs[Long]("neg_id") === 3L)
  }

  test("anchors without a same-label candidate emit nulls, not drops") {
    val m = tri(
      (0L, Seq(1.0, 0.0), 9L),
      (1L, Seq(0.9, 0.1), 1L),
      (2L, Seq(0.8, 0.2), 1L))
    val r = m(0L)
    assert(r.isNullAt(r.fieldIndex("pos_id")))
    assert(r.isNullAt(r.fieldIndex("margin_micro")))
    assert(r.getAs[Long]("anchor_label") === 9L)
  }

  test("no semi-hard negative available: positive kept, negative null") {
    // the only different-label vector is CLOSER than the positive
    val m = tri(
      (0L, Seq(1.0, 0.0), 0L),
      (1L, Seq(2.0, 1.0), 0L),   // cos ~ .894 positive
      (2L, Seq(9.0, 1.0), 1L))   // cos ~ .994, inside the radius
    val r = m(0L)
    assert(r.getAs[Long]("pos_id") === 1L)
    assert(r.isNullAt(r.fieldIndex("neg_id")))
  }

  test("margin equals the floored difference of the certified cosines") {
    val m = tri(
      (0L, Seq(1.0, 0.0), 0L),
      (1L, Seq(1.0, 0.0), 0L),   // cos 1 exactly
      (2L, Seq(0.0, 1.0), 1L))   // cos 0 exactly
    assert(m(0L).getAs[Long]("margin_micro") === 1000000L)
  }
}
