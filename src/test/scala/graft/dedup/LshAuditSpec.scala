package graft.dedup

import graft.SparkSpecBase

class LshAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def audit(docs: (Long, String)*) = LshAudit.bandingAudit(
    docs.toDF("doc_id", "text"), "doc_id", "text").collect()(0)

  test("identical docs: the J=1 pair is found by every band (recall 1)") {
    val r = audit(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different words about entirely other topics here",
      4L -> "unrelated sentences describing some third separate subject")
    assert(r.getAs[Long]("n_true") === 1L)
    assert(r.getAs[Long]("tp") === 1L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Long]("recall_micro") === 1000000L)
  }

  test("disjoint corpus: no truth, no candidates, null ratios") {
    val r = audit(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six",
      3L -> "red green blue yellow purple orange")
    assert(r.getAs[Long]("n_true") === 0L)
    assert(r.getAs[Long]("n_cand") === 0L)
    assert(r.isNullAt(r.fieldIndex("precision_micro")))
    assert(r.isNullAt(r.fieldIndex("recall_micro")))
  }

  test("confusion identities hold: tp + fn = n_true, tp + fp = n_cand") {
    val r = audit(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i k",
      3L -> "a b c x y z q w e r",
      4L -> "m n o p q r s t u v")
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") ===
      r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") ===
      r.getAs[Long]("n_cand"))
  }
}
