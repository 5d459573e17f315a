package graft.etl

import graft.SparkSpecBase

class PaddingReportSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand fixture: arrival pays max-minus-mean per batch, " +
      "length-sorted pays the minimum") {
    // lens in id order: 6 1 5 2 4 3 at B=2
    // arrival  batches (6,1)(5,2)(4,3): padded 12+10+8=30, waste 9
    // sorted   batches (1,2)(3,4)(5,6): padded  4+ 8+12=24, waste 3
    val docs = Seq((1L, 6L), (2L, 1L), (3L, 5L), (4L, 2L), (5L, 4L),
      (6L, 3L)).toDF("doc_id", "n_tokens")
    val got = PaddingReport.paddingWasteReport(docs, "doc_id", "n_tokens", 2)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    val a = got("arrival"); val s = got("length_sorted")
    assert(a.getAs[Long]("n_docs") === 6L)
    assert(a.getAs[Long]("n_batches") === 3L)
    assert(a.getAs[Long]("total_tokens") === 21L)
    assert(a.getAs[Long]("padded_tokens") === 30L)
    assert(a.getAs[Long]("waste_tokens") === 9L)
    assert(a.getAs[Long]("waste_micro") === 300000L)
    assert(s.getAs[Long]("padded_tokens") === 24L)
    assert(s.getAs[Long]("waste_tokens") === 3L)
    assert(s.getAs[Long]("waste_micro") === 125000L)
  }

  test("an all-zero-length corpus reports waste_micro 0, not NULL " +
      "(guarded division, mirrored as CASE in the oracle)") {
    val docs = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("doc_id", "n_tokens")
    PaddingReport.paddingWasteReport(docs, "doc_id", "n_tokens", 2)
      .collect().foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("waste_micro")))
        assert(r.getAs[Long]("waste_micro") === 0L)
        assert(r.getAs[Long]("padded_tokens") === 0L)
      }
  }

  test("a partial final batch pads only to its own max") {
    // 5 docs at B=2: sorted batches (1,2)(3,4)(5) -> padded 4+8+5=17
    val docs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
      .toDF("doc_id", "n_tokens")
    val s = PaddingReport.paddingWasteReport(docs, "doc_id", "n_tokens", 2)
      .collect().find(_.getAs[String]("policy") == "length_sorted").get
    assert(s.getAs[Long]("n_batches") === 3L)
    assert(s.getAs[Long]("padded_tokens") === 17L)
    assert(s.getAs[Long]("waste_tokens") === 2L)
  }

  test("length-sorted waste never exceeds arrival waste (the point " +
      "of the policy) and uniform lengths waste nothing") {
    val docs = (1L to 100L).map(i => (i, 1L + (i * 7) % 13))
      .toDF("doc_id", "n_tokens")
    val got = PaddingReport.paddingWasteReport(docs, "doc_id", "n_tokens", 8)
      .collect().map(r => r.getAs[String]("policy") ->
        r.getAs[Long]("waste_tokens")).toMap
    assert(got("length_sorted") <= got("arrival"))
    val uni = (1L to 64L).map(i => (i, 5L)).toDF("doc_id", "n_tokens")
    PaddingReport.paddingWasteReport(uni, "doc_id", "n_tokens", 8)
      .collect().foreach(r => assert(r.getAs[Long]("waste_tokens") === 0L))
  }
}
