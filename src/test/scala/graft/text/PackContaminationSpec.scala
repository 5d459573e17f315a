package graft.text

import graft.SparkSpecBase

class PackContaminationSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand fixture: per-bin cross/total pairs at budget 4") {
    // lens 3,3,2 -> bin0 segs (3,1): cross 3 of 6; bin1 segs (2,2):
    // cross 4 of 6 -> totals 7 of 12, micro 583333
    val counted = Seq((1L, 3L), (2L, 3L), (3L, 2L))
      .toDF("doc_id", "n_tokens")
    val r = PackContamination.packContaminationReport(
      counted, "doc_id", 4L).collect().head
    assert(r.getAs[Long]("n_bins") === 2L)
    assert(r.getAs[Long]("n_segments") === 4L)
    assert(r.getAs[Long]("stream_tokens") === 8L)
    assert(r.getAs[Long]("cross_pairs") === 7L)
    assert(r.getAs[Long]("total_pairs") === 12L)
    assert(r.getAs[Long]("contamination_micro") === 583333L)
  }

  test("budget-aligned docs contaminate nothing") {
    val counted = Seq((1L, 4L), (2L, 4L)).toDF("doc_id", "n_tokens")
    val r = PackContamination.packContaminationReport(
      counted, "doc_id", 4L).collect().head
    assert(r.getAs[Long]("cross_pairs") === 0L)
    assert(r.getAs[Long]("contamination_micro") === 0L)
  }

  test("single-token bins have no pairs: the zero-denominator guard") {
    val counted = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "n_tokens")
    val r = PackContamination.packContaminationReport(
      counted, "doc_id", 1L).collect().head
    assert(r.getAs[Long]("total_pairs") === 0L)
    assert(r.getAs[Long]("contamination_micro") === 0L)
  }
}
