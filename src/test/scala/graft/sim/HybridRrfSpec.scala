package graft.sim

import graft.SparkSpecBase

class HybridRrfSpec extends SparkSpecBase {
  import spark.implicits._

  test("fuse: doc in both lists outranks single-list docs; exact " +
      "integer contributions") {
    val l1 = Seq((0, 10L, 1L), (0, 11L, 2L)).toDF("query_id", "id", "rank")
    val l2 = Seq((0, 11L, 1L), (0, 12L, 2L)).toDF("query_id", "id", "rank")
    val out = HybridRrf.fuse(Seq(l1, l2), 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(11L, 10L, 12L))
    // id 11: 1e12 div 61 + 1e12 div 62 ; id 10: 1e12 div 61
    assert(out(0).getLong(3) === 1000000000000L / 61 + 1000000000000L / 62)
    assert(out(1).getLong(3) === 1000000000000L / 61)
    assert(out(2).getLong(3) === 1000000000000L / 62)
  }

  test("registered lexical leg is integer-pure end-to-end: every bm25TopK " +
      "output column the fusion consumes is integral (no float ever " +
      "reaches the fused hash)") {
    // Guards the round-11 q_s_rrf inheritance hazard: the fusion arithmetic
    // is integer (1e12 div (K+rank)), so its hash is engine-robust exactly
    // when its INPUT ranks are — i.e. when bm25 scores are exact integers
    // computed by the floor/cross-multiplication convention, not round().
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta"))
      .toDF("doc_id", "text")
    val lex = graft.text.Bm25.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "alpha", 0 -> "beta"), 10)
    import org.apache.spark.sql.types.{IntegerType, LongType}
    lex.schema.fields.foreach { f =>
      assert(f.dataType == LongType || f.dataType == IntegerType,
        s"${f.name} must be integral, was ${f.dataType}")
    }
  }

  test("fuse: equal-score ties break on id ascending; k bounds output") {
    val l1 = Seq((7, 5L, 1L), (7, 3L, 2L), (7, 9L, 3L))
      .toDF("query_id", "id", "rank")
    val l2 = Seq((7, 3L, 1L), (7, 5L, 2L), (7, 1L, 3L))
      .toDF("query_id", "id", "rank")
    // ids 3 and 5 both score div61+div62 -> tie, id 3 first
    val out = HybridRrf.fuse(Seq(l1, l2), 2).orderBy("rank").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 3L && out(1).getLong(2) === 5L)
    assert(out(0).getLong(3) === out(1).getLong(3))
  }
}
