package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  // raw corpus: two "code-like" docs, two "prose-like" docs, one short doc;
  // target distribution = prose. DSIR must weight prose docs above code docs.
  private lazy val docs = Seq(
    (1L, "int main return int main return"),
    (2L, "void loop break void loop break"),
    (3L, "the cat sat on the mat"),
    (4L, "the dog sat on the rug"),
    (5L, "x")) // 1 token -> unscorable
    .toDF("doc_id", "text")
  private lazy val target = Seq(
    (10L, "the cat sat on the rug"),
    (11L, "the dog sat on the mat"))
    .toDF("doc_id", "text")

  test("weights favor target-like documents, short docs unscorable") {
    val w = Dsir.weightsMicro(docs, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(w(5L).isEmpty)
    val Seq(w1, w2, w3, w4) = Seq(1L, 2L, 3L, 4L).map(w(_).get)
    assert(math.min(w3, w4) > math.max(w1, w2),
      s"prose weights ($w3, $w4) must exceed code weights ($w1, $w2)")
  }

  test("top-fraction selection is an exact integer rank cut") {
    // 4 scorable docs, top 1/2 -> exactly 2 selected, and they are the
    // two highest-weight (prose) docs
    val out = Dsir.selectTopFraction(docs, "doc_id", "text", target, "text",
      num = 1, den = 2)
    val sel = out.filter(col("selected")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sel === Set(3L, 4L))
    assert(out.count() === 5) // unscorable doc emitted, not dropped
    assert(out.filter(col("doc_id") === 5L).collect()(0)
      .getAs[Boolean]("selected") === false)
  }

  test("selection fraction ceiling: 1/3 of 4 scorable keeps ceil(4/3)=2") {
    val out = Dsir.selectTopFraction(docs, "doc_id", "text", target, "text",
      num = 1, den = 3)
    assert(out.filter(col("selected")).count() === 2)
  }

  test("deterministic across runs") {
    def run() = Dsir.selectTopFraction(docs, "doc_id", "text", target,
      "text").orderBy("doc_id").collect().toSeq
    assert(run() === run())
  }
}
