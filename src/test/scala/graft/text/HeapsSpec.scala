package graft.text

import graft.SparkSpecBase

class HeapsSpec extends SparkSpecBase {
  import spark.implicits._

  private def fit(docs: (String, Long, String)*) = Heaps.heapsFit(
    docs.toDF("g", "id", "text"), "g", "id", "text")
    .collect().map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("n"), Option(r.get(r.fieldIndex("slope_micro")))
        .map(_.asInstanceOf[Long]))).toMap

  test("closed template vocabulary gives slope exactly 0") {
    // every doc repeats the same 3 tokens: V constant, T grows
    val m = fit((1L to 10L).map(i => ("g", i, "a b c")): _*)
    assert(m("g")._2 === Some(0L))
  }

  test("all-new-token docs give slope exactly 1 (V = T)") {
    val m = fit((1L to 10L).map(i => ("g", i, s"t${i}a t${i}b")): _*)
    assert(m("g")._2 === Some(1000000L))
  }

  test("productive text lands strictly between 0 and 1") {
    // half repeated, half novel per doc
    val m = fit((1L to 20L).map(i =>
      ("g", i, s"the of and t${i}x")): _*)
    val s = m("g")._2.get
    assert(s > 0L && s < 1000000L)
  }

  test("groups fit independently; tiny groups collapse checkpoints") {
    val m = fit(
      ("a", 1L, "x y"), ("a", 2L, "x z"), ("a", 3L, "w q"),
      ("b", 1L, "p p p"))
    // group b has ONE doc -> one checkpoint -> degenerate fit (null)
    assert(m("a")._2.isDefined)
    assert(m("b")._2.isEmpty)
    // group a: 3 docs collapse 10 cuts to 3 distinct checkpoint ranks
    assert(m("a")._1 === 3L)
  }
}
