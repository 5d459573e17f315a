package graft.text

import graft.SparkSpecBase

class ZipfSpec extends SparkSpecBase {
  import spark.implicits._

  private def doc(counts: (String, Int)*): String =
    counts.flatMap { case (t, c) => Seq.fill(c)(t) }.mkString(" ")

  test("an exact 1/r frequency law fits slope -1 with r2 ~ 1") {
    // frequencies 12, 6, 4, 3 = 12/r at ranks 1..4: ln f = ln 12 - ln r
    val docs = Seq(("s1", doc("aa" -> 12, "bb" -> 6, "cc" -> 4,
      "dd" -> 3))).toDF("source", "text")
    val r = Zipf.zipfFit(docs, "source", "text", r = 10).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    val slope = r.getAs[Long]("slope_micro")
    assert(slope >= -1000001L && slope <= -999999L)
    assert(r.getAs[Long]("r2_micro") >= 999990L)
  }

  test("uniform frequencies fit slope 0 with undefined r2") {
    val docs = Seq(("s1", doc("aa" -> 5, "bb" -> 5, "cc" -> 5)))
      .toDF("source", "text")
    val r = Zipf.zipfFit(docs, "source", "text", r = 10).collect()(0)
    assert(r.getAs[Long]("slope_micro") === 0L)
    assert(r.isNullAt(r.fieldIndex("r2_micro")))
  }

  test("the top-R cut bounds the fitted points") {
    val manyTerms = (1 to 50).map(i => s"t$i" -> (51 - i))
    val docs = Seq(("s1", doc(manyTerms: _*))).toDF("source", "text")
    val r = Zipf.zipfFit(docs, "source", "text", r = 20).collect()(0)
    assert(r.getAs[Long]("n") === 20L)
  }
}
