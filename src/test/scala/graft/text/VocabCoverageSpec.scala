package graft.text

import graft.SparkSpecBase

class VocabCoverageSpec extends SparkSpecBase {
  import spark.implicits._

  private def cov(text: String) = VocabCoverage.vocabCoverage(
    Seq(("s", text)).toDF("src", "text"), "src", "text").collect()(0)

  test("mixed frequencies: hand-computed chao1 and unseen mass") {
    // a a b: N=3, V=2, f1=1, f2=1 -> chao1 = 2 + 1*0/(2*2) = 2
    val r = cov("a a b")
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("v_types") === 2L)
    assert(r.getAs[Long]("f1") === 1L && r.getAs[Long]("f2") === 1L)
    assert(r.getAs[Long]("chao1_milli") === 2000L)
    assert(r.getAs[Long]("unseen_micro") === 333333L)
  }

  test("all singletons: richness doubles, unseen mass is total") {
    // f1=3, f2=0 -> chao1 = 3 + 3*2/2 = 6
    val r = cov("a b c")
    assert(r.getAs[Long]("chao1_milli") === 6000L)
    assert(r.getAs[Long]("unseen_micro") === 1000000L)
  }

  test("no singletons: chao1 = V, unseen mass 0") {
    val r = cov("a a b b")
    assert(r.getAs[Long]("chao1_milli") === 2000L)
    assert(r.getAs[Long]("unseen_micro") === 0L)
  }
}
