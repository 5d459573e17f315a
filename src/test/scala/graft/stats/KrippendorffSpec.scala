package graft.stats

import graft.SparkSpecBase

class KrippendorffSpec extends SparkSpecBase {
  import spark.implicits._

  private def alpha(rows: (Long, String)*) = Krippendorff.alphaNominal(
    rows.toDF("item", "cat"), "item", "cat").collect()(0)

  test("perfect agreement across items gives alpha exactly 1") {
    val r = alpha(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b",
      3L -> "a", 3L -> "a")
    assert(r.getAs[Long]("a_l") === 0L)
    assert(r.getAs[Long]("alpha_micro") === 1000000L)
  }

  test("the canonical ragged hand example replays exactly") {
    // items: (a,a), (a,b), (b,b,b): n=7, n_a=3, n_b=4
    // A = 0 + (1*1/1 + 1*1/1) + 0 = 2; B = 3*4 + 4*3 = 24
    // alpha = 1 - 6*2/24 = 1/2
    val r = alpha(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b",
      3L -> "b", 3L -> "b", 3L -> "b")
    assert(r.getAs[Long]("n_items") === 3L)
    assert(r.getAs[Long]("n_ratings") === 7L)
    assert(r.getAs[Long]("alpha_micro") === 500000L)
  }

  test("single-rating items drop out as unpairable") {
    val withSingleton = alpha(1L -> "a", 1L -> "a", 2L -> "b",
      3L -> "b", 3L -> "b")
    assert(withSingleton.getAs[Long]("n_items") === 2L)
    // item 2's lone rating contributes nothing: same as without it
    val without = alpha(1L -> "a", 1L -> "a", 3L -> "b", 3L -> "b")
    assert(withSingleton.getAs[Long]("alpha_micro") ===
      without.getAs[Long]("alpha_micro"))
  }

  test("systematic disagreement goes negative (floor division)") {
    // every item split (a,b): A = 2*n_items, worst case
    val r = alpha(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")
    // n=4, A=4, B=2*2+2*2=8... alpha = 1 - 3*4/8 = -1/2
    assert(r.getAs[Long]("alpha_micro") === -500000L)
  }

  test("unanimous single category yields null (B = 0)") {
    val r = alpha(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "a")
    assert(r.isNullAt(r.fieldIndex("alpha_micro")))
  }

  test("panels wider than maxRaters fail loudly") {
    val rows = (1 to 9).map(i => 1L -> (if (i % 2 == 0) "a" else "b"))
    val e = intercept[Exception] {
      Krippendorff.alphaNominal(rows.toDF("item", "cat"), "item", "cat",
        maxRaters = 3).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("more than 3 ratings"))))
  }
}
