package graft.etl

import graft.SparkSpecBase

class KanonGeneralizeSpec extends SparkSpecBase {
  import spark.implicits._

  // 8 rows; quasi (g1, g2): classes of sizes 1..3; quasi (g1): 4+4;
  // empty rung: one class of 8
  private val df = Seq(
    ("a", "x", true), ("a", "x", false), ("a", "x", true),
    ("a", "y", true),
    ("b", "x", false), ("b", "x", true),
    ("b", "y", true), ("b", "y", true)).toDF("g1", "g2", "s")

  private val ladder = Seq(Seq("g1", "g2"), Seq("g1"), Seq.empty[String])

  test("rung profiles are exact and the first k-meeting rung is chosen") {
    val got = Privacy.kAnonGeneralize(df, ladder, "s", k = 4)
      .orderBy("rung").collect()
    assert(got.length === 3)
    val r0 = got(0); val r1 = got(1); val r2 = got(2)
    assert(r0.getAs[Long]("n_classes") === 4L)
    assert(r0.getAs[Long]("k_min") === 1L) // class (a,y) is a singleton
    assert(r0.getAs[Long]("rows_below_k") === 8L) // all classes < 4
    assert(!r0.getAs[Boolean]("meets_k") && !r0.getAs[Boolean]("chosen"))
    assert(r1.getAs[Long]("n_classes") === 2L)
    assert(r1.getAs[Long]("k_min") === 4L)
    assert(r1.getAs[Boolean]("meets_k") && r1.getAs[Boolean]("chosen"))
    assert(r2.getAs[Long]("k_min") === 8L)
    assert(r2.getAs[Boolean]("meets_k") && !r2.getAs[Boolean]("chosen"))
  }

  test("an impossible k falls through to the coarsest rung only when " +
      "it fits; k <= N always has a release rung") {
    val got = Privacy.kAnonGeneralize(df, ladder, "s", k = 8)
      .orderBy("rung").collect()
    assert(got.count(_.getAs[Boolean]("chosen")) === 1)
    assert(got.find(_.getAs[Boolean]("chosen")).get
      .getAs[Long]("rung") === 2L)
  }

  test("a ladder whose finest rung already meets k chooses rung 0 " +
      "and l_min tracks the sensitive diversity") {
    val got = Privacy.kAnonGeneralize(df, ladder, "s", k = 1)
      .orderBy("rung").collect()
    assert(got.head.getAs[Boolean]("chosen"))
    assert(got.head.getAs[Long]("l_min") === 1L) // singleton class
    assert(got.last.getAs[Long]("l_min") === 2L)
  }

  test("a non-terminated ladder is rejected") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonGeneralize(df, Seq(Seq("g1")), "s", k = 2)
    }
  }
}
