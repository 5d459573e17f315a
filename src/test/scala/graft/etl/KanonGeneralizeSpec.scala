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

  test("the one-pass ROLLUP path equals the per-rung union path on a " +
      "nested ladder, row for row") {
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("rung"),
      r.getAs[String]("quasi"), r.getAs[Long]("n_classes"),
      r.getAs[Long]("k_min"), r.getAs[Long]("l_min"),
      r.getAs[Long]("rows_below_k"), r.getAs[Boolean]("meets_k"))
    val viaRollup = Privacy.rollupRungs(df, ladder, "s", 4)
      .collect().map(key).sortBy(_._1)
    val viaUnion = Privacy.unionRungs(df, ladder, "s", 4)
      .collect().map(key).sortBy(_._1)
    assert(viaRollup === viaUnion)
  }

  test("a NULL quasi value stays its own class — never conflated with " +
      "the rollup's collapse marker (grouping_id selection)") {
    val withNull = df.unionByName(
      Seq(("a", null: String, true), ("a", null: String, false))
        .toDF("g1", "g2", "s"))
    val got = Privacy.kAnonGeneralize(withNull, ladder, "s", k = 4)
      .orderBy("rung").collect()
    // rung 0 gains the (a, NULL) class: 4 -> 5 classes
    assert(got(0).getAs[Long]("n_classes") === 5L)
    // rung 1 (g1 only): still 2 classes, a grows to 6 rows
    assert(got(1).getAs[Long]("n_classes") === 2L)
    assert(got(1).getAs[Long]("k_min") === 4L)
    // empty rung: one class of all 10 rows
    assert(got(2).getAs[Long]("k_min") === 10L)
  }

  test("a non-nested ladder (rung not a prefix) falls back to the " +
      "union path and stays exact") {
    val skew = Seq(Seq("g1", "g2"), Seq("g2"), Seq.empty[String])
    val got = Privacy.kAnonGeneralize(df, skew, "s", k = 4)
      .orderBy("rung").collect()
    assert(got(1).getAs[String]("quasi") === "g2")
    assert(got(1).getAs[Long]("n_classes") === 2L) // x: 5 rows, y: 3
    assert(got(1).getAs[Long]("k_min") === 3L)
    assert(!got(1).getAs[Boolean]("meets_k"))
    assert(got(2).getAs[Boolean]("chosen"))
  }

  test("a non-terminated ladder is rejected") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonGeneralize(df, Seq(Seq("g1")), "s", k = 2)
    }
  }
}
