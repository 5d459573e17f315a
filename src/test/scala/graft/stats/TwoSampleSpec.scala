package graft.stats

import graft.SparkSpecBase

class TwoSampleSpec extends SparkSpecBase {
  import spark.implicits._

  test("KS: exact ECDF-gap numerator on a hand example with ties") {
    // a: {1,2,2,4}  b: {2,3,4,4}
    // distinct values 1,2,3,4; cumA = 1,3,3,4; cumB = 0,1,2,4; na=nb=4
    // |nb*cumA - na*cumB| = 4,8,4,0 -> d_num = 8, D = 8/16 = 0.5
    val rows = Seq(
      ("v", "a", 1L), ("v", "a", 2L), ("v", "a", 2L), ("v", "a", 4L),
      ("v", "b", 2L), ("v", "b", 3L), ("v", "b", 4L), ("v", "b", 4L)
    ).toDF("v", "g", "x")
    val r = TwoSample.ks(rows, "v", "g", "x").collect().head
    assert(r.getString(0) === "v" && r.getLong(1) === 4L &&
      r.getLong(2) === 4L)
    assert(r.getLong(3) === 8L)
    assert(r.getLong(4) === 500000L)
  }

  test("KS: identical samples give D == 0; disjoint samples give D == 1") {
    val rows = Seq(
      ("same", "a", 1L), ("same", "a", 2L),
      ("same", "b", 1L), ("same", "b", 2L),
      ("disj", "a", 1L), ("disj", "a", 2L),
      ("disj", "b", 9L), ("disj", "b", 10L)
    ).toDF("v", "g", "x")
    val out = TwoSample.ks(rows, "v", "g", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("same").getLong(3) === 0L &&
      out("same").getLong(4) === 0L)
    assert(out("disj").getLong(4) === 1000000L)
  }

  test("MWU: doubled rank sum, tie term, and z match the hand computation") {
    // a: {1,2}  b: {2,3}. Ranks: 1 -> 1; tie {2,2} -> 2.5; 3 -> 4
    // R_a = 3.5 -> r2a = 7; U_a = 3.5 - 3 = 0.5 -> u2 = 1
    // tie = 2^3-2 = 6; n = 4
    // var = 4/12 * (5 - 6/12) = 1.5 ; z = (0.5 - 2)/sqrt(1.5)
    val rows = Seq(
      ("v", "a", 1L), ("v", "a", 2L), ("v", "b", 2L), ("v", "b", 3L)
    ).toDF("v", "g", "x")
    val r = TwoSample.mannWhitney(rows, "v", "g", "x").collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L)   // u2 = 2*U_a
    assert(r.getLong(4) === 6L)   // tie term
    val z = (0.5 - 2.0) / math.sqrt(1.5)
    assert(r.getLong(5) === math.floor(z * 1e6).toLong)
  }

  test("two-proportion z: pooled SE hand computation; degenerate " +
      "all-convert pool reports null z") {
    // a: 3 users, 2 convert; b: 2 users, 0 convert
    val users = Seq(("a", 1L), ("a", 1L), ("a", 0L), ("b", 0L), ("b", 0L))
      .toDF("variant", "conv")
    val r = TwoSample.twoProportion(users, "variant", "conv")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 2L, 0L)))
    val p1 = 2.0 / 3; val pp = 2.0 / 5
    val z = p1 / math.sqrt(pp * (1 - pp) * (1.0 / 3 + 1.0 / 2))
    assert(r.getLong(4) === math.floor(p1 * 1e6).toLong)
    assert(r.getLong(5) === math.floor(z * 1e6).toLong)
    val all = Seq(("a", 1L), ("b", 1L)).toDF("variant", "conv")
    assert(TwoSample.twoProportion(all, "variant", "conv")
      .collect().head.isNullAt(5))
  }

  test("MWU: zero-variance variable reports null z, exact integers stay") {
    val rows = Seq(
      ("flat", "a", 5L), ("flat", "a", 5L),
      ("flat", "b", 5L), ("flat", "b", 5L)
    ).toDF("v", "g", "x")
    val r = TwoSample.mannWhitney(rows, "v", "g", "x").collect().head
    // one tied group of 4: R_a = 2*2.5 = 5 -> r2a = 10, u2 = 10-6 = 4
    assert(r.getLong(3) === 4L)
    assert(r.getLong(4) === 60L) // 4^3-4
    assert(r.isNullAt(5))
  }
}
