package graft.stats

import graft.SparkSpecBase

class AnovaSpec extends SparkSpecBase {
  import spark.implicits._

  test("F and eta2 match the closed-form hand computation") {
    // groups a: {1,2,3}, b: {4,5,6} (cents)
    // S_a=6 S_b=15 Q=91 t=36/3+225/3=87 S=21 n=6 k=2
    // ssb = 87 - 441/6 = 13.5 ; ssw = 91 - 87 = 4
    // F = (13.5/1)/(4/4) = 13.5 ; eta2 = 13.5/17.5 = 0.7714285...
    val rows = Seq(
      ("v1", "a", 1L), ("v1", "a", 2L), ("v1", "a", 3L),
      ("v1", "b", 4L), ("v1", "b", 5L), ("v1", "b", 6L)
    ).toDF("v", "g", "c")
    val out = Anova.oneWay(rows, "v", "g", "c").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "v1" && r.getLong(1) === 2L &&
      r.getLong(2) === 6L)
    assert(r.getLong(3) === 13500000L)
    assert(r.getLong(4) === math.floor(13.5 / 17.5 * 1e6).toLong)
  }

  test("identical group means give F == 0; two variables stay " +
      "independent in one pass") {
    val rows = Seq(
      ("flat", "a", 1L), ("flat", "a", 3L),
      ("flat", "b", 3L), ("flat", "b", 1L), // same mean, same spread
      ("split", "a", 0L), ("split", "a", 0L),
      ("split", "b", 10L), ("split", "b", 10L) // perfect separation
    ).toDF("v", "g", "c")
    val out = Anova.oneWay(rows, "v", "g", "c").orderBy("variable")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getLong(3) === 0L && out("flat").getLong(4) === 0L)
    // perfect separation: ssw = 0 -> F undefined -> null; eta2 = 1
    assert(out("split").isNullAt(3))
    assert(out("split").getLong(4) === 1000000L)
  }
}
