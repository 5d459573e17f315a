package graft.stats

import graft.SparkSpecBase

class CochranArmitageSpec extends SparkSpecBase {
  import spark.implicits._

  private def ca(rows: (Long, Boolean)*) = CochranArmitage.trendTest(
    rows.toDF("dose", "won"), "dose", "won").collect()(0)

  test("hand trend: 0% at dose 0, 100% at dose 1 gives z^2 exactly 4") {
    val r = ca(0L -> false, 0L -> false, 1L -> true, 1L -> true)
    assert(r.getAs[Long]("t_num") === 4L)
    assert(r.getAs[Long]("z2_micro") === 4000000L)
    assert(r.getAs[Long]("direction") === 1L)
  }

  test("the decreasing mirror flips direction, same z^2") {
    val r = ca(0L -> true, 0L -> true, 1L -> false, 1L -> false)
    assert(r.getAs[Long]("z2_micro") === 4000000L)
    assert(r.getAs[Long]("direction") === -1L)
  }

  test("flat rates across doses: zero statistic, zero direction") {
    val r = ca(0L -> true, 0L -> false, 1L -> true, 1L -> false,
      2L -> true, 2L -> false)
    assert(r.getAs[Long]("t_num") === 0L)
    assert(r.getAs[Long]("z2_micro") === 0L)
    assert(r.getAs[Long]("direction") === 0L)
  }

  test("degenerate outcomes or a single dose level yield null") {
    val all = ca(0L -> true, 1L -> true)
    assert(all.isNullAt(all.fieldIndex("z2_micro")))
    val one = ca(2L -> true, 2L -> false, 2L -> true)
    assert(one.isNullAt(one.fieldIndex("z2_micro")))
  }

  test("monotone dose-response scores higher than a scrambled one") {
    val mono = ca((1 to 10).map(i => (0L, i <= 2)) ++
      (1 to 10).map(i => (1L, i <= 5)) ++
      (1 to 10).map(i => (2L, i <= 8)): _*)
    val scram = ca((1 to 10).map(i => (0L, i <= 5)) ++
      (1 to 10).map(i => (1L, i <= 8)) ++
      (1 to 10).map(i => (2L, i <= 2)): _*)
    assert(mono.getAs[Long]("z2_micro") > scram.getAs[Long]("z2_micro"))
  }
}
