package graft.etl

import graft.SparkSpecBase

class UniMaxSpec extends SparkSpecBase {
  import spark.implicits._

  private def alloc(budget: Long, e: Int, sizes: (String, Long)*) =
    UniMax.unimaxAllocate(sizes.toDF("d", "t"), "d", "t", budget, e)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap

  test("low-resource domains cap, the rest split the remainder evenly") {
    // caps (E=2): a=20, b=200, c=200; budget 300: a capped (20*3=60<=300),
    // b? 200*2=400 > 280 -> fill from pos 2: level=280 div 2=140, r=0
    val out = alloc(300L, 2, "a" -> 10L, "b" -> 100L, "c" -> 100L)
    assert(out === Map("a" -> 20L, "b" -> 140L, "c" -> 140L))
  }

  test("rounding units go to the largest-cap positions") {
    // caps 10,10,10; budget 8: level = 8 div 3 = 2, r = 2 -> the two
    // LAST positions (largest caps; ties ordered by domain) get +1
    val out = alloc(8L, 1, "x" -> 10L, "y" -> 10L, "z" -> 10L)
    assert(out === Map("x" -> 2L, "y" -> 3L, "z" -> 3L))
    assert(out.values.sum === 8L)
  }

  test("budget beyond the total cap allocates every cap in full") {
    val out = alloc(10000L, 2, "a" -> 5L, "b" -> 7L)
    assert(out === Map("a" -> 10L, "b" -> 14L))
  }

  test("allocation always sums to min(budget, total cap)") {
    val sizes = Seq("a" -> 3L, "b" -> 17L, "c" -> 41L, "d" -> 260L)
    for (b <- Seq(10L, 100L, 300L, 642L, 9999L)) {
      val total = alloc(b, 1, sizes: _*).values.sum
      assert(total === math.min(b, sizes.map(_._2).sum))
    }
  }
}
