package graft.stats

import graft.SparkSpecBase

class IsotonicSpec extends SparkSpecBase {
  import spark.implicits._

  private def pav(rows: (Long, Long, Long)*) = Isotonic.pavCalibrate(
    rows.toDF("bin", "n", "pos"), "bin", "n", "pos")
    .orderBy("bin").collect()
    .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("raw_micro"),
      r.getAs[Long]("iso_micro")))

  test("already-monotone rates pass through unchanged") {
    val r = pav((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
    assert(r.map(_._3).toSeq === Seq(100000L, 500000L, 900000L))
    assert(r.forall(x => x._2 === x._3))
  }

  test("single violator pools to the weighted average") {
    // rates 1.0 then 0.0 over equal weights -> both pooled to 0.5
    val r = pav((0L, 2L, 2L), (1L, 2L, 0L))
    assert(r.map(_._3).toSeq === Seq(500000L, 500000L))
  }

  test("classic PAV example: 0.1, 0.5, 0.3, 0.7 pools the middle") {
    val r = pav((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 3L),
      (3L, 10L, 7L))
    assert(r.map(_._3).toSeq ===
      Seq(100000L, 400000L, 400000L, 700000L))
  }

  test("cascading merge: a low tail drags earlier pools down") {
    // rates 0.9, 0.8, 0.1 with equal weights: all three pool to 0.6
    val r = pav((0L, 10L, 9L), (1L, 10L, 8L), (2L, 10L, 1L))
    assert(r.map(_._3).toSeq === Seq(600000L, 600000L, 600000L))
  }

  test("weighted pooling: heavier bin dominates the pooled rate") {
    // (n=30, pos=30) then (n=10, pos=0): pooled 30/40 = 0.75
    val r = pav((0L, 30L, 30L), (1L, 10L, 0L))
    assert(r.map(_._3).toSeq === Seq(750000L, 750000L))
  }

  test("iso output is always non-decreasing") {
    val r = pav((0L, 7L, 5L), (1L, 3L, 1L), (2L, 9L, 2L), (3L, 4L, 4L),
      (4L, 5L, 1L), (5L, 6L, 6L))
    assert(r.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("equals the minimax identity max_a min_b rate(a..b) (floored)") {
    val bins = Seq((0L, 7L, 5L), (1L, 3L, 1L), (2L, 9L, 2L),
      (3L, 4L, 4L), (4L, 5L, 1L), (5L, 6L, 6L))
    val got = pav(bins: _*).map(_._3).toSeq
    val b = bins.toArray
    val minimax = b.indices.map { i =>
      (0 to i).map { a =>
        (i until b.length).map { bb =>
          val p = (a to bb).map(b(_)._3).sum
          val n = (a to bb).map(b(_)._2).sum
          p * 1000000L / n
        }.min
      }.max
    }
    assert(got === minimax)
  }

  test("invalid bins (pos > n or empty bin) fail loudly") {
    assertThrows[IllegalArgumentException] { pav((0L, 2L, 3L)) }
    assertThrows[IllegalArgumentException] { pav((0L, 0L, 0L)) }
  }
}
