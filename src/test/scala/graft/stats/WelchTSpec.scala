package graft.stats

import graft.SparkSpecBase

class WelchTSpec extends SparkSpecBase {
  import spark.implicits._

  private def w(rows: (Boolean, Long)*) = WelchT.welch(
    rows.toDF("arm", "cents"), "arm", "cents").collect()(0)

  test("hand case: equal variances give the Student values") {
    // arm1 = {0, 2}, arm2 = {3, 5}: m1=1, m2=4, v1=v2=2
    // t2 = 9 / (1 + 1) = 4.5; df = 4 / (1 + 1) = 2; d = -3/sqrt(2)
    val r = w(true -> 0L, true -> 2L, false -> 3L, false -> 5L)
    assert(r.getAs[Long]("t2_micro") === 4500000L)
    assert(r.getAs[Long]("df_micro") === 2000000L)
    assert(r.getAs[Long]("d_micro") ===
      math.floor(-3.0 / math.sqrt(2.0) * 1e6).toLong)
    assert(r.getAs[Long]("direction") === -1L)
  }

  test("identical arms give exactly zero t2 and d") {
    val r = w(true -> 1L, true -> 3L, false -> 1L, false -> 3L)
    assert(r.getAs[Long]("t2_micro") === 0L)
    assert(r.getAs[Long]("d_micro") === 0L)
    assert(r.getAs[Long]("direction") === 0L)
  }

  test("zero variance in both arms leaves t2 undefined") {
    val r = w(true -> 2L, true -> 2L, false -> 5L, false -> 5L)
    assert(r.isNullAt(r.fieldIndex("t2_micro")))
    assert(r.isNullAt(r.fieldIndex("df_micro")))
    // pooled sd is 0 too
    assert(r.isNullAt(r.fieldIndex("d_micro")))
    assert(r.getAs[Long]("direction") === -1L)
  }

  test("single-observation arm leaves the statistics undefined") {
    val r = w(true -> 1L, false -> 2L, false -> 4L)
    assert(r.isNullAt(r.fieldIndex("t2_micro")))
    assert(r.getAs[Long]("n1") === 1L)
  }

  test("unequal variances: Welch df falls below the pooled n1+n2-2") {
    // arm1 tight around 10, arm2 spread wide
    val r = w(Seq[(Boolean, Long)](true -> 9L, true -> 10L, true -> 11L,
      false -> 0L, false -> 20L, false -> 40L): _*)
    assert(r.getAs[Long]("df_micro") < 4000000L)
    assert(r.getAs[Long]("t2_micro") > 0L)
  }

  test("direction follows the sign of m1 - m2") {
    val up = w(true -> 10L, true -> 12L, false -> 1L, false -> 3L)
    assert(up.getAs[Long]("direction") === 1L)
    assert(up.getAs[Long]("d_micro") > 0L)
  }

  private def to(delta: Long, rows: (Boolean, Long)*) = WelchT.tost(
    rows.toDF("arm", "cents"), "arm", "cents", delta).collect()(0)

  test("tost: identical tight arms are equivalent within a wide margin") {
    val rows = (1 to 50).flatMap(i =>
      Seq(true -> (10L + i % 2), false -> (10L + i % 2)))
    val r = to(10L, rows: _*)
    assert(r.getAs[Boolean]("equivalent"))
    assert(r.getAs[Long]("t_low_micro") > 0L)
    assert(r.getAs[Long]("t_up_micro") < 0L)
  }

  test("tost: a difference larger than the margin is NOT equivalent") {
    val rows = (1 to 50).flatMap(i =>
      Seq(true -> (10L + i % 2), false -> (40L + i % 2)))
    val r = to(10L, rows: _*)
    assert(!r.getAs[Boolean]("equivalent"))
  }

  test("tost: underpowered noise is not declared equivalent either") {
    // two tiny noisy arms: difference within margin but se too big
    val r = to(5L, true -> 0L, true -> 40L, false -> 10L, false -> 50L)
    assert(!r.getAs[Boolean]("equivalent"))
  }

  test("tost: degenerate arms leave the verdict null") {
    val r = to(10L, true -> 1L, false -> 2L)
    assert(r.isNullAt(r.fieldIndex("equivalent")))
  }
}
