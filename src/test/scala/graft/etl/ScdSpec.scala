package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Int) =
    new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime
      + sec * 1000L)
  private def us(sec: Int): Long =
    Timestamp.valueOf("2024-03-01 00:00:00").getTime * 1000L +
      sec * 1000000L

  test("versions chain half-open intervals; only the last is current") {
    val c = Seq(
      (1L, 10L, ts(0), 1.5), (1L, 11L, ts(100), 2.5),
      (1L, 12L, ts(300), 3.5),
      (2L, 20L, ts(50), 9.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Scd.scd2(c, "user_id", "ts", "event_id", Seq("value"))
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getDouble(4),
        r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, us(0), us(100), 1.5, 0L),
      (1L, 2L, us(100), us(300), 2.5, 0L),
      (1L, 3L, us(300), -1L, 3.5, 1L),
      (2L, 1L, us(50), -1L, 9.0, 1L)))
  }

  test("same-instant changes order by change id — total version order") {
    val c = Seq(
      (1L, 2L, ts(0), 8.0), (1L, 1L, ts(0), 7.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Scd.scd2(c, "user_id", "ts", "event_id", Seq("value"))
      .orderBy("version").collect()
    assert(out.map(_.getDouble(4)).toSeq === Seq(7.0, 8.0))
    assert(out.map(_.getLong(5)).toSeq === Seq(0L, 1L))
  }
}
