package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class GapFillSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dense daily grid per key, gaps carry the last observed value") {
    val e = Seq(
      (1L, ts("2024-03-01 10:00:00"), 5.0),
      (1L, ts("2024-03-04 09:00:00"), 7.5),
      (1L, ts("2024-03-05 23:59:59"), 2.0),
      (2L, ts("2024-03-10 00:00:00"), 9.0) // single-day key
    ).toDF("user_id", "ts", "value")
    val out = GapFill.dailyForwardFill(e, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-03-01", 5.0, 0L),
      (1L, "2024-03-02", 5.0, 1L), // gap: carried
      (1L, "2024-03-03", 5.0, 1L),
      (1L, "2024-03-04", 7.5, 0L),
      (1L, "2024-03-05", 2.0, 0L),
      (2L, "2024-03-10", 9.0, 0L)))
  }

  test("multiple observations in one day collapse to the LATEST by ts") {
    val e = Seq(
      (1L, ts("2024-03-01 08:00:00"), 1.0),
      (1L, ts("2024-03-01 20:00:00"), 4.0), // later wins
      (1L, ts("2024-03-03 12:00:00"), 6.0)
    ).toDF("user_id", "ts", "value")
    val out = GapFill.dailyForwardFill(e, "user_id", "ts", "value")
      .orderBy("day").collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(4.0, 4.0, 6.0))
    assert(out.map(_.getLong(3)).toSeq === Seq(0L, 1L, 0L))
  }
}
