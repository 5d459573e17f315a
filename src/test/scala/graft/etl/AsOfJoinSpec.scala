package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("backward as-of: most recent prior match, inclusive ties, null when none") {
    // key 1: left@100 has rights @50,@90 -> @90; left@90 ties right@90 -> @90
    // key 1: left@40 precedes all rights -> null
    // key 2: no rights at all -> null
    val left = Seq(
      (10L, 1L, ts(100)), (11L, 1L, ts(90)), (12L, 1L, ts(40)),
      (13L, 2L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 1L, ts(50), 5.0), (91L, 1L, ts(90), 7.0))
      .toDF("event_id", "user_id", "ts", "value")

    val out = AsOfJoin.backward(left, right, "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("prior_event_id")),
          Option(r.getAs[java.lang.Double]("prior_value"))))
      .toMap

    assert(out(10L) === (Some(91L), Some(7.0))) // @90 beats @50
    assert(out(11L) === (Some(91L), Some(7.0))) // equal ts matches (inclusive)
    assert(out(12L) === (None, None))           // nothing at or before 40
    assert(out(13L) === (None, None))           // key has no right rows
    assert(out.size === 4)                      // left-join row preservation
  }

  test("forward as-of: earliest following match, inclusive ties, null when none") {
    // key 1: left@40 has rights @50,@90 -> @50; left@90 ties right@90 -> @90
    // key 1: left@100 follows all rights -> null; key 2: no rights -> null
    val left = Seq(
      (10L, 1L, ts(40)), (11L, 1L, ts(90)), (12L, 1L, ts(100)),
      (13L, 2L, ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 1L, ts(50), 5.0), (91L, 1L, ts(90), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.forward(left, right, "user_id", "ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("next_event_id")),
          Option(r.getAs[java.lang.Double]("next_value"))))
      .toMap
    assert(out(10L) === (Some(90L), Some(5.0))) // @50 beats @90
    assert(out(11L) === (Some(91L), Some(7.0))) // equal ts matches (inclusive)
    assert(out(12L) === (None, None))
    assert(out(13L) === (None, None))
    assert(out.size === 4)
  }

  test("backward as-of: matched right ts comes back prefixed") {
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 7L, ts(3), 1.5)).toDF("event_id", "user_id", "ts", "value")
    val row = AsOfJoin.backward(left, right, "user_id", "ts").collect().head
    assert(row.getAs[Timestamp]("prior_ts") === ts(3))
    assert(row.getAs[Double]("prior_value") === 1.5)
  }
}
