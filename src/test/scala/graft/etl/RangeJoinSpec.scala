package graft.etl

import graft.SparkSpecBase
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("countNearby: inclusive boundary, bucket-crossing pairs, zero rows kept") {
    // window = 10 s => buckets of 10 s. Left@25 pairs with rights @15 (exactly
    // -10, inclusive, in the PREVIOUS bucket), @30 (next bucket), @35
    // (boundary +10) but not @36. Left@100 has no rights within 10 s.
    val left = Seq((1L, ts(25)), (2L, ts(100))).toDF("event_id", "ts")
    val right = Seq(ts(15), ts(30), ts(35), ts(36), ts(111))
      .map(Tuple1(_)).toDF("ts")
    val out = RangeJoin.countNearby(left, right, "ts", 10000000L, "event_id")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_nearby"))
      .toMap
    assert(out === Map(1L -> 3L, 2L -> 0L))
  }

  test("countNearby: each qualifying pair is counted exactly once") {
    // right row in the SAME bucket as left — its three replicas must not
    // triple-count (only the replica with the matching bucket key joins)
    val left = Seq((1L, ts(12))).toDF("event_id", "ts")
    val right = Seq(Tuple1(ts(13))).toDF("ts")
    val out = RangeJoin.countNearby(left, right, "ts", 10000000L, "event_id")
      .collect().head.getAs[Long]("n_nearby")
    assert(out === 1L)
  }
}
