package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._
  import Expectations._

  test("planted violations fail exactly their checks; clean data passes") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val rows = Seq(
      (1L, Some(10.0), "A"),
      (2L, None, "A"), // null value
      (2L, Some(99.0), "X"), // dup key (2), out of range, bad flag
      (9L, Some(20.0), "N")) // orphan key 9
      .toDF("k", "v", "flag")
    val rep = Expectations.run(rows, Seq(
      NonNullRate("v", 1.0),
      InRange("v", 0, 50, 0.9),
      InSet("flag", Seq("A", "N", "R"), 1.0),
      Unique(Seq("k")),
      RefIntegrity("k", dim, "k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    assert(rep(("non_null_rate", "v")) === (0.75, false))
    assert(rep(("in_range_rate", "v")) === (0.5, false)) // 2 of 4 in range
    assert(rep(("in_set_rate", "flag")) === (0.75, false))
    assert(rep(("unique", "k")) === (1.0, false)) // one extra row of key 2
    assert(rep(("ref_integrity", "k")) === (1.0, false)) // key 9 orphan
    val clean = Expectations.run(rows.filter(col("k") === 1L), Seq(
      NonNullRate("v", 1.0), Unique(Seq("k")),
      RefIntegrity("k", dim, "k")))
      .collect().map(_.getBoolean(4))
    assert(clean.forall(identity) && clean.length === 3)
  }
}
