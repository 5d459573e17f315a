package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FuzzyLinkSpec extends SparkSpecBase {
  import spark.implicits._

  // two blocks (by last word); distances within the widget block:
  //   "red widget" <-> "rod widget" 1, "red widget" <-> "raw widget" 2,
  //   "rod widget" <-> "raw widget" 2
  private lazy val recs = Seq(
    (1L, "red widget"), (2L, "rod widget"), (3L, "raw widget"),
    (4L, "red gear"), (5L, "raw gear"),
    (6L, "red widget") // exact duplicate of 1 — must never match 1 or 6
  ).toDF("id", "name")

  private def nearest(k: Int) = FuzzyLink.blockedNearest(
    recs, "id", "name", element_at(split(col("name"), " "), 2), k)

  test("nearest non-identical names within a block, ranked by distance, " +
      "with match multiplicity") {
    val out = nearest(2).orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // id 1 ("red widget"): nearest name is "rod widget" (1), then "raw"
    // (2); the duplicate record 6 is invisible (same name, excluded)
    assert(out.filter(_._1 == 1L).toSeq === Seq(
      (1L, 1L, "rod widget", 1L, 1L), (1L, 2L, "raw widget", 1L, 2L)))
    // its duplicate id 6 gets the IDENTICAL linkage (same name, same set)
    assert(out.filter(_._1 == 6L).map(t => (t._2, t._3, t._4, t._5)).toSeq
      === out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4, t._5)).toSeq)
    // id 2 links to the duplicated name with its record count surfaced
    assert(out.filter(_._1 == 2L).toSeq === Seq(
      (2L, 1L, "red widget", 2L, 1L), (2L, 2L, "raw widget", 1L, 2L)))
    // blocking isolation: gear names only ever match gear names
    assert(out.filter(r => r._1 == 4L || r._1 == 5L)
      .map(_._3).forall(_.endsWith("gear")))
  }

  test("k truncates per record; every record of a name shares its rank " +
      "list") {
    val out = nearest(1).collect()
    assert(out.length === 6) // one rank-1 row per record
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 1))
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getString(2) === "red widget" && r2.getLong(3) === 2L &&
      r2.getLong(4) === 1L)
  }
}
