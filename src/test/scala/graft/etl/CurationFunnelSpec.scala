package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  test("drops charge the FIRST failing gate; the funnel telescopes") {
    // doc 1 fails g1; doc 2 fails g1 AND g2 (charged to g1); doc 3
    // fails g2 only; docs 4,5 survive
    val docs = Seq(
      (1L, 5L, "fr"), (2L, 5L, "fr"), (3L, 100L, "fr"),
      (4L, 100L, "en"), (5L, 200L, "en")).toDF("id", "len", "lang")
    val rep = CurationFunnel.funnelReport(docs, Seq(
      "len" -> (col("len") >= 50), "lang" -> (col("lang") === "en")))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep("len") === ((5L, 2L, 3L)))
    assert(rep("lang") === ((3L, 1L, 2L)))
    assert(rep("survivors") === ((2L, 0L, 2L)))
  }

  test("a gate nothing fails reports zero drops with a full pass-through") {
    val docs = Seq((1L, 10L), (2L, 20L)).toDF("id", "x")
    val rep = CurationFunnel.funnelReport(docs,
      Seq("always" -> lit(true), "x_pos" -> (col("x") > 0)))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rep.toSeq === Seq(("always", 2L, 0L, 2L),
      ("x_pos", 2L, 0L, 2L), ("survivors", 2L, 0L, 2L)))
  }

  test("total loss decomposes exactly: drops plus survivors = corpus") {
    val docs = (1L to 100L).map(i => (i, i)).toDF("id", "x")
    val rep = CurationFunnel.funnelReport(docs, Seq(
      "ge_20" -> (col("x") >= 20), "even" -> (col("x") % 2 === 0),
      "le_80" -> (col("x") <= 80))).collect()
    val drops = rep.filter(_.getString(1) != "survivors")
      .map(_.getLong(3)).sum
    val surv = rep.filter(_.getString(1) == "survivors").head.getLong(4)
    assert(drops + surv === 100L)
  }
}
