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

  test("a NULL gate predicate FAILS the doc (charged to that gate), " +
      "never silently passes it") {
    // doc 2 has a null lang: `lang === "en"` evaluates to NULL — the
    // pinned semantics charge the drop to the lang gate (unknown ⇒
    // drop), so it must NOT reach survivors; doc 3 has a null len and
    // is charged to the len gate
    val docs = Seq(
      (1L, Some(100L), Some("en")),
      (2L, Some(100L), None),
      (3L, None, Some("en")),
      (4L, Some(200L), Some("en")))
      .toDF("id", "len", "lang")
    val rep = CurationFunnel.funnelReport(docs, Seq(
      "len" -> (col("len") >= 50), "lang" -> (col("lang") === "en")))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep("len") === ((4L, 1L, 3L)))
    assert(rep("lang") === ((3L, 1L, 2L)))
    assert(rep("survivors") === ((2L, 0L, 2L)))
  }

  test("gopher rules compose as funnel gates: each drop charges the " +
      "FIRST failing rule in battery order") {
    // one doc per rule, crafted to pass every EARLIER rule: 1 fails
    // word count; 2 fails mean word length (2.0 < 3.5); 3 fails the
    // alpha share (digit words); 4 fails symbol ratio (2 '#' in 10
    // words); 6 fails the stopword floor; 5 survives all five
    val docs = Seq(
      (1L, "ab cd"),
      (2L, "ab cd ef gh"),
      (3L, "1234 5678 9999 0000"),
      (4L, "them word cool nice good open then area #a #b"),
      (5L, "the cats of this barn sleep well today okay fine"),
      (6L, "cats dogs bird barn sleep well today okay fine good"))
      .toDF("doc_id", "text")
    val rules = graft.text.TextOps.gopherRules(docs, "doc_id", "text",
      minWords = 3, maxWords = 10)
    val rep = CurationFunnel.funnelReport(rules, Seq(
      "r_wc" -> col("r_wc"), "r_mwl" -> col("r_mwl"),
      "r_alpha" -> col("r_alpha"), "r_sym" -> col("r_sym"),
      "r_stop" -> col("r_stop")))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep("r_wc") === ((6L, 1L, 5L)))
    assert(rep("r_mwl") === ((5L, 1L, 4L)))
    assert(rep("r_alpha") === ((4L, 1L, 3L)))
    assert(rep("r_sym") === ((3L, 1L, 2L)))
    assert(rep("r_stop") === ((2L, 1L, 1L)))
    assert(rep("survivors") === ((1L, 0L, 1L)))
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
