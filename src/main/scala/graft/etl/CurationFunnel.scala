package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel report: per-gate drop accounting for a chained
  * filter pipeline — the observability table every production
  * curation stack publishes next to its output ("where did the other
  * 60 % go?"). Gates apply IN ORDER and a document charges its drop
  * to the FIRST gate it fails (the how-it-actually-runs semantics:
  * later gates never see it), so the per-gate numbers decompose the
  * total loss exactly — Σ n_dropped + n_survivors = corpus, no
  * double counting, unlike independent per-gate pass rates which
  * overlap and cannot be stacked.
  *
  * Scale shape: ONE map pass over the corpus evaluates every gate
  * predicate and the first-fail index in the scan stage (a CASE
  * chain, whole-stage codegen'd), ONE gates-sized aggregation — the
  * report never re-scans per gate (the naive K-pass shape). The
  * report frame is |gates|+1 rows; n_in recurrences are plain
  * driver-free arithmetic on that tiny frame via a running sum. */
object CurationFunnel {

  /** Apply `gates` (name → keep-predicate) in order; report one row
    * per gate — (stage, gate, n_in, n_dropped, n_out) — where n_in is
    * the survivor count of every earlier gate, plus a final
    * ("survivors") row with the corpus yield. */
  def funnelReport(docs: DataFrame, gates: Seq[(String, Column)])
      : DataFrame = {
    require(gates.nonEmpty, "at least one gate")
    // first failing gate index (1-based), 0 = survived all
    val firstFail = coalesce(
      (gates.zipWithIndex.map { case ((_, keep), i) =>
        when(!keep, lit(i + 1L))
      } :+ lit(0L)): _*)
    val byFail = docs.select(firstFail.as("__ff"))
      .groupBy("__ff").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // gates-sized: assemble the running funnel driver-side (|gates|+1
    // rows — config-sized, the same convention as broadcast stat rows)
    val total = byFail.values.sum
    val spark = docs.sparkSession
    import spark.implicits._
    var in = total
    val rows = gates.zipWithIndex.map { case ((name, _), i) =>
      val dropped = byFail.getOrElse(i + 1L, 0L)
      val out = in - dropped
      val row = (i + 1L, name, in, dropped, out)
      in = out
      row
    } :+ ((gates.length + 1L, "survivors", in, 0L, in))
    rows.toDF("stage", "gate", "n_in", "n_dropped", "n_out")
  }

  /** q_p30_curation_funnel: the documents table through a 4-gate
    * chain — length floor, language, token floor, char-per-token
    * ceiling — with every count replayed by the oracle under the
    * identical first-fail semantics. */
  private val pFunnel = Q(
    (s, d) => {
      val toks = size(graft.text.TextOps.tokens(col("text")))
      funnelReport(Tables.documents(s, d), Seq(
        "len_ge_100" -> (col("n_chars") >= 100),
        "lang_en" -> (col("lang") === "en"),
        "toks_ge_30" -> (toks >= 30),
        "chars_per_tok_le_8" -> (col("n_chars") <= toks * 8)))
        .orderBy("stage")
    },
    Some("""WITH t AS (SELECT n_chars, lang,
              len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS toks FROM documents),
            ff AS (SELECT CASE
                WHEN NOT (n_chars >= 100) THEN 1
                WHEN NOT (lang = 'en') THEN 2
                WHEN NOT (toks >= 30) THEN 3
                WHEN NOT (n_chars <= toks * 8) THEN 4
                ELSE 0 END AS f FROM t),
            c AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n
                  FROM ff GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
            g(stage, gate) AS (VALUES
              (1, 'len_ge_100'), (2, 'lang_en'), (3, 'toks_ge_30'),
              (4, 'chars_per_tok_le_8')),
            d0 AS (SELECT g.stage, g.gate,
                CAST(COALESCE(c.n, 0) AS BIGINT) AS n_dropped
              FROM g LEFT JOIN c ON c.f = g.stage),
            run AS (SELECT stage, gate, n_dropped,
                tot.total
                  - CAST(COALESCE(SUM(n_dropped) OVER (ORDER BY stage
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS n_in
              FROM d0, tot)
            SELECT CAST(stage AS BIGINT) AS stage, gate, n_in, n_dropped,
                   n_in - n_dropped AS n_out
            FROM run
            UNION ALL
            SELECT 5, 'survivors',
              tot.total - CAST(COALESCE((SELECT SUM(n) FROM c WHERE f > 0),
                0) AS BIGINT),
              0,
              tot.total - CAST(COALESCE((SELECT SUM(n) FROM c WHERE f > 0),
                0) AS BIGINT)
            FROM tot
            ORDER BY stage"""))

  val queries: Map[String, Q] = Map("q_p30_curation_funnel" -> pFunnel)
}
