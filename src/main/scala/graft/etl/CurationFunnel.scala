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
    * ("survivors") row with the corpus yield.
    *
    * NULL gate semantics: a predicate that evaluates to NULL (e.g.
    * `col("lang") === "en"` on a null lang) counts as FAILED — the doc
    * is charged to that gate, not silently passed through. For a
    * curation filter "unknown" must mean "drop": the three-valued-SQL
    * default (`when(!keep, …)` skips on NULL) would let undecidable
    * docs reach "survivors", which is never what a quality gate wants.
    * Spelled `coalesce(keep, false)` here and
    * `NOT COALESCE(cond, false)` in every oracle replay. */
  def funnelReport(docs: DataFrame, gates: Seq[(String, Column)])
      : DataFrame = {
    require(gates.nonEmpty, "at least one gate")
    // first failing gate index (1-based), 0 = survived all;
    // NULL predicate == fail (coalesce to false before negating)
    val firstFail = coalesce(
      (gates.zipWithIndex.map { case ((_, keep), i) =>
        when(!coalesce(keep, lit(false)), lit(i + 1L))
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
                WHEN NOT COALESCE(n_chars >= 100, false) THEN 1
                WHEN NOT COALESCE(lang = 'en', false) THEN 2
                WHEN NOT COALESCE(toks >= 30, false) THEN 3
                WHEN NOT COALESCE(n_chars <= toks * 8, false) THEN 4
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

  /** q_p34_gopher_funnel: the Gopher rule battery
    * ([[graft.text.TextOps.gopherRules]], Rae et al. 2021 §A1.1) wired
    * through the funnel as its ordered gate chain — the composition a
    * production curation stack actually publishes ("which RULE costs
    * the most documents?"): drops charge the FIRST failing rule in
    * battery order (wc → mwl → alpha → sym → stop), so the per-rule
    * numbers decompose the total loss exactly, unlike the independent
    * per-rule booleans q_t_gopher_rules reports (which overlap).
    *
    * Scale: gopherRules is pure map-side (one token split feeding all
    * counters); the funnel adds its single gates-sized aggregation —
    * the composition is still ONE corpus pass. */
  private val pGopherFunnel = Q(
    (s, d) => {
      val rules = graft.text.TextOps.gopherRules(
        Tables.documents(s, d), "doc_id", "text")
      funnelReport(rules, Seq(
        "r_wc" -> col("r_wc"), "r_mwl" -> col("r_mwl"),
        "r_alpha" -> col("r_alpha"), "r_sym" -> col("r_sym"),
        "r_stop" -> col("r_stop")))
        .orderBy("stage")
    },
    Some("""WITH t AS (SELECT doc_id, text,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents),
            c AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0)
                AS BIGINT) AS len_sum,
              CAST(len(list_filter(toks,
                x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
              CAST(len(text) - len(regexp_replace(text, '[#…]', '', 'g'))
                + (len(text) - len(replace(text, '...', ''))) // 3
                AS BIGINT) AS n_sym,
              CAST(len(list_filter(toks, x -> list_contains(
                ['the','a','of','and','to','in','is'], lower(x))))
                AS BIGINT) AS n_stop
              FROM t),
            ff AS (SELECT CASE
                WHEN NOT COALESCE(n_words >= 20 AND n_words <= 80, false)
                  THEN 1
                WHEN NOT COALESCE(2 * len_sum >= 7 * n_words
                  AND len_sum <= 5 * n_words, false) THEN 2
                WHEN NOT COALESCE(5 * n_alpha >= 4 * n_words, false) THEN 3
                WHEN NOT COALESCE(10 * n_sym <= n_words, false) THEN 4
                WHEN NOT COALESCE(n_stop >= 2, false) THEN 5
                ELSE 0 END AS f FROM c),
            cnt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n
                  FROM ff GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
            g(stage, gate) AS (VALUES
              (1, 'r_wc'), (2, 'r_mwl'), (3, 'r_alpha'),
              (4, 'r_sym'), (5, 'r_stop')),
            d0 AS (SELECT g.stage, g.gate,
                CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_dropped
              FROM g LEFT JOIN cnt ON cnt.f = g.stage),
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
            SELECT 6, 'survivors',
              tot.total - CAST(COALESCE(
                (SELECT SUM(n) FROM cnt WHERE f > 0), 0) AS BIGINT),
              0,
              tot.total - CAST(COALESCE(
                (SELECT SUM(n) FROM cnt WHERE f > 0), 0) AS BIGINT)
            FROM tot
            ORDER BY stage"""))

  val queries: Map[String, Q] = Map(
    "q_p30_curation_funnel" -> pFunnel,
    "q_p34_gopher_funnel" -> pGopherFunnel)
}
