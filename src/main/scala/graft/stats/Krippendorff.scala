package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Krippendorff's alpha, nominal metric (Krippendorff, "Content
  * Analysis" 1980; Hayes & Krippendorff, CMM 2007) — chance-corrected
  * agreement for RAGGED panels: raters may skip items, items may carry
  * any number of ratings ≥ 2. Exactly the case [[Fleiss.fleissKappa]]
  * REFUSES by design (its P̄ denominator assumes a complete panel):
  * real gate ensembles abstain (a language gate on empty text, a judge
  * timeout), and alpha is the standard statistic that stays honest
  * there. Items with fewer than 2 ratings carry no pairable
  * information and drop out, per the canonical definition.
  *
  * Exact-rational arithmetic: with o_ic = ratings of category c on
  * item i, m_i = Σ_c o_ic, n_c = Σ_i o_ic over pairable items,
  * n = Σ n_c,
  *   α = 1 − (n−1) · [Σ_i Σ_c o_ic(m_i−o_ic)/(m_i−1)] / [Σ_c n_c(n−n_c)]
  * (the standard nominal-alpha computational identity). The only
  * non-integer is the per-item 1/(m_i−1) weight; with raters bounded
  * by `maxRaters` = R, every (m_i−1) divides L = lcm(1, …, R−1), so
  * A·L = Σ o_ic(m_i−o_ic)·(L/(m_i−1)) is an EXACT integer and
  *   α = (B·L − (n−1)·A·L) / (B·L)
  * is one pmod floor-division of decimal(38,0)/HUGEINT integers
  * (α < 0 is legitimate). The rater bound is enforced loudly inside a
  * live column — an unnoticed m_i > R would corrupt the weights.
  *
  * Scale shape: ONE map-side (item, category) cells pass; the
  * disagreement sum folds over cells, the expected term over
  * |categories| rows. Nothing downstream scales with the corpus. */
object Krippendorff {

  private def lcm(xs: Seq[Long]): Long =
    xs.foldLeft(1L)((a, b) => a / BigInt(a).gcd(BigInt(b)).toLong * b)

  /** Nominal-metric alpha over long-form ratings (item, category) —
    * one row per rating. Output one row: (n_items, n_ratings, a_l,
    * b, alpha_micro); items with < 2 ratings excluded (n_items counts
    * the pairable ones). Degenerate data (every rating identical →
    * B = 0) yields null alpha. */
  def alphaNominal(ratings: DataFrame, itemCol: String, catCol: String,
      maxRaters: Int = 8): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 42,
      "maxRaters in [2, 42] (lcm fits a long)")
    val bigL = lcm((1 until maxRaters).map(_.toLong))
    val cells = ratings.groupBy(col(itemCol).as("__i"),
        col(catCol).as("__c"))
      .agg(count(lit(1)).as("o"))
    val items = cells.groupBy("__i").agg(sum("o").as("m"))
      .filter(col("m") >= 2)
      // the guard lives inside the selected column (pruning-proof): a
      // panel wider than maxRaters would silently corrupt the weights
      .select(col("__i"),
        when(col("m") <= maxRaters, col("m"))
          .otherwise(raise_error(concat(
            lit(s"alphaNominal: item with more than $maxRaters ratings ("),
            col("m"), lit(") — raise maxRaters")))).as("m"))
    val joined = cells.join(items, Seq("__i"))
    val aL = joined.agg(
      // L/(m-1) divides EVENLY by construction — integral `div`, never
      // float `/` (L up to lcm(1..41) exceeds double's exact range)
      coalesce(sum(col("o").cast("decimal(38,0)") * (col("m") - col("o"))
        * expr(s"${bigL}L div (m - 1)")), lit(0))
        .as("a_l"),
      countDistinct(col("__i")).as("n_items"))
    val nc = joined.groupBy("__c").agg(sum("o").as("nc"))
    val b = nc.crossJoin(broadcast(
        nc.agg(sum("nc").as("n"))))
      .agg(coalesce(sum(col("nc").cast("decimal(38,0)") *
        (col("n") - col("nc"))), lit(0)).as("b"),
        max(col("n")).as("n"))
    aL.crossJoin(broadcast(b))
      .select(col("n_items"), col("n").cast("long").as("n_ratings"),
        col("a_l").cast("long").as("a_l"), col("b").cast("long").as("b"),
        when(col("b") === 0, lit(null).cast("long"))
          .otherwise(Agreement.floorDiv(
            (col("b") * lit(bigL) - (col("n") - 1) * col("a_l")) *
              lit(1000000),
            col("b") * lit(bigL)))
          .as("alpha_micro"))
  }

  /** q_m70_kripp_alpha: the q_m55 gate panel made RAGGED — the
    * structural rater abstains on documents with no sentence
    * terminator at all (a gate with nothing to measure), so some
    * documents carry 2 ratings and some 3. Fleiss refuses this panel
    * (by design, spec-pinned); alpha is its answer. */
  private def cat3(c: org.apache.spark.sql.Column, lo: Int, hi: Int) =
    when(c < lo, lit("low")).when(c < hi, lit("mid")).otherwise(lit("high"))

  private val mAlpha = Q(
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        cat3(col("n_chars"), 200, 1000).as("r_len"),
        cat3(size(filter(split(col("text"), " "), t => t =!= lit(""))),
          40, 200).as("r_words"),
        (length(col("text")) - length(replace(col("text"), lit("."),
          lit("")))).as("n_sent"))
      val ratings = docs.select(col("doc_id"), col("r_len").as("cat"))
        .unionByName(docs.select(col("doc_id"), col("r_words").as("cat")))
        .unionByName(docs.filter(col("n_sent") >= 1)
          .select(col("doc_id"), cat3(col("n_sent"), 2, 10).as("cat")))
      alphaNominal(ratings, "doc_id", "cat", maxRaters = 3)
    },
    Some("""WITH base AS (SELECT doc_id,
                CASE WHEN n_chars < 200 THEN 'low'
                     WHEN n_chars < 1000 THEN 'mid' ELSE 'high' END AS r1,
                CASE WHEN len(list_filter(string_split(text, ' '),
                         x -> x <> '')) < 40 THEN 'low'
                     WHEN len(list_filter(string_split(text, ' '),
                         x -> x <> '')) < 200 THEN 'mid'
                     ELSE 'high' END AS r2,
                length(text) - length(replace(text, '.', '')) AS ns
              FROM documents),
            ratings AS (SELECT doc_id, r1 AS cat FROM base
              UNION ALL SELECT doc_id, r2 FROM base
              UNION ALL SELECT doc_id,
                CASE WHEN ns < 2 THEN 'low' WHEN ns < 10 THEN 'mid'
                     ELSE 'high' END
              FROM base WHERE ns >= 1),
            cells AS (SELECT doc_id, cat, CAST(COUNT(*) AS HUGEINT) AS o
              FROM ratings GROUP BY 1, 2),
            items AS (SELECT doc_id, SUM(o) AS m FROM cells
              GROUP BY 1 HAVING SUM(o) >= 2),
            j AS (SELECT cells.doc_id, cells.cat, cells.o, items.m
              FROM cells JOIN items ON items.doc_id = cells.doc_id),
            -- L = lcm(1, 2) = 2 for maxRaters = 3
            al AS (SELECT COALESCE(SUM(o * (m - o) * (2 // (m - 1))), 0)
                  AS a_l,
                CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_items
              FROM j),
            nc AS (SELECT cat, SUM(o) AS nc FROM j GROUP BY 1),
            bb AS (SELECT COALESCE(SUM(nc * ((SELECT SUM(nc) FROM nc)
                    - nc)), 0) AS b,
                (SELECT SUM(nc) FROM nc) AS n
              FROM nc)
            SELECT al.n_items, CAST(bb.n AS BIGINT) AS n_ratings,
              CAST(al.a_l AS BIGINT) AS a_l, CAST(bb.b AS BIGINT) AS b,
              CASE WHEN bb.b = 0 THEN NULL
                ELSE CAST(((bb.b * 2 - (bb.n - 1) * al.a_l) * 1000000
                  - ((((bb.b * 2 - (bb.n - 1) * al.a_l) * 1000000)
                      % (bb.b * 2)) + bb.b * 2) % (bb.b * 2))
                  // (bb.b * 2) AS BIGINT)
              END AS alpha_micro
            FROM al CROSS JOIN bb"""))

  val queries: Map[String, Q] = Map("q_m70_kripp_alpha" -> mAlpha)
}
