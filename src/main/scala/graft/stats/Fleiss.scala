package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fleiss' kappa multi-rater agreement (Fleiss, "Measuring nominal
  * scale agreement among many raters", Psych. Bull. 1971) — the
  * r-rater generalization of [[Agreement.cohenKappa]]: r raters each
  * assign every item one of k categories; κ measures how far the
  * observed per-item rater concordance exceeds what the raters'
  * category marginals already guarantee by chance. The curation use:
  * an ensemble of cheap quality gates (length, lexical, structural)
  * votes KEEP/MID/DROP per document — Fleiss says whether the ensemble
  * is a committee (κ high: gates see the same signal, majority vote is
  * meaningful) or a dice pool (κ ≈ 0: "2-of-3 agree" is marginals-only
  * coincidence). Cohen's kappa (q_m45) covers exactly two raters;
  * Fleiss is the operator for rating ENSEMBLES — label-aggregation
  * pipelines gate on it before trusting majority labels.
  *
  * Exact-rational arithmetic (NUMERIC_CONVENTION rule 1): with n items,
  * r raters, n_ij = raters placing item i in category j, S = Σ n_ij²
  * and C = Σ_j (Σ_i n_ij)²,
  *   P̄  = (S − n·r) / (n·r·(r−1))        (mean observed agreement)
  *   P̄e = C / (n²·r²)                     (chance agreement)
  *   κ  = (P̄ − P̄e)/(1 − P̄e)
  *      = ((S − n·r)·n·r − C·(r−1)) / ((n²·r² − C)·(r−1))
  * — a ratio of exact integers; the output is its FLOOR-division micro
  * via [[Agreement.floorDiv]] (κ < 0 is legitimate). Unanimous-constant
  * raters (C = n²r², zero chance-corrected information) yield null.
  * Products run in decimal(38,0)/HUGEINT, so no corpus size wraps.
  *
  * Scale shape: the data pass is one `groupBy(item, category)` count
  * over n·r assignment rows (map-side combined); S folds in the same
  * aggregation's second pass over n·k cells, C over k category rows.
  * Nothing downstream of the cell table scales with the corpus. */
object Fleiss {

  /** Fleiss' kappa over long-form assignments (one row per
    * item × rater): (n, r, s_sq, c_sq, pbar_micro, pe_micro,
    * kappa_micro). `r` must be constant per item (every rater rates
    * every item) — enforced, because a ragged panel silently biases
    * P̄'s denominator. */
  def fleissKappa(assign: DataFrame, itemCol: String, catCol: String)
      : DataFrame = {
    val cells = assign.groupBy(col(itemCol).as("__i"), col(catCol).as("__j"))
      .agg(count(lit(1)).as("nij"))
    val perItem = cells.groupBy("__i").agg(sum("nij").as("__ri"))
    val rChk = perItem.agg(min("__ri").as("rmin"), max("__ri").as("rmax"),
      count(lit(1)).as("n"))
    val catMarg = cells.groupBy("__j")
      .agg(sum("nij").cast("decimal(38,0)").as("cj"))
      .agg(sum(col("cj") * col("cj")).as("c_sq"))
    val sSq = cells.agg(
      sum(col("nij").cast("decimal(38,0)") * col("nij")).as("s_sq"))
    sSq.crossJoin(broadcast(rChk)).crossJoin(broadcast(catMarg))
      // the guard lives INSIDE the r column so projection pruning can
      // never drop it: a ragged panel (some item rated by fewer raters)
      // silently biases P̄'s denominator, so it fails loudly instead
      .withColumn("r",
        when(col("rmin") === col("rmax"), col("rmin"))
          .otherwise(raise_error(concat(lit("fleissKappa: ragged panel — "
            + "every rater must rate every item (min raters/item "),
            col("rmin"), lit(", max "), col("rmax"), lit(")")))))
      .withColumn("nr", col("n").cast("decimal(38,0)") * col("r"))
      .select(col("n"), col("r").cast("long").as("r"),
        col("s_sq").cast("long").as("s_sq"),
        col("c_sq").cast("long").as("c_sq"),
        // P̄ and P̄e are non-negative ratios of exact integers: integral
        // `div` (truncating == floor on non-negatives, rule 1); never
        // decimal `/`, whose HALF_UP result-scale rounding re-opens the
        // decimal-repr hazard
        expr("""cast(((s_sq - nr) * 1000000) div (nr * (r - 1)) as long)""")
          .as("pbar_micro"),
        expr("cast((c_sq * 1000000) div (nr * nr) as long)")
          .as("pe_micro"),
        when(col("nr") * col("nr") === col("c_sq"),
          lit(null).cast("long"))
          .otherwise(Agreement.floorDiv(
            ((col("s_sq") - col("nr")) * col("nr")
              - col("c_sq") * (col("r") - 1)) * lit(1000000),
            (col("nr") * col("nr") - col("c_sq")) * (col("r") - 1)))
          .as("kappa_micro"))
  }

  /** q_m55_fleiss: three deterministic document-quality raters — length
    * (n_chars), lexical (whitespace word count), structural (sentence
    * terminator count) — each assigning {low, mid, high}; the
    * ensemble-agreement read-out over the documents table. Raters are
    * pure functions of the text, so the oracle rebuilds the panel and
    * the exact-rational kappa end to end. */
  private def cat3(v: Column, lo: Int, hi: Int): Column =
    when(v < lo, lit("low")).when(v < hi, lit("mid")).otherwise(lit("high"))

  private val mFleiss = Q(
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        cat3(col("n_chars"), 200, 1000).as("r_len"),
        cat3(size(filter(split(col("text"), " "), t => t =!= lit(""))),
          40, 200).as("r_words"),
        cat3(length(col("text")) - length(regexp_replace(col("text"),
          lit("\\."), lit(""))), 2, 10).as("r_sent"))
      val long = docs.select(col("doc_id"),
        explode(array(col("r_len"), col("r_words"), col("r_sent")))
          .as("cat"))
      fleissKappa(long, "doc_id", "cat")
    },
    Some("""WITH r AS (SELECT doc_id,
                CASE WHEN n_chars < 200 THEN 'low'
                     WHEN n_chars < 1000 THEN 'mid' ELSE 'high' END AS r1,
                CASE WHEN len(list_filter(string_split(text, ' '),
                         x -> x <> '')) < 40 THEN 'low'
                     WHEN len(list_filter(string_split(text, ' '),
                         x -> x <> '')) < 200 THEN 'mid'
                     ELSE 'high' END AS r2,
                CASE WHEN length(text) - length(replace(text, '.', '')) < 2
                       THEN 'low'
                     WHEN length(text) - length(replace(text, '.', '')) < 10
                       THEN 'mid' ELSE 'high' END AS r3
              FROM documents),
            assign AS (SELECT doc_id, r1 AS cat FROM r
              UNION ALL SELECT doc_id, r2 FROM r
              UNION ALL SELECT doc_id, r3 FROM r),
            cells AS (SELECT doc_id, cat,
                CAST(COUNT(*) AS HUGEINT) AS nij
              FROM assign GROUP BY 1, 2),
            base AS (SELECT CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS n,
                SUM(nij * nij) AS s_sq FROM cells),
            marg AS (SELECT SUM(cj * cj) AS c_sq FROM
              (SELECT SUM(nij) AS cj FROM cells GROUP BY cat)),
            k AS (SELECT n, CAST(3 AS HUGEINT) AS r, s_sq, c_sq,
                n * 3 AS nr FROM base CROSS JOIN marg)
            SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
              CAST(s_sq AS BIGINT) AS s_sq, CAST(c_sq AS BIGINT) AS c_sq,
              CAST((s_sq - nr) * 1000000 // (nr * (r - 1)) AS BIGINT)
                AS pbar_micro,
              CAST(c_sq * 1000000 // (nr * nr) AS BIGINT) AS pe_micro,
              CASE WHEN nr * nr = c_sq THEN NULL
                ELSE CAST((((s_sq - nr) * nr - c_sq * (r - 1)) * 1000000)
                  // ((nr * nr - c_sq) * (r - 1)) AS BIGINT)
              END AS kappa_micro
            FROM k"""))

  val queries: Map[String, Q] = Map("q_m55_fleiss" -> mFleiss)
}
