package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf-slope fit per source — the corpus-health diagnostic the
  * frequency batteries (tf-idf, PMI, fertility) lean on but never
  * state: natural text follows freq ∝ rank^(-s) with s ≈ 1, so the
  * per-source OLS slope of log-freq on log-rank flags degenerate
  * slices — boilerplate-heavy sources flatten (s → 0, every "word"
  * equally common), template spam steepens, and a drifting slope
  * between snapshots is a crawler regression before any quality score
  * moves. R² doubles as the "is this even Zipfian" fit check.
  *
  * Determinism: term frequencies and ranks are exact integers; each
  * point's (ln rank, ln freq) is floored ONCE to micro-nats (rule 2 —
  * integer inputs through the ln of an identical tree), so the OLS
  * sufficient statistics are exact integer sums and the fit reuses
  * [[graft.stats.GroupedOls.fit]] verbatim (its one float step is the
  * identical-tree closed form, floored). Outputs are in micro-ln
  * units: slope_micro ≈ -1e6 for ideal Zipf.
  *
  * Scale shape: the tokenize-explode rides the one corpus scan; term
  * frequencies are ONE map-side-combined (source, term) count; the
  * top-R cut per source runs through the native bounded-heap
  * [[graft.plans.GroupedTopK]] (no vocabulary-wide sort), the rank
  * window then orders ≤ R rows per source, and the OLS is one keyed
  * aggregation over |sources|·R points. */
object Zipf {

  /** Per-group Zipf fit over the top `r` terms. Output (from
    * [[graft.stats.GroupedOls.fit]]): (grp, n, slope_micro,
    * intercept_micro, r2_micro) — micro-ln units. */
  def zipfFit(docs: DataFrame, grpCol: String, textCol: String, r: Int)
      : DataFrame = {
    val toks = docs.select(col(grpCol).as("g"),
      explode(TextOps.tokens(lower(col(textCol)))).as("term"))
    val freq = toks.groupBy("g", "term").agg(count(lit(1)).as("f"))
    val top = graft.plans.GroupedTopK.topK(freq, Seq("g"),
      Seq("f" -> true, "term" -> false), r)
    val w = Window.partitionBy("g").orderBy(col("f").desc, col("term"))
    val pts = top.withColumn("r", row_number().over(w))
      .select(col("g"),
        floor(log(col("r").cast("double")) * lit(1e6)).cast("long")
          .as("x"),
        floor(log(col("f").cast("double")) * lit(1e6)).cast("long")
          .as("y"))
    graft.stats.GroupedOls.fit(pts, "g", "x", "y")
  }

  /** q_t_zipf: top-100 terms per source; slope_micro ≈ -1e6 on healthy
    * text. */
  private val tZipf = Q(
    (s, d) => zipfFit(Tables.documents(s, d), "source", "text", r = 100)
      .orderBy("grp"),
    Some("""WITH toks AS (SELECT source AS g,
                unnest(list_filter(string_split(lower(text), ' '),
                  x -> x <> '')) AS term
              FROM documents),
            freq AS (SELECT g, term, CAST(COUNT(*) AS BIGINT) AS f
              FROM toks GROUP BY 1, 2),
            rk AS (SELECT g, term, f, row_number() OVER
                     (PARTITION BY g ORDER BY f DESC, term) AS r
                   FROM freq QUALIFY r <= 100),
            pts AS (SELECT g,
                CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)
                  AS x,
                CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT)
                  AS y
              FROM rk),
            agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
              FROM pts GROUP BY 1),
            f AS (SELECT g, n,
                CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
                CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS varx,
                CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vary,
                CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
                CAST(n AS DOUBLE) AS dn
              FROM agg)
            SELECT g AS grp, n,
              CASE WHEN varx > 0 THEN
                CAST(floor(cov / varx * 1000000.0) AS BIGINT)
              END AS slope_micro,
              CASE WHEN varx > 0 THEN
                CAST(floor((dsy - cov / varx * dsx) / dn * 1000000.0)
                  AS BIGINT)
              END AS intercept_micro,
              CASE WHEN varx > 0 AND vary > 0 THEN
                CAST(floor(cov * cov / (varx * vary) * 1000000.0)
                  AS BIGINT)
              END AS r2_micro
            FROM f ORDER BY grp"""))

  val queries: Map[String, Q] = Map("q_t_zipf" -> tZipf)
}
