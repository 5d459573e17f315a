package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth fit (Heaps, "Information Retrieval"
  * 1978; Herdan 1960) — V(T) ≈ K·T^β: how fast the vocabulary grows as
  * the corpus streams in. The companion diagnostic to [[Zipf]] (the two
  * laws are duals) and the PROJECTION tool next to
  * [[VocabCoverage]]'s point estimate: Chao1 says how much vocabulary
  * the current corpus missed, the Heaps exponent says what another 10×
  * of the same source would add — β near the healthy ~0.4–0.6 band
  * means productive text; β ≈ 0 means a closed template vocabulary
  * (boilerplate), β ≈ 1 means ID-like token soup. Fit per source over
  * 10 prefix checkpoints in doc_id order: x = ln T_i (running token
  * count), y = ln V_i (running distinct-term count), OLS slope = β.
  *
  * Determinism: checkpoint doc ranks are ceil-divisions; T_i and V_i
  * are exact integer cumulatives (per-doc token counts; first-
  * occurrence ranks); ln is floored to micro per CHECKPOINT (10 rows
  * per source — NUMERIC_CONVENTION rule 2) and the OLS runs
  * [[graft.stats.GroupedOls]]'s exact-integer sufficient statistics,
  * identical trees both engines (the Zipf pattern).
  *
  * Scale shape: token explode + min-doc-per-term + per-doc counts are
  * ONE map-side-combined pass each; everything after runs over
  * per-source DOC-RANK cells (the source's doc count), windows
  * partitioned by source — never a global funnel. */
object Heaps {

  /** Per-group Heaps fit over `cuts` prefix checkpoints. Output (from
    * [[graft.stats.GroupedOls.fit]]): (grp, n, slope_micro = β,
    * intercept_micro = ln K, r2_micro). Groups need ≥ 2 distinct
    * checkpoints with T ≥ 1 (single-doc groups fit nothing and emit
    * null slopes via GroupedOls' degenerate guard). */
  def heapsFit(docs: DataFrame, grpCol: String, idCol: String,
      textCol: String, cuts: Int = 10): DataFrame = {
    val toks = docs.select(col(grpCol).as("g"), col(idCol).as("id"),
      TextOps.tokens(lower(col(textCol))).as("__ts"))
    val dl = toks.select(col("g"), col("id"),
      size(col("__ts")).cast("long").as("dl"))
    val rankW = Window.partitionBy("g").orderBy("id")
    val ranked = dl.withColumn("r", row_number().over(rankW).cast("long"))
      .withColumn("t_cum", sum("dl").over(rankW
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // first occurrence of each term = min doc id; its rank arrives by
    // joining back to the ranked doc table (group-keyed)
    val firstDoc = toks
      .select(col("g"), col("id"), explode(col("__ts")).as("term"))
      .groupBy("g", "term").agg(min("id").as("id"))
      .groupBy("g", "id").agg(count(lit(1)).as("new_terms"))
    val vCum = ranked.join(firstDoc, Seq("g", "id"), "left")
      .withColumn("v_cum", sum(coalesce(col("new_terms"), lit(0L)))
        .over(rankW.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val nDocs = dl.groupBy("g").agg(count(lit(1)).as("nd"))
    // checkpoint ranks: ceil(nd*i/cuts) for i = 1..cuts — duplicates at
    // tiny nd collapse via distinct so no checkpoint is double-counted
    val cps = nDocs.select(col("g"), explode(sequence(lit(1),
        lit(cuts))).as("i"), col("nd"))
      .select(col("g"), expr(s"(nd * i + ${cuts - 1}) div $cuts")
        .as("r")).distinct()
    val pts = vCum.join(cps, Seq("g", "r"))
      .filter(col("t_cum") >= 1 && col("v_cum") >= 1)
      .select(col("g"),
        floor(log(col("t_cum").cast("double")) * lit(1e6)).cast("long")
          .as("x"),
        floor(log(col("v_cum").cast("double")) * lit(1e6)).cast("long")
          .as("y"))
    graft.stats.GroupedOls.fit(pts, "g", "x", "y")
  }

  /** q_t_heaps: per-source vocabulary-growth exponent over the
    * documents corpus — the "does this source keep saying new things"
    * read-out. */
  private val tHeaps = Q(
    (s, d) => heapsFit(Tables.documents(s, d), "source", "doc_id", "text")
      .orderBy("grp"),
    Some("""WITH toks AS (SELECT source AS g, doc_id AS id,
                list_filter(string_split(lower(text), ' '), x -> x <> '')
                  AS ts
              FROM documents),
            dl AS (SELECT g, id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
            ranked AS (SELECT g, id, dl,
                CAST(row_number() OVER (PARTITION BY g ORDER BY id)
                  AS BIGINT) AS r,
                CAST(SUM(dl) OVER (PARTITION BY g ORDER BY id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS t_cum
              FROM dl),
            firstdoc AS (SELECT g, id, CAST(COUNT(*) AS BIGINT)
                  AS new_terms
              FROM (SELECT g, term, MIN(id) AS id
                    FROM (SELECT g, id, unnest(ts) AS term FROM toks)
                    GROUP BY g, term)
              GROUP BY g, id),
            vcum AS (SELECT ranked.g, ranked.r, ranked.t_cum,
                CAST(SUM(COALESCE(firstdoc.new_terms, 0))
                  OVER (PARTITION BY ranked.g ORDER BY ranked.r
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS v_cum
              FROM ranked LEFT JOIN firstdoc
                ON firstdoc.g = ranked.g AND firstdoc.id = ranked.id),
            nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nd
              FROM dl GROUP BY g),
            cps AS (SELECT DISTINCT nd.g,
                (nd.nd * i.i + 9) // 10 AS r
              FROM nd CROSS JOIN (SELECT unnest(range(1, 11)) AS i) i),
            pts AS (SELECT vcum.g,
                CAST(FLOOR(ln(CAST(vcum.t_cum AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS x,
                CAST(FLOOR(ln(CAST(vcum.v_cum AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS y
              FROM vcum JOIN cps ON cps.g = vcum.g AND cps.r = vcum.r
              WHERE vcum.t_cum >= 1 AND vcum.v_cum >= 1),
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

  val queries: Map[String, Q] = Map("q_t_heaps" -> tHeaps)
}
