package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cronbach's alpha internal-consistency reliability (Cronbach,
  * Psychometrika 1951) — the question the agreement family has not
  * asked yet: Fleiss/Krippendorff (q_m55/q_m70) score whether raters
  * AGREE on categories; alpha scores whether k numeric scores measure
  * ONE underlying construct — "do the engine's quality heuristics form
  * a coherent scale, or are they measuring different things?" Low
  * alpha means a composite quality score is averaging noise.
  *
  * Exactness (rule 1, zero floats): with per-rater variance numerators
  * V_i = n·ΣX_i² − (ΣX_i)² and the row-sum variance numerator V_t
  * (same clearing factor, so it CANCELS),
  *   α = k/(k−1) · (1 − ΣV_i / V_t)
  * is exactly rational: α_micro = pmod-floor( k·(V_t − ΣV_i)·1e6,
  * (k−1)·V_t ) — signed (alpha is legitimately negative when scores
  * anti-correlate). V_t = 0 (constant row sums) → null. Sufficient
  * statistics accumulate in decimal(38,0)/HUGEINT — no overflow cap.
  *
  * Scale shape: ONE map-side pass over the melted (item, rater, x)
  * frame for the per-rater statistics (k cells) and ONE over per-item
  * row sums; everything after is a 1-row select. */
object Cronbach {

  /** Alpha over a melted (itemCol, raterCol, integer xCol) frame —
    * every rater scores every item. Output one row:
    * (n_items, k, alpha_micro). */
  def alpha(rows: DataFrame, itemCol: String, raterCol: String,
      xCol: String): DataFrame = {
    val base = rows.select(col(itemCol).as("__i"), col(raterCol).as("__r"),
      col(xCol).cast("decimal(38,0)").as("__x"))
    val perR = base.groupBy("__r")
      .agg(count(lit(1)).as("nr"), sum("__x").as("sx"),
        sum(col("__x") * col("__x")).as("qx"))
    val vi = perR.agg(count(lit(1)).as("k"),
      max("nr").as("n_items"),
      min("nr").as("__nmin"),
      sum(col("nr").cast("decimal(38,0)") * col("qx")
        - col("sx") * col("sx")).as("svi"))
    val perI = base.groupBy("__i")
      .agg(sum("__x").as("t"), count(lit(1)).as("__ci"))
    val vt = perI.agg(count(lit(1)).as("__ni"), sum("t").as("st"),
        sum(col("t") * col("t")).as("qt"),
        min("__ci").as("__cmin"), max("__ci").as("__cmax"))
      .select((col("__ni").cast("decimal(38,0)") * col("qt")
        - col("st") * col("st")).as("vt"),
        col("__cmin"), col("__cmax"))
    vi.join(broadcast(vt))
      .select(col("n_items"), col("k"),
        // two-sided completeness guard: equal per-rater row counts alone
        // would pass raters scoring equal numbers of DIFFERENT items, so
        // also require every item to carry exactly k ratings
        when(col("__nmin") =!= col("n_items")
            || col("__cmin") =!= col("k") || col("__cmax") =!= col("k"),
          raise_error(lit("cronbach: ragged panel — every rater must " +
            "score every item")).cast("long"))
          .when(col("vt") === 0 || col("k") < 2, lit(null).cast("long"))
          .otherwise(Agreement.floorDiv(
            col("k").cast("decimal(38,0)") * (col("vt") - col("svi"))
              * 1000000L,
            (col("k").cast("decimal(38,0)") - 1) * col("vt")))
          .as("alpha_micro"))
  }

  /** q_m82_cronbach: do the three deterministic document-quality
    * scores (chars, whitespace tokens, sentence marks) form one scale?
    * The reliability read on the same panel shape q_m55 rates. */
  private val mAlpha = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      def melt(r: String, x: org.apache.spark.sql.Column) =
        docs.select(col("doc_id").as("i"), lit(r).as("r"), x.as("x"))
      alpha(
        melt("chars", col("n_chars"))
          .unionAll(melt("toks",
            length(col("text"))
              - length(regexp_replace(col("text"), " ", ""))))
          .unionAll(melt("sents",
            length(col("text"))
              - length(regexp_replace(col("text"), "\\.", "")))),
        "i", "r", "x")
    },
    Some("""WITH m AS (
              SELECT doc_id AS i, 'chars' AS r,
                CAST(n_chars AS BIGINT) AS x FROM documents
              UNION ALL
              SELECT doc_id, 'toks',
                length(text) - length(replace(text, ' ', ''))
              FROM documents
              UNION ALL
              SELECT doc_id, 'sents',
                length(text) - length(replace(text, '.', ''))
              FROM documents),
            perr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nr,
                CAST(SUM(x) AS HUGEINT) AS sx,
                SUM(CAST(x AS HUGEINT) * x) AS qx
              FROM m GROUP BY 1),
            vi AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                MAX(nr) AS n_items,
                SUM(CAST(nr AS HUGEINT) * qx - sx * sx) AS svi
              FROM perr),
            peri AS (SELECT i, CAST(SUM(x) AS HUGEINT) AS t
              FROM m GROUP BY 1),
            vt AS (SELECT CAST(COUNT(*) AS HUGEINT) * SUM(t * t)
                - SUM(t) * SUM(t) AS vt FROM peri),
            fin AS (SELECT n_items, k,
                k * (vt - svi) * 1000000 AS anum,
                (k - 1) * vt AS aden, vt
              FROM vi, vt)
            SELECT n_items, k,
              CASE WHEN vt = 0 OR k < 2 THEN NULL
                ELSE CAST((anum - ((anum % aden) + aden) % aden) // aden
                  AS BIGINT) END AS alpha_micro
            FROM fin"""))

  val queries: Map[String, Q] = Map("q_m82_cronbach" -> mAlpha)
}
