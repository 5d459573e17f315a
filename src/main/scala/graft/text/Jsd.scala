package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between each source's unigram
  * distribution and the rest of the corpus (Lin, IEEE Trans. IT 1991)
  * — the information-theoretic drift readout next to W1 (q_m78) and
  * PSI (q_m44): symmetric, bounded by ln 2, zero-safe where raw KL is
  * not, and THE standard corpus-mixture distance in LLM data work
  * (domain weighting, contamination forensics, mixture drift).
  *
  * With per-word source count a (Σa = A) and rest count b (Σb = B),
  *   JSD = Σ_w ½(a/A)·ln(2aB/(aB+bA)) + ½(b/B)·ln(2bA/(aB+bA))
  * and every word ABSENT from the source contributes exactly
  * ½(b/B)·ln 2 — so the sum needs only the source's OWN vocabulary
  * cells plus one closed-form absent-mass term ½·ln2·(B−Σ_{w∈s}b)/B.
  * No dense source×vocab grid is ever materialized.
  *
  * Cross-engine determinism (the [[graft.stats.MutualInfo]]
  * convention): counts are exact integers, each cell's term is an
  * identical expression tree of exact-integer ratios, the one float
  * reduction is a SEQUENTIAL FOLD over word-sorted terms
  * (`aggregate`/`array_sort` ≡ `list_reduce(list(... ORDER BY ...))`),
  * output floors to integer micro-nats.
  *
  * Scale shape: one (source, word) counts pass (THE data pass), the
  * global word table derives from it, b attaches by the word-keyed
  * join, per-source totals by a k-row broadcast; the fold runs over
  * each source's OWN vocab cells. */
object Jsd {

  /** Per-group one-vs-rest JSD over (groupCol, textCol) rows. Output
    * one row per group: (g, n_tokens, vocab, jsd_micro) — micro-nats,
    * null when the rest is empty. */
  def oneVsRest(rows: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val toks = rows.select(col(groupCol).cast("string").as("__g"),
      explode(TextOps.tokens(col(textCol))).as("__w"))
    val cells = toks.groupBy("__g", "__w").agg(count(lit(1)).as("a"))
    val glob = cells.groupBy("__w").agg(sum("a").as("cv"))
    val perG = cells.groupBy("__g").agg(sum("a").as("ga"))
    val tot = glob.agg(sum("cv").as("tt"))
    val terms = cells.join(glob, Seq("__w"))
      .join(perG, Seq("__g")).join(broadcast(tot))
      .withColumn("b", col("cv") - col("a"))
      .withColumn("bb", col("tt") - col("ga"))
      // the one float block — identical tree both engines; a > 0 by
      // construction, the b = 0 leg is CASE-guarded
      .withColumn("t", expr(
        """case when bb > 0 then
             0.5e0 * (cast(a as double) / ga)
               * ln(2e0 * a * bb / cast(a * bb + b * ga as double))
             + case when b > 0 then 0.5e0 * (cast(b as double) / bb)
                 * ln(2e0 * b * ga / cast(a * bb + b * ga as double))
               else 0.0 end
           else 0.0 end"""))
    terms.groupBy(col("__g"), col("ga"), col("bb"))
      .agg(count(lit(1)).as("vocab"),
        sum("b").as("sb"),
        collect_list(struct(col("__w"), col("t").as("t"))).as("__l"))
      .withColumn("fold",
        aggregate(transform(array_sort(col("__l")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x))
      .select(col("__g").as("g"), col("ga").as("n_tokens"), col("vocab"),
        when(col("bb") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """cast(floor((fold + 0.5e0 * ln(2e0)
                 * (cast(bb - sb as double) / bb)) * 1e6) as long)"""))
          .as("jsd_micro"))
      .orderBy("g")
  }

  /** q_t_jsd: each document source's unigram distance from the rest of
    * the corpus, in micro-nats (≤ ln 2 ≈ 693147). */
  private val tJsd = Q(
    (s, d) => oneVsRest(Tables.documents(s, d), "source", "text"),
    Some("""WITH toks AS (SELECT source AS g,
                unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS w
              FROM documents),
            cells AS (SELECT g, w, CAST(COUNT(*) AS BIGINT) AS a
              FROM toks GROUP BY 1, 2),
            gw AS (SELECT w, SUM(a) AS cv FROM cells GROUP BY 1),
            perg AS (SELECT g, SUM(a) AS ga FROM cells GROUP BY 1),
            tot AS (SELECT SUM(cv) AS tt FROM gw),
            terms AS (SELECT c.g, c.w, c.a, gl.cv - c.a AS b, p.ga,
                (SELECT tt FROM tot) - p.ga AS bb
              FROM cells c JOIN gw gl USING (w) JOIN perg p ON c.g = p.g),
            tv AS (SELECT g, w, a, b, ga, bb,
                CASE WHEN bb > 0 THEN
                  0.5e0 * (CAST(a AS DOUBLE) / ga)
                    * ln(2e0 * a * bb / CAST(a * bb + b * ga AS DOUBLE))
                  + CASE WHEN b > 0 THEN 0.5e0 * (CAST(b AS DOUBLE) / bb)
                      * ln(2e0 * b * ga / CAST(a * bb + b * ga AS DOUBLE))
                    ELSE 0.0 END
                ELSE 0.0 END AS t
              FROM terms),
            agg AS (SELECT g, ga, bb, CAST(COUNT(*) AS BIGINT) AS vocab,
                SUM(b) AS sb,
                list_reduce(list(t ORDER BY w), (acc, x) -> acc + x) AS fold
              FROM tv GROUP BY 1, 2, 3)
            SELECT g, CAST(ga AS BIGINT) AS n_tokens, vocab,
              CASE WHEN bb = 0 THEN NULL
                ELSE CAST(floor((fold + 0.5e0 * ln(2e0)
                  * (CAST(bb - sb AS DOUBLE) / bb)) * 1e6) AS BIGINT)
                END AS jsd_micro
            FROM agg"""))

  val queries: Map[String, Q] = Map("q_t_jsd" -> tJsd)
}
