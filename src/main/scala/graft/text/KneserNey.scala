package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP 1995;
  * Chen & Goodman, Computer Speech & Language 1999) — THE standard LM
  * smoothing for data-quality filtering, completing the engine's LM
  * ladder: add-k (q_t_perplexity) over-rewards frequent unigrams,
  * stupid backoff (q_t_trigram_sb) is unnormalized, Dirichlet QL
  * (q_t_ql_dirichlet) is retrieval-tuned; KN's continuation
  * probability counts CONTEXTS, not occurrences — "francisco" may be
  * frequent but follows only "san", so it backs off near zero (the
  * classic KN signature, spec-pinned).
  *
  * With discount D = 3/4 (Chen–Goodman's canonical 0.75 — RATIONAL,
  * which is what makes this exact):
  *   P(y|x) = max(c(xy)−¾, 0)/c(x) + (¾·N1+(x·)/c(x)) · P_cont(y)
  *   P_cont(y) = (N1+(·y) + 1) / (NN + V + 1)
  * (the +1/+V+1 continuation smoothing reserves unk mass — a
  * documented practical completion so unseen words score finitely).
  * Clearing denominators: num = max(4c(xy)−3, 0)·CN + 3·N1+(x·)·(N1+(·y)+1),
  * den = 4·c(x)·CN with CN = NN+V+1 — exact integers; an unseen
  * context backs off entirely to P_cont. The ONLY float per bigram is
  * one −ln of the exact integer ratio, FLOORED immediately to
  * micro-nats (the [[NgramLm]] per-term floor: the per-doc reduction
  * is then an order-free exact integer sum).
  *
  * Scale shape: ALL model statistics derive from the single bigram-
  * counts aggregation (context totals, forward/backward type counts —
  * no second corpus pass); scoring is bigram/unigram-keyed joins with
  * the 1-row (NN, V) frame broadcast; one hash aggregation per doc. */
object KneserNey {

  /** The per-bigram KN score frame: (__id, x, y, nlp_micro) — one row
    * per document bigram, exact integer micro-nats. */
  private[text] def perBigram(docs: DataFrame, idCol: String,
      textCol: String, model: DataFrame, modelTextCol: String): DataFrame = {
    val bc = NgramLm.bigrams(model, monotonically_increasing_id(),
        modelTextCol)
      .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
    val ctx = bc.groupBy("x")
      .agg(sum("cxy").as("cx"), count(lit(1)).as("n1f"))
    val cont = bc.groupBy("y").agg(count(lit(1)).as("n1b"))
    val totals = bc.agg(count(lit(1)).as("nn"))
      .crossJoin(model.select(explode(TextOps.tokens(col(modelTextCol)))
        .as("tok")).agg(countDistinct("tok").as("v")))
    NgramLm.bigrams(docs, col(idCol), textCol)
      .join(bc, Seq("x", "y"), "left")
      .join(ctx, Seq("x"), "left")
      .join(cont, Seq("y"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("nlp_micro", expr(
        """cast(floor(-ln(
             cast(case when cx is null then coalesce(n1b, 0L) + 1L
               else greatest(4L * coalesce(cxy, 0L) - 3L, 0L)
                      * (nn + v + 1L)
                    + 3L * n1f * (coalesce(n1b, 0L) + 1L) end as double)
             / cast(case when cx is null then nn + v + 1L
                 else 4L * cx * (nn + v + 1L) end as double))
           * 1000000.0) as bigint)"""))
      .select(col("__id"), col("x"), col("y"), col("nlp_micro"))
  }

  /** Per-document KN negative log-likelihood against a model corpus:
    * (idCol, n_bigrams, nlp_micro) — exact integer micro-nats summed
    * per doc, null for docs with < 2 tokens. */
  def negLogMicro(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String): DataFrame = {
    val scored = perBigram(docs, idCol, textCol, model, modelTextCol)
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nlp_micro").as("nlp_micro"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nlp_micro"))
  }

  /** Min-k% surprisal (Shi et al., ICLR 2024 "Min-K% Prob" — the
    * pretraining-data membership/memorization probe): per document,
    * the mean of the k% LOWEST-probability (= highest-surprisal)
    * bigrams. A document whose WORST tokens are still unsurprising is
    * memorized/duplicated material; scoring only the tail makes the
    * probe robust to the easy bulk that drags a full-document mean.
    * k = 20%: k_top = ceil(n/5) = (n+4) div 5 — exact integers; the
    * top-tail SUM is tie-insensitive (equal values sum identically
    * whichever side of the cut they land). Output: (idCol, n_bigrams,
    * k_top, mink_mean_micro = Σtail div k_top). */
  def minKSurprisal(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pb = perBigram(docs, idCol, textCol, model, modelTextCol)
      .withColumn("rn", row_number().over(
        Window.partitionBy("__id")
          .orderBy(col("nlp_micro").desc, col("x"), col("y"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("__id")))
    val agg = pb.filter(col("rn") <= expr("(n + 4L) div 5L"))
      .groupBy("__id")
      .agg(max("n").as("n_bigrams"), count(lit(1)).as("k_top"),
        sum("nlp_micro").as("tailsum"))
    docs.select(col(idCol))
      .join(agg.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("k_top"), lit(0L)).as("k_top"),
        expr("tailsum div k_top").as("mink_mean_micro"))
  }

  /** Shared oracle chain: model statistics + the per-bigram `pb`
    * (doc_id, x, y, nlp) frame — both registered queries tail it. */
  private def knPbSql: String =
    """WITH mdb AS (SELECT
                list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
            mbg AS (SELECT t[CAST(i AS INT) + 1] AS x,
                t[CAST(i AS INT) + 2] AS y
              FROM mdb, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
              FROM mbg GROUP BY 1, 2),
            ctx AS (SELECT x, SUM(cxy) AS cx,
                CAST(COUNT(*) AS BIGINT) AS n1f FROM bc GROUP BY 1),
            cont AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n1b
              FROM bc GROUP BY 1),
            tt AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bc) AS nn,
                (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM
                  (SELECT unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS tok FROM documents)) AS v),
            db AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
            bg AS (SELECT doc_id, t[CAST(i AS INT) + 1] AS x,
                t[CAST(i AS INT) + 2] AS y
              FROM db, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            pb AS (SELECT g.doc_id, g.x, g.y,
                CAST(FLOOR(-ln(
                    CAST(CASE WHEN c2.cx IS NULL
                      THEN COALESCE(c3.n1b, 0) + 1
                      ELSE greatest(4 * COALESCE(c1.cxy, 0) - 3, 0)
                             * (tt.nn + tt.v + 1)
                           + 3 * c2.n1f * (COALESCE(c3.n1b, 0) + 1) END
                      AS DOUBLE)
                    / CAST(CASE WHEN c2.cx IS NULL THEN tt.nn + tt.v + 1
                        ELSE 4 * c2.cx * (tt.nn + tt.v + 1) END
                      AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS nlp
              FROM bg g
              LEFT JOIN bc c1 ON g.x = c1.x AND g.y = c1.y
              LEFT JOIN ctx c2 ON g.x = c2.x
              LEFT JOIN cont c3 ON g.y = c3.y
              CROSS JOIN tt)"""

  /** q_t_kneser_ney: the corpus self-scored under its own KN bigram
    * model — the filter-grade LM score next to q_t_perplexity's add-k
    * baseline on identical dataflow. */
  private val tKn = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      negLogMicro(docs, "doc_id", "text", docs, "text").orderBy("doc_id")
    },
    Some(knPbSql + """,
            sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                CAST(SUM(nlp) AS BIGINT) AS nlp_micro
              FROM pb GROUP BY 1)
            SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
              s.nlp_micro
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN sc s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id"""))

  /** q_t_mink: the min-20% surprisal membership probe — low tail-mean
    * = even the document's WORST bigrams are unsurprising under the
    * corpus model (memorized/duplicated material). */
  private val tMinK = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      minKSurprisal(docs, "doc_id", "text", docs, "text").orderBy("doc_id")
    },
    Some(knPbSql + """,
            rk AS (SELECT doc_id, nlp, row_number() OVER
                  (PARTITION BY doc_id ORDER BY nlp DESC, x, y) AS rn,
                COUNT(*) OVER (PARTITION BY doc_id) AS n
              FROM pb),
            agg AS (SELECT doc_id,
                CAST(MAX(n) AS BIGINT) AS n_bigrams,
                CAST(COUNT(*) AS BIGINT) AS k_top,
                CAST(SUM(nlp) AS BIGINT) AS tailsum
              FROM rk WHERE rn <= (n + 4) // 5 GROUP BY 1)
            SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
              COALESCE(a.k_top, 0) AS k_top,
              CAST(a.tailsum // a.k_top AS BIGINT) AS mink_mean_micro
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN agg a ON d.doc_id = a.doc_id
            ORDER BY d.doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_t_kneser_ney" -> tKn,
    "q_t_mink" -> tMinK)
}
