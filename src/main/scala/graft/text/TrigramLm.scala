package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trigram language model with STUPID BACKOFF (Brants et al., "Large
  * Language Models in Machine Translation", EMNLP 2007 §4) — the scoring
  * scheme built for exactly this setting: counts assembled distributively
  * at corpus scale, no discount fitting, no normalization pass:
  *
  *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)           if c(w₁w₂w₃) > 0
  *              = α · S(w₃|w₂)                 else
  *   S(w₃|w₂)   = c(w₂w₃)/c(w₂)               if c(w₂w₃) > 0
  *              = α · (c(w₃)+1)/(N+V)          else  (add-1 unigram floor
  *                                                    keeps unseen words
  *                                                    finite)
  *
  * with α = 0.4 (the paper's constant). Scores are not a normalized
  * distribution — which is irrelevant for the ranking/filtering uses a
  * curation pipeline has — but every level is a deterministic ratio of
  * exact integer counts, so the whole model rides the [[NgramLm]] numeric
  * contract: per-trigram −ln S floored to integer micro-nats immediately
  * (no aggregation-order float), per-doc reduction an exact integer sum,
  * bit-replayable in DuckDB.
  *
  * Scale: three count aggregations keyed on their gram; scoring joins doc
  * trigrams against the three tables on gram keys (shuffle joins at full
  * scale — the trigram table is the big one and arrives sorted by its own
  * key); N and V attach as one broadcast row. Docs with < 3 tokens emit
  * n_trigrams = 0 and a null score.
  */
object TrigramLm {

  import TextOps.tokens

  private def trigrams(df: DataFrame, id: org.apache.spark.sql.Column,
      text: String): DataFrame =
    df.select(id.as("__id"), tokens(col(text)).as("__t"))
      .select(col("__id"), explode(
        when(size(col("__t")) >= 3,
          transform(sequence(lit(0), size(col("__t")) - 3),
            i => struct(element_at(col("__t"), i + 1).as("w1"),
              element_at(col("__t"), i + 2).as("w2"),
              element_at(col("__t"), i + 3).as("w3"))))
          .otherwise(array()
            .cast("array<struct<w1:string,w2:string,w3:string>>")))
        .as("g"))
      .select(col("__id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))

  /** Exact integer core: (idCol, n_trigrams, sb_micro) with sb_micro the
    * doc's Σ floor(−ln S · 1e6) in micro-nats (floor, not round — the
    * cross-engine half-way hazard; see [[NgramLm]]). Every float expression is
    * parenthesized exactly as the oracle SQL writes it. */
  def stupidBackoffMicro(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String,
      alpha: Double = 0.4): DataFrame = {
    val modelToks = model.select(explode(tokens(col(modelTextCol))).as("tok"))
    val uni = modelToks.groupBy("tok").agg(count(lit(1)).as("cw"))
    val tot = modelToks.agg(count(lit(1)).as("n"),
      countDistinct("tok").as("v"))
    val big = NgramLm.bigrams(model, monotonically_increasing_id(),
        modelTextCol)
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val tri = trigrams(model, monotonically_increasing_id(), modelTextCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c"))
    val scored = trigrams(docs, col(idCol), textCol)
      .join(tri.toDF("w1", "w2", "w3", "c123"), Seq("w1", "w2", "w3"), "left")
      .join(big.toDF("w1", "w2", "c12"), Seq("w1", "w2"), "left")
      .join(big.toDF("w2", "w3", "c23"), Seq("w2", "w3"), "left")
      .join(uni.toDF("w2", "c2"), Seq("w2"), "left")
      .join(uni.toDF("w3", "c3"), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("s",
        when(col("c123").isNotNull, col("c123") / col("c12"))
          .when(col("c23").isNotNull,
            lit(alpha) * (col("c23") / col("c2")))
          .otherwise(lit(alpha) * (lit(alpha) *
            ((coalesce(col("c3"), lit(0L)) + lit(1.0)) /
              (col("n") + col("v"))))))
      .withColumn("sb_micro", floor(-log(col("s")) * 1e6).cast("long"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_trigrams"), sum("sb_micro").as("sb_micro"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("sb_micro"))
  }

  /** Documents scored against the even-doc_id half of the corpus as the
    * model — a PROPER train/score split, so all three backoff levels are
    * live in the hash (self-scoring would always hit the trigram level). */
  private val tTrigram = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      stupidBackoffMicro(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "text")
        .orderBy("doc_id")
    },
    Some("""WITH m AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
            mt AS (SELECT unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS tok FROM m),
            uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cw
                    FROM mt GROUP BY tok),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM mt),
            mdb AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
                   FROM m),
            mbg AS (SELECT t[CAST(i AS INT) + 1] AS x,
                     t[CAST(i AS INT) + 2] AS y
                   FROM mdb, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
                   FROM mbg GROUP BY x, y),
            mtg AS (SELECT t[CAST(i AS INT) + 1] AS w1,
                     t[CAST(i AS INT) + 2] AS w2, t[CAST(i AS INT) + 3] AS w3
                   FROM mdb, LATERAL (SELECT unnest(range(len(t) - 2)) AS i) ii),
            tc AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c
                   FROM mtg GROUP BY w1, w2, w3),
            db AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
                   FROM documents),
            tg AS (SELECT doc_id,
                     t[CAST(i AS INT) + 1] AS w1, t[CAST(i AS INT) + 2] AS w2,
                     t[CAST(i AS INT) + 3] AS w3
                   FROM db, LATERAL (SELECT unnest(range(len(t) - 2)) AS i) ii),
            sc AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                     CAST(SUM(CAST(FLOOR(-ln(
                         CASE WHEN t3.c IS NOT NULL
                              THEN CAST(t3.c AS DOUBLE) / CAST(b12.c AS DOUBLE)
                              WHEN b23.c IS NOT NULL
                              THEN 0.4 * (CAST(b23.c AS DOUBLE)
                                          / CAST(u2.cw AS DOUBLE))
                              ELSE 0.4 * (0.4 *
                                ((CAST(COALESCE(u3.cw, 0) AS DOUBLE) + 1.0)
                                 / CAST(tt.n + tt.v AS DOUBLE)))
                         END) * 1000000.0) AS BIGINT)) AS BIGINT) AS sb_micro
                   FROM tg g
                   LEFT JOIN tc t3 ON g.w1 = t3.w1 AND g.w2 = t3.w2
                                  AND g.w3 = t3.w3
                   LEFT JOIN bc b12 ON g.w1 = b12.x AND g.w2 = b12.y
                   LEFT JOIN bc b23 ON g.w2 = b23.x AND g.w3 = b23.y
                   LEFT JOIN uni u2 ON g.w2 = u2.tok
                   LEFT JOIN uni u3 ON g.w3 = u3.tok
                   CROSS JOIN tot tt
                   GROUP BY g.doc_id)
            SELECT d.doc_id AS doc_id,
                   COALESCE(s.n_trigrams, 0) AS n_trigrams,
                   s.sb_micro
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN sc s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_t_trigram_sb" -> tTrigram)
}
