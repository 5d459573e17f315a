package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary coverage estimation per source — Chao1 species richness
  * (Chao, Scand. J. Stat. 1984, bias-corrected form) plus the
  * Good–Turing unseen-mass estimate (Good, Biometrika 1953): from the
  * frequency-of-frequencies alone (V observed types, f1 singletons, f2
  * doubletons, N tokens), estimate how many types the source REALLY
  * has (chao1 = V + f1(f1−1)/(2(f2+1))) and the probability the next
  * token is a new type (f1/N) — the numbers a tokenizer-training or
  * crawl-budget decision needs: a source whose unseen mass is still
  * 20% is nowhere near vocabulary-sampled.
  *
  * Pure integers end-to-end (rule 1): counts, frequency-of-frequency
  * counts, and both estimates are single integral divisions — the
  * bias-corrected Chao1 keeps f2 = 0 finite with no special case.
  *
  * Scale shape: ONE (group, term) count pass (map-side combined), ONE
  * (group, frequency) roll-up over vocabulary cells, then one row per
  * group — the same two-level cells cascade as the MWU/KS family. */
object VocabCoverage {

  /** Per-group coverage: (group, n_tokens, v_types, f1, f2,
    * chao1_milli, unseen_micro). */
  def vocabCoverage(docs: DataFrame, grpCol: String, textCol: String)
      : DataFrame = {
    val freq = docs.select(col(grpCol).as("group"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy("group", "term").agg(count(lit(1)).as("f"))
    freq.groupBy("group").agg(
        sum("f").as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("group"), col("n_tokens"), col("v_types"), col("f1"),
        col("f2"),
        expr("""v_types * 1000L
                + (f1 * (f1 - 1) * 1000L) div ((f2 + 1) * 2)""")
          .as("chao1_milli"),
        expr("(f1 * 1000000L) div n_tokens").as("unseen_micro"))
  }

  /** q_t_vocab_coverage: per-source type richness and unseen mass. */
  private val tVocab = Q(
    (s, d) => vocabCoverage(Tables.documents(s, d), "source", "text")
      .withColumnRenamed("group", "source")
      .orderBy("source"),
    Some("""WITH freq AS (SELECT source, term,
                CAST(COUNT(*) AS BIGINT) AS f
              FROM (SELECT source,
                      unnest(list_filter(string_split(lower(text), ' '),
                        x -> x <> '')) AS term
                    FROM documents)
              GROUP BY 1, 2)
            SELECT source,
              CAST(SUM(f) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS v_types,
              CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
              CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
              CAST(COUNT(*) * 1000
                + (SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                   * (SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) - 1) * 1000)
                  // ((SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) + 1) * 2)
                AS BIGINT) AS chao1_milli,
              CAST((SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000000)
                // SUM(f) AS BIGINT) AS unseen_micro
            FROM freq GROUP BY source ORDER BY source"""))

  val queries: Map[String, Q] = Map("q_t_vocab_coverage" -> tVocab)
}
