package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rapid Automatic Keyword Extraction — Rose,
  * Engel, Cramer & Cowley 2010): candidate phrases are the maximal runs
  * of content words between stopwords/punctuation; each word scores
  * deg/freq (deg = total length of the phrases it appears in, freq =
  * its occurrence count) and a phrase scores the sum of its words —
  * rewarding longer multi-word terms whose words co-occur. The
  * corpus-level keyword table next to [[TextOps.tfidfTopTerms]]
  * (tf-idf profiles per doc; RAKE surfaces the corpus's multi-word
  * terminology — the vocabulary a tokenizer or a topic label set
  * should cover).
  *
  * Scale shape: phrase extraction is a pure map-side regex chain
  * (punctuation → delimiter, stopword → delimiter, split); freq/deg
  * are word-keyed map-side-combined aggs; scoring joins the word table
  * back onto DISTINCT phrases (phrase-keyed, not occurrence-keyed);
  * the final cut is a global TakeOrdered over phrase rows. Nothing
  * shuffles more than once on any key.
  *
  * Cross-engine determinism: deg and freq are exact integers; each
  * word's score enters as the FLOORED micro-ratio (deg·1e6 div freq —
  * integer division), so phrase scores are exact integer sums,
  * order-free, with phrase-string tie-breaks. The documented deviation
  * from float RAKE: floor-per-word (≤1 micro-unit per word) — the
  * price of bit-replayability. */
object Rake {

  /** The delimiter stopword set (closed-class English function words,
    * matching the synthetic corpus's fillers). */
  val stopRe: String =
    "\\b(a|an|the|and|or|of|in|to|is|on|for|with|as|by|at|it)\\b"

  /** Top-k corpus keywords: (rank, phrase, n_words, occurrences,
    * score_micro). */
  def topKeywords(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val ph = docs
      .select(explode(split(
        regexp_replace(regexp_replace(lower(col(textCol)),
          "[^a-z ]+", "|"), stopRe, "|"), "\\|")).as("p0"))
      .select(trim(regexp_replace(col("p0"), " +", " ")).as("phrase"))
      .filter(col("phrase") =!= "")
    val w = ph.select(col("phrase"),
        explode(split(col("phrase"), " ")).as("word"),
        size(split(col("phrase"), " ")).cast("long").as("nw"))
    val wordScore = w.groupBy("word")
      .agg(count(lit(1)).as("freq"), sum("nw").as("deg"))
      .select(col("word"), expr("(deg * 1000000L) div freq").as("ws"))
    val dpw = ph.select(col("phrase")).distinct()
      .select(col("phrase"),
        explode(split(col("phrase"), " ")).as("word"))
    val scored = dpw.join(wordScore, Seq("word"))
      .groupBy("phrase")
      .agg(sum("ws").as("score_micro"), count(lit(1)).as("n_words"))
    val occ = ph.groupBy("phrase").agg(count(lit(1)).as("occurrences"))
    scored.join(occ, Seq("phrase"))
      .orderBy(col("score_micro").desc, col("phrase")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("phrase"))).cast("long"))
      .select(col("rank"), col("phrase"), col("n_words"),
        col("occurrences"), col("score_micro"))
  }

  private val tRake = Q(
    (s, d) => topKeywords(Tables.documents(s, d), "text", 20)
      .orderBy("rank"),
    Some(s"""WITH seg AS (SELECT regexp_replace(regexp_replace(
                  lower(text), '[^a-z ]+', '|', 'g'),
                  '$stopRe', '|', 'g') AS t
              FROM documents),
            ph AS (SELECT phrase FROM (
                SELECT trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
                FROM (SELECT unnest(string_split(t, '|')) AS p FROM seg))
              WHERE phrase <> ''),
            w AS (SELECT phrase,
                unnest(string_split(phrase, ' ')) AS word,
                CAST(len(string_split(phrase, ' ')) AS BIGINT) AS nw
              FROM ph),
            ws AS (SELECT word,
                (CAST(SUM(nw) AS BIGINT) * 1000000)
                  // CAST(COUNT(*) AS BIGINT) AS ws
              FROM w GROUP BY 1),
            dpw AS (SELECT phrase,
                unnest(string_split(phrase, ' ')) AS word
              FROM (SELECT DISTINCT phrase FROM ph)),
            scored AS (SELECT phrase,
                CAST(SUM(ws.ws) AS BIGINT) AS score_micro,
                CAST(COUNT(*) AS BIGINT) AS n_words
              FROM dpw JOIN ws USING (word) GROUP BY 1),
            occ AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS occurrences
              FROM ph GROUP BY 1),
            top AS (SELECT scored.phrase, score_micro, n_words, occurrences,
                row_number() OVER (ORDER BY score_micro DESC, scored.phrase)
                  AS rank
              FROM scored JOIN occ ON scored.phrase = occ.phrase)
            SELECT CAST(rank AS BIGINT) AS rank, phrase, n_words,
                   occurrences, score_micro
            FROM top WHERE rank <= 20 ORDER BY rank"""))

  val queries: Map[String, Q] = Map("q_t_rake" -> tRake)
}
