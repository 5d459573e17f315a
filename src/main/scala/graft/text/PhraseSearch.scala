package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over positional postings — the phrase rung of
  * the retrieval family ([[Bm25]] ranks bags of terms; a phrase query
  * "slow scan batch" needs POSITIONS): the classic inverted-index plan
  * with per-term position lists and an adjacency join, which is how a
  * search engine answers quoted queries without ever rescanning text.
  *
  * Scale shape: the positional postings build (posexplode) is map-side;
  * the `isin(query terms)` filter prunes postings BEFORE any shuffle,
  * so only |matching postings| rows move; the adjacency constraint is a
  * doc-keyed equi-join on (doc, position+offset) — per-doc work bounded
  * by that doc's occurrences of the query terms, never doc×doc, and
  * docs without every term vanish at the join. Occurrence counting is a
  * doc-keyed map-side-combined agg.
  *
  * Cross-engine determinism: positions and counts are exact integers;
  * the oracle replays the identical positional plan in SQL (not a LIKE
  * shortcut — same joins, same counting). */
object PhraseSearch {

  /** Docs containing the exact token `phrase` (whitespace-tokenized,
    * lower-cased — the [[TextOps.tokens]] convention). Output:
    * (doc id, n_occurrences), matches only. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val post = docs.select(col(idCol),
        posexplode(TextOps.tokens(lower(col(textCol))))
          .as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.map(x => x: Any): _*))
    // anchor on the first term; each later term must sit at pos+i
    val anchor = post.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (w, i)) =>
        acc.join(
          post.filter(col("term") === w)
            .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"))
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  private val phraseTerms = Seq("slow", "scan")

  private val tPhrase = Q(
    (s, d) => phraseSearch(Tables.documents(s, d), "doc_id", "text",
      phraseTerms).orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, lower(text) AS t FROM documents),
            post AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, term
              FROM (SELECT doc_id,
                      unnest(list_filter(string_split(t, ' '),
                        x -> x <> '')) AS term,
                      generate_subscripts(list_filter(string_split(t, ' '),
                        x -> x <> ''), 1) - 1 AS i
                    FROM toks)
              WHERE term IN ('slow', 'scan')),
            m0 AS (SELECT doc_id, pos FROM post WHERE term = 'slow'),
            m1 AS (SELECT m0.doc_id, m0.pos FROM m0
              JOIN post p ON p.doc_id = m0.doc_id AND p.term = 'scan'
                AND p.pos - 1 = m0.pos)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM m1 GROUP BY 1 ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map("q_t_phrase_search" -> tPhrase)
}
