package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson–Spärck Jones probabilistic ranking;
  * the Lucene-default `k1=1.2, b=0.75` parameterization with the
  * `ln(1 + (N-df+0.5)/(df+0.5))` non-negative idf). The missing retrieval
  * rung next to [[TextOps.tfidfTopTerms]]: tf-idf profiles documents,
  * BM25 answers QUERIES — the standard first-stage ranker for corpus
  * search, near-dup triage, and RAG candidate generation.
  *
  * Scale shape (the inverted-index plan, declaratively): the token
  * explode is map-side and the `isin(query terms)` filter prunes the
  * postings BEFORE the (doc,term) aggregation, so the only doc-scale
  * shuffle carries just postings that match some query term. Corpus
  * stats (N, avgdl), per-term idf and the query table are all
  * config-sized broadcasts; the per-query ranking runs through the
  * native bounded-heap [[graft.plans.GroupedTopK]] operator, so only
  * k·partitions candidates per query reach the final exchange. At 100 TB
  * the postings build is the one big pass and everything downstream is
  * |matching postings|-sized.
  *
  * Cross-engine determinism: each per-term contribution is computed with
  * an identical literal expression tree in both engines, rounded to
  * integer MICRO-UNITS (the [[Dsir]] micro-nat convention,
  * `round(c*1e6)` as bigint) before the per-doc sum — so scores are
  * exact integers, the sum is order-free, and ranking ties break on
  * doc_id with no float-comparison hazard. */
object Bm25 {

  /** Top-k docs per query. `queryTerms`: (query_id, term) pairs —
    * config-sized (a query workload, not data). Output: (query_id, rank,
    * doc id, score_micro) with score_micro = BM25 in integer
    * micro-units. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val terms = queryTerms.map(_._2).distinct
    val qdf = queryTerms.toDF("query_id", "term")
    val toks = df.select(col(idCol),
      TextOps.tokens(lower(col(textCol))).as("__ts"))
    val dl = toks.select(col(idCol),
      size(col("__ts")).cast("double").as("__dl"))
    // one-row corpus stats frame; exact: doc lengths are integer-valued
    // doubles, so avg = exact-sum / n is bit-stable across partitionings
    val stats = dl.agg(count(lit(1)).cast("double").as("__n"),
      avg("__dl").as("__avgdl"))
    val post = toks.select(col(idCol), explode(col("__ts")).as("term"))
      .filter(col("term").isin(terms.map(x => x: Any): _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = post.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), log(lit(1.0) +
        (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        .as("idf"))
    val scored = post
      .join(broadcast(qdf), "term")
      .join(broadcast(idf), "term")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      // literal 2.2 / 1.2 / 0.25 / 0.75 and this association order are
      // mirrored character-for-character in the oracle SQL — double ops
      // are IEEE-exact, so identical trees give identical bits
      .select(col("query_id"), col(idCol),
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("__dl") / col("__avgdl"))) * lit(1e6))
          .cast("long").as("__c"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("__c").as("score_micro"))
    val top = graft.plans.GroupedTopK.topK(scored, Seq("query_id"),
      Seq("score_micro" -> true, idCol -> false), k)
    // rank labels over the already-bounded q·k rows — cheap by then
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col(idCol))).cast("long"))
      .select(col("query_id"), col("rank"), col(idCol), col("score_micro"))
  }

  /** The registered retrieval workload: three multi-term queries over
    * the corpus vocabulary, mixing high-df and mid-df terms. Shared with
    * the [[graft.sim.HybridRrf]] fusion operator (its lexical leg). */
  val queryWorkload: Seq[(Int, String)] = Seq(
    0 -> "join", 0 -> "merge",
    1 -> "vector", 1 -> "scan", 1 -> "batch",
    2 -> "slow", 2 -> "filter")

  /** SQL VALUES literal for [[queryWorkload]] — the oracle twin. */
  def workloadValues: String =
    queryWorkload.map { case (q, t) => s"($q,'$t')" }.mkString(",")

  /** DuckDB oracle CTE chain for [[bm25TopK]], ending in
    * `ranked(query_id, doc_id, score_micro, rank)` (unbounded rank —
    * consumers append their own `rank <= k` cut). A def, not a val:
    * shared SQL fragments as vals hit object-init-order nulls. */
  def oracleRankedCtes(queryValues: String): String = s"""toks AS (
              SELECT doc_id, list_filter(string_split(lower(text), ' '),
                  x -> x <> '') AS ts
              FROM documents),
            dl AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl FROM toks),
            stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                AVG(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES $queryValues),
            post AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
              FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
              WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
            idf AS (SELECT term, ln(1.0 +
                ((SELECT n FROM stats) - CAST(COUNT(*) AS DOUBLE) + 0.5)
                / (CAST(COUNT(*) AS DOUBLE) + 0.5)) AS idf
              FROM post GROUP BY term),
            contrib AS (SELECT q.query_id, post.doc_id,
                CAST(round(idf.idf * (post.tf * 2.2) /
                  (post.tf + 1.2 * (0.25 +
                    0.75 * dl.dl / (SELECT avgdl FROM stats))) * 1000000.0)
                  AS BIGINT) AS c
              FROM q JOIN post ON q.term = post.term
              JOIN idf ON idf.term = q.term
              JOIN dl ON dl.doc_id = post.doc_id),
            scored AS (SELECT query_id, doc_id, SUM(c) AS score_micro
              FROM contrib GROUP BY 1, 2),
            ranked AS (SELECT query_id, doc_id, score_micro,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score_micro DESC, doc_id) AS rank
              FROM scored)"""

  private val tBm25 = Q(
    (s, d) => bm25TopK(Tables.documents(s, d), "doc_id", "text",
        queryWorkload, 10)
      .orderBy("query_id", "rank"),
    Some(s"""WITH ${oracleRankedCtes(workloadValues)}
            SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
                   score_micro
            FROM ranked WHERE rank <= 10
            ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_t_bm25" -> tBm25)
}
