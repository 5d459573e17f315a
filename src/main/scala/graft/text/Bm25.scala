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
  * Cross-engine determinism (the q_m38_ks integer-cross-multiplication
  * convention; see stats/TwoSample.scala): the ONLY float step is the
  * per-term idf, floored once to integer micro-nats over the
  * config-sized term table (`floor` of a double is the binary-value
  * floor in both engines, unlike `round`, whose Spark decimal-repr
  * HALF_UP vs DuckDB C-level semantics diverge — the round-11
  * q_t_bm25 hash flip happened exactly there, a contribution landing
  * 4e-4 micro from the .5 boundary). The tf/length saturation is then
  * pure integer arithmetic: with Σdl the exact corpus token count and
  * n the doc count, `c = (idf_micro·tf·22·Σdl) div
  * (10·tf·Σdl + 3·Σdl + 9·dl·n)` — algebraically `idf·tf·2.2 /
  * (tf + 1.2·(0.25 + 0.75·dl/avgdl))` with numerator and denominator
  * multiplied by `10·Σdl`. All operands non-negative, so Spark's
  * truncating `div` and DuckDB's flooring `//` agree; the
  * cross-multiplication runs in decimal(38,0) (DuckDB: HUGEINT) so it
  * cannot overflow at any corpus size. Scores are exact integers, the
  * per-doc sum is order-free, ties break on doc_id. */
object Bm25 {

  /** Top-k docs per query. `queryTerms`: (query_id, term) pairs —
    * config-sized (a query workload, not data). Output: (query_id, rank,
    * doc id, score_micro) with score_micro = BM25 in integer
    * micro-units. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bm25TopKFromTerms(df, idCol, textCol,
      queryTerms.toDF("query_id", "term"), k,
      literalTerms = Some(queryTerms.map(_._2).distinct))
  }

  /** [[bm25TopK]] with the query workload as a DATAFRAME
    * (query_id, term) — the entry point compositions with
    * data-derived queries use ([[PseudoRelevance]] expansion terms).
    * `literalTerms`: when the term set is known at plan time, the
    * postings prune is a literal `isin` (pushable to the scan);
    * otherwise it is a broadcast semi-join on the distinct query terms
    * — still config-sized, still BEFORE the (doc, term) aggregation. */
  def bm25TopKFromTerms(df: DataFrame, idCol: String, textCol: String,
      qdf: DataFrame, k: Int,
      literalTerms: Option[Seq[String]] = None): DataFrame = {
    val toks = df.select(col(idCol),
      TextOps.tokens(lower(col(textCol))).as("__ts"))
    val dl = toks.select(col(idCol),
      size(col("__ts")).cast("long").as("__dl"))
    // one-row corpus stats frame; exact integers: doc count and the
    // total token count (Σdl) — the avgdl denominator is carried as the
    // (n, Σdl) pair so the saturation stays integer-pure downstream
    val stats = dl.agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
    val rawPost = toks.select(col(idCol), explode(col("__ts")).as("term"))
    val pruned = literalTerms match {
      case Some(terms) =>
        rawPost.filter(col("term").isin(terms.map(x => x: Any): _*))
      case None => rawPost.join(
        broadcast(qdf.select("term").distinct()), Seq("term"), "left_semi")
    }
    val post = pruned
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // the single float step: idf floored to micro-nats per TERM (a
    // config-sized, auditable table) — floor, never round (see scaladoc)
    val idf = post.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), floor(log(lit(1.0) +
        (col("__n").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * lit(1e6)).as("__idfm"))
    val scored = post
      .join(broadcast(qdf), "term")
      .join(broadcast(idf), "term")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      // integer cross-multiplication in decimal(38,0); operands are all
      // non-negative so truncating div == DuckDB's flooring `//`
      .select(col("query_id"), col(idCol),
        expr("""cast((cast(__idfm as decimal(38,0)) * tf * 22 * __sumdl)
                div (cast(tf as decimal(38,0)) * 10 * __sumdl
                     + cast(__sumdl as decimal(38,0)) * 3
                     + cast(__dl as decimal(38,0)) * 9 * __n)
                as long)""").as("__c"))
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

  /** The scoring half of the oracle chain (postings prune → idf →
    * integer saturation → per-doc sum → rank), parameterized by a CTE
    * name suffix and the query CTE to score against — assumes `toks`,
    * `dl`, `stats` are in scope. Shared by the base ranked chain and
    * the [[PseudoRelevance]] second pass. */
  def oracleScoreFrom(sfx: String, qCte: String): String =
    s"""post$sfx AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
              WHERE term IN (SELECT term FROM $qCte) GROUP BY 1, 2),
            idf$sfx AS (SELECT term, CAST(floor(ln(1.0 +
                (CAST((SELECT n FROM stats) AS DOUBLE)
                   - CAST(COUNT(*) AS DOUBLE) + 0.5)
                / (CAST(COUNT(*) AS DOUBLE) + 0.5)) * 1000000.0)
                AS BIGINT) AS idf_micro
              FROM post$sfx GROUP BY term),
            contrib$sfx AS (SELECT qq.query_id, post$sfx.doc_id,
                CAST((CAST(idf$sfx.idf_micro AS HUGEINT) * post$sfx.tf * 22
                      * (SELECT sumdl FROM stats))
                  // (CAST(post$sfx.tf AS HUGEINT) * 10
                        * (SELECT sumdl FROM stats)
                      + CAST((SELECT sumdl FROM stats) AS HUGEINT) * 3
                      + CAST(dl.dl AS HUGEINT) * 9 * (SELECT n FROM stats))
                  AS BIGINT) AS c
              FROM $qCte qq JOIN post$sfx ON qq.term = post$sfx.term
              JOIN idf$sfx ON idf$sfx.term = qq.term
              JOIN dl ON dl.doc_id = post$sfx.doc_id),
            scored$sfx AS (SELECT query_id, doc_id, SUM(c) AS score_micro
              FROM contrib$sfx GROUP BY 1, 2),
            ranked$sfx AS (SELECT query_id, doc_id, score_micro,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score_micro DESC, doc_id) AS rank
              FROM scored$sfx)"""

  /** DuckDB oracle CTE chain for [[bm25TopK]], ending in
    * `ranked(query_id, doc_id, score_micro, rank)` (unbounded rank —
    * consumers append their own `rank <= k` cut). A def, not a val:
    * shared SQL fragments as vals hit object-init-order nulls. */
  def oracleRankedCtes(queryValues: String): String = s"""toks AS (
              SELECT doc_id, list_filter(string_split(lower(text), ' '),
                  x -> x <> '') AS ts
              FROM documents),
            dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
            stats AS (SELECT COUNT(*) AS n,
                CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
            q(query_id, term) AS (VALUES $queryValues),
            post AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
              WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
            idf AS (SELECT term, CAST(floor(ln(1.0 +
                (CAST((SELECT n FROM stats) AS DOUBLE)
                   - CAST(COUNT(*) AS DOUBLE) + 0.5)
                / (CAST(COUNT(*) AS DOUBLE) + 0.5)) * 1000000.0)
                AS BIGINT) AS idf_micro
              FROM post GROUP BY term),
            contrib AS (SELECT q.query_id, post.doc_id,
                CAST((CAST(idf.idf_micro AS HUGEINT) * post.tf * 22
                      * (SELECT sumdl FROM stats))
                  // (CAST(post.tf AS HUGEINT) * 10
                        * (SELECT sumdl FROM stats)
                      + CAST((SELECT sumdl FROM stats) AS HUGEINT) * 3
                      + CAST(dl.dl AS HUGEINT) * 9 * (SELECT n FROM stats))
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
                   CAST(score_micro AS BIGINT) AS score_micro
            FROM ranked WHERE rank <= 10
            ORDER BY query_id, rank"""))

  val queries: Map[String, Q] = Map("q_t_bm25" -> tBm25)
}
