package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining (Church & Hanks, CL 1990) — the phrase-mining
  * pass of a corpus pipeline: adjacent token pairs whose co-occurrence
  * beats the independence baseline, `pmi = ln(P(x,y) / (P(x)·P(y)))`
  * with P(x,y) over bigram positions and P(·) over unigram positions.
  * Feeds tokenizer vocab induction (multi-word units), stopword-phrase
  * boilerplate lists, and query expansion; the min-count floor kills
  * the classic PMI pathology (hapax pairs scoring highest).
  *
  * Scale shape: two gram-keyed aggregations (bigram counts, unigram
  * counts — the same shuffles [[NgramLm]] pays, map-side combined),
  * one vocabulary-sized join to attach the marginals, and a global
  * top-k that plans as TakeOrdered (per-partition heaps, never a
  * single-partition sort). Corpus totals ride a one-row broadcast.
  *
  * Cross-engine determinism: all counts are exact integers; the single
  * `ln` runs on an identical literal expression tree in both engines
  * (the double products inside may round — identically, since IEEE ops
  * are deterministic given the same tree), and the score is FLOORED to
  * integer micro-nats — floor is the binary-value floor in both
  * engines, where `round`'s half-way semantics diverge (Spark HALF_UP
  * on the decimal repr vs DuckDB on the binary value; the round-11
  * q_t_bm25 flip). Ordering ties break on the bigram itself, never on
  * float compares. */
object Collocations {

  /** Top-k adjacent-pair collocations by PMI. Output: (rank, x, y,
    * c_xy, pmi_micro), rank 1..k by (pmi desc, x, y); pairs below
    * `minCount` co-occurrences are dropped before scoring. */
  def pmiTopK(df: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val uni = df.select(explode(TextOps.tokens(lower(col(textCol))))
      .as("tok"))
    val ucnt = uni.groupBy("tok").agg(count(lit(1)).as("c1"))
    val bcnt = NgramLm.bigrams(
        df.select(col(idCol), lower(col(textCol)).as("__lt")),
        col(idCol), "__lt")
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    // corpus totals: exact integer counts in one broadcast row
    val totals = uni.agg(count(lit(1)).as("nt"))
      .crossJoin(bcntTotal(df, idCol, textCol))
    val scored = bcnt
      .join(ucnt.select(col("tok").as("x"), col("c1").as("cx")), "x")
      .join(ucnt.select(col("tok").as("y"), col("c1").as("cy")), "y")
      .crossJoin(broadcast(totals))
      .select(col("x"), col("y"), col("c_xy"),
        floor(log((col("c_xy").cast("double") * col("nt") * col("nt")) /
          (col("cx").cast("double") * col("cy") * col("nb"))) * lit(1e6))
          .cast("long").as("pmi_micro"))
    scored.orderBy(col("pmi_micro").desc, col("x"), col("y")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi_micro").desc, col("x"), col("y"))).cast("long"))
      .select(col("rank"), col("x"), col("y"), col("c_xy"),
        col("pmi_micro"))
  }

  /** Total bigram positions, Σ max(len−1, 0) — one scalar reduce. */
  private def bcntTotal(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(greatest(
        size(TextOps.tokens(lower(col(textCol)))) - 1, lit(0))
        .cast("long").as("__nb1"))
      .agg(sum("__nb1").as("nb"))

  private val tPmi = Q(
    (s, d) => pmiTopK(Tables.documents(s, d), "doc_id", "text", 5, 50)
      .orderBy("rank"),
    Some("""WITH toks AS (
              SELECT doc_id, list_filter(string_split(lower(text), ' '),
                  x -> x <> '') AS ts
              FROM documents),
            uni AS (SELECT unnest(ts) AS tok FROM toks),
            ucnt AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY 1),
            nt AS (SELECT COUNT(*) AS nt FROM uni),
            nb AS (SELECT SUM(GREATEST(len(ts) - 1, 0)) AS nb FROM toks),
            bcnt AS (SELECT x, y, COUNT(*) AS c_xy FROM (
                SELECT ts[CAST(i AS INT)] AS x,
                       ts[CAST(i AS INT) + 1] AS y
                FROM toks, LATERAL (SELECT unnest(range(1, len(ts)))
                  AS i) ii)
              GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            scored AS (SELECT b.x, b.y, b.c_xy,
                CAST(floor(ln((CAST(b.c_xy AS DOUBLE)
                    * (SELECT nt FROM nt) * (SELECT nt FROM nt)) /
                  (CAST(cx.c1 AS DOUBLE) * cy.c1 * (SELECT nb FROM nb)))
                  * 1000000.0) AS BIGINT) AS pmi_micro
              FROM bcnt b
              JOIN ucnt cx ON cx.tok = b.x
              JOIN ucnt cy ON cy.tok = b.y),
            ranked AS (SELECT *, row_number() OVER (
                ORDER BY pmi_micro DESC, x, y) AS rank FROM scored)
            SELECT CAST(rank AS BIGINT) AS rank, x, y, c_xy, pmi_micro
            FROM ranked WHERE rank <= 50 ORDER BY rank"""))

  val queries: Map[String, Q] = Map("q_t_pmi" -> tPmi)
}
