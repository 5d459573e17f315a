package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language model + per-document perplexity — the
  * CCNet-style LM quality filter (arXiv:1911.00359 trains a 5-gram LM and
  * keeps low-perplexity documents; the bigram variant keeps the same
  * dataflow with the statistics learnable in-plan):
  *
  *   p(y|x) = (c(x,y) + k) / (c(x) + k·V)      (add-k smoothing)
  *   ppl(doc) = exp( −(1/n) · Σ ln p(yᵢ|xᵢ) )  over the doc's n bigrams
  *
  * Numeric contract: the per-bigram negative log-prob is FLOORED to
  * integer MICRO-nats immediately (each is a deterministic per-row
  * function of exact counts — no aggregation order involved), so the
  * per-doc reduction is an exact integer sum, reproducible bit-for-bit
  * under any partitioning and replayable in DuckDB with no float-sum
  * tolerance at all (the [[graft.sim.SimilarityOps.meanPool]] micro-units
  * trick). Floor, not round: `round`'s half-way semantics diverge
  * across engines (Spark decimal-repr HALF_UP vs DuckDB binary — the
  * round-11 q_t_bm25 flip), floor is the binary-value floor in both.
  * Perplexity derives from the exact integers at the end.
  *
  * Scale: two corpus aggregations (bigram counts, token counts) keyed on
  * natural keys; V is a 1-row aggregate broadcast into the probability
  * expression; scoring joins the doc bigrams against the model on the
  * bigram key (vocabulary²-bounded — a shuffle join at full scale, a
  * broadcast when the model is trimmed) and reduces per doc in one hash
  * aggregation. Docs with < 2 tokens carry n_bigrams = 0 and a null
  * perplexity (emitted, not dropped — the downstream filter decides).
  */
object NgramLm {

  import TextOps.tokens

  private[text] def bigrams(df: DataFrame, id: org.apache.spark.sql.Column,
      text: String): DataFrame =
    df.select(id.as("__id"), tokens(col(text)).as("__t"))
      .select(col("__id"), explode(
        when(size(col("__t")) >= 2,
          transform(sequence(lit(0), size(col("__t")) - 2),
            i => struct(element_at(col("__t"), i + 1).as("x"),
              element_at(col("__t"), i + 2).as("y"))))
          .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("b"))
      .select(col("__id"), col("b.x").as("x"), col("b.y").as("y"))

  /** Exact integer core: (idCol, n_bigrams, nlp_micro) where nlp_micro is
    * the doc's Σ floor(−ln p · 1e6) in micro-nats.
    *
    * Envelope: nlp_micro ≤ n_bigrams · ceil(ln(cx + kV)·10⁶) — exact
    * in long for 10⁹ bigrams/doc at model counts ≤ 10¹⁸
    * (graft.tools.NumericEnvelopes pins the bound). */
  def negLogMicro(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String, k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val modelToks = model.select(explode(tokens(col(modelTextCol))).as("tok"))
    val unigrams = modelToks.groupBy("tok").agg(count(lit(1)).as("cx"))
    val vocab = modelToks.agg(countDistinct("tok").as("v"))
    val bigramCounts = bigrams(model, monotonically_increasing_id(), modelTextCol)
      .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
    val scored = bigrams(docs, col(idCol), textCol)
      .join(bigramCounts, Seq("x", "y"), "left")
      .join(unigrams.withColumnRenamed("tok", "x"), Seq("x"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nlp_micro", floor(-log(
        (coalesce(col("cxy"), lit(0L)) + lit(k)) /
          (coalesce(col("cx"), lit(0L)) + lit(k) * col("v"))) * 1e6)
        .cast("long"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nlp_micro").as("nlp_micro"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nlp_micro"))
  }

  /** User surface: (idCol, n_bigrams, ppl) with ppl = exp(mean micro-nats),
    * null for unscorable docs. */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String, k: Double = 1.0): DataFrame =
    negLogMicro(docs, idCol, textCol, model, modelTextCol, k)
      .withColumn("ppl",
        exp(col("nlp_micro") / lit(1e6) / col("n_bigrams")))
      .drop("nlp_micro")

  /** Self-scored documents corpus at k = 1. Output is the exact-integer
    * core — zero float-sum tolerance anywhere in the hash. */
  private val tPpl = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      negLogMicro(docs, "doc_id", "text", docs, "text").orderBy("doc_id")
    },
    Some(negLogCtes + """
            SELECT doc_id, n_bigrams, nlp_micro
            FROM core ORDER BY doc_id"""))

  /** CCNet-style perplexity bucketing (arXiv:1911.00359 §4.3): scorable
    * docs ranked by mean per-bigram perplexity ascending (doc_id breaks
    * ties — a total order), split into `nBuckets` rank bands — bucket 1 =
    * "head" (closest to the model), last = "tail"; docs with no bigrams
    * get bucket 0. The band of rank rn among n scorable docs is
    * 1 + (nBuckets·(rn−1)) div n — pure integer arithmetic, so both
    * engines agree exactly (no percentile interpolation anywhere).
    *
    * Scale: ranking uses [[graft.etl.GlobalIndex]]'s two-pass
    * range-partition index, NOT a single-partition ntile window; n
    * attaches as a broadcast 1-row frame. The sort key is the IEEE
    * division of the two exact integers (identical in both engines);
    * only integers reach the output. Returns (frame, release) — the
    * release handle drops the index's internal range cache. */
  def perplexityBucketsReleasable(docs: DataFrame, idCol: String,
      textCol: String, model: DataFrame, modelTextCol: String,
      nBuckets: Int = 3, k: Double = 1.0): (DataFrame, () => Unit) = {
    require(nBuckets >= 1, "nBuckets >= 1")
    val core = negLogMicro(docs, idCol, textCol, model, modelTextCol, k)
    val scorable = core.filter(col("n_bigrams") > 0)
      .withColumn("__ratio", col("nlp_micro") / col("n_bigrams"))
    val (ranked, release) = graft.etl.GlobalIndex.withGlobalIndexReleasable(
      scorable, Seq(col("__ratio"), col(idCol)), "__rn")
    val n = scorable.agg(count(lit(1)).as("__n"))
    val bucketed = ranked.crossJoin(broadcast(n))
      // integral DIV (not float divide + truncate): exact at any corpus
      // size, and the same operation the oracle's // computes
      .withColumn("bucket",
        expr(s"CAST(1 + ($nBuckets * (__rn - 1)) DIV __n AS INT)"))
      .select(col(idCol), col("n_bigrams"), col("nlp_micro"), col("bucket"))
    val out = core.filter(col("n_bigrams") === 0)
      .select(col(idCol), col("n_bigrams"), col("nlp_micro"),
        lit(0).as("bucket"))
      .unionByName(bucketed)
    (out, release)
  }

  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, modelTextCol: String, nBuckets: Int = 3,
      k: Double = 1.0): DataFrame =
    perplexityBucketsReleasable(docs, idCol, textCol, model, modelTextCol,
      nBuckets, k)._1

  /** The shared per-doc exact-integer CTE chain of [[negLogMicro]]'s
    * oracle (self-scored documents at k = 1), ending in `core(doc_id,
    * n_bigrams, nlp_micro)`. */
  // lazy: referenced by tPpl, which is declared earlier in the object
  // private[graft]: the domain-tilt mixing oracle (etl.DataMix) reuses
  // the self-scored bigram-LM CTE chain verbatim
  private[graft] lazy val negLogCtes: String =
    """WITH mt AS (SELECT unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS tok FROM documents),
            uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cx
                    FROM mt GROUP BY tok),
            voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM mt),
            db AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
                   FROM documents),
            bg AS (SELECT doc_id,
                     t[CAST(i AS INT) + 1] AS x, t[CAST(i AS INT) + 2] AS y
                   FROM db, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
                   FROM bg GROUP BY x, y),
            sc AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(CAST(FLOOR(-ln(
                         CAST(COALESCE(c.cxy, 0) + 1.0 AS DOUBLE)
                       / CAST(COALESCE(u.cx, 0) + 1.0 * v.v AS DOUBLE))
                       * 1000000.0) AS BIGINT)) AS BIGINT) AS nlp_micro
                   FROM bg g
                   LEFT JOIN bc c ON g.x = c.x AND g.y = c.y
                   LEFT JOIN uni u ON g.x = u.tok
                   CROSS JOIN voc v
                   GROUP BY g.doc_id),
            core AS (SELECT d.doc_id AS doc_id,
                   COALESCE(s.n_bigrams, 0) AS n_bigrams,
                   s.nlp_micro
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN sc s ON d.doc_id = s.doc_id)"""

  /** Self-scored head/middle/tail split of the documents corpus. */
  private val tPplBuckets = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (out, release) = perplexityBucketsReleasable(
        docs, "doc_id", "text", docs, "text", nBuckets = 3)
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some(negLogCtes + """,
            rk AS (SELECT doc_id, n_bigrams, nlp_micro,
                     row_number() OVER (ORDER BY
                       CAST(nlp_micro AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
                       doc_id) AS rn,
                     COUNT(*) OVER () AS n
                   FROM core WHERE n_bigrams > 0)
            SELECT doc_id, n_bigrams, nlp_micro,
                   CAST(0 AS INT) AS bucket
            FROM core WHERE n_bigrams = 0
            UNION ALL
            SELECT doc_id, n_bigrams, nlp_micro,
                   CAST(1 + (3 * (rn - 1)) // n AS INT) AS bucket
            FROM rk
            ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_t_perplexity" -> tPpl,
    "q_t_ppl_buckets" -> tPplBuckets)
}
