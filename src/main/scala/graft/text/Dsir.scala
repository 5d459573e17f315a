package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al.,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely a target-domain language model finds it than the raw-corpus
  * model, then keep the highest-weight fraction. The paper uses hashed
  * n-gram bag models; this implementation uses the engine's add-k bigram
  * LM ([[NgramLm]]) — the same estimator family with the statistics
  * learnable in-plan.
  *
  *   w(doc) = log p_target(doc) − log p_raw(doc)
  *          = nlp_raw − nlp_target            (in negative-log space)
  *
  * Numeric contract (the [[NgramLm]] discipline): each per-bigram negative
  * log-prob is floored to integer micro-nats BEFORE the per-doc sum, so
  * weights are exact integers — reproducible under any partitioning and
  * replayable in DuckDB with zero float tolerance. Selection is a pure
  * integer rank test: rank ≤ ceil(n·num/den) over (weight desc, id).
  *
  * Scale: ONE scoring pass over the corpus bigrams (both models join the
  * same exploded bigram frame on the bigram key — not two independent
  * perplexity passes); model counts are vocabulary²-bounded aggregations;
  * the two vocabulary sizes attach as broadcast 1-row frames; ranking
  * rides [[graft.etl.GlobalIndex]]'s two-pass range scheme, never a
  * single-partition window. At 100 TB the target corpus is typically
  * small (a quality seed like Wikipedia) — its model aggregation is
  * cheap — and the raw-model counts shuffle on natural (x,y) keys.
  */
object Dsir {

  import TextOps.tokens

  /** Exact integer core: (idCol, n_bigrams, nlp_raw_micro, nlp_tgt_micro,
    * weight_micro) for every doc; null scores and weight for docs with
    * < 2 tokens (emitted, not dropped — the selector decides).
    *
    * The corpus token arrays are persisted ONCE and feed all three corpus
    * consumers — raw unigram counts, raw bigram counts, and the scoring
    * bigrams (the [[TextOps]] tf-diamond pattern); without the diamond the
    * corpus text is re-tokenized three times, which dominates the query.
    * Returns (frame, release); release unpersists the diamond after the
    * result is materialized. */
  /** (__id, __t) → (__id, x, y) sliding bigrams over the token array. */
  private[graft] def bigramsOf(tf: DataFrame): DataFrame =
    tf.select(col("__id"), explode(
        when(size(col("__t")) >= 2,
          transform(sequence(lit(0), size(col("__t")) - 2),
            i => struct(element_at(col("__t"), i + 1).as("x"),
              element_at(col("__t"), i + 2).as("y"))))
          .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("b"))
      .select(col("__id"), col("b.x").as("x"), col("b.y").as("y"))

  private def model(tf: DataFrame, suffix: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = tf.select(explode(col("__t")).as("tok"))
    (toks.groupBy("tok").agg(count(lit(1)).as(s"cx_$suffix"))
       .withColumnRenamed("tok", "x"),
     toks.agg(countDistinct("tok").as(s"v_$suffix")),
     bigramsOf(tf).groupBy("x", "y").agg(count(lit(1)).as(s"cxy_$suffix")))
  }

  /** Add-k bigram model count frames of a STATIC corpus, for composition
    * outside the batch path (e.g. the streaming gate): unigram counts
    * (x, cx_suffix), 1-row vocabulary size (v_suffix), bigram counts
    * (x, y, cxy_suffix). */
  def modelFrames(df: DataFrame, textCol: String, suffix: String)
      : (DataFrame, DataFrame, DataFrame) =
    // the row id is never consumed by the count aggregations, and a real
    // id expression (monotonically_increasing_id) would be rejected by
    // the streaming checker when these frames join a stream
    model(df.select(lit(0L).as("__id"),
      tokens(col(textCol)).as("__t")), suffix)

  /** The per-bigram negative log-prob in integer micro-nats. */
  private[graft] def nlMicroExpr(cxy: String, cx: String, v: String,
      k: Double): org.apache.spark.sql.Column =
    floor(-log((coalesce(col(cxy), lit(0L)) + lit(k)) /
      (coalesce(col(cx), lit(0L)) + lit(k) * col(v))) * 1e6).cast("long")

  def weightsMicroReleasable(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Double = 1.0)
      : (DataFrame, () => Unit) = {
    require(k > 0, "smoothing k must be positive")
    val corpusToks = docs
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .persist()
    val (uniR, vocR, bcR) = model(corpusToks, "r")
    val (uniT, vocT, bcT) = model(
      target.select(monotonically_increasing_id().as("__id"),
        tokens(col(targetTextCol)).as("__t")), "t")
    def nlMicro(cxy: String, cx: String, v: String) = nlMicroExpr(cxy, cx, v, k)
    val scored = bigramsOf(corpusToks)
      .join(bcR, Seq("x", "y"), "left")
      .join(bcT, Seq("x", "y"), "left")
      .join(uniR, Seq("x"), "left")
      .join(uniT, Seq("x"), "left")
      .crossJoin(broadcast(vocR))
      .crossJoin(broadcast(vocT))
      .withColumn("__nl_r", nlMicro("cxy_r", "cx_r", "v_r"))
      .withColumn("__nl_t", nlMicro("cxy_t", "cx_t", "v_t"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("__nl_r").as("nlp_raw_micro"), sum("__nl_t").as("nlp_tgt_micro"))
    val out = docs.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nlp_raw_micro"), col("nlp_tgt_micro"),
        (col("nlp_raw_micro") - col("nlp_tgt_micro")).as("weight_micro"))
    (out, () => { corpusToks.unpersist(blocking = false); () })
  }

  def weightsMicro(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Double = 1.0): DataFrame =
    weightsMicroReleasable(docs, idCol, textCol, target, targetTextCol, k)._1

  /** DSIR selection: keep the top num/den fraction of scorable docs by
    * (weight desc, id). Unscorable docs come back selected = false.
    * Returns (frame, release) — release drops the global-index range
    * cache once the output is materialized. */
  def selectTopFractionReleasable(docs: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      num: Int = 1, den: Int = 5, k: Double = 1.0)
      : (DataFrame, () => Unit) = {
    require(num > 0 && den >= num, "need 0 < num/den <= 1")
    val (w, releaseW) =
      weightsMicroReleasable(docs, idCol, textCol, target, targetTextCol, k)
    val scorable = w.filter(col("n_bigrams") > 0)
    val (ranked, releaseIdx) = graft.etl.GlobalIndex.withGlobalIndexReleasable(
      scorable, Seq(col("weight_micro").desc, col(idCol)), "__rn")
    val n = scorable.agg(count(lit(1)).as("__n"))
    val out = ranked.crossJoin(broadcast(n))
      // rank ≤ ceil(n·num/den), as integers: (n·num + den − 1) div den
      .withColumn("selected",
        col("__rn") <= (col("__n") * num + (den - 1)) / lit(den.toLong))
      .drop("__rn", "__n")
      .unionByName(w.filter(col("n_bigrams") === 0)
        .withColumn("selected", lit(false)))
    (out, () => { releaseIdx(); releaseW() })
  }

  def selectTopFraction(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, num: Int = 1, den: Int = 5,
      k: Double = 1.0): DataFrame =
    selectTopFractionReleasable(
      docs, idCol, textCol, target, targetTextCol, num, den, k)._1

  // -- registered query ---------------------------------------------------

  /** Raw corpus = all documents; target distribution = the non-English
    * slice (a live minority-distribution stand-in for a quality seed
    * corpus); keep the top 20%. Pure integers + a boolean in the output. */
  private val tDsir = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (out, release) = selectTopFractionReleasable(
        docs, "doc_id", "text", docs.filter(col("lang") =!= "en"), "text",
        num = 1, den = 5)
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some("""WITH mt_r AS (SELECT unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS tok FROM documents),
            uni_r AS (SELECT tok AS x, CAST(COUNT(*) AS BIGINT) AS cx_r
                      FROM mt_r GROUP BY 1),
            voc_r AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v_r
                      FROM mt_r),
            mt_t AS (SELECT unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS tok FROM documents WHERE lang <> 'en'),
            uni_t AS (SELECT tok AS x, CAST(COUNT(*) AS BIGINT) AS cx_t
                      FROM mt_t GROUP BY 1),
            voc_t AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v_t
                      FROM mt_t),
            db_r AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
            bg_r AS (SELECT doc_id,
                t[CAST(i AS INT) + 1] AS x, t[CAST(i AS INT) + 2] AS y
              FROM db_r, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            bc_r AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy_r
                     FROM bg_r GROUP BY 1, 2),
            db_t AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents WHERE lang <> 'en'),
            bg_t AS (SELECT doc_id,
                t[CAST(i AS INT) + 1] AS x, t[CAST(i AS INT) + 2] AS y
              FROM db_t, LATERAL (SELECT unnest(range(len(t) - 1)) AS i) ii),
            bc_t AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy_t
                     FROM bg_t GROUP BY 1, 2),
            sc AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(CAST(FLOOR(-ln(
                         CAST(COALESCE(r.cxy_r, 0) + 1.0 AS DOUBLE)
                       / CAST(COALESCE(ur.cx_r, 0) + 1.0 * vr.v_r AS DOUBLE))
                       * 1000000.0) AS BIGINT)) AS BIGINT) AS nlp_raw_micro,
                     CAST(SUM(CAST(FLOOR(-ln(
                         CAST(COALESCE(t.cxy_t, 0) + 1.0 AS DOUBLE)
                       / CAST(COALESCE(ut.cx_t, 0) + 1.0 * vt.v_t AS DOUBLE))
                       * 1000000.0) AS BIGINT)) AS BIGINT) AS nlp_tgt_micro
                   FROM bg_r g
                   LEFT JOIN bc_r r ON g.x = r.x AND g.y = r.y
                   LEFT JOIN bc_t t ON g.x = t.x AND g.y = t.y
                   LEFT JOIN uni_r ur ON g.x = ur.x
                   LEFT JOIN uni_t ut ON g.x = ut.x
                   CROSS JOIN voc_r vr CROSS JOIN voc_t vt
                   GROUP BY g.doc_id),
            core AS (SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
                       s.nlp_raw_micro, s.nlp_tgt_micro,
                       s.nlp_raw_micro - s.nlp_tgt_micro AS weight_micro
                     FROM (SELECT doc_id FROM documents) d
                     LEFT JOIN sc s ON d.doc_id = s.doc_id),
            rk AS (SELECT *,
                     row_number() OVER (ORDER BY weight_micro DESC, doc_id)
                       AS rn,
                     COUNT(*) OVER () AS n
                   FROM core WHERE n_bigrams > 0)
            SELECT doc_id, n_bigrams, nlp_raw_micro, nlp_tgt_micro,
                   weight_micro, (rn <= (n * 1 + 4) // 5) AS selected
            FROM rk
            UNION ALL
            SELECT doc_id, n_bigrams, nlp_raw_micro, nlp_tgt_micro,
                   weight_micro, false AS selected
            FROM core WHERE n_bigrams = 0
            ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map("q_t_dsir" -> tDsir)
}
