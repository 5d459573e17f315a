package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Padding-waste report for fixed-size training batches — the
  * training-efficiency question behind length-grouped batching (the
  * fairseq/HF `--group_by_length` practice; Ott et al. 2019): a batch
  * pads every sequence to its longest member, so batching by ARRIVAL
  * order pays max-minus-mean on every batch, while batching docs of
  * similar length together pays almost nothing. The report prices
  * both policies on the SAME corpus:
  *
  *   - `arrival`: docs batched in id order (what a naive loader does);
  *   - `length_sorted`: docs batched in (length, id) order (the
  *     length-grouped loader).
  *
  * For each policy, consecutive ranks form batches of `batchSize`;
  * a batch of sizes s₁..s_b costs b·max(s) padded tokens of which
  * Σs are real. One summary row per policy: (policy, n_docs,
  * n_batches, total_tokens, padded_tokens, waste_tokens,
  * waste_micro) — waste share in floor-micro.
  *
  * Envelope: waste_tokens · 10⁶ is a long — exact while padded
  * tokens ≤ 9.2·10¹² (graft.tools.NumericEnvelopes pins the bound).
  *
  * Scale shape: each policy's global rank comes from the distributed
  * two-pass prefix sum ([[GlobalIndex.withGlobalIndexReleasable]] —
  * range partition + per-partition offsets, NO single-partition
  * window); batches then aggregate on (policy, batch) and the summary
  * on policy — two keyed aggs over batch-sized cells. */
object PaddingReport {

  def paddingWasteReport(docs: DataFrame, idCol: String, lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize >= 1")
    def ranked(policy: String, order: Seq[Column]): (DataFrame, () => Unit) = {
      val (idx, release) = GlobalIndex.withGlobalIndexReleasable(
        docs.select(col(idCol), col(lenCol).cast("long").as("__len")),
        order, "__rn")
      (idx.select(lit(policy).as("policy"),
        expr(s"(__rn - 1) div $batchSize").as("__b"), col("__len")),
        release)
    }
    val (arrival, relA) = ranked("arrival", Seq(col(idCol)))
    val (bylen, relL) = ranked("length_sorted",
      Seq(col("__len"), col(idCol)))
    val out = arrival.unionByName(bylen)
      .groupBy("policy", "__b")
      .agg(count(lit(1)).as("nb"), max("__len").as("mx"),
        sum("__len").as("s"))
      .groupBy("policy")
      .agg(sum("nb").as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum("s").as("total_tokens"),
        sum(expr("nb * mx")).as("padded_tokens"),
        sum(expr("nb * mx - s")).as("waste_tokens"))
      // an all-zero-length corpus has padded_tokens = 0: Spark's div
      // would return NULL where DuckDB's // raises — guard both engines
      // to 0 (the PackContamination total_pairs convention)
      .withColumn("waste_micro",
        when(col("padded_tokens") > 0,
          expr("waste_tokens * 1000000L div padded_tokens"))
          .otherwise(lit(0L)))
      .localCheckpoint(eager = true)
    relA(); relL()
    out
  }

  /** q_p36_padding_waste: both batching policies priced over the
    * documents corpus at batch size 32, lengths = word counts. */
  private val pPadding = Q(
    (s, d) => paddingWasteReport(
      Tables.documents(s, d).select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_tokens")),
      "doc_id", "n_tokens", batchSize = 32)
      .orderBy("policy"),
    Some("""WITH d AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '),
                x -> x <> '')) AS BIGINT) AS n
            FROM documents),
            a AS (SELECT 'arrival' AS policy,
                (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS b, n
              FROM d
              UNION ALL
              SELECT 'length_sorted' AS policy,
                (row_number() OVER (ORDER BY n, doc_id) - 1) // 32 AS b, n
              FROM d),
            g AS (SELECT policy, b, CAST(COUNT(*) AS BIGINT) AS nb,
                CAST(MAX(n) AS BIGINT) AS mx, CAST(SUM(n) AS BIGINT) AS s
              FROM a GROUP BY 1, 2)
            SELECT policy,
              CAST(SUM(nb) AS BIGINT) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_batches,
              CAST(SUM(s) AS BIGINT) AS total_tokens,
              CAST(SUM(nb * mx) AS BIGINT) AS padded_tokens,
              CAST(SUM(nb * mx - s) AS BIGINT) AS waste_tokens,
              CAST(CASE WHEN SUM(nb * mx) > 0
                THEN SUM(nb * mx - s) * 1000000 // SUM(nb * mx)
                ELSE 0 END AS BIGINT) AS waste_micro
            FROM g GROUP BY policy ORDER BY policy"""))

  val queries: Map[String, Q] = Map("q_p36_padding_waste" -> pPadding)
}
