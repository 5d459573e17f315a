package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document attention contamination under sequence packing —
  * the cost side of the packing trade every pretraining stack makes:
  * chopping a packed token stream into fixed windows puts UNRELATED
  * documents in the same attention context, and without per-document
  * attention masking (Zhao et al. 2024 "best-fit packing"; the
  * T5/LLaMA packing discussions) a share of attention pairs crosses
  * document boundaries. This report prices that share exactly for the
  * [[TextOps.packCountedReleasable]] layout: per bin of segment
  * lengths l₁..l_k with L = Σl, cross-document pairs are
  * (L² − Σl²)/2 of the L(L−1)/2 total — both exact integers (the
  * numerators are even by symmetry).
  *
  * One summary row: (n_bins, n_segments, stream_tokens, cross_pairs,
  * total_pairs, contamination_micro). A zero-token document keeps the
  * pack convention's one phantom position (single-bin, no token
  * consumed), so corpora with empty docs overcount that position —
  * the documents fixtures carry none.
  *
  * Envelope: cross_pairs · 10⁶ is a long — exact while total
  * attention pairs ≤ 9.2·10¹² (≈ 3.6·10¹⁰ stream tokens at budget
  * 512); widen to decimal(38) beyond
  * (graft.tools.NumericEnvelopes pins the bound).
  *
  * Scale shape: the pack itself is the ONE distributed prefix sum;
  * segments explode map-side from (bin_first, bin_last) — a doc emits
  * n_segments rows, Σ ≈ docs + bins; then one bin-keyed agg and one
  * scalar reduce. */
object PackContamination {

  def packContaminationReport(counted: DataFrame, idCol: String,
      budget: Long): DataFrame = {
    val (packed, release) = TextOps.packCountedReleasable(
      counted, idCol, budget)
    val segs = packed.select(col("start_tok"),
        greatest(col("n_tokens"), lit(1L)).as("__n"),
        explode(sequence(col("bin_first"), col("bin_last"))).as("__b"))
      .select(col("__b"),
        (least(col("start_tok") + col("__n"), (col("__b") + 1) * budget)
          - greatest(col("start_tok"), col("__b") * budget)).as("__sl"))
    val out = segs.groupBy("__b")
      .agg(sum("__sl").as("L"), sum(expr("__sl * __sl")).as("ss"),
        count(lit(1)).as("nseg"))
      .agg(count(lit(1)).as("n_bins"),
        sum("nseg").as("n_segments"),
        sum("L").as("stream_tokens"),
        sum(expr("(L * L - ss) div 2")).as("cross_pairs"),
        sum(expr("(L * L - L) div 2")).as("total_pairs"))
      .withColumn("contamination_micro",
        when(col("total_pairs") > 0,
          expr("cross_pairs * 1000000L div total_pairs")).otherwise(lit(0L)))
      .localCheckpoint(eager = true)
    release()
    out
  }

  /** q_t_pack_contamination: the contamination price of the q_t_pack
    * layout (512-token windows, regex token counts). */
  private val tContamination = Q(
    (s, d) => packContaminationReport(
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(TextOps.bpeTokenCount(col("text")), lit(0L))
          .as("n_tokens")),
      "doc_id", 512L),
    Some("""WITH t AS (SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT)
                AS n_tokens
              FROM documents),
            c AS (SELECT doc_id, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok
              FROM t),
            p AS (SELECT doc_id, GREATEST(n_tokens, 1) AS n, start_tok,
                start_tok // 512 AS bf,
                (start_tok + GREATEST(n_tokens, 1) - 1) // 512 AS bl
              FROM c),
            segs AS (SELECT b.b AS b,
                LEAST(start_tok + n, (b.b + 1) * 512)
                  - GREATEST(start_tok, b.b * 512) AS sl
              FROM p, LATERAL (SELECT unnest(range(bf, bl + 1)) AS b) b),
            bins AS (SELECT b, CAST(SUM(sl) AS BIGINT) AS L,
                CAST(SUM(sl * sl) AS BIGINT) AS ss,
                CAST(COUNT(*) AS BIGINT) AS nseg
              FROM segs GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
              CAST(SUM(nseg) AS BIGINT) AS n_segments,
              CAST(SUM(L) AS BIGINT) AS stream_tokens,
              CAST(SUM((L * L - ss) // 2) AS BIGINT) AS cross_pairs,
              CAST(SUM((L * L - L) // 2) AS BIGINT) AS total_pairs,
              CAST(CASE WHEN SUM((L * L - L) // 2) > 0
                THEN SUM((L * L - ss) // 2) * 1000000
                  // SUM((L * L - L) // 2)
                ELSE 0 END AS BIGINT) AS contamination_micro
            FROM bins"""))

  val queries: Map[String, Q] =
    Map("q_t_pack_contamination" -> tContamination)
}
