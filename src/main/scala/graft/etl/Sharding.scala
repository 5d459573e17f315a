package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-balanced corpus sharding — the "split the corpus into N shards of
  * equal token mass" step every distributed training run needs (shard =
  * what one data-loader worker reads; balancing by DOCUMENT count skews
  * shard wall-clock when lengths are heavy-tailed, so balance by tokens).
  *
  * Docs stay atomic: shard boundaries are drawn on the exclusive global
  * token prefix sum, shard(doc) = (cum_excl · N) div total, capped at
  * N−1 — so each shard's token mass deviates from total/N by at most one
  * document. Contiguous in the given order, which keeps any upstream
  * ordering (curriculum, dedup-canonical, time) intact within shards.
  * Edge (spec-pinned): a single document larger than total/N absorbs the
  * quota of the shard widths it spans, leaving those shards EMPTY — at
  * corpus scale total/N is millions of tokens, so hitting this means the
  * corpus needs chunking ([[graft.text.TextOps.chunk]]) before sharding.
  *
  * Scale: the prefix sum is [[GlobalIndex.withGlobalCumsumReleasable]]'s
  * two-pass range-partition scheme — no single-partition window anywhere;
  * the total attaches as a broadcast 1-row frame; everything else is
  * map-side integer arithmetic. Pure integers end-to-end (exact in any
  * engine, at any partitioning).
  */
object Sharding {

  /** (input columns…, n_tokens→weightCol, shard). `order` must be a total
    * order (the GlobalIndex convention). Returns (frame, release); release
    * drops the cumsum's internal range cache after materialization. */
  def tokenBalancedShardsReleasable(df: DataFrame, orderCol: String,
      weight: org.apache.spark.sql.Column, nShards: Int)
      : (DataFrame, () => Unit) = {
    require(nShards > 0, "nShards must be positive")
    val weighted = df.withColumn("__w", weight.cast("long"))
    val total = weighted.agg(sum("__w").as("__total"))
    val (cum, release) = GlobalIndex.withGlobalCumsumReleasable(
      weighted, Seq(col(orderCol)), col("__w"), "__cum")
    val out = cum.crossJoin(broadcast(total))
      .withColumn("shard",
        least(floor(col("__cum") * nShards / col("__total")),
          lit(nShards - 1L)).cast("int"))
      .drop("__w", "__cum", "__total")
    (out, release)
  }

  def tokenBalancedShards(df: DataFrame, orderCol: String,
      weight: org.apache.spark.sql.Column, nShards: Int): DataFrame =
    tokenBalancedShardsReleasable(df, orderCol, weight, nShards)._1

  // -- registered query ---------------------------------------------------

  /** Documents split into 8 token-balanced shards in doc_id order. */
  private val pShard = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens",
          size(graft.text.TextOps.tokens(col("text"))).cast("long"))
        .select("doc_id", "n_tokens")
      val (out, release) =
        tokenBalancedShardsReleasable(docs, "doc_id", col("n_tokens"), 8)
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some("""WITH t AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens
            FROM documents),
            c AS (SELECT doc_id, n_tokens,
              COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS cum_excl,
              SUM(n_tokens) OVER () AS total
            FROM t)
            SELECT doc_id, n_tokens,
              CAST(LEAST((cum_excl * 8) // total, 7) AS INT) AS shard
            FROM c ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map("q_p17_token_shards" -> pShard)
}
