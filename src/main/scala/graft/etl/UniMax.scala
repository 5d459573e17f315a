package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", ICLR 2023) — the principled alternative to
  * temperature sampling (q_p19) the mixing family was missing: given a
  * total token budget and a per-domain repeat ceiling (max epochs),
  * allocate the budget as UNIFORMLY as possible across domains without
  * repeating any domain's data more than E times — low-resource
  * domains get their full cap, the rest split the remainder evenly.
  * Exactly the waterfill: sort domains by cap ascending; a domain is
  * CAPPED while `cap_i · (domains remaining) ≤ budget remaining`; from
  * the first uncapped position every domain gets the integer level
  * `rem div k`, with the `rem mod k` leftover units going to the k-th,
  * (k-1)-th, … positions from the end (a deterministic total order —
  * largest caps absorb the rounding units).
  *
  * Pure integers end-to-end (rule 1): token counts, caps, prefix sums,
  * the capped predicate, level and remainder are all exact integer
  * arithmetic — both engines replay the allocation bit-identically,
  * and the oracle re-derives every step. The budget itself derives
  * from the data as an integral fraction of the corpus total.
  *
  * Scale shape: domain sizes are ONE map-side-combined aggregation;
  * the waterfill runs entirely over |domains| rows (config-scale — a
  * mixing workload), with the fill point and level attaching as a
  * broadcast 1-row frame. */
object UniMax {

  /** Waterfill `budget` tokens over domains with per-domain cap
    * `maxEpochs · tokens`. Output: (domain, tokens, cap, alloc,
    * epochs_micro = alloc·1e6 div tokens). */
  def unimaxAllocate(sizes: DataFrame, domCol: String, sizeCol: String,
      budget: Long, maxEpochs: Int): DataFrame = {
    require(budget > 0 && maxEpochs >= 1,
      "need budget > 0 and maxEpochs >= 1")
    // r16 (guide §2.2): rank, exclusive cap prefix, and the domain count
    // formerly funneled all domains through single-partition windows;
    // the two-pass GlobalIndex scheme computes all three off one
    // range-partitioned cache (domains are a data-derived axis — web
    // corpora carry millions)
    val base = sizes
      .select(col(domCol).as("domain"),
        col(sizeCol).cast("long").as("tokens"))
      .withColumn("cap", col("tokens") * maxEpochs)
    val (running, _, nDomains) = graft.etl.GlobalIndex.withGlobalRunning(
      base, Seq(col("cap"), col("domain")), Seq(col("cap") -> "prefix"),
      indexCol = "pos")
    val flagged = running.withColumn("nn", lit(nDomains))
      .withColumn("rem", lit(budget) - col("prefix"))
      .withColumn("k", col("nn") - col("pos") + 1)
      .withColumn("capped", col("cap") * col("k") <= col("rem"))
    // the fill point and its (level, remainder) as ONE broadcastable row
    // (null level when every domain is capped — budget >= total cap)
    val istar = flagged.agg(
      min(when(!col("capped"), col("pos"))).as("istar"))
    val lvl = istar.join(
      flagged.select(col("pos").as("istar"),
        expr("rem div k").as("level"), expr("rem % k").as("r")),
      Seq("istar"), "left")
    flagged.crossJoin(broadcast(lvl))
      .select(col("domain"), col("tokens"), col("cap"),
        when(col("istar").isNull || col("pos") < col("istar"), col("cap"))
          .otherwise(col("level") +
            when(col("pos") > col("nn") - col("r"), 1L).otherwise(0L))
          .as("alloc"))
      .withColumn("epochs_micro",
        when(col("tokens") > 0, expr("(alloc * 1000000L) div tokens")))
  }

  /** q_p27_unimax: per-language token counts, budget = 60% of the
    * corpus total, ceiling 2 epochs. */
  private val pUnimax = Q(
    (s, d) => {
      val sizes = Tables.documents(s, d)
        .select(col("lang"), size(graft.text.TextOps.tokens(
          lower(col("text")))).cast("long").as("tok"))
        .groupBy("lang").agg(sum("tok").as("tokens"))
      val budget = sizes.agg(expr("(sum(tokens) * 6) div 10").as("b"))
        .head().getLong(0)
      unimaxAllocate(sizes, "lang", "tokens", budget, maxEpochs = 2)
        .withColumnRenamed("domain", "lang")
        .orderBy("lang")
    },
    Some("""WITH sz AS (SELECT lang AS domain,
                CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                  x -> x <> ''))) AS BIGINT) AS tokens
              FROM documents GROUP BY 1),
            b AS (SELECT (SUM(tokens) * 6) // 10 AS budget FROM sz),
            posn AS (SELECT domain, tokens, tokens * 2 AS cap,
                CAST(row_number() OVER wo AS BIGINT) AS pos,
                CAST(SUM(tokens * 2) OVER (ORDER BY tokens * 2, domain
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - tokens * 2 AS prefix,
                CAST(COUNT(*) OVER () AS BIGINT) AS nn
              FROM sz
              WINDOW wo AS (ORDER BY tokens * 2, domain)),
            flag AS (SELECT posn.*, b.budget - prefix AS rem,
                nn - pos + 1 AS k,
                (cap * (nn - pos + 1) <= b.budget - prefix) AS capped
              FROM posn CROSS JOIN b),
            ist AS (SELECT MIN(CASE WHEN NOT capped THEN pos END)
                AS istar FROM flag),
            lvl AS (SELECT ist.istar, f.rem // f.k AS level,
                f.rem % f.k AS r
              FROM ist LEFT JOIN flag f ON f.pos = ist.istar),
            alloc AS (SELECT domain, tokens, cap,
                CASE WHEN lvl.istar IS NULL OR pos < lvl.istar THEN cap
                     ELSE lvl.level + CASE WHEN pos > nn - lvl.r
                       THEN 1 ELSE 0 END END AS alloc,
                tokens AS tk
              FROM flag CROSS JOIN lvl)
            SELECT domain AS lang, tokens, cap, CAST(alloc AS BIGINT)
                AS alloc,
              CASE WHEN tokens > 0
                THEN CAST((alloc * 1000000) // tokens AS BIGINT) END
                AS epochs_micro
            FROM alloc ORDER BY lang"""))

  val queries: Map[String, Q] = Map("q_p27_unimax" -> pUnimax)
}
