package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — edit-distance nearest neighbors
  * without the all-pairs cross product. The classic record-linkage /
  * entity-resolution shape (Fellegi–Sunter blocking): a cheap BLOCKING
  * KEY partitions candidates, exact `levenshtein` runs only within a
  * block, and each record links to its k nearest DISTINCT other names.
  * Complements the shingle/MinHash family in [[DedupOps]]: those find
  * near-duplicate DOCUMENTS by set overlap; this finds near-matching
  * SHORT STRINGS (names, titles, SKUs) by character edits.
  *
  * Scale shape — two levers, both load-bearing at 100 TB:
  *
  *  1. BLOCKING: the block key is the shuffle key, so candidate pairs
  *     are block-bounded instead of |table|²; skewed blocks recompose
  *     the caller-supplied key (add a length bucket / salt, as
  *     [[graft.etl.SkewJoin]] does).
  *  2. CANONICALIZATION: distances are computed over DISTINCT NAMES per
  *     block — vocabulary-sized, not record-sized. Names repeat heavily
  *     in any real corpus (every "John Smith" shares one candidate
  *     set), so the quadratic runs on |vocab/block|² and records attach
  *     by one equi-join at the end. The first cut of this operator
  *     paired raw RECORDS and measured 56.6 s warm at sf0.1 (20k rows,
  *     8 blocks → 50M levenshtein calls); the distinct-name rewrite is
  *     the same answer at vocabulary cost (1.7 s warm, 33x — TimeOne,
  *     and the gap grows with the duplication factor).
  *
  * Per-name emit is k-bounded through the native
  * [[graft.plans.GroupedTopK]] heap, so the linkage table is k·|vocab|
  * — broadcastable back onto the records in the common case.
  *
  * Cross-engine determinism: levenshtein is an exact integer metric
  * (same DP recurrence in Spark and DuckDB), and ranking ties break on
  * (distance, match name) — fully ordered, no floats anywhere. */
object FuzzyLink {

  /** For each record, its k nearest DIFFERENT names sharing the blocking
    * key. Output: (id, rank, match_name, n_match_records, dist) — rank
    * 1..k by (dist asc, match_name); `n_match_records` counts how many
    * records carry the matched name (the linkage fan-out a resolver
    * needs before merging). */
  def blockedNearest(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, k: Int): DataFrame = {
    val p = df.select(col(idCol), col(nameCol), blockKey.as("__blk"))
    // the canonicalization step: one row per (block, name) + multiplicity
    val names = p.groupBy(col("__blk"), col(nameCol))
      .agg(count(lit(1)).as("__cnt"))
    val left = names.select(col("__blk"), col(nameCol).as("__lname"))
    val right = names.select(col("__blk"),
      col(nameCol).as("match_name"), col("__cnt").as("n_match_records"))
    val cand = left.join(right, Seq("__blk"))
      .filter(col("__lname") =!= col("match_name"))
      .withColumn("dist",
        levenshtein(col("__lname"), col("match_name")).cast("long"))
    val top = graft.plans.GroupedTopK.topK(cand, Seq("__blk", "__lname"),
      Seq("dist" -> false, "match_name" -> false), k)
    val ranked = top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("__blk", "__lname")
        .orderBy(col("dist"), col("match_name"))).cast("long"))
    p.join(ranked,
        p("__blk") === ranked("__blk") && p(nameCol) === ranked("__lname"))
      .select(col(idCol), col("rank"), col("match_name"),
        col("n_match_records"), col("dist"))
  }

  /** q_d_fuzzy_link: 3 nearest differently-named parts per part, blocked
    * on the name's noun (its second token) — adjective variants of the
    * same product line ("red widget" / "hot widget") surface at
    * distance 1–4 while cross-line pairs never meet. */
  private val dFuzzy = Q(
    (s, d) => blockedNearest(
        Tables.part(s, d).select(col("p_partkey"), col("p_name")),
        "p_partkey", "p_name",
        element_at(split(col("p_name"), " "), 2), 3)
      .orderBy("p_partkey", "rank"),
    Some("""WITH p AS (SELECT p_partkey, p_name,
                string_split(p_name, ' ')[2] AS blk
              FROM part),
            d AS (SELECT blk, p_name, COUNT(*) AS cnt
              FROM p GROUP BY 1, 2),
            c AS (SELECT a.blk, a.p_name AS lname, b.p_name AS match_name,
                b.cnt AS n_match_records,
                CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
              FROM d a JOIN d b
                ON a.blk = b.blk AND a.p_name <> b.p_name),
            r AS (SELECT blk, lname, match_name, n_match_records, dist,
                row_number() OVER (PARTITION BY blk, lname
                  ORDER BY dist, match_name) AS rank
              FROM c)
            SELECT p.p_partkey, CAST(r.rank AS BIGINT) AS rank,
                   r.match_name, CAST(r.n_match_records AS BIGINT)
                     AS n_match_records, r.dist
            FROM p JOIN r ON r.blk = p.blk AND r.lname = p.p_name
            WHERE r.rank <= 3
            ORDER BY p_partkey, rank"""))

  val queries: Map[String, Q] = Map("q_d_fuzzy_link" -> dFuzzy)
}
