package graft.sketch

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") / theta sketch — the distinct-count sketch
  * family with SET ALGEBRA (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07; the Apache
  * DataSketches theta design). HLL ([[HeavyHitters]]) unions perfectly
  * but cannot INTERSECT without inclusion–exclusion error blow-up; a KMV
  * state is a uniform sample of the hash space below a per-group
  * threshold θ, so intersections (and any set expression) estimate
  * directly from the retained digests.
  *
  * Engine-neutral by construction, so unlike the HLL/CMS contract gates
  * this sketch is HASH-GATED end to end: digests are md5 hex
  * (lexicographic hex order = unsigned byte order on both engines), θ is
  * the top 48 hash bits as an exact integer, and every estimate is
  * either an exact count or one double division of exact-in-double
  * operands + floor — bit-replayable in DuckDB.
  *
  * Scale shape: the state build is one distinct on (group, digest)
  * followed by the native [[graft.plans.GroupedTopK]] operator
  * (bounded k-heaps per partition, only k·partitions digests reach the
  * exchange — the sketch property materialized as a plan property);
  * states are k-row-array frames, and ALL set algebra (union k-min,
  * intersection counting) is pure array expressions over two k-arrays —
  * config-sized work however large the sketched sets. */
object ThetaKmv {

  /** Per-group KMV state: the k lexicographically smallest md5 digests
    * over the group's DISTINCT values, as one sorted hex array. */
  def kmvState(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashes = df.select(col(groupCol).cast("string").as("grp"),
      md5(col(valueCol).cast("string")).as("h")).distinct()
    graft.plans.GroupedTopK.topK(hashes, Seq("grp"), Seq("h" -> false), k)
      .groupBy("grp").agg(array_sort(collect_list("h")).as("kmv"))
  }

  /** Top 48 bits of a hex digest as an exact long (θ numerator; 48 bits
    * stay exact through a double cast, which keeps the estimate's single
    * division bit-identical cross-engine). */
  private def theta48(h: Column): Column =
    greatest(conv(substring(h, 1, 12), 16, 10).cast("long"), lit(1L))

  /** Pure-Scala twin of [[kmvEstimate]] for stateful streaming
    * consumers ([[graft.streaming.Streams.streamingKmvDistinct]]): the
    * identical arithmetic ((k−1)·2^48 / θ in doubles, floored), so a
    * stream-maintained state estimates bit-identically to the batch
    * column expression. */
  def estimateFromDigests(sortedKmv: Seq[String], k: Int): Long =
    if (sortedKmv.size < k) sortedKmv.size.toLong
    else {
      val theta = math.max(
        java.lang.Long.parseLong(sortedKmv(k - 1).substring(0, 12), 16), 1L)
      math.floor((k - 1).toDouble * 281474976710656.0 / theta).toLong
    }

  /** Distinct-count estimate: exact when the whole set fit (fewer than k
    * digests retained, θ = 1), else (k−1)/θ with θ = kth-min/2^48. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * 281474976710656.0)
        / theta48(element_at(kmv, k))).cast("long"))

  /** Union state: k smallest of the merged digest sets — a pure
    * expression over two k-arrays (shared values collapse because equal
    * values share a digest). */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection estimate (the theta-sketch move): over the union's
    * k-min sample Ku, every common digest h ≤ θ_u is a uniform sample of
    * A ∩ B at rate θ_u, so est = |Ka ∩ Kb ∩ Ku| · est(U) / k. Exact when
    * the union fit entirely. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = kmvMerge(a, b, k)
    val common = array_intersect(a, b)
    when(size(u) < k, size(common).cast("long"))
      .otherwise(floor(
        size(filter(common, h => h <= element_at(u, k))).cast("double")
          * kmvEstimate(u, k) / k).cast("long"))
  }

  /** q_sk_kmv_theta: per-source distinct-WORD estimates plus pairwise
    * union and intersection estimates over the source vocabulary — the
    * set-algebra surface on real overlapping sets. k = 16 so every SF
    * exercises the estimation branch (rse ≈ 1/√(k−2) ≈ 27%; the spec
    * pins the error against exact counts, the oracle pins the bits). */
  private val skKmv = Q(
    (s, d) => {
      val k = 16
      val words = Tables.documents(s, d).select(col("source"),
        explode(graft.text.TextOps.tokens(lower(col("text")))).as("w"))
      val st = kmvState(words, "source", "w", k)
      val singles = st.select(col("grp").as("scope"),
        kmvEstimate(col("kmv"), k).as("est"))
      val a = st.select(col("grp").as("ga"), col("kmv").as("ka"))
      val b = st.select(col("grp").as("gb"), col("kmv").as("kb"))
      val joined = a.join(b, col("ga") < col("gb"))
      val pairs = joined.select(
          concat(col("ga"), lit("|"), col("gb")).as("scope"),
          kmvEstimate(kmvMerge(col("ka"), col("kb"), k), k).as("est"))
        .unionByName(joined.select(
          concat(col("ga"), lit("&"), col("gb")).as("scope"),
          kmvIntersectEstimate(col("ka"), col("kb"), k).as("est")))
      singles.unionByName(pairs).orderBy("scope")
    },
    Some("""WITH w AS (SELECT DISTINCT source, md5(tk) AS h FROM (
              SELECT source, unnest(list_filter(
                  string_split(lower(text), ' '), x -> x <> '')) AS tk
              FROM documents) t),
            km AS (SELECT source, h FROM w
              QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 16),
            st AS (SELECT source, list(h ORDER BY h) AS kmv, COUNT(*) AS nk
              FROM km GROUP BY 1),
            singles AS (SELECT source AS scope,
              CASE WHEN nk < 16 THEN nk
                ELSE CAST(floor(15.0 * 281474976710656 / GREATEST(
                  list_sum(list_transform(range(12), i ->
                    CAST(strpos('0123456789abcdef',
                      substr(kmv[16], CAST(i AS INT)+1, 1)) - 1 AS BIGINT)
                    * (CAST(1 AS BIGINT) << CAST((11 - i) * 4 AS INT)))),
                  1)) AS BIGINT) END AS est
              FROM st),
            pr AS (SELECT a.source AS ga, b.source AS gb,
                a.kmv AS ka, b.kmv AS kb,
                list_sort(list_distinct(a.kmv || b.kmv))[1:16] AS u
              FROM st a JOIN st b ON a.source < b.source),
            pu AS (SELECT ga, gb, ka, kb, u,
                CASE WHEN len(u) < 16 THEN len(u)
                  ELSE CAST(floor(15.0 * 281474976710656 / GREATEST(
                    list_sum(list_transform(range(12), i ->
                      CAST(strpos('0123456789abcdef',
                        substr(u[16], CAST(i AS INT)+1, 1)) - 1 AS BIGINT)
                      * (CAST(1 AS BIGINT) << CAST((11 - i) * 4 AS INT)))),
                    1)) AS BIGINT) END AS est_u
              FROM pr),
            unions AS (SELECT ga || '|' || gb AS scope, est_u AS est FROM pu),
            inters AS (SELECT ga || '&' || gb AS scope,
                CASE WHEN len(u) < 16
                  THEN CAST(len(list_intersect(ka, kb)) AS BIGINT)
                  ELSE CAST(floor(CAST(len(list_filter(
                      list_intersect(ka, kb), x -> x <= u[16])) AS DOUBLE)
                    * est_u / 16) AS BIGINT) END AS est
              FROM pu)
            SELECT scope, est FROM singles
            UNION ALL SELECT scope, est FROM unions
            UNION ALL SELECT scope, est FROM inters
            ORDER BY scope"""))

  val queries: Map[String, Q] = Map("q_sk_kmv_theta" -> skKmv)
}
