package graft.sketch

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan 2005): point-frequency
  * estimates from a FIXED d×w counter grid — the complement of the
  * repo's HLL++ (distinct counts), GK (quantiles), and Misra–Gries
  * (heavy hitters) sketches.
  *
  * Guarantee: estimate ≥ true count ALWAYS (the min of d counters each
  * counting a superset); estimate ≤ true + εN with probability 1−δ for
  * ε = e/w, δ = e^−d. The overestimate-only direction is absolute, so it
  * sits inside the hash contract; the planted query forces genuine
  * collisions (1000 distinct keys into width 256) so the error side is
  * live, not vacuously zero.
  *
  * Scale: the sketch IS the 100 TB plan — d×w counters regardless of
  * corpus size, built by one map-side-combined aggregation on (row,
  * bucket) increments; two sketches merge by counter addition, so the
  * shuffle carries at most d×w partials per map task. Hash row j of a
  * key = hex chars 7–8 of md5(j ‖ ':' ‖ key) — replayable cross-engine
  * (the [[graft.etl.DataMix.uniformHash]] md5 convention). */
object CountMin {

  /** Bucket of `key` in hash row `j`: 0..255 from two md5 hex chars. */
  private def bucket(j: Int, key: Column): Column =
    conv(substring(md5(concat(lit(j.toString), lit(":"),
      key.cast("string")).cast("binary")), 7, 2), 16, 10).cast("int")

  /** Build the sketch table (j, b, cnt) — at most depth×256 rows.
    *
    * Works UNCHANGED on a streaming frame: explode + groupBy-count is a
    * streaming aggregation whose state is the counter grid itself —
    * bounded at depth×256 rows forever, no watermark needed (the rare
    * unbounded-input aggregation with naturally bounded state; spec
    * proves stream == batch on the same data). */
  def countMinSketch(df: DataFrame, keyCol: String,
      depth: Int = 4): DataFrame = {
    require(depth >= 1, "depth >= 1")
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(j, col(keyCol)).as("b"))): _*)).as("x"))
      .groupBy(col("x.j").as("j"), col("x.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` (a one-column frame named `keyCol`):
    * min over the depth counters; a bucket with no counter row reads 0. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4): DataFrame =
    keys.select(col(keyCol),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"), bucket(j, col(keyCol)).as("b"))): _*)).as("x"))
      .select(col(keyCol), col("x.j").as("j"), col("x.b").as("b"))
      .join(sketch, Seq("j", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))

  /** 1000 planted keys (c_custkey mod 1000) squeezed into width 256 —
    * forced collisions; estimates for sample keys 0..19 joined against
    * the exact counts. `is_overestimate` certifies the absolute CMS
    * direction inside the hash; `err` carries the live collision error. */
  private val skCms = Q(
    (s, d) => {
      val keyed = Tables.customer(s, d)
        .select(pmod(col("c_custkey"), lit(1000)).cast("long").as("k"))
      val sketch = countMinSketch(keyed, "k")
      val sample = keyed.filter(col("k") < 20).distinct()
      val exact = keyed.filter(col("k") < 20)
        .groupBy("k").agg(count(lit(1)).as("exact"))
      cmsEstimate(sketch, sample, "k")
        .join(exact, Seq("k"))
        .select(col("k"), col("exact"), col("estimate"),
          (col("estimate") >= col("exact")).as("is_overestimate"),
          (col("estimate") - col("exact")).as("err"))
        .orderBy("k")
    },
    Some("""WITH keyed AS (SELECT CAST(c_custkey % 1000 AS BIGINT) AS k
              FROM customer),
            inc AS (SELECT k, j,
                (strpos('0123456789abcdef',
                   substr(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 7, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                   substr(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 8, 1)) - 1)
                AS b
              FROM keyed CROSS JOIN (SELECT unnest(range(0, 4)) AS j) jj),
            sk AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM inc GROUP BY j, b),
            sample AS (SELECT DISTINCT k FROM keyed WHERE k < 20),
            probe AS (SELECT s.k, jj.j,
                (strpos('0123456789abcdef',
                   substr(md5(CAST(jj.j AS VARCHAR) || ':' || CAST(s.k AS VARCHAR)), 7, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                   substr(md5(CAST(jj.j AS VARCHAR) || ':' || CAST(s.k AS VARCHAR)), 8, 1)) - 1)
                AS b
              FROM sample s CROSS JOIN (SELECT unnest(range(0, 4)) AS j) jj),
            est AS (SELECT p.k,
                CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS estimate
              FROM probe p LEFT JOIN sk ON p.j = sk.j AND p.b = sk.b
              GROUP BY p.k),
            ex AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact
                   FROM keyed WHERE k < 20 GROUP BY k)
            SELECT ex.k, ex.exact, est.estimate,
                   est.estimate >= ex.exact AS is_overestimate,
                   est.estimate - ex.exact AS err
            FROM est JOIN ex ON est.k = ex.k
            ORDER BY ex.k"""))

  val queries: Map[String, Q] = Map("q_sk_cms" -> skCms)
}
