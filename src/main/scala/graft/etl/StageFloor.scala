package graft.etl

import graft.Q
import org.apache.spark.sql.functions._

/** Per-stage fixed-overhead calibration probe (r16, scaling-report
  * support): a multi-stage job over a CONSTANT tiny synthetic table —
  * `spark.range`, no testdata dependence, nothing cached or reused —
  * sized so per-row compute is negligible at every scale factor. Its
  * bench time therefore approximates (number of stages) × (per-stage
  * scheduling + planning + codegen floor) at the session's core count.
  *
  * Why it exists: the r15 cross-core scaling block was uninformative —
  * at sf0.1 every 8-core/32-core ratio read ≤ ~1.2 because 0.3–3 s
  * queries are dominated by exactly this floor, so fixed overhead was
  * indistinguishable from a serial operator. With the probe benched at
  * BOTH core counts, a reader can subtract the floor and compare
  * marginal work: ratio' = (t_8 − floor_8·s/5) / (t_32 − floor_32·s/5)
  * for a query with s stages. The probe recomputes from its inputs on
  * every invocation (it IS the measurement — there is no result to
  * cache), and the oracle replays the identical integer aggregates over
  * DuckDB's range().
  *
  * Shape: 5 stages — range scan + derive, two independent hash
  * aggregations (each one exchange), their equi-join, and a final sort.
  * All integers; deterministic at any parallelism. */
object StageFloor {

  private val N = 100000L
  private val K = 997L

  private val pFloor = Q(
    (s, _) => {
      val base = s.range(0, N)
        .select(col("id"), pmod(col("id"), lit(K)).as("k"))
      val agg1 = base.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("id").as("s"))
      val agg2 = base.filter(pmod(col("id"), lit(2L)) === 0)
        .groupBy("k").agg(max("id").as("mx"), min("id").as("mn"))
      agg1.join(agg2, Seq("k"))
        .select(col("k"), col("n"), col("s"), col("mx"), col("mn"))
        .orderBy("k")
    },
    Some(s"""WITH base AS (SELECT CAST(range AS BIGINT) AS id,
                CAST(range % $K AS BIGINT) AS k FROM range(0, $N)),
            a1 AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(id) AS BIGINT) AS s FROM base GROUP BY 1),
            a2 AS (SELECT k, CAST(MAX(id) AS BIGINT) AS mx,
                CAST(MIN(id) AS BIGINT) AS mn
              FROM base WHERE id % 2 = 0 GROUP BY 1)
            SELECT a1.k, n, s, mx, mn FROM a1 JOIN a2 ON a1.k = a2.k
            ORDER BY a1.k"""))

  val queries: Map[String, Q] = Map("q_p39_stage_floor" -> pFloor)
}
