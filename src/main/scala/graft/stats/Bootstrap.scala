package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Chamandy et al., Google 2012 — "Estimating
  * uncertainty for massive data streams") — the DISTRIBUTED-NATIVE
  * bootstrap: classical resampling draws n items with replacement,
  * which needs global coordination; the Poisson bootstrap instead gives
  * every (item, replicate) an independent Poisson(1) weight, which a
  * map-side expression computes from a seeded hash — no shuffle, no
  * state, replicates materialize as ONE weighted aggregation. The
  * curation use: a bootstrap band around any per-source corpus metric
  * ("did mean document length really move, or is that within resample
  * noise?").
  *
  * Determinism: the weight is the Poisson(1) inverse-CDF ladder
  * evaluated at u(id:replicate) — [[graft.etl.DataMix.uniformHash]]'s
  * exact-double md5 uniform against FIXED decimal CDF literals (both
  * engines parse the same strings to the same doubles; the ladder caps
  * at 6, P(X>6) ≈ 8·10⁻⁵ documented). Replicate means are exact
  * integer `Σw·v·1e6 div Σw`; no float reaches the hashed output.
  *
  * Scale shape: the replicate dimension explodes map-side (B rows per
  * item in the scan stage), weights are map-side scalars, and the ONLY
  * shuffle is the (group, replicate) keyed aggregation with map-side
  * combine — bounded by |groups|·B output rows however large the
  * corpus. */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities P(X ≤ k), k = 0..5; identical
    * literal strings on the oracle side. */
  private val cdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  private[stats] def poissonWeight(u: Column): Column =
    cdf.zipWithIndex.foldRight(lit(6L): Column) { case ((p, k), rest) =>
      when(u < lit(p), lit(k.toLong)).otherwise(rest)
    }

  /** SQL CASE ladder mirroring [[poissonWeight]] over expression `u`. */
  private def poissonSql(u: String): String =
    cdf.zipWithIndex
      .map { case (p, k) => s"WHEN $u < $p THEN ${k}" }
      .mkString("CASE ", " ", " ELSE 6 END")

  /** Per-(group, replicate) weighted mean of `valueCol` under B
    * independent Poisson(1) resamples seeded by `idCol`. Output:
    * (groupCol, b, n_eff, mean_micro) — a replicate that samples a
    * group to extinction (n_eff 0, possible for tiny groups) reports a
    * null mean rather than a 0-divide. */
  def poissonBootstrap(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, nReplicates: Int): DataFrame = {
    require(nReplicates >= 1, "need at least one replicate")
    val rep = df.select(col(groupCol), col(valueCol).cast("long").as("v"),
        col(idCol).cast("string").as("__id"))
      .withColumn("b", explode(sequence(lit(1), lit(nReplicates))))
    val u = graft.etl.DataMix.uniformHash(
      concat(col("__id"), lit(":"), col("b").cast("string")))
    rep.withColumn("w", poissonWeight(u))
      .groupBy(col(groupCol), col("b"))
      .agg(sum("w").as("n_eff"), sum(col("w") * col("v")).as("wv"))
      .select(col(groupCol), col("b").cast("long").as("b"), col("n_eff"),
        when(col("n_eff") > 0, expr("wv * 1000000L div n_eff"))
          .otherwise(lit(null).cast("long")).as("mean_micro"))
  }

  /** q_m46_bootstrap: 16 Poisson replicates of mean document length per
    * source — the oracle replays the hash ladder and every weighted
    * mean exactly, so the certified surface is the full resample, not a
    * summary of it. */
  private val mBootstrap = Q(
    (s, d) => poissonBootstrap(Tables.documents(s, d), "source", "n_chars",
        "doc_id", nReplicates = 16)
      .orderBy("source", "b"),
    Some(s"""WITH rep AS (SELECT source, n_chars, doc_id, b
              FROM documents,
                   (SELECT unnest(range(1, 17)) AS b)),
            w AS (SELECT source, b, n_chars,
                ${poissonSql(graft.etl.DataMix.uniformSqlExpr(
                  "CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)"))}
                  AS w
              FROM rep),
            agg AS (SELECT source, CAST(b AS BIGINT) AS b,
                CAST(SUM(w) AS BIGINT) AS n_eff,
                CAST(SUM(w * n_chars) AS BIGINT) AS wv
              FROM w GROUP BY source, b)
            SELECT source, b, n_eff,
                CASE WHEN n_eff > 0 THEN wv * 1000000 // n_eff
                     ELSE NULL END AS mean_micro
            FROM agg ORDER BY source, b"""))

  val queries: Map[String, Q] = Map("q_m46_bootstrap" -> mBootstrap)
}
