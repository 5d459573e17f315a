package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bradley–Terry paired-comparison model (Bradley & Terry, Biometrika
  * 1952) fit by Hunter's MM algorithm (Hunter, Ann. Statist. 2004) —
  * the canonical way to turn PAIRWISE preference outcomes into a
  * per-item strength scale: P(i beats j) = p_i/(p_i + p_j). The
  * training-data use is preference aggregation: human or judge
  * A-vs-B verdicts over sources / prompts / model outputs arrive as
  * (winner, loser) events, and the BT strengths are the principled
  * leaderboard behind them (what preference-data pipelines fit before
  * reward modeling; win RATE ignores opponent strength, BT does not).
  *
  * Determinism (NUMERIC_CONVENTION rule 1 taken all the way): the MM
  * update p_i ← W_i / Σ_{j≠i} n_ij/(p_i+p_j) is run entirely in
  * integer fixed point — strengths live on a T = 10⁹ grid, each
  * pairwise term is one integral division at SCALE = 10¹⁸, the
  * per-item denominator is an integer SUM (order-free, unlike float
  * accumulation), and each sweep renormalizes to Σp = T with a floor
  * of 1 grid unit (items an MM sweep zeroes stay in the simplex).
  * 20 fixed sweeps from the uniform start. The oracle replays the
  * identical integer recursion as a DuckDB recursive CTE in HUGEINT —
  * bit-equal by construction, no float ever exists on either side.
  * Quantization error per term is ≤ 1/T of the strength scale —
  * far below the model's statistical resolution.
  *
  * Scale shape: the DATA pass is building (winner, loser) counts —
  * map-side combined groupBy. The MM loop runs on the k×k comparison
  * matrix, which for any real leaderboard (sources, models, domains)
  * is config-sized — it collects k² counts to the driver (the
  * LCA/KMeans centroid precedent), never row-scale data. Items must
  * form one comparison graph with ≥1 game each (enforced: items are
  * DERIVED from the pairs). */
object BradleyTerry {

  private val T: BigInt = BigInt(1000000000L)
  private val SCALE: BigInt = BigInt(10).pow(18)

  /** Fit BT strengths over outcome rows (winnerCol, loserCol) — one row
    * per decided comparison. Output: (item, wins, games,
    * strength_micro) with strengths normalized to Σ = 1e6 (micro share
    * of total strength), sorted by item. */
  def fit(outcomes: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 20): DataFrame = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    val wl = outcomes.groupBy(col(winnerCol).as("w"), col(loserCol).as("l"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    require(wl.nonEmpty, "bradleyTerry: no decided comparisons")
    val items = wl.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val k = items.length
    val idx = items.zipWithIndex.toMap
    val nTot = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    val wins = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    for ((w, l, n) <- wl) {
      val (i, j) = (idx(w), idx(l))
      nTot((i, j)) += n; nTot((j, i)) += n; wins(i) += n
    }
    // opponents of i, ascending j — a fixed iteration order (the SUM is
    // integer so order cannot matter, but fixed order keeps the loop
    // auditable against the oracle's GROUP BY)
    val opp: Array[Array[(Int, Long)]] = Array.tabulate(k)(i =>
      (0 until k).flatMap(j =>
        if (nTot((i, j)) > 0) Some((j, nTot((i, j)))) else None).toArray)
    var p: Array[BigInt] = Array.fill(k)(T / k)
    for (_ <- 0 until iters) {
      val praw = Array.tabulate(k) { i =>
        val d = opp(i).map { case (j, n) =>
          BigInt(n) * SCALE / (p(i) + p(j)) }.sum
        if (d > 0) BigInt(wins(i)) * SCALE / d else BigInt(0)
      }
      val s = praw.sum
      p = praw.map(pr => (pr * T / s).max(BigInt(1)))
    }
    val rows = items.zipWithIndex.map { case (it, i) =>
      (it, wins(i), opp(i).map(_._2).sum,
        (p(i) * 1000000 / T).toLong)
    }.toSeq
    spark.createDataFrame(rows)
      .toDF("item", "wins", "games", "strength_micro")
      .orderBy("item")
  }

  /** q_m59_bradley_terry: a source-strength leaderboard from matched
    * document "bouts" — the rank-i doc of each source (by doc_id within
    * source) plays the rank-i doc of every other source, longer text
    * wins, length ties are undecided and dropped. A synthetic but fully
    * deterministic preference workload; the oracle replays the pairing,
    * the counts, and the exact integer MM recursion. */
  private val mBt = Q(
    (s, d) => {
      val idxd = Tables.documents(s, d).select(col("source"),
          col("doc_id"), col("n_chars"))
        .withColumn("idx", row_number().over(
          Window.partitionBy("source").orderBy("doc_id")))
      val a = idxd.select(col("source").as("sa"), col("idx"),
        col("n_chars").as("ca"))
      val b = idxd.select(col("source").as("sb"), col("idx"),
        col("n_chars").as("cb"))
      val outcomes = a.join(b, Seq("idx"))
        .filter(col("sa") < col("sb") && col("ca") =!= col("cb"))
        .select(
          when(col("ca") > col("cb"), col("sa")).otherwise(col("sb"))
            .as("winner"),
          when(col("ca") > col("cb"), col("sb")).otherwise(col("sa"))
            .as("loser"))
      fit(outcomes, "winner", "loser")
        .withColumnRenamed("item", "source")
    },
    Some("""WITH RECURSIVE
            idxd AS (SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS idx
              FROM documents),
            wl AS (SELECT
                CASE WHEN a.n_chars > b.n_chars THEN a.source
                     ELSE b.source END AS w,
                CASE WHEN a.n_chars > b.n_chars THEN b.source
                     ELSE a.source END AS l,
                CAST(COUNT(*) AS HUGEINT) AS n
              FROM idxd a JOIN idxd b
                ON a.idx = b.idx AND a.source < b.source
                   AND a.n_chars <> b.n_chars
              GROUP BY 1, 2),
            src AS (SELECT source,
                CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS i,
                CAST(COUNT(*) OVER () AS HUGEINT) AS k
              FROM (SELECT w AS source FROM wl
                    UNION SELECT l FROM wl)),
            games AS (
              SELECT si.i AS i, sj.i AS j, wl.n FROM wl
                JOIN src si ON si.source = wl.w
                JOIN src sj ON sj.source = wl.l
              UNION ALL
              SELECT sj.i, si.i, wl.n FROM wl
                JOIN src si ON si.source = wl.w
                JOIN src sj ON sj.source = wl.l),
            gtot AS (SELECT i, j, SUM(n) AS n FROM games GROUP BY 1, 2),
            wins AS (SELECT si.i AS i, CAST(SUM(wl.n) AS HUGEINT) AS w
              FROM wl JOIN src si ON si.source = wl.w GROUP BY 1),
            it(iter, ps) AS (
              SELECT 0, (SELECT list(CAST(1000000000 AS HUGEINT) // k
                  ORDER BY i) FROM src)
              UNION ALL
              SELECT iter + 1, (
                SELECT list(pn ORDER BY i) FROM (
                  SELECT i, GREATEST(CAST(1 AS HUGEINT),
                      praw * 1000000000 // (SUM(praw) OVER ())) AS pn
                  FROM (
                    SELECT g.i AS i,
                      COALESCE(MAX(w.w), 0)
                        * CAST('1000000000000000000' AS HUGEINT)
                        // SUM(g.n * CAST('1000000000000000000' AS HUGEINT)
                               // (ps[g.i] + ps[g.j])) AS praw
                    FROM gtot g LEFT JOIN wins w ON w.i = g.i
                    GROUP BY g.i)))
              FROM it WHERE iter < 20)
            SELECT s.source, CAST(COALESCE(w.w, 0) AS BIGINT) AS wins,
              CAST((SELECT SUM(n) FROM gtot WHERE gtot.i = s.i) AS BIGINT)
                AS games,
              CAST(ps[s.i] * 1000000 // 1000000000 AS BIGINT)
                AS strength_micro
            FROM it, src s LEFT JOIN wins w ON w.i = s.i
            WHERE it.iter = 20
            ORDER BY s.source"""))

  val queries: Map[String, Q] = Map("q_m59_bradley_terry" -> mBt)
}
