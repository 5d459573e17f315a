package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document classifier over surface features — the DCLM/fastText
  * move (arXiv:2406.11794: train a cheap classifier on rule-derived
  * labels, score the corpus with it): logistic regression by full-batch
  * gradient descent, DISTILLING the rule-based language-id heuristic
  * ([[TextOps.langId]]) into a linear model of its profile scores.
  *
  * QUANTIZED-gradient parameterization, deliberately: each row's
  * per-feature gradient contribution (σ(w·x) − y)·xⱼ rounds to integer
  * MICRO-units before the reduction, so every gradient sum is an exact
  * integer under any partitioning and the whole fit — per-iteration
  * weights included — is bit-for-bit replayable in DuckDB CTEs (the
  * seeded-unroll family of the KMeans/KModes/BGMM oracles; the
  * quantization perturbs each step by ≤ 5e-7 per row, far below what GD
  * tolerates).
  *
  * Scale: one narrow feature projection (persisted across the loop), one
  * k-column integer aggregation per iteration (map-side combined), and a
  * final counting pass — weights are a config-sized vector on the driver,
  * never a data-sized collect.
  */
object QualityClassifier {

  final case class Fit(weights: Array[Double], n: Long, correct: Long)

  private def zCol(w: Array[Double], features: Seq[String]): Column =
    features.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * col(f)
    }

  /** Batch-GD logistic fit of `label` (boolean) on `featureCols` with an
    * intercept, zero init, `iters` full-batch steps at rate `lr`. */
  def fit(docs: DataFrame, featureCols: Seq[String], label: Column,
      iters: Int = 20, lr: Double = 1.0): Fit = {
    val feats = docs.select(
      (label.cast("double").as("y") +: featureCols.map(col)): _*).persist()
    val n = feats.count()
    require(n > 0, "empty training frame")
    var w = Array.fill(featureCols.size + 1)(0.0)
    (1 to iters).foreach { _ =>
      val err = lit(1.0) / (lit(1.0) + exp(-zCol(w, featureCols))) - col("y")
      val gs = (lit(1.0) +: featureCols.map(col)).zipWithIndex.map {
        case (x, j) => sum(round(err * x * 1e6).cast("long")).as(s"g$j")
      }
      val g = feats.agg(gs.head, gs.tail: _*).collect()(0)
      w = w.indices.map(j =>
        w(j) - lr * ((g.getLong(j).toDouble / 1e6) / n.toDouble)).toArray
    }
    val correct = feats
      .filter((zCol(w, featureCols) >= 0) === (col("y") === 1.0)).count()
    feats.unpersist(blocking = false)
    Fit(w, n, correct)
  }

  // -- oracle SQL generator (seeded-unroll, LloydOracleSql style) ---------

  /** DuckDB replay of [[fit]] on the langid-score features: `iters`
    * chained (gradient, weight) CTE pairs over the feature CTE. The
    * feature scores replay [[TextOps.langIdScoreColumns]]; every float
    * literal is e-notation (a bare 1.0 would be DECIMAL and decimal
    * arithmetic would diverge from Spark's double path). */
  private[text] def oracleSql(iters: Int, lr: Double): String =
    // MATERIALIZED pins each CTE to one evaluation — without it DuckDB
    // re-inlines `f` into every iteration and exhausts file handles
    // (the LloydOracleSql lesson, same failure mode)
    oracleSqlRaw(iters, lr).replace(" AS (", " AS MATERIALIZED (")

  private def oracleSqlRaw(iters: Int, lr: Double): String = {
    val d = 3 // s_en, s_spark, s_sql
    def wRefs(t: Int) = (0 to d).map(j => s"w$j")
    def z(wt: String) =
      s"($wt.w0 + $wt.w1 * f1 + $wt.w2 * f2 + $wt.w3 * f3)"
    val xs = Seq("", " * f1", " * f2", " * f3")
    def iteration(t: Int): String = {
      val prev = s"wt${t - 1}"
      val sig = s"(1e0 / (1e0 + exp(-${z(prev)})) - y)"
      val grads = xs.zipWithIndex.map { case (x, j) =>
        s"SUM(CAST(ROUND($sig$x * 1e6) AS BIGINT)) AS g$j"
      }.mkString(",\n              ")
      val ws = wRefs(t).zipWithIndex.map { case (wn, j) =>
        s"$prev.$wn - ${lr}e0 * ((CAST(g$j AS DOUBLE) / 1e6) / CAST(n AS DOUBLE)) AS $wn"
      }.mkString(",\n              ")
      s"""gt$t AS (SELECT
              $grads
              FROM f CROSS JOIN $prev),
            wt$t AS (SELECT
              $ws
              FROM gt$t CROSS JOIN wt${t - 1} CROSS JOIN n0)"""
    }
    val zeros = (0 to d).map(j => s"0e0 AS w$j").mkString(", ")
    s"""WITH t AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents),
            s AS (SELECT doc_id,
              CAST(len(list_filter(toks, x -> list_contains(
                ['the','and','of','fast','slow'], lower(x)))) AS BIGINT) AS f1,
              CAST(len(list_filter(toks, x -> list_contains(
                ['spark','shuffle','partition','executor','batch'],
                lower(x)))) AS BIGINT) AS f2,
              CAST(len(list_filter(toks, x -> list_contains(
                ['select','join','query','table','scan'],
                lower(x)))) AS BIGINT) AS f3
              FROM t),
            f AS (SELECT doc_id,
              CASE WHEN f1 >= f2 AND f1 >= f3 THEN 1e0 ELSE 0e0 END AS y,
              f1, f2, f3 FROM s),
            n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
            wt0 AS (SELECT $zeros),
            ${(1 to iters).map(iteration).mkString(",\n            ")}
            SELECT n0.n AS n,
              CAST(ROUND(w0 * 1e6) AS BIGINT) AS w0_micro,
              CAST(ROUND(w1 * 1e6) AS BIGINT) AS w1_micro,
              CAST(ROUND(w2 * 1e6) AS BIGINT) AS w2_micro,
              CAST(ROUND(w3 * 1e6) AS BIGINT) AS w3_micro,
              (SELECT CAST(SUM(CASE WHEN (${z(s"wt$iters")} >= 0e0)
                     = (y = 1e0) THEN 1 ELSE 0 END) AS BIGINT)
               FROM f CROSS JOIN wt$iters) AS n_correct
            FROM wt$iters CROSS JOIN n0"""
  }

  /** Distill lang_pred == 'en' from the three langid profile scores —
    * 20 GD steps at lr 1; the spec certifies the fit beats the majority
    * class, the hash certifies the exact quantized weights and counts. */
  private val tClf = Q(
    (s, d) => {
      val spark = s
      import spark.implicits._
      val scored = TextOps.langId(Tables.documents(s, d), "doc_id", "text")
      val r = fit(scored, Seq("s_en", "s_spark", "s_sql"),
        col("lang_pred") === "en", iters = 20, lr = 1.0)
      Seq((r.n, math.round(r.weights(0) * 1e6),
        math.round(r.weights(1) * 1e6), math.round(r.weights(2) * 1e6),
        math.round(r.weights(3) * 1e6), r.correct))
        .toDF("n", "w0_micro", "w1_micro", "w2_micro", "w3_micro",
          "n_correct")
    },
    Some(oracleSql(20, 1.0)))

  val queries: Map[String, Q] = Map("q_t_quality_clf" -> tClf)
}
