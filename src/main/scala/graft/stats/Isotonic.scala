package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration by pool-adjacent-violators
  * (Ayer et al., Ann. Math. Statist. 1955; Barlow et al. 1972;
  * Zadrozny & Elkan KDD'02 for classifier calibration) — fit the best
  * NON-DECREASING positive-rate curve over ordered score bins. The
  * pipeline use: the reliability table (q_t_calibration) shows WHERE a
  * quality score is miscalibrated; isotonic regression is the standard
  * non-parametric recalibration map on top of it — monotone by
  * construction, no sigmoid shape assumption (vs Platt scaling), and
  * the exact L2-optimal monotone fit.
  *
  * Exactness: PAV pools are pairs of exact integer sums (positives,
  * rows); pooled rates are rationals compared by CROSS-MULTIPLICATION
  * during the merge loop (no float ever decides a pool), and the
  * reported rate is the pool rational in floor-micro. The oracle
  * cannot run a stack algorithm, so it replays the MINIMAX
  * characterization of isotonic regression instead — the fitted value
  * at bin i equals max_{a≤i} min_{b≥i} rate(a..b) (Barlow et al. §1.2)
  * — and since floor is monotone, floor-micro commutes with that
  * max/min: computing max/min over PRE-FLOORED range rates gives
  * bit-identical output to flooring the PAV pool. Two independent
  * constructions of the same integers — a stronger oracle than a
  * replay.
  *
  * Scale shape: the data pass is one map-side groupBy(bin) count; PAV
  * itself runs on the BIN table (config-sized — score bins, not rows)
  * on the driver, the LCA/centroid-collect precedent. The O(B³)
  * minimax form is oracle-only; the engine's PAV is O(B). */
object Isotonic {

  /** PAV over pre-aggregated ordered bins (bin, n, pos): the largest
    * non-decreasing rate curve minorizing... precisely, the L2 isotonic
    * fit. Output: (bin, n, pos, raw_micro, iso_micro), iso_micro
    * non-decreasing in bin. */
  def pavCalibrate(bins: DataFrame, binCol: String, nCol: String,
      posCol: String): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    val rows = bins.select(col(binCol).cast("long"),
      col(nCol).cast("long"), col(posCol).cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    require(rows.forall(r => r._2 > 0 && r._3 >= 0 && r._3 <= r._2),
      "pavCalibrate: each bin needs n > 0 and 0 <= pos <= n")
    // stack of pools (posSum, nSum, firstIdx); merge while the previous
    // pool's rate exceeds the incoming one — rationals compared by
    // cross-multiplication, never floats
    case class Pool(p: BigInt, n: BigInt, from: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    rows.zipWithIndex.foreach { case ((_, n, pos), i) =>
      var cur = Pool(BigInt(pos), BigInt(n), i)
      while (stack.nonEmpty &&
          stack.last.p * cur.n > cur.p * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Pool(prev.p + cur.p, prev.n + cur.n, prev.from)
      }
      stack += cur
    }
    val iso = new Array[Long](rows.length)
    var bIdx = rows.length
    for (pool <- stack.reverseIterator) {
      val rate = (pool.p * 1000000 / pool.n).toLong
      for (i <- pool.from until bIdx) iso(i) = rate
      bIdx = pool.from
    }
    val out = rows.zipWithIndex.map { case ((b, n, pos), i) =>
      (b, n, pos, pos * 1000000L / n, iso(i)) }
    spark.createDataFrame(out.toSeq)
      .toDF("bin", "n", "pos", "raw_micro", "iso_micro")
  }

  /** q_m61_isotonic: monotone-calibrated P(passes the 40-word lexical
    * gate | length bin) over 50-char n_chars bins — the isotonic
    * recalibration of document length as a quality signal. The oracle
    * builds the same bins, then computes the fit through the minimax
    * identity (max over left ends of min over right ends of the
    * floored range rate). */
  private val mIso = Q(
    (s, d) => {
      val bins = Tables.documents(s, d)
        .groupBy(expr("cast(n_chars as long) div 50").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(size(filter(split(col("text"), " "),
            t => t =!= lit(""))) >= 40, 1L).otherwise(0L)).as("pos"))
      pavCalibrate(bins, "bin", "n", "pos").orderBy("bin")
    },
    Some("""WITH bins AS (SELECT CAST(n_chars // 50 AS BIGINT) AS bin,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
                    x -> x <> '')) >= 40 THEN 1 ELSE 0 END) AS BIGINT)
                  AS pos
              FROM documents GROUP BY 1),
            idx AS (SELECT bin, n, pos,
                row_number() OVER (ORDER BY bin) AS rn,
                CAST(SUM(n) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) AS cn,
                CAST(SUM(pos) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) AS cp
              FROM bins),
            -- floored rate of every contiguous bin range [a..b]
            ranges AS (SELECT a.rn AS ar, b.rn AS br,
                CAST(((b.cp - (a.cp - a.pos)) * 1000000)
                     // (b.cn - (a.cn - a.n)) AS BIGINT) AS rate
              FROM idx a JOIN idx b ON a.rn <= b.rn),
            -- minimax: iso(i) = max over a<=i of min over b>=i of rate
            inner_min AS (SELECT i.rn AS irn, r.ar,
                MIN(r.rate) AS mn
              FROM idx i JOIN ranges r ON r.ar <= i.rn AND r.br >= i.rn
              GROUP BY 1, 2),
            iso AS (SELECT irn, MAX(mn) AS iso_micro
              FROM inner_min GROUP BY 1)
            SELECT idx.bin, idx.n, idx.pos,
              CAST((CAST(idx.pos AS HUGEINT) * 1000000) // idx.n
                AS BIGINT) AS raw_micro,
              iso.iso_micro
            FROM idx JOIN iso ON iso.irn = idx.rn
            ORDER BY idx.bin"""))

  val queries: Map[String, Q] = Map("q_m61_isotonic" -> mIso)
}
