package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed (banded) range join on event time, for proximity predicates with
  * NO shared equi-key — e.g. "right rows within ±w of each left row".
  *
  * A naive theta join (`abs(r.ts − l.ts) <= w`) has no equi-condition, so
  * Spark plans a broadcast nested-loop / cartesian product: O(|L|·|R|)
  * comparisons, hopeless at scale. The banded encoding restores an
  * equi-join: time is cut into buckets of width w; each right row is
  * replicated into its bucket and both neighbors, each left row probes its
  * exact bucket. |r.ts − l.ts| <= w implies the bucket indices differ by at
  * most 1, so every qualifying pair meets in EXACTLY one bucket (the one
  * replica whose bucket equals the left row's) — no dedup needed — and the
  * exact predicate prunes the rest. Shuffle volume is 3·|R| + |L| keyed by
  * bucket, and the bucket key spreads uniformly over time, so the join
  * parallelizes over the timeline at any scale.
  */
object RangeJoin {

  /** Append a count of right rows whose `tsCol` lies within ±`windowMicros`
    * of each left row's (left rows with no neighbors keep count 0).
    * `idCol` must uniquely identify left rows. */
  def countNearby(left: DataFrame, right: DataFrame, tsCol: String,
      windowMicros: Long, idCol: String, countCol: String = "n_nearby"): DataFrame = {
    val lb = left
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__b", expr(s"__us div ${windowMicros}L"))
    val rBucket = expr(s"__rus div ${windowMicros}L")
    val rb = right.select(unix_micros(col(tsCol)).as("__rus"))
      .withColumn("__b", explode(array(rBucket - 1, rBucket, rBucket + 1)))
    val counts = lb.join(rb, "__b")
      .filter(abs(col("__rus") - col("__us")) <= windowMicros)
      .groupBy(idCol).agg(count(lit(1)).as(countCol))
    left.join(counts, Seq(idCol), "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
  }
}
