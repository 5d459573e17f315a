package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key (ties at equal timestamps match,
  * like DuckDB/kdb ASOF semantics). The reference has no such operator; it's
  * here as a first-class event-time primitive for training-data pipelines
  * (attribution, feature lookback, point-in-time correctness).
  *
  * Spark lacks a native as-of join, and the naive encoding — an inequality
  * (range) join `l.key = r.key AND r.ts <= l.ts` + argmax — degenerates to a
  * per-key cross product (O(n·m) per key: every left row meets every earlier
  * right row before the argmax prunes). This implementation composes
  * built-ins instead (preference (a) from the build plan):
  *
  *   1. union both sides, tagged, right rows carrying their payload struct;
  *   2. one window pass per key ordered by (ts, tag): `last(payload,
  *      ignoreNulls)` over rows unbounded-preceding..current carries the
  *      latest right payload forward to each left row;
  *   3. keep left rows, expand the matched struct.
  *
  * Cost is ONE shuffle of (left ∪ right) on the key plus a within-partition
  * sort — identical asymptotics to a sort-merge join, independent of how
  * many right rows precede each left row, so it holds at 100 TB where every
  * key has a deep history. Right rows sort before left rows at equal ts
  * (tag 0 < 1), giving inclusive backward semantics.
  */
object AsOfJoin {

  /** @param matchPrefix prefix for the matched right-side columns in the
    *                    output (right's key column is dropped — it equals
    *                    the left key; its other columns, including `ts`,
    *                    come back prefixed, null where no match exists). */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      matchPrefix: String = "prior_"): DataFrame = {
    require(!left.columns.contains("__r") && !left.columns.contains("__tag"),
      "left must not contain reserved columns __r/__tag")
    val payloadCols = right.columns.filterNot(_ == key)
    val r = right.select(col(key), col(ts).as("__ts"), lit(0).as("__tag"),
      struct(payloadCols.map(col).toSeq: _*).as("__r"))
    val l = left.withColumn("__ts", col(ts)).withColumn("__tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last("__r", ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col("__m")(c).as(matchPrefix + c)): _*)
  }

  /** Forward as-of join — the mirror: for each left row, the EARLIEST right
    * row with `right.ts >= left.ts` in the same key (inclusive ties, like
    * DuckDB's `ASOF … ON l.ts <= r.ts`). "Next event after": time-to-
    * conversion, next-error-after-deploy, label lookahead. Same single
    * union shuffle + one window pass; left rows sort before right rows at
    * equal ts (tag 0 < 1), and `first(payload) over current..following`
    * carries the nearest following right payload back. */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      matchPrefix: String = "next_"): DataFrame = {
    require(!left.columns.contains("__r") && !left.columns.contains("__tag"),
      "left must not contain reserved columns __r/__tag")
    val payloadCols = right.columns.filterNot(_ == key)
    val r = right.select(col(key), col(ts).as("__ts"), lit(1).as("__tag"),
      struct(payloadCols.map(col).toSeq: _*).as("__r"))
    val l = left.withColumn("__ts", col(ts)).withColumn("__tag", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__m", first("__r", ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col("__m")(c).as(matchPrefix + c)): _*)
  }
}
