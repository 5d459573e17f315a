package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
  * skew at runtime, but when ONE side is small enough to replicate and a
  * handful of keys carry most rows (power-law user ids, null-ish sentinel
  * keys), salting fixes the imbalance at plan time and works for any join
  * the optimizer picks:
  *
  *   - fact side: key -> (key, salt) with salt = random-but-deterministic
  *     hash of the whole row modulo `salts`, so a hot key's rows spread
  *     over `salts` shuffle partitions instead of one straggler;
  *   - dim side: replicated `salts` times (explode), one copy per salt, so
  *     every fact row still finds its match exactly once.
  *
  * Shuffle cost: fact unchanged, dim × salts (choose `salts` ≈ the ratio
  * between the hottest key's row count and the average). Result equals the
  * unsalted inner/left join row-for-row.
  */
object SkewJoin {

  /** Inner or left join of a skewed `fact` against a small `dim` on `key`.
    * Pass the fact columns that make rows distinct-ish as `spreadCols`
    * (defaults to all non-key columns) — they feed the salt hash. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner", spreadCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val spread = (if (spreadCols.nonEmpty) spreadCols
                  else fact.columns.filterNot(_ == key).toSeq).map(col)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(spread: _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
