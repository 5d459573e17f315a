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

  /** MEASURED variant of [[saltedJoin]]: one counting pass over the fact
    * finds the keys carrying at least `factor`× the mean row count, and
    * only THOSE keys are salted — light keys join unsalted, so the dim
    * replication cost drops from |dim| × salts to |heavy| × salts rows
    * (at a power-law 100 TB key distribution, a handful). The heavy test
    * is pure integer arithmetic — cnt · n_keys ≥ factor · total — so the
    * decision is deterministic and cross-engine replayable. The heavy-key
    * frame is by definition config-sized; it is materialized eagerly (the
    * counting job runs at call time) and broadcast to both sides.
    *
    * The output adds `is_heavy` so callers (and the oracle) can observe
    * which keys the detector salted; the data rows equal the plain join
    * row-for-row. Null fact keys never match in an equi-join, so a null
    * "key" group is never salted — identical to the plain join's
    * treatment. */
  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, factor: Int = 2, joinType: String = "inner",
      spreadCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(factor > 0, "factor must be positive")
    val spread = (if (spreadCols.nonEmpty) spreadCols
                  else fact.columns.filterNot(_ == key).toSeq).map(col)
    val counts = fact.groupBy(key).agg(count(lit(1)).as("__cnt"))
    val tot = counts.agg(sum("__cnt").as("__total"),
      count(lit(1)).as("__nkeys"))
    val heavy = counts.crossJoin(broadcast(tot))
      .filter(col("__cnt") * col("__nkeys") >=
        lit(factor.toLong) * col("__total"))
      .select(col(key), lit(true).as("__h"))
      // eager localCheckpoint: the counting pass RUNS NOW, at plan
      // construction — surprising for callers composing lazily, but
      // deliberate: the heavy set must be a settled literal frame before
      // both broadcast attaches (a lazy diamond would recount the fact
      // table twice), and the result is config-sized so no cache residue
      .localCheckpoint(eager = true)
    val saltedFact = fact.join(broadcast(heavy), Seq(key), "left")
      .withColumn("__salt",
        when(col("__h"), pmod(hash(spread: _*), lit(salts)))
          .otherwise(lit(0)))
    val saltedDim = dim.join(broadcast(heavy), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__h"), array((0 until salts).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__h")
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
      .withColumn("is_heavy", coalesce(col("__h"), lit(false)))
      .drop("__salt", "__h")
  }
}
