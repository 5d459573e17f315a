package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  test("shards balance token mass to within one document") {
    // heavy-tailed but sane: one 300-token doc (< total/N = 322.5) among
    // 99 ten-token docs
    val docs = ((1L to 49L).map(i => (i, 10L)) ++ Seq((50L, 300L)) ++
      (51L to 100L).map(i => (i, 10L))).toDF("id", "w")
    val out = Sharding.tokenBalancedShards(docs, "id", col("w"), 4)
    val sums = out.groupBy("shard").agg(sum("w").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sums.keySet === Set(0, 1, 2, 3))
    val ideal = (99 * 10 + 300) / 4.0
    // every shard within one max-document (300) of the ideal mass
    sums.values.foreach(s => assert(math.abs(s - ideal) <= 300.0, sums))
    // doc atomicity: each id appears exactly once
    assert(out.count() === 100 &&
      out.select("id").distinct().count() === 100)
  }

  test("a doc spanning multiple shard quotas absorbs them (documented)") {
    // one 1000-token doc at the END among 99 ten-token docs: the giant
    // absorbs the token mass of shards 2-3, which come back EMPTY — the
    // documented boundary-scheme behavior when a doc exceeds total/N
    val docs = ((1L to 99L).map(i => (i, 10L)) :+ (100L, 1000L))
      .toDF("id", "w")
    val out = Sharding.tokenBalancedShards(docs, "id", col("w"), 4)
    val shards = out.select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(shards === Set(0, 1))
    assert(out.count() === 100) // still atomic, nothing dropped
  }

  test("shards are contiguous in the given order") {
    val docs = (1L to 50L).map(i => (i, 7L)).toDF("id", "w")
    val out = Sharding.tokenBalancedShards(docs, "id", col("w"), 5)
      .orderBy("id").collect().map(_.getInt(2))
    assert(out.toSeq === out.sorted.toSeq) // non-decreasing along the order
    assert(out.distinct.length === 5)
  }

  test("a doc larger than the ideal shard mass stays atomic") {
    val docs = Seq((1L, 5L), (2L, 100L), (3L, 5L)).toDF("id", "w")
    val out = Sharding.tokenBalancedShards(docs, "id", col("w"), 4)
    assert(out.count() === 3) // never split
    val shardOf = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(shardOf(2L) >= shardOf(1L) && shardOf(3L) >= shardOf(2L))
  }
}
