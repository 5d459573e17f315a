package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // hot key 1 carries 90% of rows; dim has one row per key
  private def fixtures = {
    val fact = ((1 to 900).map(i => (1L, s"r$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"s$i")))
      .toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "kname")
    (fact, dim)
  }

  test("salted inner join equals the unsalted join row-for-row") {
    val (fact, dim) = fixtures
    val got = SkewJoin.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "kname")
      .collect().map(_.toSeq).sortBy(_.toString)
    val want = fact.join(dim, Seq("k"))
      .select("k", "payload", "kname")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got === want)
  }

  test("adaptive salting: only the measured-heavy key is salted, rows intact") {
    val (fact, dim) = fixtures
    val got = SkewJoin.adaptiveSaltedJoin(fact, dim, "k", salts = 8,
      factor = 2)
    val rows = got.select("k", "payload", "kname", "is_heavy").collect()
    val want = fact.join(dim, Seq("k")).select("k", "payload", "kname")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rows.map(_.toSeq.take(3)).sortBy(_.toString) === want,
      "adaptive salting must be row-for-row transparent")
    // key 1 carries 90% of 1000 rows over 8 distinct keys: 900*8 >= 2*1000
    // -> heavy; every other key is far below the threshold
    val heavyKeys = rows.filter(_.getAs[Boolean]("is_heavy"))
      .map(_.getAs[Long]("k")).toSet
    assert(heavyKeys === Set(1L), s"expected only key 1 heavy, got $heavyKeys")
  }

  test("left join keeps unmatched fact rows with null dim columns") {
    val (fact, dim) = fixtures
    val extra = fact.union(Seq((99L, "orphan")).toDF("k", "payload"))
    val out = SkewJoin.saltedJoin(extra, dim, "k", salts = 4, joinType = "left")
    assert(out.count() === extra.count())
    val orphan = out.filter($"k" === 99L).collect()
    assert(orphan.length === 1 && orphan.head.getAs[String]("kname") == null)
  }

  test("hot key spreads across salts (no single-bucket straggler)") {
    val (fact, _) = fixtures
    val buckets = fact.withColumn("__salt",
        pmod(hash(col("payload")), lit(8)))
      .filter($"k" === 1L).groupBy("__salt").count().collect()
    assert(buckets.length > 4, s"hot key stuck in ${buckets.length} buckets")
  }
}
