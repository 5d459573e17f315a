package graft.stats

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("weights are a seeded deterministic Poisson(1): bounded 0..6, " +
      "mean near 1, bit-identical across runs") {
    val u = graft.etl.DataMix.uniformHash(
      concat(col("doc_id").cast("string"), lit(":"), col("b").cast("string")))
    val w = docs.withColumn("b", explode(sequence(lit(1), lit(16))))
      .withColumn("w", Bootstrap.poissonWeight(u))
    val stats = w.agg(min("w"), max("w"), avg("w"), count(lit(1))).head()
    assert(stats.getLong(0) >= 0L && stats.getLong(1) <= 6L)
    // 8000 draws of Poisson(1): mean within 5 sigma of 1
    assert(math.abs(stats.getDouble(2) - 1.0) <
      5.0 / math.sqrt(stats.getLong(3).toDouble))
    val a = Bootstrap.poissonBootstrap(docs, "source", "n_chars",
      "doc_id", 16).orderBy("source", "b").collect().toSeq
    val b = Bootstrap.poissonBootstrap(docs, "source", "n_chars",
      "doc_id", 16).orderBy("source", "b").collect().toSeq
    assert(a === b)
  }

  test("replicate means vary around the point estimate and stay inside " +
      "the group's value range") {
    val out = Bootstrap.poissonBootstrap(docs, "source", "n_chars",
      "doc_id", 16)
    val perSrc = out.filter(col("n_eff") > 0)
      .groupBy("source")
      .agg(min("mean_micro").as("lo"), max("mean_micro").as("hi"),
        countDistinct("mean_micro").as("distinct_means"))
    val bounds = docs.groupBy("source")
      .agg((min("n_chars") * 1000000L).as("vlo"),
        (max("n_chars") * 1000000L).as("vhi"))
    val j = perSrc.join(bounds, "source").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Long]("distinct_means") > 1,
        s"${r.getString(0)}: resampling produced no variation")
      assert(r.getAs[Long]("lo") >= r.getAs[Long]("vlo"))
      assert(r.getAs[Long]("hi") <= r.getAs[Long]("vhi"))
    }
  }

  test("a replicate that samples a group to extinction reports null, " +
      "not a 0-divide") {
    // single-item groups: some (group, replicate) draws get weight 0
    val tiny = docs.limit(40).withColumn("g", col("doc_id").cast("string"))
    val out = Bootstrap.poissonBootstrap(tiny, "g", "n_chars", "doc_id", 16)
    val extinct = out.filter(col("n_eff") === 0)
    assert(extinct.count() > 0, "expected some zero-weight replicates")
    assert(extinct.filter(col("mean_micro").isNotNull).count() === 0L)
  }
}
