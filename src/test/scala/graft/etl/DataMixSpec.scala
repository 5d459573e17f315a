package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DataMixSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = (0L until 400L)
    .map(i => (i, s"src${i % 4}")).toDF("id", "source")

  test("mix sample honors per-source rates and is partition-independent") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val kept = DataMix.mixSample(docs, "id", "source", rates, defaultRate = 0.25)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") === 100L) // rate 1.0 keeps everything
    // hash-threshold sampling: expected 50 ± binomial noise
    assert(kept("src1") > 30 && kept("src1") < 70, s"src1=${kept("src1")}")
    assert(kept.getOrElse("src2", 0L) < kept("src1"))
    // identical decisions under a different partitioning
    val repart = DataMix.mixSample(docs.repartition(13), "id", "source",
      rates, defaultRate = 0.25).select("id").as[Long].collect().toSet
    val once = DataMix.mixSample(docs, "id", "source",
      rates, defaultRate = 0.25).select("id").as[Long].collect().toSet
    assert(repart === once)
  }

  test("mix sample at rate 0 drops a source entirely") {
    val kept = DataMix.mixSample(docs, "id", "source",
      Map("src3" -> 0.0), defaultRate = 1.0)
    assert(kept.filter(col("source") === "src3").count() === 0L)
    assert(kept.count() === 300L)
  }
}
