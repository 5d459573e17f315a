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

  test("weighted sample: keep rate scales with the weight, deterministic") {
    // 200 docs at weight 0.1, 200 at weight 0.6 — with baseRate 1.5 the
    // effective rates are 0.15 and 0.9
    val w = (0 until 400).map(i =>
      (i.toLong, if (i < 200) 0.1 else 0.6)).toDF("id", "wt")
    val kept = DataMix.weightedSample(w, "id", "wt", baseRate = 1.5)
    val lo = kept.filter(col("wt") === 0.1).count()
    val hi = kept.filter(col("wt") === 0.6).count()
    assert(lo > 10 && lo < 50, s"low-weight kept $lo of 200 (expect ~30)")
    assert(hi > 160 && hi < 200, s"high-weight kept $hi of 200 (expect ~180)")
    // weight 0 drops everything; weight ≥ 1/baseRate keeps everything
    assert(DataMix.weightedSample(w.withColumn("wt", lit(0.0)),
      "id", "wt", 1.5).count() === 0L)
    assert(DataMix.weightedSample(w.withColumn("wt", lit(1.0)),
      "id", "wt", 1.5).count() === 400L)
    // identical decisions under a different partitioning
    val again = DataMix.weightedSample(w.repartition(7), "id", "wt", 1.5)
      .select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
  }

  test("tokenBudgetMix: limiting source kept whole, bulk source down-sampled") {
    // A: 100 docs × 10 tokens = 1000; B: 10 docs × 10 tokens = 100.
    // Equal shares → T* = 200, rate_B = 1 (B is the limiting source),
    // rate_A = 0.1; unlisted source C is dropped entirely.
    val text = "tok " * 9 + "tok" // 10 whitespace/BPE tokens
    val docs = ((1L to 100L).map(i => (i, text, "A")) ++
      (101L to 110L).map(i => (i, text, "B")) ++
      (111L to 120L).map(i => (i, text, "C")))
      .toDF("doc_id", "text", "source")
    val out = DataMix.tokenBudgetMix(docs, "doc_id", "text", "source",
        Map("A" -> 0.5, "B" -> 0.5)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens")))
    assert(out.forall(_._3 === 10L))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("B", 0) === 10, "limiting source must keep all")
    assert(!bySrc.contains("C"), "unlisted source must be dropped")
    val a = bySrc.getOrElse("A", 0)
    assert(a > 0 && a < 100, s"bulk source kept $a of 100 (expect ~10)")
    // a share-listed source with NO documents must not cap the others
    // (a_s = 0 would set T* = 0 and silently empty the whole mix)
    val withGhost = DataMix.tokenBudgetMix(docs, "doc_id", "text", "source",
      Map("A" -> 0.4, "B" -> 0.4, "GHOST" -> 0.2)).count()
    assert(withGhost > 0, "absent share-listed source emptied the mix")
  }

  test("temperatureMix flattens a skewed source distribution toward n^alpha") {
    // 400 / 100 / 25 docs; alpha=0.5 -> rates 0.25 / 0.5 / 1
    val skewed = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 500L).map(i => (i, "mid")) ++
      (500L until 525L).map(i => (i, "small"))).toDF("id", "source")
    val out = DataMix.temperatureMix(skewed, "id", "source", alpha = 0.5)
    val kept = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") === 25L, "smallest source must be kept whole")
    // expectations 100 / 50 / 25 — allow binomial noise
    assert(kept("big") > 70 && kept("big") < 130, s"big=${kept("big")}")
    assert(kept("mid") > 30 && kept("mid") < 70, s"mid=${kept("mid")}")
    // flattening: raw ratio 16:1 must compress toward 4:1
    assert(kept("big").toDouble / kept("small") < 8.0)
    // alpha = 1 is the identity
    assert(DataMix.temperatureMix(skewed, "id", "source", 1.0).count() === 525L)
    // decisions are partition-independent
    val again = DataMix.temperatureMix(skewed.repartition(11), "id",
      "source", 0.5).select("id").as[Long].collect().toSet
    assert(again === out.select("id").as[Long].collect().toSet)
  }

  test("reservoirSample: exactly k per group, tournament == single window") {
    val df = ((0L until 300L).map(i => (i, "A")) ++
      (300L until 320L).map(i => (i, "B")) ++
      (320L until 323L).map(i => (i, "C"))).toDF("id", "source")
    val out = DataMix.reservoirSample(df, "id", "source", k = 5, seed = "s0")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("rank")))
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGroup("A").size === 5 && byGroup("B").size === 5)
    assert(byGroup("C") === Set(320L, 321L, 322L),
      "group smaller than k comes back whole")
    assert(out.map(_._3).forall(r => r >= 1 && r <= 5))
    // the two-level tournament must equal the direct single-window top-k
    import org.apache.spark.sql.expressions.Window
    val direct = df.withColumn("__u",
        md5(concat(lit("s0:"), col("id").cast("string")).cast("binary")))
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy(col("__u"), col("id"))))
      .filter(col("r") <= 5).select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet === direct)
    // partition-independent and seed-sensitive
    val again = DataMix.reservoirSample(df.repartition(17), "id", "source",
      5, "s0").select("id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
    val other = DataMix.reservoirSample(df, "id", "source", 5, "s1")
      .select("id").as[Long].collect().toSet
    assert(other !== out.map(_._1).toSet)
  }

  test("weightedReservoir: exact k, weight-propelled, tournament == window") {
    // one row carries 10^6x the weight of the other 999 — A-ES makes its
    // key -ln(u)/w essentially 0, so it must be in any size-25 sample
    val df = ((0L until 999L).map(i => (i, 1L)) :+ (999L, 1000000L))
      .toDF("id", "wt")
    val out = DataMix.weightedReservoir(df, "id", "wt", k = 25, seed = "w0")
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids.size === 25)
    assert(ids.contains(999L), "heavy row missing from the weighted sample")
    // equals the direct single-window computation of the same keys
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(concat(lit("w0:"),
        col("id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") + lit(0.5)) / lit(4294967296.0)
    val direct = df.withColumn("key_nano",
        floor(-log(u) / col("wt").cast("double") * 1e9).cast("long"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("key_nano"), col("id"))))
      .filter(col("r") <= 25).select("id").as[Long].collect().toSet
    assert(ids === direct)
    // zero/negative weights are excluded, not sampled at rate ~0
    val withZero = df.withColumn("wt",
      when(col("id") < 990, lit(0L)).otherwise(col("wt")))
    val nz = DataMix.weightedReservoir(withZero, "id", "wt", 25, "w0")
    assert(nz.count() === 10L)
    assert(nz.select("id").as[Long].collect().forall(_ >= 990L))
    // partition-independent
    val again = DataMix.weightedReservoir(df.repartition(13), "id", "wt",
      25, "w0").select("id").as[Long].collect().toSet
    assert(again === ids)
  }

  test("stratifiedSplit: exact floor counts per stratum, deterministic") {
    val df = (1L to 100L).map(i => (i, if (i <= 60) "a" else "b"))
      .toDF("id", "cls")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = DataMix.stratifiedSplit(df, "id", "cls", fr, "s1")
    val byCls = out.groupBy("cls", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (c, s, n) => (c, s) -> n }.toMap
    // stratum a: n=60 -> 48/6/6; stratum b: n=40 -> 32/4/4
    assert(byCls === Map(("a", "train") -> 48L, ("a", "val") -> 6L,
      ("a", "test") -> 6L, ("b", "train") -> 32L, ("b", "val") -> 4L,
      ("b", "test") -> 4L))
    // reproducible and partition-count independent
    val a = out.select("id", "split").as[(Long, String)].collect().toSet
    val b = DataMix.stratifiedSplit(df.repartition(7), "id", "cls", fr, "s1")
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(a === b)
    // a different seed moves membership but not the counts
    val c = DataMix.stratifiedSplit(df, "id", "cls", fr, "s2")
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(c !== a)
  }
}
