package graft.sketch

import graft.SparkSpecBase

class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  // zipf-ish stream: value i appears ~ n/i times, plus noise singletons
  private def zipf(n: Int): Seq[String] =
    (1 to 8).flatMap(i => Seq.fill(n / i)(s"v$i")) ++
      (1 to n / 4).map(i => s"noise$i")

  test("sketch: undercounts by at most n/(cap+1); frequent items survive") {
    val data = scala.util.Random.shuffle(zipf(400)) // fixed-free: property holds for any order
    val cap = 16
    val sk = HeavyHitters.sketch(data.iterator, cap)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = data.size.toLong / (cap + 1)
    sk.foreach { case (v, c) =>
      assert(c <= exact(v), s"$v overcounted")
      assert(exact(v) - c <= bound, s"$v undercounted past n/(cap+1)")
    }
    exact.collect { case (v, c) if c > bound => v }
      .foreach(v => assert(sk.contains(v), s"frequent $v missing from sketch"))
  }

  test("merge: associative prune keeps the undercount bound") {
    val a = zipf(300).take(150)
    val b = zipf(300).drop(150)
    val cap = 16
    val merged = HeavyHitters.mergeAndPrune(
      HeavyHitters.sketch(a.iterator, cap),
      HeavyHitters.sketch(b.iterator, cap), cap)
    val exact = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = (a.size + b.size).toLong / (cap + 1)
    assert(merged.size <= cap)
    merged.foreach { case (v, c) => assert(c <= exact(v)) }
    exact.collect { case (v, c) if c > 2 * bound => v } // merge doubles slack
      .foreach(v => assert(merged.contains(v), s"frequent $v lost in merge"))
  }

  test("topK: equals the exact distributed top-k on skewed data") {
    val df = zipf(1000).toDF("w").repartition(7)
    val got = HeavyHitters.topK(df, "w", 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = df.groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (w, c) => (-c, w) }.take(5).toSeq
    assert(got === want)
  }

  test("hll state: parquet round trip is bit-exact, straddling batches " +
      "merge without double count, estimate within bound") {
    val rows = (0 until 12000).map(i => ("g" + (i % 2), (i % 8000).toLong))
    // split so ~2000 values per group appear in BOTH batches — the union
    // must dedupe them, not add counts
    val a = rows.take(7000).toDF("g", "v")
    val b = rows.drop(5000).toDF("g", "v")
    val sa = HeavyHitters.buildHllState(a, Seq("g"), "v")
    val sb = HeavyHitters.buildHllState(b, Seq("g"), "v")
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    sa.write.mode("overwrite").parquet(s"$dir/state")
    val saBack = spark.read.parquet(s"$dir/state")
    // sketch bytes survive the parquet round trip bit-identically
    def bytes(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("hll").toSeq).toMap
    assert(bytes(saBack) === bytes(sa))
    val est = HeavyHitters.estimateHll(
        HeavyHitters.mergeHllStates(Seq("g"), saBack, sb))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct_est"))
      .toMap
    val exact = rows.distinct.groupBy(_._1).view.mapValues(_.size).toMap
    Seq("g0", "g1").foreach { g =>
      val (e, x) = (est(g).toDouble, exact(g).toDouble)
      assert(math.abs(e - x) <= 5 * 1.04 / math.sqrt(4096) * x,
        s"$g: est $e vs exact $x")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
