package graft.pipeline

import graft.SparkSpecBase
import graft.etl.Cleaning
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("cleaning chain: time cols dropped, headers lowercased, tags applied, sentinels filled") {
    val df = Seq(
      (1L, "A", Some(2.5), "fbval", "3"),
      (2L, null.asInstanceOf[String], None, null, null)
    ).toDF("ID", "Q1_Answer", "q_time_page1", "sbeh_mc_12_fb", "age_numeric")
      .withColumn("q_time_page1", lit(1.0))
    val out = Cleaning.cleanResponses(df)
    assert(!out.columns.exists(_.contains("_time")))
    assert(out.columns.contains("id") && out.columns.contains("q1_answer"))
    assert(out.columns.contains("sbeh_mc_12_fb_tgt")) // _fb auto-tagged
    assert(out.columns.contains("age")) // _numeric stripped
    val r2 = out.filter(col("id") === 2).head()
    assert(r2.getAs[String]("q1_answer") === "not selected")
  }

  test("numeric sentinel fills -999 and 'None' maps to null") {
    val df = Seq((1L, Some(5.0), "None"), (2L, None, "real")).toDF("id", "v", "s")
    val filled = Cleaning.fillSentinels(df)
    assert(filled.filter(col("id") === 2).head().getAs[Double]("v") === -999.0)
    val nn = Cleaning.noneToNull(df)
    assert(nn.filter(col("id") === 1).head().isNullAt(2))
  }

  test("question-bank recode maps stored codes to display labels") {
    val bank = Seq(
      ("q1_opinion", "q1", "att", "Strongly agree", "5"),
      ("q1_opinion", "q1", "att", "Disagree", "1"))
      .toDF("varname", "shortname", "category", "option_text", "option_value")
    val df = Seq((1L, "5"), (2L, "1"), (3L, "other")).toDF("id", "q1_opinion")
    val out = Cleaning.mapToOptionTitles(df, bank).orderBy("id").collect()
    assert(out(0).getString(1) === "Strongly agree")
    assert(out(1).getString(1) === "Disagree")
    assert(out(2).getString(1) === "other") // unmapped passes through
  }

  test("dedupColumns keeps the first occurrence of duplicated names") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq((1, "y")).toDF("id", "w")
    val joined = a.join(b, a("id") === b("id")) // two 'id' columns
    assert(joined.columns.count(_ == "id") === 2)
    val deduped = Cleaning.dedupColumns(joined)
    assert(deduped.columns.toSeq === Seq("id", "v", "w"))
    assert(deduped.head().getInt(0) === 1)
  }

  test("gower distance: zero for identical rows, bounded by 1") {
    val df = Seq(
      (1L, 10.0, "a"), (2L, 10.0, "a"), (3L, 20.0, "b")
    ).toDF("id", "num", "cat")
    val pairs = graft.metrics.ClusterQuality.gowerPairs(df, "id", Seq("num"), Seq("cat"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 0.0)
    assert(pairs((1L, 3L)) === 1.0) // max num distance + cat mismatch
    assert(pairs.values.forall(v => v >= 0 && v <= 1))
  }

  test("exact silhouette matches the sklearn-style golden (incl. singleton = 0)") {
    // numpy golden: points [[0,0],[0,1],[1,0],[5,5],[5,6],[9,0]],
    // labels [0,0,0,1,1,2] -> mean silhouette 0.70237518778043
    val df = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(0.0, 1.0), 0), (3L, Seq(1.0, 0.0), 0),
      (4L, Seq(5.0, 5.0), 1), (5L, Seq(5.0, 6.0), 1), (6L, Seq(9.0, 0.0), 2)
    ).toDF("id", "v", "label")
    val s = graft.metrics.ClusterQuality.silhouette(df, "id", "v", "label")
    assert(math.abs(s - 0.70237518778043) < 1e-10)
  }

  test("coerceNumerics converts all-numeric string cols only") {
    val df = Seq(("1.5", "abc"), ("2", "3")).toDF("nums", "mixed")
    val out = Cleaning.coerceNumerics(df)
    assert(out.schema("nums").dataType.typeName === "double")
    assert(out.schema("mixed").dataType.typeName === "string")
  }

  test("work queue: next unprocessed item, mark processed round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("queue").toString
    val queue = Seq(
      (1234L, "survey_a", Seq("kraken")),
      (1235L, "survey_b", Seq.empty[String]),
      (1236L, "survey_c", Seq("graft"))
    ).toDF("id", "title", "processed_by")
    val next = WorkQueue.nextSurvey(queue)
    assert(next.map(_.id) === Some(1234L)) // kraken != graft -> still unprocessed
    val marked = WorkQueue.markProcessed(queue, 1234L)
    val next2 = WorkQueue.nextSurvey(marked)
    assert(next2.map(_.id) === Some(1235L))
    // round-trip through JSON
    WorkQueue.writeQueue(marked, s"$dir/q")
    val reread = WorkQueue.readQueue(spark, s"$dir/q")
    assert(WorkQueue.nextSurvey(reread).map(_.id) === Some(1235L))
    // empty-queue case (reference test_assets.py empty case)
    val empty = WorkQueue.nextSurvey(queue.filter(col("id") < 0))
    assert(empty.isEmpty)
  }

  test("existence probe + write-if-absent caching guard (S4)") {
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    val df = Seq((1, "a")).toDF("id", "v")
    assert(!Sinks.exists(spark, s"$dir/out"))
    assert(Sinks.writeParquetIfAbsent(df, s"$dir/out"))
    assert(Sinks.exists(spark, s"$dir/out"))
    // second call: skipped, no error, data unchanged
    assert(!Sinks.writeParquetIfAbsent(df.union(df), s"$dir/out"))
    assert(spark.read.parquet(s"$dir/out").count() === 1)
  }

  test("orc sink/scan: round trip is lossless and filters push down") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    Sinks.orc(src, s"$dir/li")
    val back = Sinks.readOrc(spark, s"$dir/li")
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    assert(back.except(src).count() === 0 && src.except(back).count() === 0)
    // scan contracts survive the format switch: predicate reaches the
    // ORC reader, projection prunes to the referenced columns
    val plan = back.filter(col("l_quantity") > 40).select("l_orderkey")
      .queryExecution.executedPlan
      .toString()
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,"), plan)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("corrupt-tolerant json ingest: good rows parse, raw broken lines " +
      "land in the quarantine, repaired quarantine re-ingests") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("quar").toString
    val lines = Seq(
      """{"id": 1, "name": "ok-one"}""",
      """{"id": 2, "name": "ok-two"""", // truncated — malformed
      """{"id": "three", "name": "bad-type"}""", // unparseable id
      """{"id": 4, "name": "ok-three"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/in.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val good = Sinks.readJsonWithQuarantine(
      spark, s"$dir/in.jsonl", schema, s"$dir/quarantine")
    assert(good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "ok-one"), (4L, "ok-three")))
    val quarantined = spark.read.text(s"$dir/quarantine")
      .collect().map(_.getString(0)).toSet
    assert(quarantined === Set(lines(1), lines(2)))
    // the quarantine is replayable: repair and re-ingest through the
    // same reader — nothing new lands in quarantine
    val repaired = quarantined.map(_
      .replace("ok-two\"", "ok-two\"}").replace("\"three\"", "3"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/repaired.jsonl"),
      repaired.mkString("\n").getBytes("UTF-8"))
    val good2 = Sinks.readJsonWithQuarantine(
      spark, s"$dir/repaired.jsonl", schema, s"$dir/quarantine2")
    assert(good2.count() === 2)
    assert(!new java.io.File(s"$dir/quarantine2").exists() ||
      spark.read.text(s"$dir/quarantine2").count() === 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cdc apply: latest-wins merge with bucket-pruned rewrite; " +
      "untouched bucket files stay byte-identical; lookups prune") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    val init = (0L until 800L).map(k => (k, s"v$k")).toDF("k", "v")
    Sinks.writeKeyedBuckets(init, dir, "k", 16)
    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.lastModified(), f.length()))
        .toMap
    }
    val before = fileState()
    // update k=5 (two changes — seq 2 must win), delete k=6, insert k=900
    val batch = Seq((5L, "stale", "U", 1L), (5L, "fresh", "U", 2L),
      (6L, "gone", "D", 1L), (900L, "new", "I", 1L))
      .toDF("k", "v", "op", "seq")
    Sinks.applyCdc(spark, dir, batch, "k", "op", "seq", 16)
    val after = spark.read.parquet(dir).drop("bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (0L until 800L).map(k => k -> s"v$k").toMap -
      6L + (5L -> "fresh") + (900L -> "new")
    assert(after === expected)
    // untouched buckets: every pre-existing file outside the touched
    // buckets survives with identical mtime+size
    val touched = spark.range(1).select(
        Sinks.bucketId(lit(5L), 16), Sinks.bucketId(lit(6L), 16),
        Sinks.bucketId(lit(900L), 16))
      .head().toSeq.map(_.asInstanceOf[Int]).toSet
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"bucket=$b/")) }
    val nowState = fileState()
    untouchedBefore.foreach { case (p, st) =>
      assert(nowState.get(p) === Some(st), s"untouched file rewritten: $p")
    }
    assert(untouchedBefore.nonEmpty && touched.size >= 2)
    // key lookup prunes to the probed buckets (partition filter on the
    // bucket directory column, not a full listing)
    val lk = Sinks.lookupKeys(spark, dir, "k", Seq(5L, 900L), 16)
    assert(lk.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v")))
      .toSet === Set((5L, "fresh"), (900L, "new")))
    val plan = lk.queryExecution.executedPlan.toString()
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("bucket")), plan)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  test("cdc crash recovery: a commit crashed mid-swap (rename-out done, " +
      "rename-in skipped) is restored on the next applyCdc; re-applying " +
      "the batch equals a never-crashed sequence") {
    def table(dir: String): Map[Long, String] =
      spark.read.parquet(dir).drop("bucket")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val root = java.nio.file.Files.createTempDirectory("cdccr").toString
    val init = (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v")
    val b1 = Seq((3L, "b1", "U", 1L), (7L, "x", "D", 1L),
      (500L, "new", "I", 1L)).toDF("k", "v", "op", "seq")
    val b2 = Seq((3L, "b2", "U", 1L), (501L, "new2", "I", 1L))
      .toDF("k", "v", "op", "seq")
    // control: the never-crashed sequence
    val ctl = s"$root/ctl"
    Sinks.writeKeyedBuckets(init, ctl, "k", 8)
    Sinks.applyCdc(spark, ctl, b1, "k", "op", "seq", 8)
    Sinks.applyCdc(spark, ctl, b2, "k", "op", "seq", 8)
    val expected = table(ctl)
    // crashed run: apply b1, then SIMULATE the crash window commitBuckets
    // protects — one touched bucket renamed out to the backup, its staged
    // replacement never renamed in
    val t = s"$root/t"
    Sinks.writeKeyedBuckets(init, t, "k", 8)
    Sinks.applyCdc(spark, t, b1, "k", "op", "seq", 8)
    val goodAfterB1 = table(t)
    val bucketOfK3 = spark.range(1)
      .select(Sinks.bucketId(lit(3L), 8)).head().getInt(0)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${t}__cdc_backup"))
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$t/bucket=$bucketOfK3"),
      new org.apache.hadoop.fs.Path(s"${t}__cdc_backup/bucket=$bucketOfK3")))
    // the crash contract: re-apply the SAME batch, then continue. The
    // entry recovery must first restore the stranded bucket (without it,
    // the rewrite would read zero survivors for that bucket and drop
    // every unchanged key in it — the round-10 data-loss hole).
    Sinks.applyCdc(spark, t, b1, "k", "op", "seq", 8)
    assert(table(t) === goodAfterB1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t}__cdc_backup")))
    Sinks.applyCdc(spark, t, b2, "k", "op", "seq", 8)
    assert(table(t) === expected)
    // completed-swap crash state: bucket present in BOTH table and backup
    // (crash after rename-in, before backup delete) → recovery keeps the
    // table copy and drops the stale backup
    val stale = s"${t}__cdc_backup/bucket=$bucketOfK3"
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${t}__cdc_backup"))
    init.filter(col("k") === 3L)
      .withColumn("v", lit("STALE"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stale)
    Sinks.applyCdc(spark, t,
      Seq((502L, "n3", "I", 1L)).toDF("k", "v", "op", "seq"),
      "k", "op", "seq", 8)
    assert(table(t) === expected + (502L -> "n3"))
    assert(table(t)(3L) === "b2") // the stale backup copy did NOT win
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("cdc compaction: after N small batches + schema evolution the " +
      "table reads identically with one file per bucket and uniform " +
      "widest-schema footers") {
    val root = java.nio.file.Files.createTempDirectory("cdccomp").toString
    val dir = s"$root/t"
    Sinks.writeKeyedBuckets(
      (0L until 300L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", 8)
    // five small batches, one of which evolves the schema
    (1 to 5).foreach { i =>
      val b =
        if (i == 3) Seq((i.toLong, s"u$i", "extra", "U", 1L),
          (1000L + i, s"n$i", "extra", "I", 1L))
          .toDF("k", "v", "v2", "op", "seq")
        else Seq((i.toLong, s"u$i", "U", 1L), (1000L + i, s"n$i", "I", 1L))
          .toDF("k", "v", "op", "seq")
            .withColumn("v2", lit(null).cast("string"))
      Sinks.applyCdc(spark, dir, b, "k", "op", "seq", 8)
    }
    def parquetFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    // out-of-band backfill: a second file lands in one bucket dir (the
    // generic small-file case compaction collapses — applyCdc itself
    // keeps one file per touched bucket)
    val bfBucket = spark.range(1)
      .select(Sinks.bucketId(lit(2000L), 8)).head().getInt(0)
    Seq((2000L, "bf")).toDF("k", "v")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$dir/bucket=$bfBucket")
    assert(parquetFiles().groupBy(_.getParentFile.getName)
      .values.exists(_.size > 1))
    val before = spark.read.option("mergeSchema", "true").parquet(dir)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[String]("v2")))).toSet
    val filesBefore = parquetFiles().size
    Sinks.compactCdc(spark, dir)
    val after = spark.read.parquet(dir) // no mergeSchema needed anymore
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[String]("v2")))).toSet
    assert(after === before)
    val byBucket = parquetFiles().groupBy(_.getParentFile.getName)
    assert(byBucket.values.forall(_.size == 1),
      s"expected 1 file/bucket, got ${byBucket.view.mapValues(_.size).toMap}")
    assert(parquetFiles().size < filesBefore)
    // every footer carries the widest schema (uniform v2 column)
    assert(parquetFiles().forall { f =>
      spark.read.parquet(f.getAbsolutePath).columns.contains("v2") })
    // the sidecar survives compaction — pruned lookups still work
    val lk = Sinks.lookupKeys(spark, dir, "k", Seq(3L), 8)
    assert(lk.collect().map(_.getAs[String]("v")).toSeq === Seq("u3"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("cdc schema evolution: a batch with a NEW column widens the " +
      "table; later batches keep working against the mixed layout") {
    val dir = java.nio.file.Files.createTempDirectory("cdcev").toString + "/t"
    Sinks.writeKeyedBuckets(
      (0L until 64L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", 8)
    // evolved batch: adds column v2
    Sinks.applyCdc(spark,
      dir, Seq((1L, "upd", "yes", "U", 1L), (200L, "new", "yes", "I", 1L))
        .toDF("k", "v", "v2", "op", "seq"), "k", "op", "seq", 8)
    val t1 = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(t1.columns.contains("v2"))
    val m1 = t1.collect().map(r => r.getAs[Long]("k") ->
      Option(r.getAs[String]("v2"))).toMap
    assert(m1(1L) === Some("yes") && m1(200L) === Some("yes"))
    assert(m1(2L) === None) // untouched rows read null in the new column
    // a later NON-evolved batch against the mixed layout still merges
    Sinks.applyCdc(spark,
      dir, Seq((2L, "upd2", "U", 1L)).toDF("k", "v", "op", "seq"),
      "k", "op", "seq", 8)
    val t2 = spark.read.option("mergeSchema", "true").parquet(dir)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(t2(2L) === "upd2" && t2(1L) === "upd" && t2.size === 65)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  test("end-to-end segmentation battery on a planted survey") {
    val rows = (0 until 240).map { i =>
      val seg = i % 3
      val q1 = if (i % 10 < 8) Seq("tech_lover", "tech_neutral", "tech_hater")(seg)
        else "tech_neutral"
      val q2 = if (i % 10 < 7) Seq("urban", "suburban", "rural")(seg) else "urban"
      val opinion = Seq("agree", "neutral", "disagree")(seg)
      (i.toLong, q1, q2, opinion, 1.0)
    }
    val survey = rows.toDF("alchemer_id", "tech_q1_rb", "geo_q2", "psy_q3_tgt", "weight")
    val results = SegmentationPipeline.run(spark, survey,
      SegmentationPipeline.Config(
        idCol = "alchemer_id",
        clusterCols = Seq("tech_q1_rb", "geo_q2"),
        weightCol = Some("weight"),
        ks = 3 until 4,
        rulesCol = Some("tech_q1_rb")))
    assert(results.keySet === Set("kmeans", "kmodes", "rules_based", "lca"))
    // the COMPLETE get_all_metrics field family (metrics.py:814-911) must be
    // present for every algorithm — NaN where the reference emits np.nan
    val family = Set(
      "n_seed", "n_clusters", "silhouette", "davies_bouldin",
      "calinski_harabasz", "silhouette_random_ratio",
      "davies_bouldin_random_ratio", "calinski_harabasz_random_ratio",
      "fb_presence", "model_consistency", "label_consistency", "uniqueness",
      "communicability_average", "significant_variables",
      "significant_tgt_variables", "spread_of_significant_variables",
      "spread_of_significant_tgt_variables", "magnitude", "variability",
      "ml_signal", "chi2_signal", "message_reach_ml_signal",
      "massage_reach_chi2_signal", "chi2_signal_core_columns",
      "message_reach_optimal_signal", "core_columns",
      "percent_retained_for_core_cols")
    results.foreach { case (name, r) =>
      assert(r.metrics("n_clusters") >= 2, s"$name cluster count")
      assert(r.labeled.columns.contains("cluster"))
      val missing = family -- r.metrics.keySet
      assert(missing.isEmpty, s"$name metrics missing: $missing")
      // per-cluster flattened proportions cover every cluster
      assert(r.metrics.keys.count(_.startsWith("cluster_proportion_")) ===
        r.metrics("n_clusters").toInt, s"$name proportions")
    }
    // the kmeans path can refit, so its consistency pair is real (not NaN)
    assert(!results("kmeans").metrics("model_consistency").isNaN)
    assert(!results("kmeans").metrics("label_consistency").isNaN)
    assert(!results("kmeans").metrics("silhouette").isNaN)
    // psy_q3_tgt exists -> the tgt-gated family is computed on the kmeans
    // path (features available): ml + chi2 signal and variability are real
    assert(!results("kmeans").metrics("ml_signal").isNaN)
    assert(!results("kmeans").metrics("chi2_signal").isNaN)
    assert(!results("kmeans").metrics("variability").isNaN)
    // kmodes has no feature vectors -> geometry + ml_signal NaN, per the
    // reference's conditional; the chi2 branch still runs
    assert(results("kmodes").metrics("ml_signal").isNaN)
    assert(results("kmodes").metrics("silhouette").isNaN)
    assert(!results("kmodes").metrics("chi2_signal").isNaN)
    // planted psy variable must be flagged significant for at least one algo
    assert(results.values.exists(_.deliver.count() > 0))
    // metrics csv sink round-trip
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val metricsDf = results("kmeans").metrics.toSeq.toDF("metric", "value")
    Sinks.metricsCsv(metricsDf, s"$dir/metrics")
    assert(spark.read.option("header", true).csv(s"$dir/metrics").count() > 0)
  }

  test("bucketed tables join with ZERO exchange and aggregate without one") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Sinks.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    // tiny test tables would broadcast-join (which needs no distribution,
    // so the planner rightly disables the bucketed scan); force the
    // shuffle-join path the bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // the shuffle was paid once at write time: the join replans with no
      // Exchange on either side (and no per-query sort — data is
      // bucket-local sorted)
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      assert(joined.count() === l.count())
      // aggregation on the bucket key also skips its exchange
      val agg = spark.table("b_lineitem").groupBy("o_orderkey")
        .agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      // correctness unchanged vs the unbucketed join
      val a = joined.groupBy().agg(count(lit(1)), sum("l_quantity"))
        .head().toSeq
      val b = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy().agg(count(lit(1)), sum("l_quantity")).head().toSeq
      assert(a === b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
