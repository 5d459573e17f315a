package graft.tools

import graft.Tables
import graft.dedup.{DedupOps, DupClusters}
import graft.etl.DataMix
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of q_pipeline_corpus (~12 s at
  * sf0.1) — clean/dedup/persist, SimHash pairs, edit verify, the CC
  * canonicalization loop, decontamination, quality + sampling. */
object ProfileCorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val all = Tables.documents(spark, sfDir)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val docs = all.filter(pmod(col("doc_id"), lit(29)) =!= 0)
    val bench = all.filter(pmod(col("doc_id"), lit(29)) === 0)

    val cleaned = TextOps.cleanText(docs, "doc_id", "text")
      .select(col("doc_id"), col("clean"))
    timed("cleanText")(noop(cleaned))
    val keepIds = DedupOps.exactDedup(cleaned, "doc_id", "clean")
      .select(col("keep").as("doc_id"))
    val surv = cleaned.join(keepIds, Seq("doc_id")).persist()
    timed("exact dedup + persist")(
      println(s"[profile]   survivors = ${surv.count()}"))

    val pairs = DedupOps.simhashPairs(surv, "doc_id", "clean")
    timed("simhash pairs")(noop(pairs))
    timed("pairs count")(println(s"[profile]   pairs = ${pairs.count()}"))

    val confirmed = DedupOps.editVerify(surv, pairs, "doc_id", "clean")
      .filter(col("confirmed")).select("ida", "idb")
    timed("edit verify count#1")(
      println(s"[profile]   confirmed = ${confirmed.count()}"))
    val conf32 = DedupOps.editVerify(surv,
        pairs.repartition(32, col("ida"), col("idb")), "doc_id", "clean")
      .filter(col("confirmed")).select("ida", "idb")
    timed("edit verify repart32")(noop(conf32))
    val confThresh = {
      val t = surv.select(col("doc_id").as("__id"),
        coalesce(substring(col("clean"), 1, 200), lit("")).as("__t"))
      pairs.select("ida", "idb")
        .repartition(32, col("ida"), col("idb"))
        .join(t.toDF("ida", "ta"), Seq("ida"), "left")
        .join(t.toDF("idb", "tb"), Seq("idb"), "left")
        .withColumn("d", levenshtein(col("ta"), col("tb"), 40))
        .filter(col("d") >= 0 &&
          col("d") <= lit(0.2) * greatest(length(col("ta")), length(col("tb"))))
        .select("ida", "idb")
    }
    timed("edit verify repart32+thresh")(noop(confThresh))
    val confC = confirmed.cache()
    timed("confirmed cache+count")(
      println(s"[profile]   confirmed = ${confC.count()}"))

    val champions = timed("canonicalize build (CC loop)") {
      DupClusters.canonicalize(surv, confC, "doc_id", "clean")
        .filter(col("is_canonical") === 1)
        .select(col("doc_id"), col("cluster_size"))
        .join(surv, Seq("doc_id"))
    }
    val champC = champions.cache()
    timed("canonicalize run")(
      println(s"[profile]   champions = ${champC.count()}"))

    val decon = DedupOps.decontaminate(champC, "doc_id", "clean",
        bench, "text")
      .filter(!col("contaminated")).select("doc_id")
    timed("decontaminate")(noop(decon))

    val cleanCorpus = champC.join(decon, Seq("doc_id"))
    val quality = TextOps.qualityFeatures(cleanCorpus, "doc_id", "clean")
      .select(col("doc_id"), col("stopword_ratio"))
    val out = DataMix.weightedSample(
        cleanCorpus.join(quality, Seq("doc_id")),
        "doc_id", "stopword_ratio", 1.5)
      .select(col("doc_id"),
        length(col("clean")).cast("long").as("n_chars_clean"),
        col("cluster_size"), col("stopword_ratio"))
    timed("quality + sample (decon rerun)")(noop(out))
    spark.stop()
  }
}
