package graft.tools

import graft.Tables
import graft.dedup.DedupOps
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of q_d_prefix_jaccard (~8 s at
  * sf0.1, and the truth pass inside q_d_lsh_audit): shingles, the
  * document-frequency attach + per-doc rarity ranking window, the
  * prefix candidate self-join, and the exact verify join — each timed
  * with a noop write. */
object ProfilePrefixJaccard {
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

    val docs = Tables.documents(spark, sfDir)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val k = 3
    val threshold = 0.5

    val sh = DedupOps.shingles(docs.withColumn("__blk", lit(1)),
      "doc_id", "text", "__blk", k).select("id", "shingle").cache()
    timed("shingles (cache+count)")(
      println(s"[profile]   rows = ${sh.count()}"))

    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    timed("freq agg")(noop(freq))

    val wDoc = Window.partitionBy("id").orderBy(col("df"), col("shingle"))
    val szW = Window.partitionBy("id")
    val prefix = sh.join(freq, "shingle")
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(szW))
      .filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("id", "shingle")
    timed("freq join + windows + prefix")(noop(prefix))
    val prefixC = prefix.cache()
    timed("prefix (cache+count)")(
      println(s"[profile]   prefix rows = ${prefixC.count()}"))

    val cands = prefixC.toDF("ida", "shingle")
      .join(prefixC.toDF("idb", "shingle"), Seq("shingle"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    timed("prefix self-join + distinct")(noop(cands))
    val candsC = cands.cache()
    timed("cands (cache+count)")(
      println(s"[profile]   cand pairs = ${candsC.count()}"))

    val docSets = sh.groupBy("id")
      .agg(collect_list(col("shingle")).as("set"))
    timed("docSets agg")(noop(docSets))
    val shared = candsC
      .join(docSets.toDF("ida", "__sa"), "ida")
      .join(docSets.toDF("idb", "__sb"), "idb")
      .select(col("ida"), col("idb"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("shared"),
        size(col("__sa")).cast("long").as("sza"),
        size(col("__sb")).cast("long").as("szb"))
    timed("set attach + intersect")(noop(shared))
    val out = shared
      .filter(col("shared") /
        (col("sza") + col("szb") - col("shared")) >= threshold)
    timed("filter (full rerun)")(noop(out))
    spark.stop()
  }
}
