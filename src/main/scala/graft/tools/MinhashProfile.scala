package graft.tools

import graft.Tables
import graft.dedup.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the banded-MinHash dedup at bench scale: counts
  * and wall-clock per stage, to locate the dominant cost (candidate-join
  * blowup vs shingle aggregation vs verify join). */
object MinhashProfile {
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
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs = ${docs.count()}")

    val sh = DedupOps.shingles(
        docs.withColumn("__blk", lit(1)), "doc_id", "text", "__blk", 3)
      .select(col("id"), col("shingle")).distinct().cache()
    timed("shingles distinct+cache")(println(s"[profile]   shingle rows = ${sh.count()}"))

    val numBands = 4; val rowsPerBand = 2
    val nHashes = numBands * rowsPerBand
    val minhashes = sh.groupBy("id").agg(
      min(xxhash64(lit(0), col("shingle"))).as("h0"),
      (1 until nHashes).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)
    timed("minhash agg")(minhashes.write.format("noop").mode("overwrite").save())

    val banded = minhashes.select(col("id"), explode(array(
      (0 until numBands).map { b =>
        struct(lit(b).as("band"),
          hash((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
            .as("key"))
      }: _*)).as("bk")).cache()
    banded.count()

    // bucket skew: largest band buckets
    timed("bucket histogram") {
      banded.groupBy("bk").count().orderBy(col("count").desc).show(10, false)
    }

    val cands = banded.toDF("ida", "bk")
      .join(banded.toDF("idb", "bk"), Seq("bk"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct().cache()
    timed("candidate join+distinct")(println(s"[profile]   cands = ${cands.count()}"))

    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val shared = cands
      .join(sh.toDF("ida", "shingle"), Seq("ida"))
      .join(sh.toDF("idb", "shingle"), Seq("idb", "shingle"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
    timed("verify join") {
      val out = cands.join(shared, Seq("ida", "idb"), "left")
        .na.fill(Map("shared" -> 0L))
        .join(sizes.toDF("ida", "sza"), "ida")
        .join(sizes.toDF("idb", "szb"), "idb")
        .withColumn("jaccard_dist", round(lit(1.0) -
          col("shared") / (col("sza") + col("szb") - col("shared")), 6))
        .filter(col("jaccard_dist") <= 0.5)
      println(s"[profile]   final pairs = ${out.count()}")
    }
    spark.stop()
  }
}
