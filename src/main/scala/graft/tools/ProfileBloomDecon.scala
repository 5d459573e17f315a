package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of q_d_bloom_decon (~5 s at sf0.1):
  * benchmark gram set, bitmap build, corpus gram generation, the
  * bloom-probe filter, and the exact verify join. */
object ProfileBloomDecon {
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
    // replicate the registered split (q_d_decontaminate convention)
    val docs = all.filter(pmod(col("doc_id"), lit(29)) =!= 0)
    val bench = all.filter(pmod(col("doc_id"), lit(29)) === 0)
    val n = 5; val mBits = 1 << 16; val kHash = 3

    def grams(df: org.apache.spark.sql.DataFrame, id: String) =
      graft.dedup.DedupOps.shingles(
        df.withColumn("__blk", lit(1)), id, "text", "__blk", n)
        .select(col("id"), col("shingle").as("g"))

    val bg = grams(bench.select(lit(0L).as("__bid"), col("text")), "__bid")
      .select("g").distinct().persist()
    timed("bench grams distinct+persist")(
      println(s"[profile]   bench grams = ${bg.count()}"))

    def positions(g: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(kHash)), j =>
        pmod(xxhash64(j, g), lit(mBits.toLong)))
    val bitmap = bg.select(explode(positions(col("g"))).as("p"))
      .select(expr("p div 64").as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("bw"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bw"))))
        .as("bm"))
    timed("bitmap build")(noop(bitmap))

    val corpusGrams = grams(docs, "doc_id")
    timed("corpus grams")(noop(corpusGrams))

    val probed = corpusGrams
      .withColumn("__ps", positions(col("g")))
      .crossJoin(broadcast(bitmap))
      .filter(expr("forall(__ps, p -> " +
        "(coalesce(element_at(bm, p div 64), 0L) & " +
        "shiftleft(1L, cast(p % 64 as int))) != 0)"))
      .select("id", "g")
    timed("bloom probe filter (grams rerun)")(noop(probed))

    val hits = probed.join(broadcast(bg), "g")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    val out = docs.select(col("doc_id").as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0).as("contaminated"))
    timed("verify + assemble (full rerun)")(noop(out))
    spark.stop()
  }
}
