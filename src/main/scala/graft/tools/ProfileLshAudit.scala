package graft.tools

import graft.Tables
import graft.dedup.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of q_d_lsh_audit (the round-15 bench
  * leader at ~24 s): seed the same stages bandingAudit composes —
  * shingles, the 8×sha256 minhash pass, the band self-join, the
  * prefix-Jaccard ground truth, the confusion join — and time each
  * with a noop write so the dominant cost is located, not guessed. */
object ProfileLshAudit {
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

    val shingleK = 3
    val t = graft.text.TextOps.tokens(lower(col("text")))
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(
        when(size(t) >= shingleK,
          transform(sequence(lit(0), size(t) - shingleK),
            i => concat_ws(" ", (0 until shingleK).map(o =>
              element_at(t, i + o + 1)): _*)))
          .otherwise(array().cast("array<string>"))))
        .as("shingle"))
      .cache()
    timed("shingles (cache+count)")(
      println(s"[profile]   shingle rows = ${sh.count()}"))

    val nH = 8
    val hexed = sh.select((col("id") +:
      (0 until nH).map(i =>
        expr(s"sha2(concat('$i:', shingle), 256)").as(s"x$i"))): _*)
    timed("8x sha256 only")(noop(hexed))

    def hex48(hexCol: String): String =
      (1 to 12).map(p =>
        s"(instr('0123456789abcdef', substr($hexCol, $p, 1)) - 1) * ${
          BigInt(16).pow(12 - p)}L").mkString("(", " + ", ")")
    val hashed = hexed.select((col("id") +:
      (0 until nH).map(i => expr(hex48(s"x$i")).as(s"v$i"))): _*)
    timed("+ hex48 parse")(noop(hashed))

    val minh = hashed.groupBy("id").agg(count(lit(1)).as("sz"),
      (0 until nH).map(i => min(col(s"v$i")).as(s"h$i")): _*)
      .cache()
    timed("minhash agg (cache+count)")(
      println(s"[profile]   docs with minhash = ${minh.count()}"))

    val banded = minh.select(col("id"), explode(array(
      (0 until 4).map(b => struct((lit(b).as("band") +:
        (0 until 2).map(r =>
          col(s"h${b * 2 + r}").as(s"k$r"))): _*)): _*))
      .as("bk"))
    val cand = banded.toDF("ida", "bk")
      .join(banded.toDF("idb", "bk"), Seq("bk"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    timed("band self-join + distinct")(noop(cand))

    val truth = timed("prefixJaccard truth (build)") {
      DedupOps.prefixJaccardPairs(docs, "doc_id", "text", shingleK, 0.5)
        .select("ida", "idb")
    }
    timed("prefixJaccard truth (run)")(noop(truth))

    val joined = truth.withColumn("t", lit(1L))
      .join(cand.withColumn("c", lit(1L)), Seq("ida", "idb"),
        "full_outer")
    timed("confusion agg (cand+truth rerun)")(noop(joined.agg(
      sum(coalesce(col("t"), lit(0L))).as("n_true"),
      sum(coalesce(col("c"), lit(0L))).as("n_cand"))))
    spark.stop()
  }
}
