package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured answer to "does [[graft.text.BpeMerge.applyMerge]]'s
  * interpreted `aggregate` fold need a codegen port?" — the fold runs on
  * the VOCABULARY table (bounded rows), so the question only matters if a
  * ~10⁶-word vocab makes the interpreted lambda dominate an iteration.
  *
  * Synthesizes a million-word vocab (md5-hex words, 32 symbols each — a
  * PESSIMISTIC word length; real unicode vocabs average far shorter), then
  * times one BPE iteration's two phases separately:
  *   (a) pair counting — explode + hash agg + 1-row argmax (the shuffle);
  *   (b) merge application — the interpreted fold over every word.
  *
  *   sbt "runMain graft.tools.BpeVocabBench [nWords]"
  */
object BpeVocabBench {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic vocab: distinct md5-hex words, Zipf-ish freq from id
    val words = spark.range(nWords.toLong)
      .select(md5(col("id").cast("string")).as("w"),
        (lit(1L) + col("id") % 97).as("freq"))
      .withColumn("syms", split(col("w"), ""))
      .persist()
    words.count()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warm-up: force codegen paths once so neither phase is billed startup
    words.select(sum(size(col("syms")))).collect()

    println(s"=== BPE iteration phases at $nWords-word vocab (32 syms/word) ===")
    val best = timed("pair counting (explode+agg+argmax)") {
      words.select(col("freq"), explode(
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("x"),
              element_at(col("syms"), i + 2).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y")).limit(1).collect()
    }
    val (x, y) = (best(0).getString(0), best(0).getString(1))
    println(s"  best pair: ('$x','$y') cnt=${best(0).getLong(2)}")
    timed("merge (composed aggregate fold)") {
      words.select(sum(size(graft.text.BpeMerge
        .applyMergeComposedCol(col("syms"), x, y)))).collect()
    }
    timed("merge (codegen'd BpeMergeFold)") {
      words.select(sum(size(
        graft.text.BpeMerge.applyMergeCol(col("syms"), x, y)))).collect()
    }
    // the comparison scalar: a codegen'd pass over the same arrays doing
    // trivial work — the floor any expression-based port could reach
    timed("codegen floor (size-only pass)") {
      words.select(sum(size(col("syms")))).collect()
    }
    spark.stop()
  }
}
