package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured answer to "does grouped top-k deserve a custom physical
  * operator?" — window vs [[graft.plans.GroupedTopK]] on LARGE groups
  * (the regime the operator exists for: the window encoding shuffles and
  * sorts every row; the operator ships only ≤ groups·k·partitions
  * survivors through the exchange).
  *
  *   sbt "runMain graft.tools.GroupedTopKBench [nRows] [nGroups]"
  */
object GroupedTopKBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val nGroups = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(nRows)
      .select(pmod(col("id"), lit(nGroups.toLong)).as("g"),
        xxhash64(col("id")).as("v"), col("id"))
      .persist()
    df.count()

    def timed(label: String)(f: => Long): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        (System.nanoTime() - t0) / 1e9 -> r
      }
      println(f"  $label%-34s ${times.map(_._1).min}%7.2f s " +
        f"(rows ${times.head._2}%d)")
    }

    println(s"=== top-$k per group at $nRows rows / $nGroups groups ===")
    timed("window: row_number over sort") {
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .count()
    }
    timed("custom: partial/final heap operator") {
      graft.plans.GroupedTopK.topK(df, Seq("g"),
        Seq("v" -> true, "id" -> false), k).count()
    }
    spark.stop()
  }
}
