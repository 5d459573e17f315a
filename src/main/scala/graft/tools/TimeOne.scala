package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Isolated per-query timer for local iteration:
  *   runMain graft.tools.TimeOne <sfDir> <query>[,<query>...] [--explain]
  * Times each query with the same noop-write full-plan execution Bench
  * uses (two runs, both printed — first includes per-query plan/codegen
  * setup, second is the warm number). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    names.foreach { name =>
      // untimed inter-query GC — same hygiene as Bench: let the
      // ContextCleaner reclaim the previous query's broadcast/shuffle
      // debris so its cost doesn't land in this query's numbers
      System.gc()
      val fn = SparkEntry.queries(name)
      if (explain)
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeone] $name%s: cold ${times(0)}%.2f s, warm ${times(1)}%.2f s")
    }
    spark.stop()
  }
}
