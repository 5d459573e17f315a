package graft.tools
import org.apache.spark.sql.SparkSession
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = graft.sim.SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    for ((nl, np) <- Seq((16,2),(16,4),(16,6),(8,2),(8,3),(32,6),(16,8))) {
      val g = graft.sim.SimilarityOps.knnGraph(emb, "vec_id", "embedding", nl, np, 3).collect()
      val hits = g.count(r => exact((r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))))
      println(f"nList=$nl nProbe=$np recall=${hits.toDouble/exact.size}%.3f cand-bound=${g.length}")
    }
    spark.stop()
  }
}
