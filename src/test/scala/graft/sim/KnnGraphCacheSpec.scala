package graft.sim

import graft.{SparkSpecBase, Tables}

class KnnGraphCacheSpec extends SparkSpecBase {

  test("same (session, dir, params) returns the one frozen frame") {
    val a = KnnGraphCache.edges(spark, sf, 16, 4, 5)
    val b = KnnGraphCache.edges(spark, sf, 16, 4, 5)
    assert(a eq b)
  }

  test("cached edges are bit-identical to a fresh knnGraph build") {
    val cached = KnnGraphCache.edges(spark, sf, 16, 4, 5)
      .collect().map(_.toSeq).toSet
    val fresh = SimilarityOps.knnGraph(Tables.embeddings(spark, sf),
        "vec_id", "embedding", 16, 4, 5)
      .collect().map(_.toSeq).toSet
    assert(cached === fresh)
  }

  test("different parameters key different entries") {
    val a = KnnGraphCache.edges(spark, sf, 16, 4, 5)
    val b = KnnGraphCache.edges(spark, sf, 16, 4, 3)
    assert(!(a eq b))
    assert(b.collect().forall(_.getAs[Long]("rank") <= 3L))
  }

  test("the frozen frame survives spark.catalog.clearCache() (the Verify/Bench inter-query reset)") {
    val a = KnnGraphCache.edges(spark, sf, 16, 4, 5)
    val before = a.count()
    spark.catalog.clearCache()
    assert(a.count() === before)
    // still the same entry — no rebuild on re-request
    assert(KnnGraphCache.edges(spark, sf, 16, 4, 5) eq a)
  }
}
