package graft.multimodal

import graft.SparkSpecBase

class VisualClustersSpec extends SparkSpecBase {
  import spark.implicits._

  test("pairs close transitively, singletons self-label, min id " +
      "canonicalizes") {
    val ids = (1L to 6L).toDF("doc_id")
    // 1-2, 2-3 chain; 5-6 pair; 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("ida", "idb")
    val out = MultimodalOps.visualClusters(ids, "doc_id", pairs)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, 1), (2L, 1L, 3L, 0), (3L, 1L, 3L, 0),
      (4L, 4L, 1L, 1), (5L, 5L, 2L, 1), (6L, 5L, 2L, 0)))
  }
}
