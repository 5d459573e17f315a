package graft.sim

import graft.SparkSpecBase

class ClusterLabelsSpec extends SparkSpecBase {
  import spark.implicits._

  test("c-TF-IDF: cluster-exclusive terms score ctf*ln(C/df), shared " +
      "terms zero out, small clusters are excluded") {
    val clusters = Seq(
      (1L, 10L, 2L), (2L, 10L, 2L),   // cluster 10, size 2
      (3L, 20L, 2L), (4L, 20L, 2L),   // cluster 20, size 2
      (5L, 30L, 1L)                   // singleton -> excluded
    ).toDF("vec_id", "cluster", "cluster_size")
    val docs = Seq(
      (1L, "apple apple banana x"), (2L, "apple"),
      (3L, "dog x"), (4L, "dog cat"),
      (5L, "noise")
    ).toDF("doc_id", "text")
    val out = ClusterLabels.labelClusters(clusters, docs, "doc_id",
      "text", k = 2, minSize = 2).orderBy("cluster", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val ln2 = math.log(2.0)
    // cluster 10: apple ctf 3 df 1 -> 3ln2; banana 1ln2; x df 2 -> 0
    assert(out(0) === ((10L, 1L, "apple",
      math.floor(3 * ln2 * 1e6).toLong)))
    assert(out(1) === ((10L, 2L, "banana",
      math.floor(ln2 * 1e6).toLong)))
    // cluster 20: dog ctf 2 -> 2ln2; cat 1ln2
    assert(out(2) === ((20L, 1L, "dog",
      math.floor(2 * ln2 * 1e6).toLong)))
    assert(out(3) === ((20L, 2L, "cat",
      math.floor(ln2 * 1e6).toLong)))
    // the singleton's vocabulary never appears
    assert(!out.exists(_._3 == "noise"))
  }
}
