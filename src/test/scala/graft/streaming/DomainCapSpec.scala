package graft.streaming

import graft.SparkSpecBase
import graft.text.UrlOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DomainCapSpec extends SparkSpecBase {
  import spark.implicits._

  // a hot hub domain plus a long tail, ids zero-padded so string order
  // is arrival order
  private val docs = (1 to 30).map { i =>
    val dom = if (i % 3 == 0) "hub.com" else s"site${i % 5}.org"
    (dom, f"d$i%03d")
  }

  test("streamed keep/drop equals the batch capDocuments gate when " +
      "docs arrive in the batch order (quotas from domainCaps)") {
    implicit val sqlCtx = spark.sqlContext
    val df = docs.toDF("domain", "doc_id")
    val capMicro = 150000L // 15% share
    val quotas = UrlOps.domainCaps(df, "domain", capMicro)
      .collect().map(r => r.getAs[String]("domain") ->
        r.getAs[Long]("quota")).toMap
    val batchKept = UrlOps.capDocuments(df, "domain", "doc_id", capMicro)
      .filter(col("kept")).collect().map(_.getAs[String]("doc_id")).toSet
    val input = MemoryStream[(String, String)]
    val q = Streams.streamingDomainCap(input.toDS(), quotas, 0L)
      .writeStream.format("memory").queryName("cap_parity")
      .outputMode("append").start()
    val (b1, b2) = docs.sortBy(_._2).splitAt(13) // arrival = id order
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.table("cap_parity").collect()
    q.stop()
    assert(streamed.length === docs.length) // one verdict per doc
    val streamKept = streamed.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[String]("docId")).toSet
    assert(streamKept === batchKept)
  }

  test("quota zero drops everything, unknown domains use the default, " +
      "and ranks keep counting across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = Streams.streamingDomainCap(input.toDS(),
      Map("blocked.com" -> 0L), defaultQuota = 2L)
      .writeStream.format("memory").queryName("cap_quota")
      .outputMode("append").start()
    input.addData(("blocked.com", "b1"), ("new.net", "n1"), ("new.net", "n2"))
    q.processAllAvailable()
    input.addData(("new.net", "n3"), ("blocked.com", "b2"))
    q.processAllAvailable()
    val rows = spark.table("cap_quota").collect()
      .map(r => r.getAs[String]("docId") ->
        (r.getAs[Long]("rank"), r.getAs[Boolean]("kept"))).toMap
    q.stop()
    assert(rows("b1") === ((1L, false)))
    assert(rows("b2") === ((2L, false)))
    assert(rows("n1") === ((1L, true)))
    assert(rows("n2") === ((2L, true)))
    assert(rows("n3") === ((3L, false))) // state carried: rank 3 > 2
  }
}
