package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TrigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private val alpha = 0.4

  test("all three backoff levels score as specified") {
    val model = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // model: trigrams {a b c, b c d}; bigrams {ab, bc, cd}; unigrams
    // a,b,c,d each 1; N=4, V=4
    val score = Seq(
      (10L, "a b c"), //  seen trigram: S = c(abc)/c(ab) = 1/1
      (11L, "x b c"), //  unseen trigram, seen bigram bc: S = α·(1/1)
      (12L, "x y d"), //  both unseen, d in model: S = α·α·((1+1)/(4+4))
      (13L, "x y z"), //  fully unseen: S = α·α·((0+1)/(4+4))
      (14L, "a b")) //    < 3 tokens: unscorable
      .toDF("doc_id", "text")
    val out = TrigramLm.stupidBackoffMicro(score, "doc_id", "text",
      model, "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    def micro(s: Double): Long = math.floor(-math.log(s) * 1e6).toLong
    assert(out(10L) === ((1L, Some(micro(1.0)))))
    assert(out(11L) === ((1L, Some(micro(alpha * 1.0)))))
    assert(out(12L) === ((1L, Some(micro(alpha * (alpha * (2.0 / 8.0)))))))
    assert(out(13L) === ((1L, Some(micro(alpha * (alpha * (1.0 / 8.0)))))))
    assert(out(14L) === ((0L, None)))
  }

  test("repeated in-model trigrams score cheaper than out-of-model text") {
    val docs = graft.Tables.documents(spark, sf).limit(50)
    val model = docs.filter($"doc_id" % 2 === 0)
    val out = TrigramLm.stupidBackoffMicro(docs, "doc_id", "text",
      model, "text")
      .filter($"n_trigrams" > 0)
      .withColumn("mean_micro", $"sb_micro" / $"n_trigrams")
    val inModel = out.filter($"doc_id" % 2 === 0)
      .agg(avg("mean_micro")).as[Double].head()
    val held = out.filter($"doc_id" % 2 === 1)
      .agg(avg("mean_micro")).as[Double].head()
    assert(inModel < held,
      s"model half should score cheaper: $inModel vs $held")
  }
}
