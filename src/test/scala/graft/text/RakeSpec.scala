package graft.text

import graft.SparkSpecBase

class RakeSpec extends SparkSpecBase {
  import spark.implicits._

  test("phrases split at stopwords and punctuation; deg/freq scoring " +
      "favors recurring multi-word terms") {
    val docs = Seq(
      "deep learning and deep learning of models",
      "gradient descent; gradient descent!"
    ).toDF("text")
    val out = Rake.topKeywords(docs, "text", 10).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // deep: freq 2, deg 4 -> 2e6; learning: 2e6 -> phrase 4e6, seen twice
    assert(out("deep learning") === ((2L, 2L, 4000000L)))
    assert(out("gradient descent") === ((2L, 2L, 4000000L)))
    // models: freq 1, deg 1 -> 1e6
    assert(out("models") === ((1L, 1L, 1000000L)))
    assert(!out.contains("and") && !out.contains("of"))
  }

  test("rank orders by score then phrase; case folds; k bounds") {
    val docs = Seq("Alpha Beta", "alpha beta", "gamma").toDF("text")
    val out = Rake.topKeywords(docs, "text", 2).collect()
    assert(out.length === 2)
    // alpha beta: each word freq 2 deg 4 -> 2e6+2e6 = 4e6; gamma 1e6
    assert(out(0).getLong(0) === 1L && out(0).getString(1) === "alpha beta")
    assert(out(1).getString(1) === "gamma")
  }
}
