package graft.functions

import graft.SparkSpecBase
import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b").select(cosineSim($"a", $"b")).head().getDouble(0)

  test("matches hand-computed values") {
    assert(math.abs(cos(Seq(1, 0), Seq(0, 1))) < 1e-12)
    assert(math.abs(cos(Seq(1, 2, 3), Seq(1, 2, 3)) - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1, 0), Seq(-1, 0)) + 1.0) < 1e-12)
    // 45 degrees
    assert(math.abs(cos(Seq(1, 0), Seq(1, 1)) - math.sqrt(0.5)) < 1e-12)
  }

  test("degenerate zero vector scores 0, null input yields null") {
    assert(cos(Seq(0, 0), Seq(1, 1)) === 0.0)
    val r = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b").select(cosineSim($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("interpreted and codegen paths agree (wholestage on/off)") {
    val df = graft.Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = df.crossJoin(df.select($"vec_id".as("id2"), $"v".as("v2")))
      .filter($"vec_id" < $"id2").limit(500)
      .select($"vec_id", $"id2", cosineSim($"v", $"v2").as("c"))
    val withCodegen = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(withCodegen === interpreted)
      assert(withCodegen.values.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("float embeddings upcast once and score within [-1, 1]") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qv")).crossJoin(emb.limit(20))
      .select(cosineSim($"embedding", $"qv").as("c"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
  }
}
