package graft.sketch

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ThetaKmvSpec extends SparkSpecBase {
  import spark.implicits._

  // planted sets with a KNOWN overlap: A = 0..999, B = 600..1599
  // (|A| = |B| = 1000, |A∩B| = 400, |A∪B| = 1600)
  private lazy val planted = (0 until 1000).map(i => ("A", s"v$i")) ++
    (600 until 1600).map(i => ("B", s"v$i"))

  test("estimates land within 4·rse of exact for distinct, union, and " +
      "intersection on planted overlapping sets") {
    val k = 64
    val rse = 1.0 / math.sqrt(k - 2) // ~12.7%
    val st = ThetaKmv.kmvState(planted.toDF("g", "v"), "g", "v", k)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(st("A").length === k && st("B").length === k)
    assert(st("A") === st("A").sorted, "state is sorted hex")
    val row = Seq((st("A"), st("B"))).toDF("ka", "kb")
      .select(
        ThetaKmv.kmvEstimate(col("ka"), k).as("ea"),
        ThetaKmv.kmvEstimate(ThetaKmv.kmvMerge(col("ka"), col("kb"), k), k)
          .as("eu"),
        ThetaKmv.kmvIntersectEstimate(col("ka"), col("kb"), k).as("ei"))
      .head()
    val (ea, eu, ei) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(math.abs(ea - 1000.0) / 1000.0 <= 4 * rse, s"distinct est $ea")
    assert(math.abs(eu - 1600.0) / 1600.0 <= 4 * rse, s"union est $eu")
    // intersection compounds the union estimate's error with the
    // sampling ratio's — allow a wider (but still informative) band
    assert(math.abs(ei - 400.0) / 400.0 <= 8 * rse, s"intersect est $ei")
  }

  test("small sets are EXACT (theta = 1), and a merge of a set with " +
      "itself is idempotent") {
    val k = 64
    val small = (0 until 20).map(i => ("S", s"x$i"))
    val st = ThetaKmv.kmvState(small.toDF("g", "v"), "g", "v", k)
    val kmv = st.head().getSeq[String](1)
    assert(kmv.length === 20)
    val row = Seq((kmv, kmv)).toDF("ka", "kb").select(
        ThetaKmv.kmvEstimate(col("ka"), k).as("e"),
        ThetaKmv.kmvEstimate(ThetaKmv.kmvMerge(col("ka"), col("kb"), k), k)
          .as("eu"),
        ThetaKmv.kmvIntersectEstimate(col("ka"), col("kb"), k).as("ei"))
      .head()
    assert(row.getLong(0) === 20L)
    assert(row.getLong(1) === 20L) // self-union collapses shared digests
    assert(row.getLong(2) === 20L) // self-intersection is the set itself
  }

  test("disjoint sets intersect to ~zero; union of disjoint halves " +
      "estimates the sum") {
    val k = 64
    val df = ((0 until 800).map(i => ("L", s"a$i")) ++
      (0 until 800).map(i => ("R", s"b$i"))).toDF("g", "v")
    val st = ThetaKmv.kmvState(df, "g", "v", k)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val row = Seq((st("L"), st("R"))).toDF("ka", "kb").select(
        ThetaKmv.kmvEstimate(ThetaKmv.kmvMerge(col("ka"), col("kb"), k), k)
          .as("eu"),
        ThetaKmv.kmvIntersectEstimate(col("ka"), col("kb"), k).as("ei"))
      .head()
    val rse = 1.0 / math.sqrt(k - 2)
    assert(math.abs(row.getLong(0) - 1600.0) / 1600.0 <= 4 * rse)
    // a disjoint pair can only report a (rare) digest-range accident:
    // bounded by a couple of sampling units, nowhere near a real overlap
    assert(row.getLong(1) <= (2 * 1600) / k, s"disjoint est ${row.getLong(1)}")
  }

  test("the state build rides the GroupedTopK operator (bounded " +
      "per-partition sketch state)") {
    val plan = ThetaKmv.kmvState(planted.toDF("g", "v"), "g", "v", 16)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("GroupedTopK"), plan)
  }
}
