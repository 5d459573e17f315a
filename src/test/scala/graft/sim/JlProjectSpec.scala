package graft.sim

import graft.SparkSpecBase

class JlProjectSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { k =>
      (k.toLong, Array.tabulate(dim)(i =>
        (((k * 37 + i * 11) % 17) - 8) / 8f))
    }

  test("hand-checked component: proj equals the explicit signed sum") {
    val dim = 8
    val v = vecs(1, dim)
    val out = JlProject.jlProject(v.toDF("id", "v"), "id", "v",
      dim = dim, outDim = 4, scale = 64).head()
    val q = v.head._2.map(x => math.floor(x.toDouble * 64 + 0.5).toLong)
    val expect = (0 until 4).map(o =>
      (0 until dim).map(i => JlProject.jlSign(o, i) * q(i)).sum)
    assert(out.getSeq[Long](1).toSeq === expect)
  }

  test("sign matrix is deterministic and balanced-ish") {
    val signs = for (o <- 0 until 16; i <- 0 until 64)
      yield JlProject.jlSign(o, i)
    assert(signs === signs.map(identity)) // stable across calls
    val pos = signs.count(_ == 1)
    assert(pos > 400 && pos < 624) // ~half of 1024, generous band
  }

  test("JL property: projected distances track original distances") {
    val dim = 64
    val df = vecs(24, dim).toDF("id", "v")
    val proj = JlProject.jlProject(df, "id", "v", dim = dim, outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val orig = vecs(24, dim).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 64 + 0.5).toLong)
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    val ratios = for {
      a <- 0L until 24L; b <- (a + 1) until 24L
      da = d2(orig(a), orig(b)) if da > 0
    } yield d2(proj(a), proj(b)) / 16.0 / da
    // deterministic fixture: every pair's distortion within a JL-plausible
    // band for m = 16, and the median is close to 1
    val sorted = ratios.sorted
    assert(sorted.head > 0.2 && sorted.last < 3.0,
      s"range ${sorted.head} .. ${sorted.last}")
    val med = sorted(sorted.size / 2)
    assert(med > 0.6 && med < 1.6, s"median $med")
  }
}
