package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("mortonKey interleaves bits exactly") {
    // (x=0b101, y=0b011, 3 bits) -> z bits y2 x2 y1 x1 y0 x0 = 0b011011
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.mortonKey(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(got === 0x1BL)
    // round-trip property on a seeded batch: de-interleaving the key
    // recovers both inputs
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val keys = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.mortonKey(Seq(col("x"), col("y")), 8).as("z"))
      .collect()
    keys.foreach { r =>
      val z = r.getLong(2)
      val x = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val y = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(x === r.getLong(0) && y === r.getLong(1))
    }
  }

  test("withMortonKey matches a local bin+interleave reference") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500)((rnd.nextInt(1000).toLong, rnd.nextInt(365).toLong))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val got = ZOrder.withMortonKey(
        rows.toDF("id", "a", "b"), Seq("a", "b"), bits = 6)
      .select("id", "zkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (mnA, mxA) = (rows.map(_._2).min, rows.map(_._2).max)
    val (mnB, mxB) = (rows.map(_._3).min, rows.map(_._3).max)
    def bin(x: Long, mn: Long, mx: Long) = (x - mn) * 64 / (mx - mn + 1)
    rows.foreach { case (id, a, b) =>
      val (ba, bb) = (bin(a, mnA, mxA), bin(b, mnB, mxB))
      val z = (0 until 6).map(i =>
        (((ba >> i) & 1L) << (2 * i)) | (((bb >> i) & 1L) << (2 * i + 1))).sum
      assert(got(id) === z, s"id=$id a=$a b=$b")
    }
  }

  test("hilbert index: exhaustive bijection and the adjacency property " +
      "(consecutive indices are grid neighbors — the curve never jumps)") {
    val cells = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.HilbertIndex.index(col("x"), col("y"), 4).as("h"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got.keySet === (0L until 256L).toSet, "must be a bijection")
    (0L until 255L).foreach { i =>
      val (x0, y0) = got(i); val (x1, y1) = got(i + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"jump between $i and ${i + 1}: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("z-order layout skips more files than a 1-D sort on a mixed " +
      "2-D predicate workload (footer-stats simulation)") {
    val rnd = new scala.util.Random(7)
    val n = 40000
    val pts = Seq.fill(n)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.layout(pts, Seq("x", "y"), bits = 8, numFiles = 64)
      .write.mode("overwrite").parquet(s"$dir/z")
    ZOrder.hilbertLayout(pts, Seq("x", "y"), bits = 8, numFiles = 64)
      .write.mode("overwrite").parquet(s"$dir/h")
    pts.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    // per-file (x, y) min/max — exactly what a parquet footer publishes
    def stats(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (zs, ls) = (stats(s"$dir/z"), stats(s"$dir/linear"))
    val hs = stats(s"$dir/h")
    assert(zs.length === 64 && ls.length === 64 && hs.length === 64)
    // workload: x-only, y-only, and x-and-y 10%-wide range predicates; a
    // file must be OPENED iff its stats rectangle intersects the box
    val qrnd = new scala.util.Random(99)
    def opened(st: Array[(Long, Long, Long, Long)],
        box: (Long, Long, Long, Long)) = st.count { case (a, b, c, d) =>
      b >= box._1 && a <= box._2 && d >= box._3 && c <= box._4 }
    val tot = Array.fill(3)(0)
    val ltot = Array.fill(3)(0)
    val htot = Array.fill(3)(0)
    (1 to 60).foreach { i =>
      val (x0, y0) = (qrnd.nextInt(900).toLong, qrnd.nextInt(900).toLong)
      val shape = i % 3
      val box = shape match {
        case 0 => (x0, x0 + 99L, 0L, 999L) // x-only
        case 1 => (0L, 999L, y0, y0 + 99L) // y-only
        case _ => (x0, x0 + 99L, y0, y0 + 99L) // both
      }
      tot(shape) += opened(zs, box); ltot(shape) += opened(ls, box)
      htot(shape) += opened(hs, box)
    }
    // the sharp contract: the 1-D layout CANNOT prune on the second
    // dimension (every file spans all of y), the curve layout must
    // (8x8 tiling -> a 10% y-window touches ~2 of 8 tile rows)
    assert(ltot(1) === 20 * 64, "linear layout should full-scan y-only")
    assert(tot(1) < ltot(1) / 3,
      s"y-only: z opened ${tot(1)} vs linear ${ltot(1)}")
    // and across the mixed workload the curve still wins overall, even
    // though linear is better on its one good shape (x-only)
    val (zTot, lTot, hTot) = (tot.sum, ltot.sum, htot.sum)
    assert(zTot < (lTot * 7) / 10,
      s"z-order opened $zTot files vs linear $lTot — expected < 0.7x")
    // the hilbert curve prunes at least as well as morton on the same
    // workload (no quadrant jumps -> tighter file rectangles); small
    // slack for workload noise
    assert(hTot <= (zTot * 11) / 10,
      s"hilbert opened $hTot vs morton $zTot — expected <= 1.1x")
    assert(hTot < (lTot * 7) / 10,
      s"hilbert opened $hTot files vs linear $lTot — expected < 0.7x")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
