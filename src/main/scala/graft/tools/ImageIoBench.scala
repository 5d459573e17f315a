package graft.tools

/** Micro-measurement for the media family's per-blob cost (guide §1.2
  * measure-first): PNG encode + decode per synthetic 8×8 texture with
  * ImageIO's default DISK-backed stream cache vs the in-memory cache
  * (`ImageIO.setUseCache(false)`). The registered media queries run one
  * encode + one decode per id, so a per-call temp-file create/delete is
  * pure overhead at any scale. Single-threaded timing — executor-side
  * contention on the filesystem only makes the disk path worse. */
object ImageIoBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < n) {
        val png = graft.multimodal.PerceptualHash.synthTexturePngForBench(i.toLong)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        acc += img.getRaster.getSample(0, 0, 0)
        i += 1
      }
      println(f"[imageio] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n encode+decode, sink=$acc)")
    }
    run("disk cache (default)")
    run("disk cache (warm)")
    javax.imageio.ImageIO.setUseCache(false)
    run("memory cache")
    run("memory cache (warm)")
  }
}
