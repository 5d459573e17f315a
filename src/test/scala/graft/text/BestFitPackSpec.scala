package graft.text

import graft.SparkSpecBase

class BestFitPackSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-traced best-fit: 5,4,3,3,1 at budget 8 packs into two " +
      "full bins (tightest-fit, most-recent tie-break)") {
    // 5 -> bin1(rem 3); 4 -> bin2(rem 4); 3 -> bin1 is tighter (3<4) ->
    // bin1 full; 3 -> bin2(rem 1); 1 -> bin2 full
    val bins = BestFitPack.simulateItemwise(Seq(5L, 4L, 3L, 3L, 1L), 8L)
    assert(bins.map(b => (b._1, b._2, b._4)).sorted ===
      Seq((0L, 8L, 2L), (0L, 8L, 3L)))
    // l2 sums identify the compositions: {5,3} and {4,3,1}
    assert(bins.map(_._3).sorted === Seq(26L, 34L))
  }

  test("class-batched simulation is EXACTLY the itemwise algorithm " +
      "on randomized histograms (per-bin stats as multisets)") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 40) {
      val budget = 8L + rnd.nextInt(120)
      val nLens = 1 + rnd.nextInt(12)
      val hist = (1 to nLens).map { _ =>
        (1L + rnd.nextInt(budget.toInt), 1L + rnd.nextInt(50))
      }.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).sum) }.toSeq
      val itemLens = hist.flatMap { case (l, c) =>
        Seq.fill(c.toInt)(l) }.sorted(Ordering[Long].reverse)
      val item = BestFitPack.simulateItemwise(itemLens, budget)
        .map(b => (b._1, b._2, b._3, b._4)).sorted
      val batched = BestFitPack.simulate(hist, budget)
        .flatMap(k => Seq.fill(k.count.toInt)((k.rem, k.lSum, k.l2Sum,
          k.nSeg))).sorted
      assert(item === batched, s"trial $trial budget $budget hist $hist")
    }
  }

  test("the report: bestfit splits only docs over budget and beats " +
      "chop on truncation; chop wastes only the last bin's padding") {
    // docs 10..60 tokens at budget 64: bestfit never splits, chop must
    val docs = (1L to 40L).map(i => (i, 10L + (i * 7L) % 51L))
      .toDF("doc_id", "n_tokens")
    val got = BestFitPack.packBestFitReport(docs, "doc_id", 64L)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    val chop = got("chop"); val best = got("bestfit")
    val total = docs.collect().map(_.getLong(1)).sum
    Seq(chop, best).foreach { r =>
      assert(r.getAs[Long]("total_tokens") === total)
      assert(r.getAs[Long]("padded_tokens") ===
        r.getAs[Long]("n_bins") * 64L)
      assert(r.getAs[Long]("waste_tokens") ===
        r.getAs[Long]("padded_tokens") - total)
      assert(r.getAs[Long]("cross_pairs") <= r.getAs[Long]("total_pairs"))
    }
    assert(best.getAs[Long]("n_split_docs") === 0L)
    assert(chop.getAs[Long]("n_split_docs") > 0L)
    // chop is a contiguous stream: waste < one budget's worth
    assert(chop.getAs[Long]("waste_tokens") < 64L)
    // every bestfit segment is a whole doc
    assert(best.getAs[Long]("n_segments") === 40L)
    // the economics trade: bestfit pays padding to avoid splits
    assert(best.getAs[Long]("waste_tokens") >=
      chop.getAs[Long]("waste_tokens"))
  }

  test("docs over budget emit full chunks (their own zero-cross bins) " +
      "plus a packed residual; zero-token docs are excluded") {
    val docs = Seq((1L, 130L), (2L, 64L), (3L, 10L), (4L, 0L))
      .toDF("doc_id", "n_tokens")
    val got = BestFitPack.packBestFitReport(docs, "doc_id", 64L)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    val best = got("bestfit")
    assert(best.getAs[Long]("n_docs") === 3L)
    // doc1: 2 full chunks + residual 2; doc2: exactly one full chunk;
    // doc3: residual 10 -> residuals {2,10} pack into ONE bin
    assert(best.getAs[Long]("n_split_docs") === 1L) // only doc1
    assert(best.getAs[Long]("n_segments") === 3L + 2L)
    assert(best.getAs[Long]("n_bins") === 3L + 1L)
    // full-chunk bins contribute zero cross pairs; the residual bin
    // holds docs of 10 and 2 tokens -> 20 cross pairs
    assert(best.getAs[Long]("cross_pairs") === 20L)
    assert(best.getAs[Long]("total_pairs") ===
      3L * (64L * 63L / 2L) + (12L * 11L / 2L))
  }

  test("the r14 reports re-run over the bestfit layout: padding waste " +
      "stays below arrival-order batching on the same corpus") {
    val docs = (1L to 60L).map(i => (i, 5L + (i * 13L) % 60L))
      .toDF("doc_id", "n_tokens")
    val best = BestFitPack.packBestFitReport(docs, "doc_id", 64L)
      .collect().find(_.getAs[String]("policy") == "bestfit").get
    val arrival = graft.etl.PaddingReport.paddingWasteReport(
      docs, "doc_id", "n_tokens", batchSize = 2)
      .collect().find(_.getAs[String]("policy") == "arrival").get
    // arrival batching pads every batch to its max; best-fit fills
    // bins to capacity -> strictly less relative waste here
    assert(best.getAs[Long]("waste_micro") <
      arrival.getAs[Long]("waste_micro"))
  }
}
