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

  // plain-Scala expected manifest: full-chunk bins in doc order, then
  // residuals through the itemwise algorithm
  private def expectedManifest(docs: Seq[(Long, Long)],
      budget: Long): Set[(Long, Long, Long, Long)] = {
    val pos = docs.filter(_._2 > 0).sortBy(_._1)
    var fb = 0L
    val full = pos.flatMap { case (id, n) =>
      val f = n / budget
      val rows = (0L until f).map(i => (id, i, fb + i, budget))
      fb += f
      rows
    }
    val fullTotal = fb
    val resid = pos.map { case (id, n) => (id, n % budget) }
      .filter(_._2 > 0)
      .sortBy { case (id, r) => (-r, id) }
    val (_, asg) = BestFitPack.simulateItemwiseAssign(resid.map(_._2), budget)
    val residRows = resid.zip(asg).map { case ((id, r), bin) =>
      val n = pos.find(_._1 == id).get._2
      (id, n / budget, fullTotal + bin, r)
    }
    (full ++ residRows).toSet
  }

  test("the assignment manifest equals the itemwise algorithm per doc " +
      "(full-chunk numbering + best-fit residual bins), randomized") {
    val rnd = new scala.util.Random(44115L)
    for (trial <- 1 to 3) {
      val docs = (1L to 35L).map(i =>
        (i, rnd.nextInt(150).toLong)) // includes zeros and > budget
      val got = BestFitPack.packBestFitAssign(
        docs.toDF("doc_id", "n_tokens"), "doc_id", 64L)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("seg_idx"),
          r.getAs[Long]("bin"), r.getAs[Long]("seg_tokens"))).toSet
      assert(got === expectedManifest(docs, 64L), s"trial $trial")
    }
  }

  test("the manifest is consistent with the economics report: same " +
      "bins, same waste, same cross pairs, ids contiguous") {
    val docs = (1L to 50L).map(i => (i, 5L + (i * 31L) % 120L))
      .toDF("doc_id", "n_tokens")
    val manifest = BestFitPack.packBestFitAssign(docs, "doc_id", 64L)
      .collect()
    val report = BestFitPack.packBestFitReport(docs, "doc_id", 64L)
      .collect().find(_.getAs[String]("policy") == "bestfit").get
    val byBin = manifest.groupBy(_.getAs[Long]("bin"))
    assert(byBin.keySet === (0L until report.getAs[Long]("n_bins")).toSet)
    byBin.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("seg_tokens")).sum <= 64L)
    }
    assert(manifest.length.toLong === report.getAs[Long]("n_segments"))
    assert(manifest.map(_.getAs[Long]("seg_tokens")).sum ===
      report.getAs[Long]("total_tokens"))
    val waste = byBin.values.map(rows =>
      64L - rows.map(_.getAs[Long]("seg_tokens")).sum).sum
    assert(waste === report.getAs[Long]("waste_tokens"))
    val cross = byBin.values.map { rows =>
      val ls = rows.map(_.getAs[Long]("seg_tokens"))
      (ls.sum * ls.sum - ls.map(x => x * x).sum) / 2
    }.sum
    assert(cross === report.getAs[Long]("cross_pairs"))
  }

  test("mask spans tile every bin contiguously from 0 up to its fill, " +
      "one span per manifest segment") {
    val docs = (1L to 30L).map(i => (i, 7L + (i * 13L) % 90L))
      .toDF("doc_id", "n_tokens")
    val manifest = BestFitPack.packBestFitAssign(docs, "doc_id", 64L)
    val spans = BestFitPack.packMaskSpans(manifest, "doc_id").collect()
    assert(spans.length === manifest.count().toInt)
    assert(spans.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("seg_idx"))).toSet ===
      manifest.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("seg_idx"))).toSet)
    spans.groupBy(_.getAs[Long]("bin")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("seg_rank"))
      var off = 0L
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("seg_rank") === i.toLong)
        assert(r.getAs[Long]("start_off") === off)
        assert(r.getAs[Long]("end_off") > off)
        off = r.getAs[Long]("end_off")
      }
      assert(off <= 64L)
    }
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
