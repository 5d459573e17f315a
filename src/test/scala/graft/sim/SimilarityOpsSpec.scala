package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)

  test("brute-force top-k: self excluded, k rows per query, cosine descending") {
    val out = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length === 5)
      val cos = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sameElements(cos.sorted.reverse), "descending by rank")
      assert(!rows.exists(r => r.getAs[Long]("neighbor") == r.getAs[Long]("qid")))
    }
  }

  test("ANN recall vs exact baseline is substantial within buckets") {
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 20),
        "vec_id", "embedding", 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val ann = SimilarityOps.annTopK(emb, "vec_id", "embedding",
        dim = 64, nBits = 6, nTables = 12, k = 3, col("id") < 20).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    // OR-amplified candidates should recover a substantial share of the
    // exact top-3 on clustered embeddings
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(ann.nonEmpty)
    assert(recall > 0.3, f"ANN recall $recall%.2f suspiciously low")
  }

  test("IVF top-k: substantial recall, and returned cosines are exact") {
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 20),
        "vec_id", "embedding", 3).collect()
    val exactPairs = exact
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val exactCos = exact
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    val ivf = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      nList = 16, nProbe = 4, k = 3, col("id") < 20).collect()
    val ivfPairs = ivf
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val recall = (ivfPairs intersect exactPairs).size.toDouble / exactPairs.size
    assert(ivf.nonEmpty)
    assert(recall > 0.5, f"IVF recall $recall%.2f suspiciously low")
    // candidates are exact-scored: any overlapping pair carries the same cosine
    ivf.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))
      exactCos.get(key).foreach(c =>
        assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("IVF-PQ: shortlist+rerank recall >= 0.6, rerank cosines are exact") {
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", 3).collect()
    val exactPairs = exact
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val exactCos = exact
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    val pq = SimilarityOps.ivfPqTopK(emb, "vec_id", "embedding",
      dim = 64, nList = 16, nProbe = 4, m = 8, kSub = 16,
      shortlist = 32, k = 3, col("id") < 5).collect()
    val pqPairs = pq
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val recall = (pqPairs intersect exactPairs).size.toDouble / exactPairs.size
    assert(pq.nonEmpty)
    assert(recall >= 0.6, f"IVF-PQ rerank recall $recall%.2f below contract")
    // the rerank is exact-cosine: overlapping pairs carry the same score
    pq.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))
      exactCos.get(key).foreach(c =>
        assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("IVF lifecycle: append never touches existing postings, the " +
      "merged index round-trips through parquet, and probing it equals " +
      "probing a from-scratch full build") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val batch = emb.filter($"vec_id" % 5 === 0)
    val cent = SimilarityOps.ivfCentroids(base, "vec_id", "embedding", 16)
    val idx0 = SimilarityOps.buildIvfIndex(base, "vec_id", "embedding", 16)
    val merged = SimilarityOps.appendToIvf(idx0, cent, batch,
      "vec_id", "embedding")
    // existing postings byte-identical under append
    val before = idx0.select("id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = merged.select("id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.forall { case (id, l) => after(id) == l })
    assert(after.size === emb.count())
    // persisted postings: parquet round trip, probe equality with a
    // from-scratch assignment of the full corpus to the same quantizer
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/i"
    merged.write.parquet(dir)
    val reread = spark.read.parquet(dir)
    def probe(i: org.apache.spark.sql.DataFrame) =
      SimilarityOps.probeIvf(i, cent, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", nProbe = 4, k = 3)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor"))).toSet
    val scratch = SimilarityOps.assignToLists(
      emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), cent)
    assert(probe(reread) === probe(scratch))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  test("trained PQ codebook: well-formed training output, and recall " +
      "through ivfPqTopK at least matches the seeded codebook") {
    val trained = SimilarityOps.pqTrainCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 8, kSub = 16, iters = 2).collect()
    // every subspace keeps <= kSub NON-EMPTY clusters covering the corpus
    val n = emb.count()
    (0 until 8).foreach { s =>
      val rows = trained.filter(_.getAs[Long]("s") == s)
      assert(rows.nonEmpty && rows.length <= 16)
      assert(rows.map(_.getAs[Long]("n")).sum === n, s"subspace $s coverage")
      rows.foreach(r => assert(r.getAs[Seq[Long]]("sum_v").size === 8))
    }
    def recallOf(cb: Option[org.apache.spark.sql.DataFrame]): Double = {
      val exactPairs = SimilarityOps.bruteForceTopK(emb,
          emb.filter($"vec_id" < 5), "vec_id", "embedding", 3).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
      val pq = SimilarityOps.ivfPqTopK(emb, "vec_id", "embedding",
        dim = 64, nList = 16, nProbe = 4, m = 8, kSub = 16,
        shortlist = 32, k = 3, col("id") < 5, codebook = cb).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
      (pq intersect exactPairs).size.toDouble / exactPairs.size
    }
    val seeded = recallOf(None)
    val trainedRecall = recallOf(Some(SimilarityOps.pqTrainedCbv(
      emb, "vec_id", "embedding", dim = 64, m = 8, kSub = 16, iters = 2)))
    info(f"recall@3 seeded $seeded%.2f -> trained $trainedRecall%.2f")
    assert(trainedRecall >= seeded,
      f"training must not lose recall: seeded $seeded%.2f vs trained $trainedRecall%.2f")
    assert(trainedRecall >= 0.6)
  }

  test("IVF with nProbe == nList degenerates to exact brute force") {
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 10),
      "vec_id", "embedding", 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor"), r.getAs[Double]("cosine"))).toSet
    val ivf = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      nList = 8, nProbe = 8, k = 3, col("id") < 10).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor"), r.getAs[Double]("cosine"))).toSet
    assert(ivf === exact)
  }

  test("IVF is deterministic under a fixed seed") {
    def run() = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      nList = 8, nProbe = 2, k = 3, col("id") < 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor"))).toSet
    assert(run() === run())
  }

  test("deterministic hyperplanes: same signature across invocations") {
    val s1 = emb.withColumn("b", SimilarityOps.lshSignature("embedding", 64, 8))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = emb.withColumn("b", SimilarityOps.lshSignature("embedding", 64, 8))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
  }

  test("mean pool: hand-computed group means, unit norm, ordered dims") {
    import spark.implicits._
    // group 1: (1,0,0) and (0,1,0) → mean (0.5, 0.5, 0) → normalized
    // (0.707107, 0.707107, 0); group 2: single chunk (0, 0, 2) → (0, 0, 1)
    val df = Seq((1, Array(1f, 0f, 0f)), (1, Array(0f, 1f, 0f)),
      (2, Array(0f, 0f, 2f))).toDF("grp", "vec")
    val out = SimilarityOps.meanPool(df, "grp", "vec")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getSeq[Double](2).toList)).toMap
    assert(out(1) === ((2L, List(0.707107, 0.707107, 0.0))))
    assert(out(2) === ((1L, List(0.0, 0.0, 1.0))))
    // pooled vectors are unit-length up to the 6dp rounding
    out.values.foreach { case (_, v) =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
    }
  }

  test("semDedup: within-cell near-dups pruned, lowest id kept, cells block") {
    // centroids = ids 0,1 (nList = 2): cell 0 along +x, cell 1 along +y.
    // id 2 duplicates id 0 (same direction) → pruned; id 3 is y-ish with a
    // small x component → cell 1, kept (its only cell-mate, id 1, is not
    // within tau); id 4 duplicates id 1 but sits in cell 1 → pruned.
    val df = Seq(
      (0L, Array(10f, 0f, 0f)), (1L, Array(0f, 10f, 0f)),
      (2L, Array(9f, 0.5f, 0f)), (3L, Array(2f, 6f, 7f)),
      (4L, Array(0.5f, 9f, 0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(df, "vec_id", "embedding",
        nList = 2, tau = 0.95).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cell"), r.getAs[Boolean]("kept"))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(out(0) === ((0L, true)) && out(2) === ((0L, false)), "x dup pruned")
    assert(out(1) === ((1L, true)) && out(4) === ((1L, false)), "y dup pruned")
    assert(out(3)._2, "non-dup cell-mate survives")
    // survivors of one cell are pairwise below tau — the SemDeDup invariant
    val survivors = out.collect { case (id, (cell, true)) => (id, cell) }
    assert(survivors.map(_._1).toSet === Set(0L, 1L, 3L))
  }

  test("cluster-balanced sample caps each cell, most prototypical first") {
    // two clusters around the axes: 4 x-ish vectors, 2 y-ish vectors;
    // cap 2 → x cluster drops its 2 farthest members, y cluster intact
    val df = Seq(
      (0L, Array(10f, 0f, 0f)), (1L, Array(0f, 10f, 0f)), // seed centroids
      (2L, Array(9f, 1f, 0f)), (3L, Array(8f, 2f, 0f)),
      (4L, Array(7f, 3f, 0f)), (5L, Array(1f, 9f, 0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.clusterBalancedSample(df, "vec_id", "embedding",
        nList = 2, capPerCluster = 2).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cell"), r.getAs[Int]("cap_rank"),
          r.getAs[Boolean]("selected"))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L), "nothing dropped")
    // per-cell selected counts = min(cap, cell size)
    val perCell = out.values.groupBy(_._1).map { case (c, vs) =>
      c -> vs.count(_._3) }
    assert(perCell === Map(0L -> 2, 1L -> 2))
    // x cluster: centroid itself (d2=0) ranks 1, nearest member 2 ranks 2;
    // farther members 3 and 4 unselected
    assert(out(0L)._3 && out(2L)._3 && !out(3L)._3 && !out(4L)._3)
    assert(out(1L)._3 && out(5L)._3)
  }

  test("scalarQuantize8: extremes exact, mid-range error bounded, reproducible") {
    val vs = Seq(
      (0L, Array(0.0f, 0.0f)),   // the per-dim minimum on both dims
      (1L, Array(1.0f, 10.0f)),  // the per-dim maximum on both dims
      (2L, Array(0.5f, 5.0f)))   // exact midpoints
    val df = vs.toDF("vec_id", "embedding")
    val out = SimilarityOps.scalarQuantize8(df, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_dims"), r.getAs[Long]("code_sum"),
          r.getAs[Long]("err_pico"))).toMap
    // min vector -> code 0 each dim, zero error; max -> 255 each, zero
    // error (ranges 1 and 10 dequantize exactly)
    assert(out(0L) === ((2L, 0L, 0L)))
    assert(out(1L) === ((2L, 510L, 0L)))
    // midpoint: 127.5 rounds HALF_UP to 128 on both dims; error per dim is
    // (half-step/2)^2-ish — bounded by (step/2)^2 = (range/510)^2
    val (n, cs, err) = out(2L)
    assert(n === 2L && cs === 256L)
    val bound = (math.pow(1.0 / 510, 2) + math.pow(10.0 / 510, 2)) * 1e12
    assert(err > 0L && err <= math.ceil(bound).toLong + 2)
    // degenerate dimension (mx == mn) -> code 0, no error contribution
    val degen = SimilarityOps.scalarQuantize8(
      Seq((0L, Array(3.0f, 1.0f)), (1L, Array(3.0f, 2.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("err_pico")).toMap
    assert(degen(0L) === 0L && degen(1L) === 0L)
    // partition-independent on the real table
    val a = SimilarityOps.scalarQuantize8(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val b = SimilarityOps.scalarQuantize8(emb.repartition(7), "vec_id",
      "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
  }

  test("knn graph: bounded degree, no self-loops, substantial recall") {
    val g = SimilarityOps.knnGraph(emb, "vec_id", "embedding",
      nList = 16, nProbe = 4, k = 3).collect()
    val byQ = g.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === emb.count(), "every vector has neighbors")
    byQ.foreach { case (qid, rows) =>
      assert(rows.length <= 3 && rows.nonEmpty)
      assert(!rows.exists(_.getAs[Long]("neighbor") == qid))
    }
    val exact = SimilarityOps.bruteForceTopK(emb, emb, "vec_id",
      "embedding", 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val hits = g.count(r =>
      exact((r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))))
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.7, f"knn-graph recall@3 $recall%.2f") // measured 0.91
  }

  test("graph rank: matches an exact BigInt power-iteration reference, " +
      "conserves total mass") {
    val got = SimilarityOps.graphRank(emb, "vec_id", "embedding",
      nList = 16, nProbe = 4, k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = SimilarityOps.knnGraph(emb, "vec_id", "embedding",
      nList = 16, nProbe = 4, k = 5)
      .select("qid", "neighbor").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = emb.count()
    // independent reference: arbitrary-precision integers, plain Scala
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val L = 60L; val c = 1200L
    var r = (0L until n).map(_ -> BigInt(1)).toMap
    (1 to 3).foreach { i =>
      val base = BigInt(3 * L) * BigInt(c).pow(i - 1)
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        r(u) * (17 * L / deg(u)) }.sum).toMap
      r = (0L until n).map(v => v -> (base + in.getOrElse(v, BigInt(0)))).toMap
    }
    assert(got.size.toLong === n)
    (0L until n).foreach(v => assert(BigInt(got(v)) === r(v), s"node $v"))
    // no dangling nodes in this graph -> mass is conserved exactly:
    // sum R_3 = n * C^3 (the scaled invariant sum(pr) == 1)
    assert(got.values.map(BigInt(_)).sum === BigInt(n) * BigInt(c).pow(3))
  }

  test("semantic clusters: strong pairs merge, the rest stay singletons") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.99f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.semanticClusters(vecs, "vec_id", "embedding",
      nList = 2, nProbe = 2, k = 2, minCosine = 0.9).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(0L -> (0L, 2L), 1L -> (0L, 2L),
      2L -> (2L, 1L), 3L -> (3L, 1L)))
  }

  test("hard negatives: never the anchor's own label, top-k by cosine") {
    val out = SimilarityOps.hardNegatives(emb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", "label", 4).collect()
    val labels = emb.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === 4)
      rows.foreach { r =>
        assert(r.getAs[Int]("neg_label") !== labels(qid),
          s"negative shares anchor $qid's label")
      }
      // the mined negatives are exactly the best cross-label entries of the
      // unconstrained exact top list
      val full = SimilarityOps.bruteForceTopK(emb,
        emb.filter($"vec_id" === qid), "vec_id", "embedding", 1000)
        .collect().sortBy(_.getAs[Long]("rank"))
        .filter(r => labels(r.getAs[Long]("neighbor")) != labels(qid))
        .take(4).map(_.getAs[Long]("neighbor")).toSeq
      val mined = rows.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("negative")).toSeq
      assert(mined === full)
    }
  }
}
