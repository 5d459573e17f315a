package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Parity gate for the r15 compiled Viterbi DP: the expression must
  * replay the former composed higher-order `aggregate` DP bit-for-bit
  * (the DuckDB unigram oracles replay that recurrence, so any
  * divergence is a hash failure). The old fold is preserved HERE as
  * the reference implementation and both run over the same lattice.
  */
class ViterbiSegmentExprSpec extends SparkSpecBase {

  /** The pre-r15 composed DP, verbatim (windows → broadcast score
    * attach → per-word collect_list → HOF forward fold → HOF
    * backtrace), kept as the parity reference. */
  private def composedSegment(words: org.apache.spark.sql.DataFrame,
      scores: Seq[(String, Long)], maxPieceLen: Int)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pieces = scores.toDF("p", "s")
    val wins = words.select(col("w"), col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least($maxPieceLen, length(w))),
           l -> transform(sequence(0, length(w) - l),
           j -> struct(cast(j AS bigint) AS j, cast(j + l AS bigint) AS i,
                       substr(w, j + 1, l) AS p))))""")).as("e"))
      .select(col("w"), col("freq"), col("e.j").as("j"),
        col("e.i").as("i"), col("e.p").as("p"))
    val scored = wins.join(broadcast(pieces), Seq("p"))
      .groupBy("w", "freq")
      .agg(collect_list(struct(col("j"), col("i"), col("s"))).as("edges"))
    val wlen = length(col("w"))
    val dpInit = struct(array(lit(0L)).as("best"), array(lit(0L)).as("bp"))
    val dp = aggregate(sequence(lit(1), wlen), dpInit, (acc, i) => {
      val iL = i.cast("long")
      val cands = transform(
        filter(col("edges"), e => e.getField("i") === iL),
        e => struct(
          (element_at(acc.getField("best"),
            (e.getField("j") + 1).cast("int")) + e.getField("s")).as("t"),
          (-e.getField("j")).as("nj")))
      val m = array_max(cands)
      struct(
        concat(acc.getField("best"), array(m.getField("t"))).as("best"),
        concat(acc.getField("bp"), array(-m.getField("nj"))).as("bp"))
    })
    val withDp = scored.withColumn("__dp", dp)
      .select(col("w"), col("freq"), col("__dp.bp").as("bp"))
    val walk = aggregate(sequence(lit(1), wlen),
      struct(wlen.cast("long").as("pos"),
        array().cast("array<string>").as("pieces")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val j = element_at(col("bp"), (pos + 1).cast("int"))
        when(pos > 0, struct(
          j.as("pos"),
          concat(acc.getField("pieces"),
            array(substr(col("w"), (j + 1).cast("int"),
              (pos - j).cast("int")))).as("pieces")))
          .otherwise(acc)
      },
      acc => acc.getField("pieces"))
    withDp.select(col("w"), col("freq"), walk.as("pieces"))
  }

  private def runBoth(wordRows: Seq[(String, Long)],
      scores: Seq[(String, Long)], maxPieceLen: Int): Unit = {
    import spark.implicits._
    val words = wordRows.toDF("w", "freq")
    val old = composedSegment(words, scores, maxPieceLen)
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toList)).toList
    val neu = words.select(col("w"), col("freq"),
        ViterbiSegment.viterbiPieces(col("w"),
          ViterbiSegment.buildScores(scores), maxPieceLen).as("pieces"))
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toList)).toList
    assert(neu === old)
  }

  test("tie-break parity with the composed DP: equal-total paths pick " +
    "the smallest start (longest final piece), piece order back-to-front") {
    // [ab]+[c] and [a]+[bc] tie at -30 for "abc"; the composed
    // array_max over (t, -j) keeps j=1 for the last piece ("bc"... no:
    // smallest j wins the LAST edge into i=3, i.e. piece w[1..3) = "bc")
    val scores = Seq("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -20L, "bc" -> -20L)
    runBoth(Seq(("abc", 3L), ("ab", 1L), ("c", 2L), ("abcabc", 1L)),
      scores, 2)
  }

  test("parity on a corpus-shaped vocabulary (every substring scored, " +
    "add-one micro-nat scores, maxPieceLen 4)") {
    val wordRows = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "antidisestablishment", "a", "ab", "zzzz",
      "ababab", "mississippi").zipWithIndex
      .map { case (w, i) => (w, (i + 1).toLong) }
    // build a seed-like score table: all substrings of length <= 4,
    // scored by a deterministic pseudo-count
    val subs = wordRows.flatMap { case (w, _) =>
      for (l <- 1 to math.min(4, w.length); j <- 0 to w.length - l)
        yield w.substring(j, j + l)
    }.groupBy(identity).map { case (p, occ) => (p, occ.size.toLong) }
    val t = subs.values.sum
    val n = subs.size
    val scores = subs.toSeq.map { case (p, c) =>
      (p, math.floor(math.log((c + 1).toDouble /
        (t + n).toDouble) * 1e6).toLong)
    }
    runBoth(wordRows, scores, 4)
  }

  test("viterbi_total equals the path score sum; alt-total excludes the " +
    "candidate piece exactly as the composed exclusion fold") {
    import spark.implicits._
    val scores = Seq("a" -> -5L, "b" -> -7L, "c" -> -4L, "ab" -> -9L,
      "bc" -> -8L, "abc" -> -25L)
    val m = ViterbiSegment.buildScores(scores)
    val sm = scores.toMap
    val words = Seq("abc", "ab", "cab", "bcbc").toDF("w")
    val rows = words.select(col("w"),
        ViterbiSegment.viterbiPieces(col("w"), m, 3).as("pieces"),
        ViterbiSegment.viterbiTotal(col("w"), m, 3).as("total"),
        ViterbiSegment.viterbiAltTotal(col("w"), lit("ab"), m, 3)
          .as("alt"))
      .collect()
    rows.foreach { r =>
      val pieces = r.getSeq[String](1)
      assert(r.getLong(2) === pieces.map(sm).sum,
        s"total != path sum for ${r.getString(0)}")
    }
    // brute-force alt check: best total over all segmentations of
    // "abc" that avoid "ab": [abc]=-25, [a][bc]=-13, [a][b][c]=-16 →
    // alt = -13; with "ab" allowed, [ab][c]=-13 ties and total=-13
    val abc = rows.find(_.getString(0) == "abc").get
    assert(abc.getLong(3) === -13L)
    assert(abc.getLong(2) === -13L)
  }

  test("unreachable word yields null pieces and null totals (char " +
    "outside the model)") {
    import spark.implicits._
    val m = ViterbiSegment.buildScores(Seq("a" -> -5L))
    val r = Seq("az").toDF("w").select(
      ViterbiSegment.viterbiPieces(col("w"), m, 2).as("p"),
      ViterbiSegment.viterbiTotal(col("w"), m, 2).as("t"),
      ViterbiSegment.viterbiAltTotal(col("w"), lit("zz"), m, 2).as("x"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("code-point positions: multibyte chars segment by character, " +
    "not byte or UTF-16 unit") {
    import spark.implicits._
    val scores = Seq("é" -> -3L, "éé" -> -5L, "😀" -> -2L)
    val m = ViterbiSegment.buildScores(scores)
    val r = Seq("ééé", "😀éé").toDF("w")
      .select(col("w"),
        ViterbiSegment.viterbiPieces(col("w"), m, 2).as("p"))
      .orderBy("w").collect()
    val byW = r.map(x => x.getString(0) -> x.getSeq[String](1).toList).toMap
    // tie at -8 between [éé][é] and [é][éé]: smallest start j=1 wins
    // the final edge, so the last piece is "éé"; back-to-front order
    // puts it first
    assert(byW("ééé") === List("éé", "é"))
    assert(byW("😀éé") === List("éé", "😀"))
  }
}
