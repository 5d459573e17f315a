package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UnigramPruneSpec extends SparkSpecBase {
  import spark.implicits._

  // planted corpus: "ab"/"bc" frequent AND load-bearing; "abc" has a
  // decent count but a cheap alternative (ab+c / a+bc); "qxv" is rare
  // but its removal forces a far-worse path — the case count-top-K
  // cannot see
  private val docs = Seq(
    (1L, Seq.fill(10)("abc").mkString(" ")),
    (2L, Seq.fill(30)("ab").mkString(" ")),
    (3L, Seq.fill(30)("bc").mkString(" ")),
    (4L, Seq.fill(5)("qxv").mkString(" "))).toDF("doc_id", "text")

  private val (mpl, extra, keep) = (3, 100, 3)

  private def report() = UnigramPrune.pruneReport(docs, "text",
    maxPieceLen = mpl, vocabExtra = extra, vocabKeep = keep)
    .collect()
    .map(r => r.getAs[String]("piece") ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("loss_micro"),
        r.getAs[Boolean]("kept"))).toMap

  // independent plain-Scala replay of the pinned semantics (the
  // ObjectivesSpec md5-replay convention): seed -> scores -> DP with
  // and without each candidate
  private def replay(): Map[String, (Long, Long)] = {
    val words = docs.collect().flatMap(_.getString(1).split(" "))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val seed = scala.collection.mutable.Map[String, Long]()
    for ((w, f) <- words; l <- 1 to math.min(mpl, w.length);
        j <- 0 to w.length - l)
      seed(w.substring(j, j + l)) = seed.getOrElse(w.substring(j, j + l), 0L) + f
    val chars = seed.filter(_._1.length == 1)
    val multi = seed.filter { case (p, c) => p.length > 1 && c >= 1 }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(extra)
    val kept = (chars.toSeq ++ multi).toMap
    val t = kept.values.sum
    val n = kept.size.toLong
    val score = kept.map { case (p, c) =>
      p -> math.floor(math.log((c + 1).toDouble / (t + n)) * 1e6).toLong }
    def dp(w: String, excl: Option[String]): (Long, Seq[String]) = {
      val NEG = Long.MinValue / 2
      val best = Array.fill(w.length + 1)(NEG); best(0) = 0L
      val bp = new Array[Int](w.length + 1)
      for (i <- 1 to w.length; j <- math.max(0, i - mpl) until i) {
        val p = w.substring(j, i)
        if (!excl.contains(p) && score.contains(p) &&
            best(j) + score(p) > best(i)) {
          best(i) = best(j) + score(p); bp(i) = j
        }
      }
      var pos = w.length; var path = List.empty[String]
      while (pos > 0) { path ::= w.substring(bp(pos), pos); pos = bp(pos) }
      (best(w.length), path)
    }
    val loss = scala.collection.mutable.Map[String, Long]()
    for ((w, f) <- words) {
      val (b, path) = dp(w, None)
      for (p <- path.filter(_.length > 1).distinct) {
        val (a, _) = dp(w, Some(p))
        loss(p) = loss.getOrElse(p, 0L) + f * (b - a)
      }
    }
    kept.collect { case (p, c) if p.length > 1 =>
      p -> (c, loss.getOrElse(p, 0L)) }.toMap
  }

  test("losses match an independent full replay of seed -> score -> " +
      "exclusion DP, and pieces outside every best path lose zero") {
    val got = report()
    val exp = replay()
    assert(got.keySet === exp.keySet)
    exp.foreach { case (p, (c, l)) =>
      assert(got(p)._1 === c, s"cnt($p)")
      assert(got(p)._2 === l, s"loss($p)")
    }
    // qx / xv are never on a best path ("qxv" segments as itself)
    assert(got("qx")._2 === 0L)
    assert(got("xv")._2 === 0L)
  }

  test("likelihood-loss keeps the rare load-bearing piece that " +
      "count-top-K drops (Kudo section 3.2 vs the count M-step)") {
    val got = report()
    // count ranking at K=3 keeps abc (cnt 10) over qxv (cnt 5) ...
    assert(got("abc")._1 > got("qxv")._1)
    // ... but qxv's removal costs more likelihood, so the loss
    // criterion keeps qxv and prunes abc
    assert(got("qxv")._2 > got("abc")._2)
    assert(got("qxv")._3 === true)
    assert(got("abc")._3 === false)
    assert(got("ab")._3 === true)
    assert(got("bc")._3 === true)
    assert(got.values.count(_._3) === keep)
    // every loss is non-negative (removal can never improve a best path)
    got.values.foreach { case (_, l, _) => assert(l >= 0L) }
  }
}
