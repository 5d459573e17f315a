package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ObjectivesSpec extends SparkSpecBase {
  import spark.implicits._

  // independent reimplementation of the corpus PRNG (first 32 md5 bits
  // as a long) — the hand oracle for the draw-dependent assertions
  private def h32(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three"),
    (3L, "solo")).toDF("doc_id", "text")

  test("span corruption: hand-traced masks on every fixture doc " +
      "(independent md5 draw replay)") {
    val got = Objectives.spanCorruptionReport(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    docs.collect().sortBy(_.getLong(0)).zip(got).foreach { case (in, r) =>
      val id = in.getLong(0)
      val words = in.getString(1).split(" ").filter(_.nonEmpty)
      val n = words.length
      val flags = (0 until n).map(i => h32(s"$id:$i") % 20 == 0)
      val masked = (0 until n).map(i =>
        (math.max(0, i - 2) to i).exists(flags))
      val spans = (0 until n).count(i =>
        masked(i) && (i == 0 || !masked(i - 1)))
      assert(r.getAs[Long]("n_words") === n.toLong)
      assert(r.getAs[Long]("n_starts") === flags.count(identity).toLong)
      assert(r.getAs[Long]("n_masked") === masked.count(identity).toLong)
      assert(r.getAs[Long]("n_spans") === spans.toLong)
      assert(r.getAs[Long]("enc_tokens") ===
        (n - masked.count(identity) + spans).toLong)
      assert(r.getAs[Long]("tgt_tokens") ===
        (masked.count(identity) + spans).toLong)
    }
  }

  test("span corruption: a zero-word document emits NO row (the oracle's" +
      " LATERAL-unnest semantics, the cropPairReport convention)") {
    val withEmpty = docs.unionByName(
      Seq((4L, ""), (5L, "   ")).toDF("doc_id", "text"))
    val ids = Objectives.spanCorruptionReport(withEmpty, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L, 3L))
  }

  test("span corruption degenerate rates: every-position starts give " +
      "one full-doc span; spanLen 1 makes masked == starts") {
    val all = Objectives.spanCorruptionReport(docs, "doc_id", "text",
      startEvery = 1).orderBy("doc_id").collect()
    all.foreach { r =>
      val n = r.getAs[Long]("n_words")
      assert(r.getAs[Long]("n_starts") === n)
      assert(r.getAs[Long]("n_masked") === n)
      assert(r.getAs[Long]("n_spans") === 1L)
      assert(r.getAs[Long]("enc_tokens") === 1L)
      assert(r.getAs[Long]("tgt_tokens") === n + 1L)
      assert(r.getAs[Long]("mask_share_micro") === 1000000L)
    }
    Objectives.spanCorruptionReport(docs, "doc_id", "text", spanLen = 1)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_masked") === r.getAs[Long]("n_starts"))
        assert(r.getAs[Long]("n_spans") === r.getAs[Long]("n_starts"))
      }
  }

  test("fim split: hand-traced cut points and exact segment chars " +
      "(independent md5 draw replay)") {
    val got = Objectives.fimSplitReport(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    docs.collect().sortBy(_.getLong(0)).zip(got).foreach { case (in, r) =>
      val id = in.getLong(0)
      val words = in.getString(1).split(" ").filter(_.nonEmpty)
      val n = words.length
      val applied = h32(s"$id:fa") % 2 == 0
      val (lo, hi) = if (applied) {
        val c1 = h32(s"$id:f1") % (n + 1)
        val c2 = h32(s"$id:f2") % (n + 1)
        (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
      } else (n, n)
      def chars(a: Int, b: Int): Long =
        words.slice(a, b).map(_.length.toLong).sum +
          math.max(0, b - a - 1)
      assert(r.getAs[Boolean]("fim_applied") === applied)
      assert(r.getAs[Long]("pre_words") === lo.toLong)
      assert(r.getAs[Long]("mid_words") === (hi - lo).toLong)
      assert(r.getAs[Long]("suf_words") === (n - hi).toLong)
      assert(r.getAs[Long]("pre_chars") === chars(0, lo))
      assert(r.getAs[Long]("mid_chars") === chars(lo, hi))
      assert(r.getAs[Long]("suf_chars") === chars(hi, n))
      // the PSM render built FOR REAL must match the reported offsets
      val psm = "<|fim_pre|>" + words.slice(0, lo).mkString(" ") +
        "<|fim_suf|>" + words.slice(hi, n).mkString(" ") +
        "<|fim_mid|>" + words.slice(lo, hi).mkString(" ")
      assert(r.getAs[Long]("psm_chars") === psm.length.toLong)
      assert(psm.substring(r.getAs[Long]("mid_start").toInt,
        r.getAs[Long]("mid_end").toInt) === words.slice(lo, hi)
        .mkString(" "))
    }
  }

  test("crop pairs: hand-traced starts and overlap Jaccard " +
      "(independent md5 draw replay)") {
    val got = Objectives.cropPairReport(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    docs.collect().sortBy(_.getLong(0)).zip(got).foreach { case (in, r) =>
      val id = in.getLong(0)
      val n = in.getString(1).split(" ").count(_.nonEmpty).toLong
      val len = math.max(1L, n / 2)
      val m = n - len + 1
      val a = h32(s"$id:ca") % m
      val b = h32(s"$id:cb") % m
      val ov = math.max(0L, math.min(a, b) + len - math.max(a, b))
      assert(r.getAs[Long]("crop_len") === len)
      assert(r.getAs[Long]("a_start") === a)
      assert(r.getAs[Long]("b_start") === b)
      assert(r.getAs[Long]("overlap") === ov)
      assert(r.getAs[Long]("jaccard_micro") ===
        ov * 1000000L / (2 * len - ov))
      assert(r.getAs[Boolean]("usable") === (ov > 0 && ov < len))
    }
  }

  test("crop pairs: identical crops score full Jaccard but are not " +
      "usable positives; a one-word doc degenerates cleanly") {
    // a 1-word doc forces L=1, m=1 -> both starts 0, overlap 1
    val one = Seq((7L, "solo")).toDF("doc_id", "text")
    val r = Objectives.cropPairReport(one, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("crop_len") === 1L)
    assert(r.getAs[Long]("overlap") === 1L)
    assert(r.getAs[Long]("jaccard_micro") === 1000000L)
    assert(!r.getAs[Boolean]("usable"))
  }

  test("fim split: word and char partitions are exact decompositions") {
    Objectives.fimSplitReport(docs, "doc_id", "text").collect()
      .foreach { r =>
        assert(r.getAs[Long]("pre_words") + r.getAs[Long]("mid_words") +
          r.getAs[Long]("suf_words") === r.getAs[Long]("n_words"))
        assert(r.getAs[Long]("mid_end") <= r.getAs[Long]("psm_chars"))
        assert(r.getAs[Long]("mid_end") - r.getAs[Long]("mid_start") ===
          r.getAs[Long]("mid_chars"))
      }
  }
}
