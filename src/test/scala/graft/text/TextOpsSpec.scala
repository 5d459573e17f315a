package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("token count ignores empty tokens from repeated whitespace") {
    val df = Seq((1L, "a  b   c"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = df.select($"id", TextOps.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("quality columns: ratios bounded, empty text safe (no division by zero)") {
    val df = Seq((1L, "The quick, brown fox!"), (2L, "")).toDF("id", "text")
    val rows = TextOps.qualityFeatures(df, "id", "text").collect()
    rows.foreach { r =>
      Seq("punct_ratio", "stopword_ratio", "upper_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
    }
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Double]("punct_ratio") > 0) // ',' and '!'
    assert(r1.getAs[Double]("upper_ratio") > 0) // 'T'
    assert(r1.getAs[Double]("stopword_ratio") === 0.25) // 'the' of 4 tokens
  }

  test("language-ID: clear profiles win, tie-break order is deterministic") {
    val df = Seq(
      (1L, "select join query table scan"),
      (2L, "spark shuffle partition executor batch"),
      (3L, "the and of fast slow"),
      (4L, "zzz yyy xxx")). // no profile hits -> all zero -> tie-break 'en'
      toDF("id", "text")
    val out = TextOps.langId(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(out === Map(1L -> "sql", 2L -> "spark", 3L -> "en", 4L -> "en"))
  }

  test("fingerprint is invariant to case, token order, and duplication") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "GAMMA alpha BETA beta"),
      (3L, "alpha beta delta")).toDF("id", "text")
    val fp = df.select($"id", TextOps.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("repetition: hand-computed gopher ratios on a templated doc") {
    // doc 1 = "go go go stop": bigrams = [go go, go go, go stop] →
    //   top bigram "go go" covers 2×5 chars of 13 → 0.769231
    //   trigrams = [go go go, go go stop] — no repeats → dup ratio 0
    // doc 2 = "a b a b a b": trigram "a b a" ×2 and "b a b" ×2 →
    //   dup chars = 2×5 + 2×5 = 20 over 11 chars → ratio > 1 is allowed
    //   (per-occurrence counting upper-bounds merged spans; documented)
    val df = Seq((1L, "go go go stop"), (2L, "a b a b a b"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionFeatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === (("go go", 0.769231, 0.0)))
    assert(out(2L)._1 === "a b")
    assert(out(2L)._3 === 1.818182) // round(20/11, 6)
  }

  test("tfidf: corpus-wide terms score zero, rare repeated terms rank first") {
    // "cat" appears in all 3 docs → idf = ln(1) = 0; "rocket" only in doc 1
    // with tf=2 → top term of doc 1
    val df = Seq((1L, "cat rocket rocket dog"), (2L, "cat dog"),
      (3L, "cat fish")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(5)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.head._3 === "rocket")
    assert(doc1.head._4 === 2.197225) // 2 * ln(3/1) rounded to 6dp
    assert(out.filter(_._3 == "cat").forall(_._4 === 0.0))
  }

  test("chunking: overlapping windows, ragged tail, degenerate docs") {
    val doc = (1 to 7).map(i => s"w$i").mkString(" ") // 7 tokens
    val df = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(df, "doc_id", "text",
      chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0,3,6 → [w1..w4], [w4..w7] (overlap w4), tail [w7]
    assert(out.toSeq === Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7", 1L),
      (2L, 0L, "a b", 2L)))
  }

  test("repetition: short and empty docs fall back to empty bigram and zero ratios") {
    val df = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.repetitionFeatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === (("", 0.0, 0.0)))
    assert(out(2L) === (("", 0.0, 0.0)))
  }

  test("pii: emails, phones, and IPv4s are counted and redacted; clean text untouched") {
    val df = Seq(
      (1L, "write bob.smith+x@corp.example.com or call 555-123-4567 now"),
      (2L, "served from 192.168.10.1 and 10.0.0.255, mail a@b.io"),
      (3L, "no pii here, just text with version 1.2 and code x@y")).toDF("doc_id", "text")
    val out = TextOps.piiRedact(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) === ((1L, 1L, 0L, "write <EMAIL> or call <PHONE> now")))
    assert(out(2L) === ((1L, 0L, 2L, "served from <IP> and <IP>, mail <EMAIL>")))
    // "x@y" has no dot-TLD, "1.2" is not a dotted quad — both stay
    assert(out(3L) === ((0L, 0L, 0L,
      "no pii here, just text with version 1.2 and code x@y")))
  }

  test("cleanText: NFC composes accents, controls become boundaries, ws collapses") {
    val df = Seq(
      (1L, "cafe\u0301 x"),          // decomposed accent -> composed
      (2L, "a\nb\u0007c"),           // newline + BEL: boundaries kept
      (3L, "  lots   of\t\tspace  "), // collapse + trim
      (4L, "del\u200Bzw")).toDF("doc_id", "text") // zero-width (Cf) -> space
    val out = TextOps.cleanText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L)._1 === "caf\u00e9 x")
    assert(out(1L)._2 === 6L) // composed e-acute counts one char
    assert(out(2L)._1 === "a b c")
    assert(out(3L)._1 === "lots of space")
    assert(out(4L)._1 === "del zw")
  }

  test("pii redaction is idempotent: placeholder tags never re-match") {
    val rnd = new scala.util.Random(3)
    val pieces = Seq("text", "a@b.co", "555-123-4567", "8.8.8.8", "word",
      "x.y@z.example.com")
    val df = (0 until 50).map(i =>
      (i.toLong, Seq.fill(6)(pieces(rnd.nextInt(pieces.length)))
        .mkString(" "))).toDF("doc_id", "text")
    val once = TextOps.piiRedact(df, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = TextOps.piiRedact(once, "doc_id", "text")
    // second pass finds nothing and changes nothing
    val residual = twice
      .agg(sum(col("n_emails") + col("n_phones") + col("n_ips"))).head().getLong(0)
    assert(residual === 0L)
    val changed = once.join(twice.select(col("doc_id"), col("redacted")), "doc_id")
      .filter(col("text") =!= col("redacted")).count()
    assert(changed === 0L)
  }

  test("packSequences: offsets, straddling split, empty doc rides along") {
    import spark.implicits._
    // token counts: a=3, b=4, c=0, d=5 at budget 6 →
    //   a [0,3) bin 0; b [3,7) straddles bins 0-1 (split);
    //   c offset 7, zero tokens → bin 1 only; d [7,12) bins 1 (7..11) — all
    //   inside bin 1 (6..11)
    val df = Seq(
      (1L, "one two three"), (2L, "a b c d"), (3L, ""),
      (4L, "v w x y z")).toDF("doc_id", "text")
    val out = TextOps.packSequences(df, "doc_id", "text", 6L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_tok"),
         r.getAs[Long]("bin_first"), r.getAs[Long]("bin_last"),
         r.getAs[Long]("n_segments"))).toMap
    assert(out(1L) === ((3L, 0L, 0L, 0L, 1L)))
    assert(out(2L) === ((4L, 3L, 0L, 1L, 2L)), "doc straddles the cut")
    assert(out(3L) === ((0L, 7L, 1L, 1L, 1L)), "empty doc occupies no space")
    assert(out(4L) === ((5L, 7L, 1L, 1L, 1L)))
    // stream is gapless: the last doc's end equals the total token count
    val total = out.values.map(_._1).sum
    assert(out.values.map(t => t._2 + t._1).max === total)
  }

  test("htmlStrip: tags to spaces, single-decode entities, edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a<br>b"),                      // tag must not glue a to b
      (2L, "&amp;lt; stays literal"),      // double-encoded: ONE decode only
      (3L, "<p>x &amp; y</p>"),
      (4L, "no markup at all"),
      (5L, "unclosed <tag stays")          // no '>' -> not a tag
    ).toDF("doc_id", "text")
    val out = TextOps.htmlStrip(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((1L, 0L, "a b")))
    assert(out(2L) === ((0L, 1L, "&lt; stays literal")),
      "&amp;lt; must decode exactly once, to the literal string '&lt;'")
    assert(out(3L) === ((2L, 1L, "x & y")))
    assert(out(4L) === ((0L, 0L, "no markup at all")))
    assert(out(5L) === ((0L, 0L, "unclosed <tag stays")))
  }

  test("packGrouped: each group is its own zero-based stream, no mixing") {
    import spark.implicits._
    // group A: 3 + 4 tokens (doc 2 straddles the 6-cut), group B: 5 tokens
    // starting back at offset 0 — a global packer would have put doc 10
    // at offset 7
    val counted = Seq(
      (1L, "A", 3L), (2L, "A", 4L), (10L, "B", 5L))
      .toDF("doc_id", "grp", "n_tokens")
    val (out, release) = TextOps.packGroupedReleasable(
      counted, "doc_id", "grp", 6L)
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("grp"), r.getAs[Long]("start_tok"),
       r.getAs[Long]("bin_first"), r.getAs[Long]("bin_last"))).toMap
    release()
    assert(rows(1L) === (("A", 0L, 0L, 0L)))
    assert(rows(2L) === (("A", 3L, 0L, 1L)), "straddler splits within A")
    assert(rows(10L) === (("B", 0L, 0L, 0L)),
      "group B restarts at offset 0 — sequences never mix groups")
    spark.catalog.clearCache()
  }

  test("curriculum packing lays short docs out first") {
    import org.apache.spark.sql.functions.col
    val counted = Seq((1L, 100L), (2L, 5L), (3L, 40L), (4L, 5L))
      .toDF("doc_id", "n_tokens")
    val (out, release) = TextOps.packCountedOrderedReleasable(
      counted, Seq(col("n_tokens"), col("doc_id")), 512L)
    val offs = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("start_tok")).toMap
    release()
    // layout order (n_tokens, id): 2(5) -> 4(5) -> 3(40) -> 1(100)
    assert(offs === Map(2L -> 0L, 4L -> 5L, 3L -> 10L, 1L -> 50L))
  }

  test("gopherRules: each rule trips on its crafted violator, keep is the AND") {
    val good = "the quick brown foxes jumped over many lazy sleeping dogs " +
      "while the farmer watched from his barn door in quiet amazement " +
      "until every single animal finally wandered home again after dark"
    val docs = Seq(
      (1L, good),                               // passes everything
      (2L, "too few words here"),               // r_wc (and r_stop)
      (3L, ("a b c " * 20).trim + " the of"),   // r_mwl low (mean < 3.5)
      (4L, good.replace("the ", "### the ")),   // r_sym
      (5L, Seq.fill(30)("wordy").mkString(" ")) // r_stop (0 stopwords)
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_wc"), r.getAs[Boolean]("r_mwl"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_sym"),
          r.getAs[Boolean]("r_stop"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._6)
    assert(!out(3L)._2 && !out(3L)._6)
    assert(!out(4L)._4 && !out(4L)._6)
    assert(!out(5L)._5 && !out(5L)._6)
    // '…' and '...' both count as symbols; integer div by 3 for the dots
    val sym = TextOps.gopherRules(
      Seq((9L, "a … b ... c")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_sym").as[Long].head()
    assert(sym === 2L)
  }

  test("ngramDiversity: exact totals, short docs skipped, dup collapse") {
    val docs = Seq(
      ("en", "a b c d"),     // trigrams: "a b c", "b c d"
      ("en", "a b c"),       // "a b c" again -> duplicate
      ("en", "x y"),         // shorter than n: contributes nothing
      ("fr", "u v w")        // one trigram in its own group
    ).toDF("lang", "text")
    val out = TextOps.ngramDiversity(docs, "lang", "text", n = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("total_ngrams"), r.getAs[Long]("distinct_ngrams")))
      .toMap
    assert(out("en") === ((3L, 2L)))
    assert(out("fr") === ((1L, 1L)))
    // a corpus duplicated wholesale doubles totals, distinct unchanged
    val doubled = TextOps.ngramDiversity(docs.union(docs), "lang", "text", 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("total_ngrams"), r.getAs[Long]("distinct_ngrams")))
      .toMap
    assert(doubled("en") === ((6L, 2L)))
  }

  test("quality percentile: 0..1 span per source, singleton pins 0.5") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "the of and the of"), // densest stopwords in source a
      (2L, "a", "the foo bar baz qux"),
      (3L, "a", "foo bar baz qux quux"),
      (4L, "b", "anything at all"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.qualityPercentileBySource(docs, "doc_id", "text",
      "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pct")).toMap
    assert(out(3L) === 0.0) // zero stopwords -> lowest rank
    assert(out(2L) === 0.5)
    assert(out(1L) === 1.0)
    assert(out(4L) === 0.5) // singleton source
  }
}
