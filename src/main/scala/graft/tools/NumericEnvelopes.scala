package graft.tools

/** NUMERIC_CONVENTION rule 11, executable: every long-arithmetic
  * overflow envelope that used to live only in scaladoc prose is a
  * registry entry here, and `NumericEnvelopeSpec` (a) recomputes each
  * entry's worst-case magnitude in BigInt and FAILS if it exceeds
  * Long.MaxValue, and (b) greps the source tree for the `Envelope:`
  * scaladoc marker and fails on any marker file without a registry
  * entry or any entry whose file lost its marker — so a prose-only
  * bound cannot exist in a green build.
  *
  * Convention for new operators: if a hashed path sums products in
  * long (not decimal(38)), state the bound in the scaladoc on a line
  * containing `Envelope:` and add the matching entry below. Operators
  * that accumulate in decimal(38)/HUGEINT, or that guard with a
  * runtime `require`/`assert_true` (ZOrder, the similarity rank
  * scale), need no entry — their failure mode is loud already. */
final case class Envelope(
    name: String,
    sourceFile: String,
    claim: String,
    worstAbs: BigInt)

object NumericEnvelopes {

  private def b(x: Long): BigInt = BigInt(x)

  val all: Seq[Envelope] = Seq(
    Envelope(
      "phash-dct-coefficient",
      "src/main/scala/graft/multimodal/PerceptualHash.scala",
      "8x8 gray DCT in Q14 fixed point: |C(u,v)| <= 255 * 64 * 16384^2",
      b(255) * 64 * b(16384).pow(2)),
    Envelope(
      "jl-projection-accumulator",
      "src/main/scala/graft/functions/JlProjection.scala",
      "±1-sign dot of quantized components: |acc| <= dim * (|v|max *" +
        " scale + 1) at dim 2^16, |v| <= 1e6, scale <= 2^10",
      b(1L << 16) * (b(1000000) * (1L << 10) + 1)),
    Envelope(
      "domain-caps-quota",
      "src/main/scala/graft/text/UrlOps.scala",
      "quota numerator total * capMicro at 9.2e12 docs, capMicro 1e6",
      b(9200000000000L) * 1000000),
    Envelope(
      "ngram-lm-doc-surprisal",
      "src/main/scala/graft/text/NgramLm.scala",
      "per-doc sum of micro-nat surprisals: n_bigrams * " +
        "ceil(ln(cx + kV) * 1e6) at 1e9 bigrams/doc, counts <= 1e18",
      b(1000000000L) * 42000000L),
    Envelope(
      "unigram-viterbi-path-total",
      "src/main/scala/graft/text/UnigramLm.scala",
      "DP path total: wordLen * ceil(ln(T + N) * 1e6) at 2^16-char " +
        "words, T <= 1e18 tokens",
      b(1L << 16) * 42000000L),
    Envelope(
      "tcloseness-floored-share",
      "src/main/scala/graft/etl/Privacy.scala",
      "micro share numerators cv * 1e6 and gv * 1e6 at 9.2e12 rows",
      b(9200000000000L) * 1000000),
    Envelope(
      "padding-waste-share",
      "src/main/scala/graft/etl/PaddingReport.scala",
      "waste_tokens * 1e6 at 9.2e12 padded tokens",
      b(9200000000000L) * 1000000),
    Envelope(
      "pack-contamination-share",
      "src/main/scala/graft/text/PackContamination.scala",
      "cross_pairs * 1e6 at 9.2e12 total attention pairs",
      b(9200000000000L) * 1000000),
    Envelope(
      "shuffle-quality-shares",
      "src/main/scala/graft/etl/ShuffleQuality.scala",
      "same_pairs * 1e6 and ns * 1e6 at 9.2e12 docs; pm^2 <= 1e12",
      b(9200000000000L) * 1000000),
    Envelope(
      "unigram-prune-loss-sum",
      "src/main/scala/graft/text/UnigramPrune.scala",
      "piece loss sum: tokens * wordLen * ceil(ln(T + N) * 1e6) at " +
        "1e10 corpus tokens of 16-char words",
      b(10000000000L) * 16 * 42000000L),
    Envelope(
      "bestfit-pack-pairs",
      "src/main/scala/graft/text/BestFitPack.scala",
      "cross/total attention pairs * 1e6 at 9.2e12 pairs (~ " +
        "stream tokens * budget / 2)",
      b(9200000000000L) * 1000000))
}
