package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured answer to "does exactCharSpans' gram-key stage need the
  * rolling-hash codegen expression?" (the BpeVocabBench discipline:
  * measure BEFORE porting).
  *
  * The composed key stage hashes every position's L-char substring with
  * xxhash64 — O(len·L) character reads and one UTF8String slice per
  * position. [[graft.functions.RollingGramHash]] computes the same-shape
  * keys in one O(len) Karp–Rabin pass. This bench times ONLY the
  * map-side key computation (explode + xor checksum, no gram-key
  * shuffle) on synthetic ~4 KB docs, so the ratio isolates the stage the
  * expression replaces.
  *
  *   sbt "runMain graft.tools.GramHashBench [nDocs] [docChars]"
  */
object GramHashBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val docChars = args.drop(1).headOption.map(_.toInt).getOrElse(4096)
    val L = 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic docs: repeated sha2 blocks -> deterministic, non-periodic
    // at gram scale, docChars chars each
    val blocks = docChars / 64 + 1
    val docs = spark.range(nDocs.toLong)
      .select(col("id"), substring(concat_ws("", (0 until blocks).map(b =>
        sha2(concat(col("id").cast("string"), lit(s":$b")), 256)): _*),
        1, docChars).as("__t"))
      .persist()
    docs.count()

    def timed(label: String)(f: => Long): Unit = {
      // two runs, min kept — first run pays codegen compilation
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        (System.nanoTime() - t0) / 1e9 -> r
      }
      println(f"  $label%-38s ${times.map(_._1).min}%7.2f s " +
        f"(checksum ${times.head._2}%d)")
    }

    println(s"=== gram-key stage at $nDocs docs x $docChars chars, L=$L ===")
    timed("composed: transform+substr+xxhash64") {
      docs.select(col("id"), posexplode(expr(
          s"""transform(sequence(0, length(__t) - $L),
                i -> struct(xxhash64(substr(__t, i + 1, $L)) AS h1,
                            xxhash64('g2', substr(__t, i + 1, $L)) AS h2))"""))
          .as(Seq("pos", "h")))
        .agg(bit_xor(col("h.h1").bitwiseXOR(col("h.h2")))).head().getLong(0)
    }
    timed("codegen: dual rolling Karp-Rabin") {
      import graft.functions.RollingGramHash
      docs.select(col("id"),
          RollingGramHash.hashes(col("__t"), L, RollingGramHash.Mult1).as("a"),
          RollingGramHash.hashes(col("__t"), L, RollingGramHash.Mult2).as("b"))
        .select(col("id"), posexplode(arrays_zip(col("a"), col("b")))
          .as(Seq("pos", "h")))
        .agg(bit_xor(col("h.a").bitwiseXOR(col("h.b")))).head().getLong(0)
    }

    // CDC boundary-detection shape (cdcChunks): one 8-char window hash
    // per position, kept only where the boundary condition holds. The
    // composed shape allocates one UTF8String slice AND one full md5 per
    // position (O(len·w) reads, O(len) digests); the rolling shape is
    // one O(len) pass + an O(1) top-bits test per position. Checksums
    // are boundary COUNTS (different hash families select different
    // positions; both land near len/64 on random text — comparable
    // selectivity, not identical positions).
    println(s"=== cdc boundary stage at $nDocs docs x $docChars chars, w=8 ===")
    timed("composed: per-position md5(substr)%64") {
      docs.select(size(filter(sequence(lit(8), length(col("__t"))), i =>
          conv(substring(md5(col("__t").substr(i - 7, lit(8))), 1, 2),
            16, 10).cast("int") % 64 === 0)).as("nb"))
        .agg(sum("nb")).head().getLong(0)
    }
    // NOTE the zip_with shape: the hash array is an ARGUMENT of the HOF
    // (evaluated once per row), never referenced inside a lambda — an
    // aliased column read via element_at(i) in the lambda gets INLINED by
    // CollapseProject, re-evaluating the O(len) rolling pass per position
    // (measured: minutes, not seconds — O(len²) resurrected)
    timed("codegen: rolling hash + top-bits test") {
      import graft.functions.RollingGramHash
      docs.select(size(filter(zip_with(
          RollingGramHash.hashes(col("__t"), 8, RollingGramHash.Mult1),
          sequence(lit(8), length(col("__t"))),
          (h, pos) => when(shiftrightunsigned(h, 58) === 0, pos)),
        p => p.isNotNull)).as("nb"))
        .agg(sum("nb")).head().getLong(0)
    }
    spark.stop()
  }
}
