package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpecBase {
  import spark.implicits._

  private def h(s: String): Double =
    Seq(s).toDF("t").select(CharEntropy.charEntropy(col("t")))
      .as[Double].head()

  test("known entropies") {
    assert(h("abca") === 1.5) // p = {1/2, 1/4, 1/4}
    assert(h("aaaa") === 0.0)
    assert(h("") === 0.0)
    assert(math.abs(h("abcd") - 2.0) < 1e-12)
  }

  test("supplementary code points count as single characters") {
    // U+1F600 (surrogate pair in UTF-16) twice + 'a' twice -> 1 bit
    val s = "😀a😀a"
    assert(math.abs(h(s) - 1.0) < 1e-12)
  }

  test("null propagates and the expression runs inside codegen") {
    val out = Seq(Some("abca"), None).toDF("t")
      .select(CharEntropy.charEntropy(col("t")).as("h")).collect()
    assert(out.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSeq === Seq(Some(1.5), None))
  }

  test("prose scores between the gate brackets, filler below, noise above") {
    val prose = "the quick brown fox jumps over the lazy dog near the river bank"
    val filler = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val noise = "k9Xq2Zv7Lm4Rt8Wc1Jh5Np3Gd6Fb0Ys/+=QaEuIoTrPw"
    assert(h(prose) >= 2.0 && h(prose) <= 5.5)
    assert(h(filler) < 2.0)
    assert(h(noise) > 5.0)
  }
}
