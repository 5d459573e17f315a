package graft.text

import graft.SparkSpecBase

class JsdSpec extends SparkSpecBase {
  import spark.implicits._

  private def jsd(rows: (String, String)*) = Jsd.oneVsRest(
    rows.toDF("g", "text"), "g", "text").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(r.fieldIndex("jsd_micro"))) None
         else Some(r.getAs[Long]("jsd_micro")))).toMap

  test("identical unigram distributions are at divergence exactly 0") {
    val m = jsd("a" -> "x y z", "b" -> "x y z")
    assert(m("a") === Some(0L))
    assert(m("b") === Some(0L))
  }

  test("disjoint vocabularies hit the ln 2 ceiling") {
    val m = jsd("a" -> "x x x", "b" -> "y y y")
    val ln2Micro = math.floor(math.log(2.0) * 1e6).toLong
    assert(m("a") === Some(ln2Micro))
    assert(m("b") === Some(ln2Micro))
  }

  test("partial overlap lands strictly between 0 and ln 2") {
    val m = jsd("a" -> "x y", "b" -> "x z")
    val v = m("a").get
    assert(v > 0L && v < 693147L)
    // symmetric fixture: both sides see the same mixture distance
    assert(m("b") === m("a"))
  }

  test("a single source has an empty rest: null divergence") {
    val m = jsd("a" -> "x y z")
    assert(m("a") === None)
  }

  test("token multiplicities matter, not just vocabulary") {
    val skew = jsd("a" -> "x x x y", "b" -> "x y y y")
    val flat = jsd("a" -> "x x y y", "b" -> "x x y y")
    assert(flat("a") === Some(0L))
    assert(skew("a").get > 0L)
  }

  test("empty-after-split texts contribute nothing") {
    val m = jsd("a" -> "x  y", "b" -> "x y")
    assert(m("a") === Some(0L))
  }
}
