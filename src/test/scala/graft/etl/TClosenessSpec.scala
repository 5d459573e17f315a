package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TClosenessSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand fixture: floored-micro TVD per class, absent values " +
      "count as zero mass") {
    // class A holds (x,x,y), class B holds (y,y,y); global x:2/6 y:4/6
    // A: |2e6/3 - 2e6/6| + |1e6/3 - 4e6/6| = 333333 + 333333 -> /2 = 333333
    // B: |0 - 333333|    + |1e6 - 666666| = 333333 + 333334 -> /2 = 333333
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "y"), ("B", "y"), ("B", "y")).toDF("g", "s")
    val got = Privacy.tClosenessReport(df, Seq("g"), "s")
      .orderBy("g").collect()
    assert(got.map(_.getAs[String]("g")).toSeq === Seq("A", "B"))
    val a = got(0); val bRow = got(1)
    assert(a.getAs[Long]("class_size") === 3L)
    assert(a.getAs[Long]("n_values") === 2L)
    assert(a.getAs[Long]("tvd_micro") === 333333L)
    assert(bRow.getAs[Long]("class_size") === 3L)
    assert(bRow.getAs[Long]("n_values") === 1L) // x never appears in B
    assert(bRow.getAs[Long]("tvd_micro") === 333333L)
  }

  test("a single class IS the global distribution: tvd exactly 0") {
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y")).toDF("g", "s")
    val got = Privacy.tClosenessReport(df, Seq("g"), "s").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("tvd_micro") === 0L)
  }

  test("identical per-class distributions across classes: both zero " +
      "(t-closeness is about shares, not sizes)") {
    val df = Seq(("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "x"), ("B", "y"), ("B", "y")).toDF("g", "s")
    val got = Privacy.tClosenessReport(df, Seq("g"), "s")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("tvd_micro")).toMap
    assert(got === Map("A" -> 0L, "B" -> 0L))
  }

  test("sensitive attribute overlapping the quasi set is rejected") {
    val df = Seq(("A", "x")).toDF("g", "s")
    intercept[IllegalArgumentException] {
      Privacy.tClosenessReport(df, Seq("g", "s"), "s")
    }
  }
}
