package graft.stats

import graft.SparkSpecBase
import graft.pipeline.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def melt(rows: Seq[String]): DataFrame =
    rows.map(("lang", _)).toDF("variable", "value")

  private def psiOf(ref: Seq[String], cur: Seq[String]): Map[String, Long] =
    Drift.psi(melt(ref), melt(cur), "variable", "value")
      .select("value", "term_micro").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def expectedTerm(cr: Long, cc: Long, nr: Long, nc: Long,
      v: Long): Long = {
    val p = (cr + 1).toDouble / (nr + v)
    val q = (cc + 1).toDouble / (nc + v)
    math.floor((p - q) * math.log(p / q) * 1000000.0).toLong
  }

  test("identical populations score PSI exactly 0 on every bin") {
    val pop = Seq("en", "en", "en", "fr", "de")
    val out = Drift.psi(melt(pop), melt(pop), "variable", "value")
    assert(out.agg(max(abs(col("term_micro")))).head().getLong(0) === 0L)
    assert(out.select("psi_micro").distinct().head().getLong(0) === 0L)
  }

  test("a planted shift produces the hand-computed Laplace terms; " +
      "one-sided values stay finite") {
    // ref: 3 en, 1 fr; cur: 1 en, 2 fr, 1 zh (zh unseen in ref)
    val terms = psiOf(Seq("en", "en", "en", "fr"),
      Seq("en", "fr", "fr", "zh"))
    // V = 3 distinct values across both sides, n_ref = 4, n_cur = 4
    assert(terms("en") === expectedTerm(3, 1, 4, 4, 3))
    assert(terms("fr") === expectedTerm(1, 2, 4, 4, 3))
    assert(terms("zh") === expectedTerm(0, 1, 4, 4, 3))
    // (p−q) and ln(p/q) always share sign, so every pre-floor PSI term
    // is non-negative — both the vacated (en) and the arriving (zh)
    // side contribute positive drift
    assert(terms("en") > 0L && terms("zh") > 0L)
  }

  test("PSI between VersionedTable snapshots == PSI between the raw " +
      "populations (time-travel composition)") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString + "/t"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v0 = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    VersionedTable.create(v0, dir, "doc_id", numBuckets = 4)
    VersionedTable.append(spark, dir, batch, "doc_id", numBuckets = 4)
    def meltD(df: DataFrame) = Drift.meltDocs(df)
    val viaTable = Drift.psi(
        meltD(VersionedTable.read(spark, dir, version = 0L)),
        meltD(VersionedTable.read(spark, dir)), "variable", "value")
      .orderBy("variable", "value").collect().toSeq
    val viaRaw = Drift.psi(meltD(v0), meltD(docs), "variable", "value")
      .orderBy("variable", "value").collect().toSeq
    assert(viaTable === viaRaw)
    // the cumulative snapshot CONTAINS v0, so drift is small but the
    // appended third shifts the profile measurably away from zero
    assert(viaTable.map(_.getAs[Long]("term_micro")).exists(_ != 0L))
  }
}
