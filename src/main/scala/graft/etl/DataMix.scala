package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic per-source sampling for training-data mixing: given a
  * target rate per source (upsample-quality / downsample-bulk curation,
  * the C4/Pile-style corpus mixing step), keep a document iff a uniform
  * hash of its id falls under the source's rate.
  *
  * The decision is a pure map-side expression — no shuffle, no RNG state:
  * u(id) = first 32 bits of md5(id) / 2³², so the sample is reproducible
  * under any partitioning and any engine with md5 (the oracle rebuilds the
  * identical u in DuckDB). At 100 TB this composes with the parquet scan
  * (predicate on a computed column — evaluated in the scan stage, rows
  * never reach a shuffle).
  *
  * Rates > 1 would need row replication (upsampling with repeats); this
  * operator caps at keep-all and leaves integer replication to the caller
  * (a `explode(sequence(...))` one-liner), keeping the kernel a filter.
  */
object DataMix {

  /** Uniform [0,1) hash of a column: first 8 hex chars of md5 → /2³².
    * Exact in double (numerator < 2³², denominator a power of two), so
    * both engines compare bit-identical doubles against the rate. */
  def uniformHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  def mixSample(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.withColumn("__u", uniformHash(col(idCol)))
      .withColumn("__rate", rate)
      .filter(col("__u") < col("__rate"))
      .drop("__u", "__rate")
  }

  // -- registered query ---------------------------------------------------

  /** Mix the 20-source documents corpus: keep all of src0, half of src1,
    * a quarter of everything else — the oracle replays the md5-threshold
    * decision per row (hex parsed with the strpos trick used by the
    * sha256-based LSH oracles). */
  private val pMix = Q(
    (s, d) => mixSample(Tables.documents(s, d), "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25)
      .select("doc_id", "source").orderBy("doc_id"),
    Some("""WITH u AS (SELECT doc_id, source,
              (  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)
              ) / 4294967296.0 AS uu
            FROM documents)
            SELECT doc_id, source FROM u
            WHERE uu < (CASE source WHEN 'src0' THEN 1.0
                                    WHEN 'src1' THEN 0.5
                                    ELSE 0.25 END)
            ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map("q_p14_mix_sample" -> pMix)
}
