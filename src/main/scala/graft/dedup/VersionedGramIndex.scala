package graft.dedup

import graft.{Q, Tables}
import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The exact-substring (char-gram) contamination index PERSISTED ON
  * MANIFEST COMMITS — [[DupClusters.buildSpanIndex]]'s lifecycle
  * re-homed onto [[graft.pipeline.VersionedTable]], closing the
  * round-11 verdict's index-unification item across all THREE persisted
  * index families (IVF postings → [[graft.sim.VersionedIvf]], embedding
  * LSH → [[VersionedEmbedIndex]], gram keys → here). The streaming
  * contamination gate probes a SNAPSHOT: appends racing underneath
  * never tear a running probe, and `version` time-travels the
  * arbitration ("which spans would yesterday's index have flagged").
  *
  *  - index rows are 16-byte gram keys (h1, h2) — content-addressed and
  *    immutable, so an append is a PURE file add
  *    ([[VersionedTable.append]]): nothing existing is read or moved,
  *    commit cost ∝ |batch grams|;
  *  - duplicate keys across commits are harmless BY CONSTRUCTION: the
  *    probe is a left-semi join, for which key multiplicity is
  *    invisible — so appends skip the global distinct a bare-parquet
  *    dedup of the index would need (per-BATCH distinct only), and
  *    compaction is an optimization, never a correctness step;
  *  - rows bucket on h1 for write parallelism; the probe reads the full
  *    snapshot (a semi-join build side), so manifest pruning is not
  *    part of this index's contract — same trade as the LSH index.
  *
  * Single writer (the ingest loop), coordination-free readers. */
object VersionedGramIndex {

  /** Create the index at `dir` from the base corpus (version 0). */
  def create(base: DataFrame, dir: String, idCol: String, textCol: String,
      minLen: Int = 50, numBuckets: Int = 16): Unit =
    VersionedTable.create(
      DupClusters.buildSpanIndex(base, idCol, textCol, minLen),
      dir, "h1", numBuckets)

  /** Commit an arriving batch's (batch-distinct) gram keys as a new
    * version — pure file add. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, minLen: Int = 50,
      numBuckets: Int = 16): Unit =
    VersionedTable.append(spark, dir,
      DupClusters.buildSpanIndex(batch, idCol, textCol, minLen),
      "h1", numBuckets)

  /** Duplicated spans of `batch` against the `version` snapshot
    * (latest by default) — [[DupClusters.exactSpansVsIndex]] over an
    * explicit manifest file list. */
  def probe(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, minLen: Int = 50,
      version: Long = -1L): DataFrame =
    DupClusters.exactSpansVsIndex(batch,
      VersionedTable.read(spark, dir, version).select("h1", "h2"),
      idCol, textCol, minLen)

  /** q_d_spans_versioned: even docs are the corpus — all but the
    * multiples of 20 create the index, the multiples of 20 commit as
    * version 1 — and the odd docs probe BOTH the latest and the
    * time-traveled v0 snapshot. The oracle rebuilds each snapshot's
    * gram set from scratch as literal substrings, so one hash gate
    * certifies append ≡ rebuild AND that time travel reads exactly the
    * pre-append index. */
  private val dVersioned = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val base = evens.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      val arriving = evens.filter(pmod(col("doc_id"), lit(20)) === 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val dir = java.nio.file.Files.createTempDirectory("graft-vgram")
        .toString + "/index"
      create(base, dir, "doc_id", "text")
      append(s, dir, arriving, "doc_id", "text")
      val out = probe(s, dir, batch, "doc_id", "text")
        .withColumn("ver", lit(1L))
        .unionByName(probe(s, dir, batch, "doc_id", "text", version = 0L)
          .withColumn("ver", lit(0L)))
        .orderBy("ver", "doc_id", "span_start")
      val mat = out.localCheckpoint(eager = true)
      org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(
          new java.io.File(dir).getParent), true)
      mat
    },
    Some("""WITH g AS (SELECT doc_id, CAST(i AS INT) AS pos,
                substr(text, CAST(i AS INT) + 1, 50) AS gram
              FROM documents,
                LATERAL (SELECT unnest(range(length(text) - 49)) AS i) ii
              WHERE length(text) >= 50),
            snap AS (SELECT 1 AS ver, gram FROM g WHERE doc_id % 2 = 0
                     UNION
                     SELECT 0 AS ver, gram FROM g
                     WHERE doc_id % 2 = 0 AND doc_id % 20 <> 0),
            bg AS (SELECT snap.ver, g.doc_id, g.pos
                   FROM g JOIN snap ON g.gram = snap.gram
                   WHERE g.doc_id % 2 = 1),
            runs AS (SELECT DISTINCT ver, doc_id, pos FROM bg),
            grp AS (SELECT ver, doc_id, pos,
                pos - CAST(row_number() OVER
                  (PARTITION BY ver, doc_id ORDER BY pos) AS INT) AS grp
              FROM runs)
            SELECT CAST(ver AS BIGINT) AS ver, doc_id,
              CAST(MIN(pos) AS BIGINT) AS span_start,
              CAST(MAX(pos) + 49 AS BIGINT) AS span_end,
              CAST(MAX(pos) - MIN(pos) + 50 AS BIGINT) AS span_len
            FROM grp GROUP BY ver, doc_id, grp
            ORDER BY ver, doc_id, span_start"""))

  val queries: Map[String, Q] = Map("q_d_spans_versioned" -> dVersioned)
}
