package graft.sim

import graft.{Q, Tables}
import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF postings index PERSISTED ON MANIFEST COMMITS — the
  * [[SimilarityOps.appendToIvf]] lifecycle re-homed onto
  * [[graft.pipeline.VersionedTable]], so the index gets snapshot
  * isolation under the streaming maintenance loops for free:
  *
  *  - the coarse quantizer is FROZEN at create (written once, immutable
  *    — the precondition that makes incremental build ≡ full rebuild
  *    exact, proven by q_s_ivf_append);
  *  - an append batch assigns against the frozen quantizer (map-only
  *    literal argmin, cost ∝ |batch|, independent of index size) and
  *    commits by ADDING files — [[VersionedTable.append]]: no existing
  *    posting is read, rewritten, or moved;
  *  - a reader (probe) resolves ONE manifest and scans that explicit
  *    file list: appends racing underneath never tear its snapshot, and
  *    `version` time-travels to any retained index state (probe the
  *    pre-append index while debugging a recall regression);
  *  - postings bucket on the LIST id, so a probe prunes AT THE MANIFEST
  *    to the ≤ nList·nProbe lists its queries rank — at 100 TB the scan
  *    reads only the probed lists' files, never the index.
  *
  * Single writer per index (the maintenance-loop topology); probes need
  * no coordination. Registered as q_s_ivf_versioned: build over the
  * base corpus, append the arriving fifth, probe BOTH the latest and
  * the time-traveled v0 snapshot — the oracle recomputes each from
  * scratch, so the hash match proves append ≡ rebuild AND time travel
  * in one gate. */
object VersionedIvf {

  private def quantizerDir(dir: String) = s"$dir/quantizer"

  /** Create the index at `dir`: freeze the coarse quantizer (the nList
    * lowest-id base vectors, [[SimilarityOps.ivfCentroids]]), assign the
    * base corpus, commit as version 0 bucketed on the list id. */
  def create(base: DataFrame, dir: String, idCol: String, vecCol: String,
      nList: Int, numBuckets: Int): Unit = {
    val spark = base.sparkSession
    val cent = SimilarityOps.ivfCentroids(base, idCol, vecCol, nList)
    // the quantizer is config-sized (nList rows) and IMMUTABLE: one file,
    // written exactly once — overwriting it would silently invalidate
    // every committed posting, so ErrorIfExists
    cent.coalesce(1).write.mode(SaveMode.ErrorIfExists)
      .parquet(quantizerDir(dir))
    val postings = SimilarityOps.assignToLists(
      SimilarityOps.prep(base, idCol, vecCol), cent)
    VersionedTable.create(postings, dir, "list", numBuckets)
  }

  /** The frozen coarse quantizer: (cid, cv), nList rows. */
  def quantizer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(quantizerDir(dir))

  /** Assign an arriving batch against the frozen quantizer and commit it
    * as a new version. Pure file-add ([[VersionedTable.append]]): batch
    * cost is |batch| assignment + write, independent of index size. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String, numBuckets: Int): Unit = {
    val postings = SimilarityOps.assignToLists(
      SimilarityOps.prep(batch, idCol, vecCol), quantizer(spark, dir))
    VersionedTable.append(spark, dir, postings, "list", numBuckets)
  }

  /** The postings snapshot (id, list, v) at `version` (latest by
    * default) — an explicit manifest file list, immune to concurrent
    * appends. */
  def readIndex(spark: SparkSession, dir: String, version: Long = -1L)
      : DataFrame =
    VersionedTable.read(spark, dir, version).select("id", "list", "v")

  /** Probe the persisted index: rank each query's nProbe nearest lists
    * against the frozen quantizer, PRUNE THE MANIFEST to the union of
    * probed lists (an aggregate-sized collect — at most nList values,
    * config-sized at any corpus size), then score exactly as
    * [[SimilarityOps.probeIvf]]. `version` time-travels the probe to any
    * retained snapshot. */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, k: Int,
      numBuckets: Int, version: Long = -1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = quantizer(spark, dir)
    val q = SimilarityOps.prep(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"))
    val d2q = graft.functions.SquaredDistance.squaredDist(col("qv"), col("cv"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("cid"))
    val probedLists = q.join(broadcast(cent)).withColumn("d2", d2q)
      .withColumn("r", row_number().over(w)).filter(col("r") <= nProbe)
      .select("cid").distinct().collect().map(_.getLong(0)).toSeq
    val pruned = VersionedTable.lookupKeys(spark, dir, "list",
        probedLists, numBuckets, version)
      .select("id", "list", "v")
    SimilarityOps.probeIvf(pruned, cent, queries, idCol, vecCol, nProbe, k)
  }

  // -- registered query -------------------------------------------------

  /** q_s_ivf_versioned: base corpus (vec_id % 5 ≠ 0) creates the index,
    * the arriving fifth commits as version 1, and the SAME query set
    * probes version 1 AND the time-traveled version 0. The oracle
    * assigns each snapshot's corpus from scratch against the frozen
    * (base-derived) quantizer, so one hash gate certifies the whole
    * lifecycle: append ≡ rebuild, and time travel reads exactly the
    * pre-append index. */
  private val sVersioned = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val dir = java.nio.file.Files.createTempDirectory("graft-vivf")
        .toString + "/index"
      create(base, dir, "vec_id", "embedding", nList = 16, numBuckets = 16)
      append(s, dir, batch, "vec_id", "embedding", numBuckets = 16)
      val q = emb.filter(col("vec_id") < 5)
      val out = probe(s, dir, q, "vec_id", "embedding", nProbe = 4, k = 3,
          numBuckets = 16)
        .withColumn("ver", lit(1L))
        .unionByName(probe(s, dir, q, "vec_id", "embedding", nProbe = 4,
          k = 3, numBuckets = 16, version = 0L).withColumn("ver", lit(0L)))
        .orderBy("ver", "qid", "rank")
      // materialize, then drop the scratch index (the pCorpus release
      // convention: the returned frame must stay consumable afterwards)
      val mat = out.localCheckpoint(eager = true)
      org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(
          new java.io.File(dir).getParent), true)
      mat
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            cent AS (SELECT vec_id AS cid, e AS cv FROM v
                     WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT 16),
            dist AS (SELECT v.vec_id AS id, cent.cid,
                COALESCE(list_sum(list_transform(range(0, 64),
                  i -> (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1])
                     * (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1]))), 0)
                  AS d2
              FROM v CROSS JOIN cent),
            ar AS (SELECT id, cid, row_number() OVER
                     (PARTITION BY id ORDER BY d2, cid) AS r FROM dist),
            assigned AS (SELECT id, cid AS list FROM ar WHERE r = 1),
            probes AS (SELECT id AS qid, cid AS list FROM ar
                       WHERE r <= 4 AND id < 5),
            snap AS (SELECT 1 AS ver, id, list FROM assigned
                     UNION ALL
                     SELECT 0 AS ver, id, list FROM assigned
                     WHERE id % 5 <> 0),
            cand AS (SELECT DISTINCT snap.ver, p.qid, snap.id
              FROM snap JOIN probes p ON snap.list = p.list
              WHERE snap.id <> p.qid),
            scored AS (SELECT cand.ver, cand.qid, cand.id,
                list_dot_product(a.e, b.e)
                  / (SQRT(list_dot_product(a.e, a.e))
                     * SQRT(list_dot_product(b.e, b.e))) AS cosine
              FROM cand JOIN v a ON a.vec_id = cand.id
                        JOIN v b ON b.vec_id = cand.qid),
            r AS (SELECT ver, qid, id, cosine, row_number() OVER
                    (PARTITION BY ver, qid ORDER BY cosine DESC, id) AS rank
                  FROM scored)
            SELECT CAST(ver AS BIGINT) AS ver, qid, rank, id AS neighbor,
                   ROUND(cosine, 6) AS cosine
            FROM r WHERE rank <= 3 ORDER BY ver, qid, rank"""))

  val queries: Map[String, Q] = Map("q_s_ivf_versioned" -> sVersioned)
}
