package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence-level n-gram NOVELTY scoring — the dedup-aware-mixing
  * signal: for each candidate document, the fraction of its DISTINCT
  * word n-grams that do NOT occur anywhere in an already-selected
  * reference corpus. A mixing policy consumes it directly ("prefer
  * high-novelty candidates", "cap near-zero-novelty docs"), turning
  * near-duplicate suppression into a GRADED sampling weight instead of
  * [[graft.dedup.DedupOps.decontaminate]]'s binary drop — the
  * complement of contamination: there the reference is an eval suite
  * and ANY overlap is poison; here the reference is the selected
  * corpus so far and overlap is merely redundancy.
  *
  * Scale shape: gram construction rides [[graft.dedup.DedupOps
  * .shingles]] (tokenize-once, per-doc-distinct explode); the seen
  * test is ONE equi-join on the gram key. Unlike decontaminate's
  * broadcast (eval suites are tiny), the reference here is
  * corpus-scale, so the join SHUFFLES both sides on the gram key —
  * the natural partitioning, with AQE free to broadcast when the
  * reference happens to be small. One |grams|-scale exchange total;
  * the per-doc roll-up is map-side combined.
  *
  * Cross-engine determinism (NUMERIC_CONVENTION rule 1): counts are
  * exact longs and the score is pure integer division
  * `novel·1e6 div n_grams` — no float anywhere. A doc too short to
  * have a single n-gram carries no overlap evidence and scores fully
  * novel (1e6) by definition. */
object Novelty {

  /** Per-candidate novelty against `ref`. Output: (idCol, n_grams,
    * novel_grams, novelty_micro). */
  def noveltyScore(cand: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 3): DataFrame = {
    import graft.dedup.DedupOps.shingles
    def grams(df: DataFrame, id: String, tc: String): DataFrame =
      shingles(df.withColumn("__blk", lit(1)), id, tc, "__blk", n)
        .select(col("id"), col("shingle").as("g"))
    val seen = grams(ref.select(lit(0L).as("__rid"),
        col(refTextCol).as("__rt")), "__rid", "__rt")
      .select("g").distinct().withColumn("__seen", lit(1))
    val counted = grams(cand, idCol, textCol)
      .join(seen, Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), count("__seen").as("seen"))
    cand.select(col(idCol).as("id"))
      .join(counted, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        (coalesce(col("n_grams"), lit(0L))
          - coalesce(col("seen"), lit(0L))).as("novel_grams"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(1000000L))
          .otherwise(expr("""(coalesce(n_grams, 0L) - coalesce(seen, 0L))
                             * 1000000L div coalesce(n_grams, 1L)"""))
          .as("novelty_micro"))
  }

  /** q_t_novelty: docs with doc_id % 3 == 0 play the already-selected
    * corpus; the rest are candidates, scored on word 3-grams. The
    * corpus's planted near-dup families make the score spread real:
    * near-dups of selected docs land near 0, fresh text near 1e6. */
  private val tNovelty = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      noveltyScore(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
        "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0), "text")
        .orderBy("doc_id")
    },
    Some("""WITH cand AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '')
                  AS t
              FROM documents WHERE doc_id % 3 <> 0),
            refd AS (SELECT
                list_filter(string_split(lower(text), ' '), x -> x <> '')
                  AS t
              FROM documents WHERE doc_id % 3 = 0),
            refg AS (SELECT DISTINCT
                unnest(list_transform(range(GREATEST(len(t) - 2, 0)),
                  i -> t[CAST(i AS INT)+1] || ' ' || t[CAST(i AS INT)+2]
                    || ' ' || t[CAST(i AS INT)+3])) AS g
              FROM refd),
            cg AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(GREATEST(len(t) - 2, 0)),
                  i -> t[CAST(i AS INT)+1] || ' ' || t[CAST(i AS INT)+2]
                    || ' ' || t[CAST(i AS INT)+3])) AS g
              FROM cand),
            counted AS (SELECT cg.doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_grams,
                CAST(COUNT(refg.g) AS BIGINT) AS seen
              FROM cg LEFT JOIN refg ON cg.g = refg.g
              GROUP BY cg.doc_id)
            SELECT c.doc_id,
                COALESCE(n.n_grams, 0) AS n_grams,
                COALESCE(n.n_grams, 0) - COALESCE(n.seen, 0)
                  AS novel_grams,
                CASE WHEN COALESCE(n.n_grams, 0) = 0 THEN 1000000
                     ELSE (COALESCE(n.n_grams, 0) - COALESCE(n.seen, 0))
                          * 1000000 // COALESCE(n.n_grams, 1) END
                  AS novelty_micro
            FROM cand c LEFT JOIN counted n ON c.doc_id = n.doc_id
            ORDER BY c.doc_id"""))

  val queries: Map[String, Q] = Map("q_t_novelty" -> tNovelty)
}
