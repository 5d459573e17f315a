package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns —
  * the dimensionality reducer in front of clustering / dedup /
  * coreset passes at corpus scale (Achlioptas JCSS'03: ±1 sign
  * matrices satisfy the JL lemma with the same O(ε⁻² log n) target
  * dimension as Gaussian ones, and are integer-exact). A 64-d →
  * 16-d projection cuts every downstream distance computation 4×
  * while distorting pairwise distances by a bounded factor — the
  * standard first move before an expensive all-pairs-ish stage.
  *
  * Exactness: components quantize by the PQ convention
  * floor(x·scale + 0.5) (identical literal tree both engines), the
  * sign matrix derives from sha256("jlp:o:i") — the [[SimilarityOps]]
  * hyperplane trick, so the oracle rebuilds the EXACT matrix with
  * DuckDB's sha256 — and each output component is a pure ±1-weighted
  * integer sum. No floats reach the hashed path.
  *
  * Scale shape: map-only — the projection is the codegen'd
  * [[graft.functions.JlProjection]] expression (ONE fused loop per
  * row over a flattened sign constant; the composed
  * transform/aggregate form measured 4.9 s warm over 500 rows —
  * CodegenFallback folds — vs sub-100 ms native), no shuffle, no
  * data-sized state. */
object JlProject {

  /** +1/−1 from the top bit of sha256("jlp:o:i"). */
  private[sim] def jlSign(o: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hx = md.digest(s"jlp:$o:$i".getBytes("UTF-8"))
    if ((hx(0) & 0x80) == 0) 1 else -1
  }

  /** Project `vecCol` (length `dim`) to `outDim` integer components:
    * proj[o] = Σᵢ sign(o,i) · floor(v[i]·scale + 0.5). Output:
    * (idCol, proj: array<long>). */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, scale: Int = 64): DataFrame = {
    require(outDim >= 1 && dim >= 1)
    val signs = (0 until outDim).flatMap(o =>
      (0 until dim).map(i => jlSign(o, i)))
    df.select(col(idCol),
      graft.functions.JlProjection.project(col(vecCol), signs, outDim,
        dim, scale).as("proj"))
  }

  /** q_s_jl_project: the embeddings table 64-d → 16-d, every integer
    * component hash-checked — the oracle re-derives the sha256 sign
    * matrix, re-quantizes, and re-sums. */
  private val sJl = Q(
    (s, d) => graft.Q.serializeArrays(
      jlProject(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, outDim = 16).orderBy("vec_id")),
    Some("""WITH v AS (SELECT vec_id,
              CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            xi AS (SELECT vec_id, list_transform(e,
              x -> CAST(floor(x * 64 + 0.5) AS BIGINT)) AS q FROM v),
            signs AS (SELECT o, i,
              CASE WHEN strpos('0123456789abcdef',
                  substr(sha256('jlp:' || o || ':' || i), 1, 1)) - 1 < 8
                THEN 1 ELSE -1 END AS s
              FROM (SELECT unnest(range(0, 16)) AS o) oo
              CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii),
            xv AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
                q[CAST(i AS INT) + 1] AS x
              FROM xi, LATERAL (SELECT unnest(range(0, 64)) AS i) ri),
            pr AS (SELECT xv.vec_id, signs.o, SUM(signs.s * xv.x) AS p
              FROM xv JOIN signs ON signs.i = xv.i
              GROUP BY 1, 2)
            SELECT vec_id,
              CAST(to_json(list(CAST(p AS BIGINT) ORDER BY o))
                AS VARCHAR) AS proj
            FROM pr GROUP BY vec_id ORDER BY vec_id"""))

  val queries: Map[String, Q] = Map("q_s_jl_project" -> sJl)
}
