package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit (Sweeney, IJUFKS 2002; Machanavajjhala
  * et al., ICDE 2006) — the release-gate metrics for quasi-identifier
  * re-identification risk: a table is k-anonymous when every
  * equivalence class over the quasi-identifier columns holds ≥ k rows,
  * and l-diverse when every class carries ≥ l distinct values of the
  * sensitive attribute. A training-data pipeline runs this BEFORE
  * publishing per-user derived tables (session roll-ups, survey
  * segment artifacts): PII redaction (q_t_pii_redact) scrubs direct
  * identifiers, this audits the indirect ones.
  *
  * Pure integers end-to-end: class sizes, the minimum class size
  * (k_min), distinct-sensitive minima (l_min), the count and row mass
  * of classes below the target k, and the at-risk row share in
  * floor-micro — one integral division.
  *
  * Scale shape: ONE map-side groupBy(quasi-identifiers) pass carrying
  * a count plus an exact distinct over the sensitive column (classes
  * are the unit of the audit, so the shuffle key IS the class); the
  * summary is a scalar reduce over CLASS cells. At 100 TB the class
  * table is the data-sized object only when the quasi-set nears a key
  * — which is exactly the k_min = 1 finding the audit exists to
  * surface. */
object Privacy {

  /** One-row audit: (n_rows, n_classes, k_min, l_min,
    * classes_below_k, rows_below_k, below_k_micro) for the given
    * target k. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    classes.agg(
      sum("sz").as("n_rows"),
      count(lit(1)).as("n_classes"),
      min("sz").as("k_min"),
      min("ldiv").as("l_min"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L))
        .as("rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("k_min"), col("l_min"),
        col("classes_below_k"), col("rows_below_k"),
        expr("rows_below_k * 1000000L div n_rows").as("below_k_micro"))
  }

  /** q_p28_kanon: re-identification audit of the customer table under
    * quasi-identifiers (nation, market segment) with account-balance
    * sign as the sensitive attribute, target k = 5. */
  private val pKanon = Q(
    (s, d) => kAnonymityAudit(
      Tables.customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        (col("c_acctbal") > 0).as("positive_bal")),
      Seq("c_nationkey", "c_mktsegment"), "positive_bal", k = 5),
    Some("""WITH classes AS (SELECT c_nationkey, c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(COUNT(DISTINCT c_acctbal > 0) AS BIGINT) AS ldiv
              FROM customer GROUP BY 1, 2)
            SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_classes,
              MIN(sz) AS k_min, MIN(ldiv) AS l_min,
              CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS classes_below_k,
              CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                AS rows_below_k,
              CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1000000
                // SUM(sz) AS BIGINT) AS below_k_micro
            FROM classes"""))

  /** Per-class t-closeness report (Li, Li & Venkatasubramanian, ICDE
    * 2007) — the distributional sibling of k-anonymity/l-diversity: a
    * class can be large (k-anonymous) and diverse (l-diverse) yet
    * still leak, when its SENSITIVE-VALUE DISTRIBUTION diverges from
    * the table's. The report computes, per equivalence class, the
    * total-variation distance between the class's sensitive
    * distribution and the global one, in the house floor-micro
    * convention: tvd_micro = Σ_v |cv·10⁶ div n_c − gv·10⁶ div N|
    * div 2 over the GLOBAL value domain (absent class cells count as
    * zero mass) — every share floored to micro before the difference,
    * so both engines hash identically.
    *
    * Envelope: cv·10⁶ and gv·10⁶ are longs — exact for tables up to
    * 9.2·10¹² rows (graft.tools.NumericEnvelopes pins the bound).
    *
    * Scale shape: ONE groupBy(quasi, sensitive) pass is the data
    * scan; classes and the global marginal derive from those CELLS
    * (never the rows again); the class × value grid is |classes| ×
    * |domain| — domain is config-small, so the grid join broadcasts
    * the marginal and the 1-row total. */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive attribute cannot also be a quasi-identifier")
    val q = quasiCols.map(col)
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("cv"))
    val cls = cells.groupBy(q: _*)
      .agg(sum("cv").as("n_c"), count(lit(1)).as("n_values"))
    val gl = cells.groupBy(col(sensitiveCol)).agg(sum("cv").as("gv"))
    val tot = gl.agg(sum("gv").as("__N"))
    cls.crossJoin(broadcast(gl))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("cv"))
      .crossJoin(broadcast(tot))
      .groupBy(q: _*)
      .agg(min("n_c").as("class_size"),
        min("n_values").as("n_values"),
        sum(abs(expr("cv * 1000000L div n_c")
          - expr("gv * 1000000L div __N"))).as("__s"))
      .select((q :+ col("class_size") :+ col("n_values") :+
        expr("__s div 2").as("tvd_micro")): _*)
  }

  /** q_p35_tcloseness: the t-closeness table for the q_p28 release
    * gate — same quasi-identifiers (nation, market segment), same
    * sensitive attribute (balance sign). */
  private val pTCloseness = Q(
    (s, d) => tClosenessReport(
      Tables.customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        (col("c_acctbal") > 0).as("positive_bal")),
      Seq("c_nationkey", "c_mktsegment"), "positive_bal")
      .orderBy("c_nationkey", "c_mktsegment"),
    Some("""WITH base AS (SELECT c_nationkey, c_mktsegment,
                c_acctbal > 0 AS sv FROM customer),
            cells AS (SELECT c_nationkey, c_mktsegment, sv,
                CAST(COUNT(*) AS BIGINT) AS cv
              FROM base GROUP BY 1, 2, 3),
            cls AS (SELECT c_nationkey, c_mktsegment,
                CAST(SUM(cv) AS BIGINT) AS n_c,
                CAST(COUNT(*) AS BIGINT) AS n_values
              FROM cells GROUP BY 1, 2),
            gl AS (SELECT sv, CAST(SUM(cv) AS BIGINT) AS gv
              FROM cells GROUP BY 1),
            tot AS (SELECT CAST(SUM(gv) AS BIGINT) AS N FROM gl),
            grid AS (SELECT c.c_nationkey, c.c_mktsegment, c.n_c,
                c.n_values, g.sv, g.gv, COALESCE(x.cv, 0) AS cv
              FROM cls c CROSS JOIN gl g
              LEFT JOIN cells x ON x.c_nationkey = c.c_nationkey
                AND x.c_mktsegment = c.c_mktsegment AND x.sv = g.sv)
            SELECT c_nationkey, c_mktsegment,
              MIN(n_c) AS class_size, MIN(n_values) AS n_values,
              CAST(SUM(ABS(cv * 1000000 // n_c - gv * 1000000 // N))
                // 2 AS BIGINT) AS tvd_micro
            FROM grid CROSS JOIN tot
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Generalization ladder — the ACTING half of the k-anonymity audit
    * (the q_d_exact_spans → q_d_span_scrub pattern): given an ordered
    * ladder of quasi-identifier sets from finest to coarsest (each
    * rung generalizes by DROPPING columns — full-domain
    * generalization, Sweeney 2002 §4 / Samarati 2001), evaluate every
    * rung's anonymity profile and mark the FIRST rung whose minimum
    * class size meets the target k — the release candidate. The empty
    * rung (one class = the whole table) guarantees a chosen rung
    * exists for any k ≤ N.
    *
    * One row per rung: (rung, quasi, n_classes, k_min, l_min,
    * rows_below_k, meets_k, chosen).
    *
    * Scale shape: a NESTED ladder (every rung a prefix of the one
    * before — the registered shape, and what a generalization
    * hierarchy usually is) costs exactly ONE corpus pass: a ROLLUP
    * over the finest rung computes every prefix level's class cells
    * in one Expand+aggregate, rung summaries pick their level by
    * grouping_id (so data NULLs in quasi columns never conflate with
    * the rollup's collapse marker), and the rung labels attach by
    * broadcast (audit-pinned: one scan in the q_p38 plan). A
    * non-nested ladder falls back to one groupBy per rung. The chosen
    * flag is a 1-row broadcast min attach either way. */
  def kAnonGeneralize(df: DataFrame, ladder: Seq[Seq[String]],
      sensitiveCol: String, k: Int): DataFrame = {
    require(ladder.nonEmpty, "ladder must have at least one rung")
    require(ladder.last.isEmpty,
      "last rung must be the empty quasi set (release always possible)")
    val nested = ladder.sliding(2).forall {
      case Seq(a, b) => b.length < a.length && a.startsWith(b)
      case _ => true
    }
    val all = if (nested) rollupRungs(df, ladder, sensitiveCol, k)
      else unionRungs(df, ladder, sensitiveCol, k)
    // the rung table is LADDER-sized: materialize it once and attach
    // the chosen flag driver-side — a lazy min-attach would re-derive
    // the whole corpus pass a second time (audit-pinned: the rollup
    // path's library frame costs exactly one scan). No meeting rung
    // (k > N) leaves chosen NULL on every row, as before.
    val spark = df.sparkSession
    val rows = all.collect()
    val chosen = rows.filter(_.getAs[Boolean]("meets_k"))
      .map(_.getAs[Long]("rung")).minOption
    val out = rows.toSeq.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+
        chosen.map(c => java.lang.Boolean.valueOf(r.getAs[Long]("rung") == c))
          .orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      all.schema.add("chosen", org.apache.spark.sql.types.BooleanType))
  }

  /** One ROLLUP pass for a nested ladder: rung i's class cells are the
    * rollup rows whose grouping_id collapses exactly the columns rung
    * i drops (2^(dropped) − 1); skipped prefix levels are computed by
    * the rollup but filtered out — still one scan. */
  private[graft] def rollupRungs(df: DataFrame, ladder: Seq[Seq[String]],
      sensitiveCol: String, k: Int): DataFrame = {
    val full = ladder.head
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df.rollup(full.map(col): _*)
      .agg(grouping_id().as("__gid"),
        count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    val gids = ladder.map(q => (1L << (full.length - q.length)) - 1)
    val meta = ladder.zipWithIndex.map { case (q, i) =>
      (gids(i), i.toLong, q.mkString(","))
    }.toDF("__gid", "rung", "quasi")
    cells.filter(col("__gid").isin(gids: _*))
      .groupBy("__gid")
      .agg(count(lit(1)).as("n_classes"),
        min("sz").as("k_min"),
        min("ldiv").as("l_min"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("rows_below_k"))
      .join(broadcast(meta), Seq("__gid"))
      .select(col("rung"), col("quasi"), col("n_classes"), col("k_min"),
        col("l_min"), col("rows_below_k"),
        (col("k_min") >= k).as("meets_k"))
  }

  /** The general path: one groupBy per rung, unioned. */
  private[graft] def unionRungs(df: DataFrame, ladder: Seq[Seq[String]],
      sensitiveCol: String, k: Int): DataFrame =
    ladder.zipWithIndex.map { case (quasi, i) =>
      val keyed =
        if (quasi.isEmpty) df.withColumn("__k", lit("*")).groupBy("__k")
        else df.groupBy(quasi.map(col): _*)
      keyed.agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
        .agg(count(lit(1)).as("n_classes"),
          min("sz").as("k_min"),
          min("ldiv").as("l_min"),
          sum(when(col("sz") < k, col("sz")).otherwise(0L))
            .as("rows_below_k"))
        .select(lit(i.toLong).as("rung"),
          lit(quasi.mkString(",")).as("quasi"),
          col("n_classes"), col("k_min"), col("l_min"),
          col("rows_below_k"),
          (col("k_min") >= k).as("meets_k"))
    }.reduce(_ unionByName _)

  /** q_p38_kanon_generalize: the release ladder for the q_p28 gate —
    * (nation, segment) → (nation) → (*) at target k = 40. */
  private val pGeneralize = Q(
    (s, d) => kAnonGeneralize(
      Tables.customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        (col("c_acctbal") > 0).as("positive_bal")),
      Seq(Seq("c_nationkey", "c_mktsegment"), Seq("c_nationkey"),
        Seq.empty),
      "positive_bal", k = 40)
      .orderBy("rung"),
    Some("""WITH base AS (SELECT c_nationkey, c_mktsegment,
                c_acctbal > 0 AS sv FROM customer),
            r0c AS (SELECT CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(COUNT(DISTINCT sv) AS BIGINT) AS ldiv
              FROM base GROUP BY c_nationkey, c_mktsegment),
            r1c AS (SELECT CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(COUNT(DISTINCT sv) AS BIGINT) AS ldiv
              FROM base GROUP BY c_nationkey),
            r2c AS (SELECT CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(COUNT(DISTINCT sv) AS BIGINT) AS ldiv
              FROM base),
            rungs AS (
              SELECT CAST(0 AS BIGINT) AS rung,
                'c_nationkey,c_mktsegment' AS quasi,
                CAST(COUNT(*) AS BIGINT) AS n_classes,
                MIN(sz) AS k_min, MIN(ldiv) AS l_min,
                CAST(SUM(CASE WHEN sz < 40 THEN sz ELSE 0 END)
                  AS BIGINT) AS rows_below_k,
                MIN(sz) >= 40 AS meets_k
              FROM r0c
              UNION ALL
              SELECT CAST(1 AS BIGINT), 'c_nationkey',
                CAST(COUNT(*) AS BIGINT),
                MIN(sz), MIN(ldiv),
                CAST(SUM(CASE WHEN sz < 40 THEN sz ELSE 0 END)
                  AS BIGINT),
                MIN(sz) >= 40
              FROM r1c
              UNION ALL
              SELECT CAST(2 AS BIGINT), '',
                CAST(COUNT(*) AS BIGINT),
                MIN(sz), MIN(ldiv),
                CAST(SUM(CASE WHEN sz < 40 THEN sz ELSE 0 END)
                  AS BIGINT),
                MIN(sz) >= 40
              FROM r2c),
            ch AS (SELECT MIN(rung) AS c FROM rungs WHERE meets_k)
            SELECT rung, quasi, n_classes, k_min, l_min, rows_below_k,
              meets_k, rung = ch.c AS chosen
            FROM rungs CROSS JOIN ch
            ORDER BY rung"""))

  val queries: Map[String, Q] = Map(
    "q_p28_kanon" -> pKanon,
    "q_p35_tcloseness" -> pTCloseness,
    "q_p38_kanon_generalize" -> pGeneralize)
}
