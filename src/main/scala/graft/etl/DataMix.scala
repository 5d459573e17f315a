package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** DuckDB replica of [[uniformHash]] over SQL expression `c` — for
    * composing new oracle queries (the existing oracle literals above
    * spell the same expression inline). */
  def uniformSqlExpr(c: String): String = {
    val m = s"md5(CAST($c AS VARCHAR))"
    (1 to 8).map { i =>
      val mult = java.math.BigInteger.valueOf(16L).pow(8 - i)
      s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1) * $mult.0"
    }.mkString("(  ", "\n               + ", "\n              ) / 4294967296.0")
  }

  /** Integer sibling of [[uniformHash]]: the same first 32 md5 bits as
    * a non-negative BIGINT in [0, 2³²) — the shared PRNG for operators
    * that need exact modular draws (span starts, FIM cut points)
    * rather than a double threshold. Pure map-side, reproducible under
    * any partitioning. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** DuckDB replica of [[hash32]] over SQL expression `c` — every hex
    * digit cast to BIGINT before the scale multiply so no INTEGER
    * overflow can enter the sum (max term 15·16⁷ < 2³²). */
  def hash32SqlExpr(c: String): String = {
    val m = s"md5(CAST($c AS VARCHAR))"
    (1 to 8).map { i =>
      val mult = java.math.BigInteger.valueOf(16L).pow(8 - i)
      s"CAST(strpos('0123456789abcdef', substr($m, $i, 1)) - 1 AS BIGINT) * $mult"
    }.mkString("(  ", "\n               + ", "\n              )")
  }

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

  /** Quality-WEIGHTED sampling — importance sampling for corpus mixing
    * (the FineWeb/DCLM-style move from per-source rates to per-document
    * quality): keep a document iff u(id) < min(1, baseRate · weight), with
    * `weightCol` any deterministic per-doc score in [0, 1] (a quality
    * ratio, a classifier probability). Same scale contract as
    * [[mixSample]]: pure map-side filter, no shuffle, reproducible under
    * any partitioning; high-quality docs are kept at up to baseRate× the
    * rate of zero-scored ones. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      baseRate: Double): DataFrame =
    df.withColumn("__u", uniformHash(col(idCol)))
      .filter(col("__u") < least(lit(1.0), lit(baseRate) * col(weightCol)))
      .drop("__u")

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

  /** Weighted sampling keyed on the (already-oracled, 6dp-rounded)
    * stopword-ratio quality feature at baseRate 1.5 — the oracle rebuilds
    * the identical u and the identical rounded ratio, so the per-row keep
    * decision compares bit-identical doubles in both engines. */
  private val pWeighted = Q(
    (s, d) => {
      val q = graft.text.TextOps.qualityFeatures(
          Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("stopword_ratio"))
      weightedSample(q, "doc_id", "stopword_ratio", baseRate = 1.5)
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents),
            sw AS (SELECT doc_id,
              ROUND(CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','of','and','to','in','is'], lower(x)))) AS DOUBLE)
                / GREATEST(len(toks), 1), 6) AS stopword_ratio
              FROM t),
            u AS (SELECT doc_id, stopword_ratio,
              (  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16.0
               + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)
              ) / 4294967296.0 AS uu
            FROM sw)
            SELECT doc_id, stopword_ratio FROM u
            WHERE uu < LEAST(1.0, 1.5 * stopword_ratio)
            ORDER BY doc_id"""))

  /** Token-budget corpus mixing — the step a pretraining pipeline actually
    * runs: targets are TOKEN shares per source, not row rates. Given
    * target shares p_s (sources absent from the map get 0 and are
    * dropped), the achievable corpus size without upsampling is
    * T* = min_s(a_s / p_s) over the available token counts a_s; each
    * source is then down-sampled at rate_s = min(1, p_s · T* / a_s) via
    * the same u(id) decision as [[mixSample]], so the KEPT token mass
    * lands on the target proportions in expectation.
    *
    * Scale: one hash aggregation for the per-source token counts (k rows,
    * k = #sources), a broadcast join of the k-row rate table back onto
    * the corpus, and the map-side hash filter. No driver-side numbers:
    * T* and the rates stay in-plan, so the decision arithmetic is the
    * same IEEE doubles the oracle recomputes. */
  def tokenBudgetMix(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetShares: Map[String, Double]): DataFrame =
    tokenBudgetMixByCount(docs.select(col(idCol), col(sourceCol),
      coalesce(graft.text.TextOps.bpeTokenCount(col(textCol)), lit(0L))
        .as("n_tokens")), idCol, sourceCol, targetShares)

  /** [[tokenBudgetMix]] over a PRECOMPUTED `(idCol, sourceCol, n_tokens)`
    * frame — the composition surface for real tokenizer counts
    * ([[graft.text.BpeMerge.encodeCorpus]]). */
  def tokenBudgetMixByCount(counted: DataFrame, idCol: String,
      sourceCol: String, targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.values.forall(_ > 0), "shares must be positive")
    val share = targetShares.foldLeft(lit(0.0)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    val avail = counted.groupBy(sourceCol)
      .agg(sum("n_tokens").as("a_s"))
      .withColumn("p_s", share)
      // a_s > 0: a share-listed source with no tokens would otherwise set
      // T* = 0 and silently empty the WHOLE mix (and 0·T*/0 is NaN);
      // an absent source can't contribute, so it must not cap the others
      .filter(col("p_s") > 0 && col("a_s") > 0)
    val tStar = avail.agg(min(col("a_s") / col("p_s")).as("t_star"))
    val rates = avail.crossJoin(broadcast(tStar))
      .select(col(sourceCol),
        least(lit(1.0), col("p_s") * col("t_star") / col("a_s")).as("rate"))
    counted.join(broadcast(rates), Seq(sourceCol))
      .filter(uniformHash(col(idCol)) < col("rate"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }

  /** Mix src0/src1/src2 at 50/30/20 token shares (other sources dropped).
    * The oracle recomputes a_s, T*, the rates, and the md5-uniform keep
    * decision — identical double arithmetic on exact BIGINT token sums. */
  private val pTokenMix = Q(
    (s, d) => tokenBudgetMix(Tables.documents(s, d), "doc_id", "text",
      "source", Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, source,
              CAST(len(regexp_extract_all(text,
                ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT)
                AS n_tokens
              FROM documents),
            avail AS (SELECT source, SUM(n_tokens) AS a_s,
                -- CAST: a bare 0.5 literal is DECIMAL in DuckDB, and
                -- decimal division would not match Spark's double path
                CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                            WHEN 'src2' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS p_s
              FROM t GROUP BY source),
            pos AS (SELECT source, CAST(a_s AS BIGINT) AS a_s, p_s
                    FROM avail WHERE p_s > 0 AND a_s > 0),
            ts AS (SELECT MIN(CAST(a_s AS DOUBLE) / p_s) AS t_star FROM pos),
            rates AS (SELECT source,
                LEAST(1.0, p_s * t_star / CAST(a_s AS DOUBLE)) AS rate
              FROM pos CROSS JOIN ts)
            SELECT t.doc_id AS doc_id, t.source AS source, t.n_tokens
            FROM t JOIN rates r ON t.source = r.source
            WHERE """ + uniformSqlExpr("t.doc_id") + """ < r.rate
            ORDER BY t.doc_id"""))

  /** Seeded deterministic corpus shuffle — the training-order permutation.
    * A training run must visit documents in a random-looking order that is
    * (a) reproducible across reruns and engines, (b) re-derivable for any
    * single doc without materializing the permutation (resume-from-step),
    * and (c) computable without a global sort by an RNG sequence. Sort key
    * = md5(seed ‖ ':' ‖ id) — a pseudorandom total order any engine
    * replays; the position is the distributed global index over that key
    * (two-pass range scheme, no single-partition exchange).
    *
    * Changing the seed re-permutes; epoch e conventionally uses seed ‖ e.
    * Returns (frame, release) — release drops the index's range cache. */
  def seededShuffleReleasable(df: DataFrame, idCol: String, seed: String)
      : (DataFrame, () => Unit) = {
    val keyed = df.withColumn("__shufkey",
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
        .cast("binary")))
    val (indexed, release) = GlobalIndex.withGlobalIndexReleasable(
      keyed, Seq(col("__shufkey"), col(idCol)), "pos")
    (indexed.drop("__shufkey"), release)
  }

  def seededShuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    seededShuffleReleasable(df, idCol, seed)._1

  /** Documents permuted under seed "epoch0". */
  private val pShuffle = Q(
    (s, d) => {
      val (out, release) = seededShuffleReleasable(
        Tables.documents(s, d).select("doc_id"), "doc_id", "epoch0")
      val mat = out.orderBy("doc_id").localCheckpoint(eager = true)
      release()
      mat
    },
    Some("""SELECT doc_id,
              row_number() OVER (ORDER BY
                md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
            FROM documents ORDER BY doc_id"""))

  /** Temperature-scaled source mixing (the mT5/UniMax multilingual
    * rebalancing step — Xue et al. 2021 §3.1, Chung et al. 2023): flatten
    * the source-size distribution so the kept counts are ∝ n_s^α,
    * α ∈ (0, 1], by down-sampling each source at
    *
    *   rate_s = (n_min / n_s)^(1−α)
    *
    * The smallest source is kept whole; a source 100× larger is kept at
    * 100^(α−1) of its rows (α = 0.5 → 10× down-weight), which is exactly
    * sampling with temperature T = 1/α. Decision = the same pure map-side
    * u(id) < rate_s test as [[mixSample]].
    *
    * Scale: one k-row count aggregation (k = #sources, with map-side
    * partial counts), a broadcast of the k-row rate table, and a scan-stage
    * filter — the corpus itself never shuffles.
    *
    * Cross-engine float contract: α = 0.5 computes rate via sqrt (correctly
    * rounded in IEEE 754, so DuckDB reproduces it bit-identically); other α
    * go through pow, whose last-ulp rounding is not guaranteed identical
    * across libm implementations — fine for production use, but oracle
    * queries pin α = 0.5. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("n_s"))
    val nmin = counts.agg(min("n_s").as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_s").cast("double")
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(sourceCol), col("n_s"),
        (if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha))
          .as("rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(uniformHash(col(idCol)) < col("rate"))
      .select(col(idCol), col(sourceCol), col("n_s"), col("rate"))
  }

  /** α = 0.5 (temperature 2) over the documents corpus grouped by LANGUAGE
    * — the canonical mT5 use, and the skewed grouping in this corpus (en
    * is ~3× the smallest language; the 20 sources are deliberately
    * balanced, which would make every rate 1). The oracle replays counts,
    * sqrt rates, and the md5-uniform keep decision with the identical
    * IEEE doubles. */
  private val pTemperature = Q(
    (s, d) => temperatureMix(Tables.documents(s, d), "doc_id", "lang",
      alpha = 0.5).orderBy("doc_id"),
    Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_s
                       FROM documents GROUP BY lang),
            m AS (SELECT MIN(n_s) AS n_min FROM c),
            r AS (SELECT lang, n_s,
                    sqrt(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
                  FROM c CROSS JOIN m)
            SELECT d.doc_id, d.lang, r.n_s, r.rate
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE """ + uniformSqlExpr("d.doc_id") + """ < r.rate
            ORDER BY d.doc_id"""))

  /** Seeded reservoir sampling: EXACTLY k documents per group (vs the
    * rate-based operators above, which hit a target only in expectation —
    * eval sets and per-domain probes need exact counts). The sample is the
    * k smallest values of md5(seed ‖ ':' ‖ id) within each group: a
    * uniform draw without replacement that any engine replays, independent
    * of partitioning (groups smaller than k come back whole).
    *
    * Scale: a giant group must NOT funnel through one window task, so the
    * selection is a two-level tournament — level 1 takes the top-k per
    * (group, input-partition), bounding every task's output at k rows per
    * group it sees and hashing the shuffle on (group, partition-id) so no
    * single reducer receives a whole hot group; level 2 ranks the
    * ≤ k·P survivors per group. The result is exactly the global top-k
    * (any row outside its partition's top-k is outside the group's top-k),
    * which is what the oracle's single window computes. */
  def reservoirSample(df: DataFrame, idCol: String, groupCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__u",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
          .cast("binary")))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(groupCol, "__pid")
      .orderBy(col("__u"), col(idCol))
    val global = Window.partitionBy(groupCol).orderBy(col("__u"), col(idCol))
    keyed
      .withColumn("__r1", row_number().over(local)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col(groupCol), col("rank"))
  }

  /** Exactly 7 docs per source under seed "rsv0"; the oracle replays the
    * same md5 order with one window (hex strings compare identically —
    * ASCII in both engines). */
  private val pReservoir = Q(
    (s, d) => reservoirSample(Tables.documents(s, d), "doc_id", "source",
      k = 7, seed = "rsv0").orderBy("doc_id"),
    Some("""WITH r AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source
                ORDER BY md5('rsv0:' || CAST(doc_id AS VARCHAR)), doc_id)
                AS rank
            FROM documents)
            SELECT doc_id, source, rank FROM r WHERE rank <= 7
            ORDER BY doc_id"""))

  /** Weighted sampling WITHOUT replacement, exactly k rows — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006): each row draws
    * u ∈ (0,1) and keeps key u^(1/w); the k largest keys are a weighted
    * sample without replacement. We order by the equivalent
    * −ln(u)/w ASCENDING (monotone transform — avoids the pow whose
    * rounding differs across libms) and, per the engine's integer
    * discipline, FLOOR the key to integer NANOUNITS before ranking so the
    * order is reproducible cross-engine (ties broken by id; floor, not
    * round — the half-way semantics hazard, see [[graft.text.Dsir]]). u is the md5
    * uniform shifted to the open interval ((h+0.5)/2³² — u = 0 would put
    * −ln(u) at +∞ regardless of weight).
    *
    * Scale: same two-level tournament as [[reservoirSample]] — keys are
    * map-side scalars, no full-group window ever sees a hot group whole. */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(concat(lit(seed), lit(":"),
        col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") + lit(0.5)) / lit(4294967296.0)
    val keyed = df
      .filter(col(weightCol) > 0)
      .withColumn("key_nano",
        floor(-log(u) / col(weightCol).cast("double") * 1e9).cast("long"))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy("__pid")
      .orderBy(col("key_nano"), col(idCol))
    val global = Window.orderBy(col("key_nano"), col(idCol))
    keyed
      .withColumn("__r1", row_number().over(local)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col(weightCol), col("key_nano"), col("rank"))
  }

  /** 25 documents sampled ∝ n_chars under seed "wrsv0". The oracle replays
    * u, the nano-floored A-ES key, and one global window. */
  private val pWeightedReservoir = Q(
    (s, d) => weightedReservoir(Tables.documents(s, d)
      .select("doc_id", "n_chars"), "doc_id", "n_chars", k = 25,
      seed = "wrsv0").orderBy("doc_id"),
    Some("""WITH key AS (SELECT doc_id, n_chars,
              CAST(floor(-ln((
              """ + uniformSqlExpr("'wrsv0:' || CAST(doc_id AS VARCHAR)") +
      """ * 4294967296.0 + 0.5) / 4294967296.0)
                / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
              FROM documents WHERE n_chars > 0),
            rk AS (SELECT doc_id, n_chars, key_nano,
              row_number() OVER (ORDER BY key_nano, doc_id) AS rank
              FROM key)
            SELECT doc_id, n_chars, key_nano, rank FROM rk WHERE rank <= 25
            ORDER BY doc_id"""))

  /** Deterministic stratified train/val/test split with EXACT per-stratum
    * counts: within each stratum rows rank by md5(seed:id) (a reproducible
    * uniform order), and the cumulative-fraction boundaries floor to
    * integers — so every stratum lands its floor(n·Σf) rows per split
    * exactly, unlike Bernoulli `sample()` whose per-split sizes drift.
    * Complements [[graft.dedup.DupClusters.leakSafeSplit]] (which splits by
    * near-dup CLUSTER to stop leakage; this one guarantees per-class
    * proportions when strata are labels).
    *
    * Scale shape: ONE per-stratum window (keyed shuffle on the stratum) +
    * a broadcast of the per-stratum counts; the split decision is a scalar
    * cascade on (rank, n). Identical FP products both engines (floor of
    * double·fraction), so boundaries hash-match. */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Seq[(String, Double)], seed: String): DataFrame = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val w = Window.partitionBy(stratumCol).orderBy(col("__k"), col(idCol))
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    val ranked = df
      .withColumn("__k",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(stratumCol))
    val cascade = fractions.init.zip(cum.init).reverse
      .foldLeft(lit(fractions.last._1)) { case (els, ((name, _), c)) =>
        when(col("__r") <= floor(col("__n") * c), name).otherwise(els)
      }
    ranked.withColumn("split", cascade).drop("__k", "__r", "__n")
  }

  private val pStratified = Q(
    (s, d) => stratifiedSplit(Tables.documents(s, d), "doc_id", "lang",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "42")
      .select("doc_id", "lang", "split").orderBy("doc_id"),
    Some("""WITH k AS (SELECT doc_id, lang,
                md5('42:' || CAST(doc_id AS VARCHAR)) AS kk FROM documents),
            r AS (SELECT doc_id, lang, row_number() OVER
                    (PARTITION BY lang ORDER BY kk, doc_id) AS r FROM k),
            n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)
            SELECT r.doc_id, r.lang,
              CASE WHEN r.r <= FLOOR(n.n * 0.8) THEN 'train'
                   WHEN r.r <= FLOOR(n.n * 0.9) THEN 'val'
                   ELSE 'test' END AS split
            FROM r JOIN n ON r.lang = n.lang
            ORDER BY r.doc_id"""))

  /** DoReMi-flavored EXPONENTIAL-TILT domain reweighting (single-round
    * multiplicative-weights update — Xie et al. 2023's Group-DRO step
    * with a STATIC proxy loss; the full algorithm re-trains the proxy
    * under the new mixture, which is out of scope for a data engine, so
    * the documented divergence is one tilt round instead of T): domains
    * whose mean proxy loss EXCEEDS the corpus baseline get upweighted
    * `∝ exp(η·excess)`, so the mixture shifts toward under-learned
    * domains; at-or-below-baseline domains stay at the uniform tilt 1.
    *
    * `scored`: one row per item with an integer loss numerator
    * (`lossCol`, e.g. micro-nats) and its unit count (`nCol`, e.g.
    * bigrams). Per-domain mean loss and the corpus baseline are
    * integer floor-divisions of exact sums; the one float step,
    * `exp(excess_micro·η_micro/1e12)`, runs on an identical literal
    * tree both engines (the ln precedent) and FLOORS to micro; the
    * final normalization `tilt·1e6 div Σtilt` is integer. Domains with
    * zero scorable units carry no loss evidence → excess 0, tilt
    * neutral. Output: (groupCol, n_docs, n_units, loss_micro,
    * excess_micro, tilt_micro, weight_micro).
    *
    * Scale: ONE map-side-combined groupBy(domain) over the scored
    * frame; everything after runs on |domains| rows with the baseline
    * and Σtilt attached as broadcast 1-row frames. */
  def exponentialTiltWeights(scored: DataFrame, groupCol: String,
      nCol: String, lossCol: String, etaMicro: Long): DataFrame = {
    require(etaMicro > 0, "etaMicro must be positive")
    val dom = scored.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      sum(coalesce(col(nCol), lit(0L))).as("n_units"),
      sum(coalesce(col(lossCol), lit(0L))).as("loss_sum"))
    val base = dom.agg(sum("loss_sum").as("ls"), sum("n_units").as("nu"))
      .select(expr("ls div nu").as("base_micro"))
    val tilted = dom.crossJoin(broadcast(base))
      .withColumn("loss_micro", expr(
        "case when n_units > 0 then loss_sum div n_units else null end"))
      .withColumn("excess_micro",
        greatest(lit(0L), coalesce(col("loss_micro") - col("base_micro"),
          lit(0L))))
      .withColumn("tilt_micro",
        floor(exp(col("excess_micro").cast("double")
          * lit(etaMicro.toDouble) / lit(1e12)) * lit(1000000.0))
          .cast("long"))
    val tot = tilted.agg(sum("tilt_micro").as("tilt_total"))
    tilted.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("n_units"),
        col("loss_micro"), col("excess_micro"), col("tilt_micro"),
        expr("tilt_micro * 1000000L div tilt_total").as("weight_micro"))
  }

  /** q_p26_doremi_tilt: the documents corpus self-scored by the bigram
    * LM ([[graft.text.NgramLm.negLogMicro]]), tilted per SOURCE at
    * η = 2 — sources whose text the corpus-wide LM finds surprising
    * (above-baseline micro-nats per bigram) gain mixture weight. The
    * oracle rebuilds the LM scores AND the whole tilt chain, so the
    * hash certifies loss aggregation, baseline, exp tilt, and
    * normalization end to end. */
  private val pDoremi = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = graft.text.NgramLm
        .negLogMicro(docs, "doc_id", "text", docs, "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      exponentialTiltWeights(scored, "source", "n_bigrams", "nlp_micro",
        etaMicro = 2000000L).orderBy("source")
    },
    Some(graft.text.NgramLm.negLogCtes + """,
            src AS (SELECT c.doc_id, c.n_bigrams, c.nlp_micro, d.source
                    FROM core c JOIN documents d ON c.doc_id = d.doc_id),
            dom AS (SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(COALESCE(n_bigrams, 0)) AS BIGINT) AS n_units,
                CAST(SUM(COALESCE(nlp_micro, 0)) AS BIGINT) AS loss_sum
              FROM src GROUP BY source),
            b AS (SELECT CAST(SUM(loss_sum) AS BIGINT)
                    // CAST(SUM(n_units) AS BIGINT) AS base_micro
                  FROM dom),
            t AS (SELECT dom.*, b.base_micro,
                CASE WHEN n_units > 0 THEN loss_sum // n_units
                     ELSE NULL END AS loss_micro
              FROM dom CROSS JOIN b),
            t2 AS (SELECT *,
                GREATEST(0, COALESCE(loss_micro - base_micro, 0))
                  AS excess_micro
              FROM t),
            t3 AS (SELECT *,
                CAST(FLOOR(exp(CAST(excess_micro AS DOUBLE) * 2000000.0
                  / 1e12) * 1000000.0) AS BIGINT) AS tilt_micro
              FROM t2),
            tt AS (SELECT CAST(SUM(tilt_micro) AS BIGINT) AS tilt_total
                   FROM t3)
            SELECT source, n_docs, n_units, loss_micro, excess_micro,
                tilt_micro,
                tilt_micro * 1000000 // tilt_total AS weight_micro
            FROM t3 CROSS JOIN tt
            ORDER BY source"""))

  val queries: Map[String, Q] = Map(
    "q_p26_doremi_tilt" -> pDoremi,
    "q_p22_stratified_split" -> pStratified,
    "q_p16_token_budget_mix" -> pTokenMix,
    "q_p14_mix_sample" -> pMix,
    "q_p15_weighted_sample" -> pWeighted,
    "q_p18_shuffle" -> pShuffle,
    "q_p19_temperature_mix" -> pTemperature,
    "q_p20_reservoir" -> pReservoir,
    "q_p21_weighted_reservoir" -> pWeightedReservoir)
}
