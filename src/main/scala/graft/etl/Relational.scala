package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2-§2.7) expressed as
  * declarative DataFrame plans with DuckDB oracle SQL.
  *
  * Scale notes apply throughout: every query keeps filters/projections
  * declarative so Catalyst pushes them into the parquet scan; small
  * dimension tables (supplier, mapping literals) are explicitly
  * `broadcast()` so the big fact side never shuffles for the join; all
  * aggregations are partial-aggregated map-side by Catalyst. Queries that
  * are inherently single-partition (global sort + limit, positional
  * row_number) are flagged in their scaladoc — at 100 TB those would be
  * replaced by the documented scalable variant.
  */
object Relational {

  // -- P: projection / filter / row ops ---------------------------------

  /** P1: projection by explicit name list — column pruning reaches the scan. */
  private val p1 = Q(
    (s, d) => Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey"),
    Some("SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey"))

  /** P2: projection by name predicate (reference drops `_time` columns the
    * same way — utils.py:61-63); resolved on the driver, pruned at the scan. */
  private val p2 = Q(
    (s, d) => {
      val df = Tables.lineitem(s, d)
      val keep = df.columns.filterNot(_.contains("date"))
      df.select(keep.map(col).toIndexedSeq: _*).orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** P3: drop columns. */
  private val p3 = Q(
    (s, d) => Tables.orders(s, d).drop("o_orderpriority", "o_orderdate")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders ORDER BY o_orderkey"""))

  /** P4: row filter — predicate pushed to the parquet scan (PushedFilters). */
  private val p4 = Q(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity > 45 AND l_returnflag = 'R'
            ORDER BY l_orderkey, l_linenumber"""))

  /** P5: membership filter (isin). */
  private val p5 = Q(
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_orderpriority").orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderpriority FROM orders
            WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey"""))

  /** P6: row dedup (dropDuplicates → shuffle on the dedup key only). */
  private val p6 = Q(
    (s, d) => Tables.customer(s, d)
      .select("c_nationkey", "c_mktsegment").dropDuplicates()
      .orderBy("c_nationkey", "c_mktsegment"),
    Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
            ORDER BY c_nationkey, c_mktsegment"""))

  /** P8: typed sentinel NA fill (reference: numeric→-999 — utils.py:56-57).
    * A nullable column is derived first since the synthetic data has no NULLs. */
  private val p8 = Q(
    (s, d) => Tables.events(s, d)
      .withColumn("value_filled",
        when(col("value") < 0.5, lit(null)).otherwise(round(col("value"), 3)))
      .na.fill(Map("value_filled" -> -999.0))
      .select("event_id", "value_filled").orderBy("event_id"),
    Some("""SELECT event_id,
            COALESCE(CASE WHEN value < 0.5 THEN NULL ELSE ROUND(value,3) END, -999.0)
              AS value_filled
            FROM events ORDER BY event_id"""))

  /** P9: value recode via when-chains (reference: code→label maps, main.py:33-41). */
  private val p9 = Q(
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", "returned")
          .when(col("l_returnflag") === "A", "accepted")
          .otherwise("none").as("flag_label"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'A' THEN 'accepted'
                 ELSE 'none' END AS flag_label
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** P10: bulk rename (reference lowercases headers / adds `_tgt` tags). */
  private val p10 = Q(
    (s, d) => Tables.part(s, d)
      .select("p_partkey", "p_name", "p_brand")
      .toDF("part_id", "part_name", "brand").orderBy("part_id"),
    Some("""SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand
            FROM part ORDER BY part_id"""))

  /** P11: type-coercion sweep (reference: pd.to_numeric errors='ignore'). */
  private val p11 = Q(
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size_d"),
        col("p_partkey").cast("string").as("key_s"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d,
            CAST(p_partkey AS VARCHAR) AS key_s FROM part ORDER BY p_partkey"""))

  /** P12: derived column append — codegen'd arithmetic, no UDF. Rounded to
    * 4 dp = the exact decimal precision of the product (2 dp × 2 dp), so the
    * round is unambiguous on both engines (no half-way boundary). */
  private val p12 = Q(
    (s, d) => Tables.lineitem(s, d)
      .withColumn("revenue", round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
      .select("l_orderkey", "l_linenumber", "revenue")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** P13: deterministic key-mod sample — unlike `df.sample`, stable across
    * engines AND across partitionings, which is what a 100 TB repeatable
    * pipeline actually wants (rerun-stable splits). */
  private val p13 = Q(
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select("o_orderkey", "o_totalprice").orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey"""))

  // -- J: joins ----------------------------------------------------------

  /** J1: left equi-join, small dim side broadcast — zero shuffle of the fact
    * table (reference: attach-labels join, clustering.py:585-588). */
  private val j1 = Q(
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"), "left")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_suppkey, s_name
            FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
            ORDER BY l_orderkey, l_linenumber"""))

  /** J2: inner multi-key join of two aggregates (reference: uniqueness pair
    * match on (q_code, category), metrics.py:321-334). Both sides share the
    * grouping keys, so AQE can plan a shuffle-free sort-merge reuse. */
  private val j2 = Q(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val t1 = li.groupBy("l_partkey", "l_returnflag").agg(count(lit(1)).as("n"))
      val t2 = li.groupBy("l_partkey", "l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"))
      t1.join(t2, Seq("l_partkey", "l_returnflag"), "inner")
        .orderBy("l_partkey", "l_returnflag")
    },
    Some("""WITH t1 AS (SELECT l_partkey, l_returnflag, COUNT(*) AS n
                        FROM lineitem GROUP BY 1,2),
                 t2 AS (SELECT l_partkey, l_returnflag, ROUND(SUM(l_quantity),2) AS qty
                        FROM lineitem GROUP BY 1,2)
            SELECT t1.l_partkey, t1.l_returnflag, n, qty
            FROM t1 JOIN t2 ON t1.l_partkey = t2.l_partkey
                           AND t1.l_returnflag = t2.l_returnflag
            ORDER BY t1.l_partkey, t1.l_returnflag"""))

  /** J3: positional (index-aligned) join — pandas `df['c'] = labels`
    * semantics. Spark has no row order, so the alignment key is made
    * explicit with a DISTRIBUTED global index ([[GlobalIndex]]): range
    * repartition + per-partition row_number + cumulative offsets — no
    * single-partition window, so the encoding survives 100 TB (labels are
    * still best kept as columns from the start, SURVEY §7.4). */
  private val j3 = Q(
    (s, d) => {
      val a = GlobalIndex.withGlobalIndex(
        Tables.orders(s, d).select("o_orderkey"), Seq(col("o_orderkey")))
      val b = GlobalIndex.withGlobalIndex(
        Tables.customer(s, d).select("c_custkey"), Seq(col("c_custkey")))
      a.join(b, Seq("rn"), "inner").select("rn", "o_orderkey", "c_custkey")
        .orderBy("rn")
    },
    Some("""WITH a AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
                       FROM orders),
                 b AS (SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn
                       FROM customer)
            SELECT a.rn AS rn, o_orderkey, c_custkey
            FROM a JOIN b ON a.rn = b.rn ORDER BY rn"""))

  /** J4: recode via broadcast mapping table (reference: rename_segments join,
    * chisquared_tester.py:121-128) — the scalable alternative to when-chains
    * when the mapping is data, not code. */
  private val j4 = Q(
    (s, d) => {
      import s.implicits._
      val mapping = Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
        .toDF("code", "flag_label")
      val li = Tables.lineitem(s, d)
      li.join(broadcast(mapping), li("l_returnflag") === mapping("code"), "inner")
        .select("l_orderkey", "l_linenumber", "flag_label")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, m.flag_label
            FROM lineitem JOIN (VALUES ('R','returned'),('A','accepted'),('N','none'))
              AS m(code, flag_label) ON l_returnflag = m.code
            ORDER BY l_orderkey, l_linenumber"""))

  /** Left-semi join (EXISTS) — Spark-native; no right-side columns shuffled. */
  private val j5 = Q(
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey"""))

  /** Left-anti join (NOT EXISTS). The probe side is pre-filtered (customers
    * with no URGENT order) so the result is non-empty at every SF — an
    * anti join whose oracle agrees on the empty set proves nothing. */
  private val j6 = Q(
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** J7 (beyond ref): point-in-interval lookup join — the price-band /
    * IP-range / SLA-tier dimension shape. The band table is config-sized,
    * so the inequality join IS a broadcast nested loop by design: each
    * fact row tests k intervals in the scan stage, the fact side never
    * shuffles, and the roll-up partial-aggregates map-side. At 100 TB the
    * same plan holds — the only growing thing is the scan. */
  private val j7 = Q(
    (s, d) => {
      val sess = s
      import sess.implicits._
      val bands = Seq(("cheap", 0.0, 1000.0), ("mid", 1000.0, 10000.0),
        ("high", 10000.0, 1e12)).toDF("band", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(bands), col("l_extendedprice") >= col("lo") &&
          col("l_extendedprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("total"))
        .orderBy("band")
    },
    Some("""SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_extendedprice), 2) AS total
            FROM lineitem l
            JOIN (VALUES ('cheap', 0.0, 1000.0), ('mid', 1000.0, 10000.0),
                         ('high', 10000.0, 1e12)) b(band, lo, hi)
              ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
            GROUP BY 1 ORDER BY 1"""))

  // -- A: aggregations ---------------------------------------------------

  /** A1: group-by count (value_counts). */
  private val a1 = Q(
    (s, d) => Tables.events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n")).orderBy("event_type"),
    Some("SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"))

  /** A2/U2: crosstab via pivot — the χ² workhorse (chisquared_tester.py:241).
    * Pivot values are supplied explicitly so the plan is a single pass with
    * map-side partial aggregation (no value-discovery job). */
  private val a2 = Q(
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag").pivot("l_linestatus", Seq("F", "O")).count()
      .na.fill(0)
      .withColumnRenamed("F", "f").withColumnRenamed("O", "o")
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS f,
            CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS o
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** A3: weighted group sum. */
  private val a3 = Q(
    (s, d) => Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("wsum")).orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, ROUND(SUM(o_totalprice),2) AS wsum
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** A4: group mode with deterministic tie-break (count desc, key asc) —
    * the reference's per-cluster modal answer (chisquared_tester.py:917). */
  private val a4 = Q(
    (s, d) => {
      val counts = Tables.customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("n").desc, col("c_nationkey"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"), col("n"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH c AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
                       FROM customer GROUP BY 1,2),
                 r AS (SELECT *, row_number() OVER
                        (PARTITION BY c_mktsegment ORDER BY n DESC, c_nationkey) AS rn
                       FROM c)
            SELECT c_mktsegment, c_nationkey AS mode_nation, n FROM r
            WHERE rn = 1 ORDER BY c_mktsegment"""))

  /** A5: multi-key group size. */
  private val a5 = Q(
    (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n")).orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
            FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""))

  /** A6: grouped distinct count (communicability uses this — metrics.py:353). */
  private val a6 = Q(
    (s, d) => Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n_cust")).orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** A7: global reductions. */
  private val a7 = Q(
    (s, d) => Tables.lineitem(s, d).agg(
      round(avg("l_quantity"), 4).as("avg_qty"),
      round(sum("l_extendedprice"), 2).as("sum_price"),
      count(lit(1)).as("n")),
    Some("""SELECT ROUND(AVG(l_quantity),4) AS avg_qty,
            ROUND(SUM(l_extendedprice),2) AS sum_price, COUNT(*) AS n
            FROM lineitem"""))

  /** A8: non-null response rate (chisquared_tester.py:1240). */
  private val a8 = Q(
    (s, d) => Tables.events(s, d).agg(
      round(count(when(col("value") >= 0.5, lit(1))) / count(lit(1)), 6)
        .as("resp_rate")),
    Some("""SELECT ROUND(COUNT(CASE WHEN value >= 0.5 THEN 1 END) / COUNT(*), 6)
              AS resp_rate FROM events"""))

  /** A9: group share of total — single shuffle; the total comes from a
    * broadcast 1-row cross join over the already-aggregated (group-sized)
    * frame, not a second scan and not an empty-window single-partition
    * exchange. */
  private val a9 = Q(
    (s, d) => {
      val grouped = Tables.customer(s, d).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      grouped.crossJoin(broadcast(grouped.agg(sum("n").as("tot"))))
        .withColumn("share", round(col("n") / col("tot"), 6))
        .drop("tot")
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n,
            ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS share
            FROM customer GROUP BY 1 ORDER BY 1"""))

  /** A10: grouped-iteration (pandas groupby-apply) as typed
    * flatMapGroups — top-2 customers per nation by balance. Runs
    * distributed per group key (no driver loop), but materializes each
    * group with a full shuffle-and-sort; kept as the general
    * grouped-iteration surface (arbitrary per-group logic — the
    * reference's groupby-apply), spec-pinned equal to the registered
    * query. The REGISTERED q_a10 routes through the native
    * [[graft.plans.GroupedTopK]] operator instead, because its specific
    * per-group program IS a top-k: measured at sf0.1 warm (TimeOne)
    * flatMapGroups 0.76 s → GroupedTopK 0.43 s (1.8x — modest at 25
    * nation groups; the operator's 7.3x headline needs data volume, but
    * the shape is the one that survives a 100x scale-up: no group ever
    * materialized, only 2·|groups| rows cross the exchange). */
  def groupedTopNIterate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .as[(Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        rows.toSeq.sortBy(r => (-r._3, r._2)).take(2)
      }
      .toDF("c_nationkey", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "c_custkey")
  }

  private val a10 = Q(
    (s, d) => graft.plans.GroupedTopK.topK(
      Tables.customer(s, d).select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq("c_nationkey"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 2)
      .orderBy("c_nationkey", "c_custkey"),
    Some("""WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey) AS rn
                       FROM customer)
            SELECT c_nationkey, c_custkey, c_acctbal FROM r WHERE rn <= 2
            ORDER BY c_nationkey, c_custkey"""))

  /** A11: exact interpolated quantiles per group — Spark `percentile` and
    * DuckDB `quantile_cont` share the (n−1)·p linear-interpolation
    * definition, so values hash-match. 2-dp inputs at quartile fractions
    * have ≤4 true decimals, so round(4) is exact on both engines. */
  private val a11 = Q(
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
            ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
            ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // -- W: windows / ranking / sort / top-k -------------------------------

  /** W1: pandas average-rank with ties (metrics.py:133-141 rank semantics):
    * avg_rank = rank() + (tie_count - 1)/2. Computed WITHOUT a global
    * window (a bare `rank() OVER (ORDER BY …)` moves the whole table to one
    * partition): the distributed [[GlobalIndex]] assigns row numbers over
    * the total order (value, key), and avg(rn) within each tie group equals
    * rank + (cnt − 1)/2 exactly — consecutive integers' mean, exact in
    * double — so the oracle keeps the textbook window formulation while the
    * engine side scales. */
  private val w1 = Q(
    (s, d) => {
      val indexed = GlobalIndex.withGlobalIndex(
        Tables.supplier(s, d).select(col("s_suppkey"), col("s_acctbal")),
        Seq(col("s_acctbal"), col("s_suppkey")), "__rn")
      indexed
        .withColumn("avg_rank",
          avg(col("__rn")).over(Window.partitionBy("s_acctbal")))
        .drop("__rn")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_acctbal,
            rank() OVER (ORDER BY s_acctbal)
              + (COUNT(*) OVER (PARTITION BY s_acctbal) - 1) / 2.0 AS avg_rank
            FROM supplier ORDER BY s_suppkey"""))

  /** W2: argmax row per group (idxmax) with deterministic tie-break. */
  private val w2 = Q(
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderpriority"), col("o_orderkey").as("best_order"),
          round(col("o_totalprice"), 2).as("best_price"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
            SELECT o_orderpriority, o_orderkey AS best_order,
                   ROUND(o_totalprice,2) AS best_price
            FROM r WHERE rn = 1 ORDER BY o_orderpriority"""))

  /** W3: global sort + limit — Spark plans TakeOrderedAndProject (per-partition
    * top-k then k-way merge on driver), which scales: no global sort shuffle. */
  private val w3 = Q(
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(50),
    Some("""SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice,2) AS price
            FROM lineitem
            ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 50"""))

  /** W4: top-k per group (discover top-10, chisquared_tester.py:1729). */
  private val w4 = Q(
    (s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy("p_brand", "rn")
    },
    Some("""WITH r AS (SELECT *, row_number() OVER (PARTITION BY p_brand
                         ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part)
            SELECT p_brand, rn, p_partkey, ROUND(p_retailprice,2) AS price
            FROM r WHERE rn <= 3 ORDER BY p_brand, rn"""))

  /** W5: cumulative sum over an explicit order (per-customer running spend). */
  private val w5 = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey), 2) AS running
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  // -- U: set ops / reshape ---------------------------------------------

  /** U1: union by name. */
  private val u1 = Q(
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("bucket"))
        .unionByName(
          o.filter(col("o_orderpriority") === "5-LOW")
            .select(col("o_orderkey"), lit("low").as("bucket")))
        .orderBy("bucket", "o_orderkey")
    },
    Some("""SELECT o_orderkey, 'urgent' AS bucket FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, 'low' AS bucket FROM orders
            WHERE o_orderpriority = '5-LOW'
            ORDER BY bucket, o_orderkey"""))

  /** U3: stack + explode (multi-select answers → rows,
    * chisquared_tester.py:739-754): tokenize documents and count words.
    * Explode happens before the shuffle; partial aggregation keeps the
    * shuffle at |vocab| not |tokens|. */
  private val u3 = Q(
    (s, d) => Tables.documents(s, d)
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(100),
    Some("""SELECT word, COUNT(*) AS n FROM (
              SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
              FROM documents)
            GROUP BY 1 ORDER BY n DESC, word LIMIT 100"""))

  // -- F: scalar functions ----------------------------------------------

  /** F1-F6: string functions (lower/contains/split/regex extract+replace). */
  private val fStrings = Q(
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_type")).as("type_uc"),
        col("p_name").contains("widget").as("is_widget"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_tok"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_type"), "[AEIOU]", "").as("type_novowel"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).as("name_len"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, lower(p_name) AS name_lc, upper(p_type) AS type_uc,
            contains(p_name, 'widget') AS is_widget,
            split_part(p_name, ' ', 1) AS first_tok,
            regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
            regexp_replace(p_type, '[AEIOU]', '', 'g') AS type_novowel,
            substring(p_name, 1, 5) AS name5,
            CAST(length(p_name) AS INT) AS name_len
            FROM part ORDER BY p_partkey"""))

  /** F7-F11: math functions on a key-mod slice. */
  private val fMath = Q(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("a"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(pow(col("l_tax") + 1, 2), 6).as("pw"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            ROUND(ABS(l_discount - 0.05), 4) AS a,
            ROUND(SQRT(l_quantity), 6) AS sq,
            ROUND(LN(l_extendedprice), 6) AS lg,
            ROUND(POW(l_tax + 1, 2), 6) AS pw
            FROM lineitem WHERE l_orderkey % 50 = 0
            ORDER BY l_orderkey, l_linenumber"""))

  /** F12-F14: array functions — remove sentinel, membership, sorted-distinct
    * access (the reference's list scrubbing, helper_functions.py:15-30). */
  private val fArrays = Q(
    (s, d) => {
      val toks = filter(split(lower(col("text")), " "), t => t =!= "")
      Tables.documents(s, d).select(
          col("doc_id"),
          size(array_remove(toks, "the")).cast("long").as("n_no_the"),
          array_contains(toks, "spark").as("has_spark"),
          element_at(array_sort(array_distinct(toks)), 1).as("first_tok"),
          size(array_distinct(toks)).cast("long").as("n_distinct"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id,
              list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
              FROM documents)
            SELECT doc_id,
              CAST(len(list_filter(toks, x -> x <> 'the')) AS BIGINT) AS n_no_the,
              list_contains(toks, 'spark') AS has_spark,
              list_sort(list_distinct(toks))[1] AS first_tok,
              CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
            FROM t ORDER BY doc_id"""))

  /** F15: JSON extraction from a string column. */
  private val fJson = Q(
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id"""))

  // -- E: event-time ops (batch analogs of the streaming layer) ----------

  /** Tumbling event-time window aggregate (Structured Streaming's windowed
    * agg in batch form — same groupBy(window) shape, here via date_trunc
    * for oracle parity). */
  private val eWindow = Q(
    (s, d) => Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("HOUR", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
      .orderBy("hour_ts", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
            event_type, COUNT(*) AS n, ROUND(SUM(value),3) AS v
            FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  /** Gap-based sessionization (30-min inactivity) via lag + running flag sum —
    * the batch twin of flatMapGroupsWithState session windows. Exact parity
    * via integer microsecond arithmetic on both engines. */
  private val eSession = Q(
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
        .groupBy("user_id").agg(sum("new_s").cast("long").as("n_sessions"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (SELECT user_id, ts,
              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS prev_us
              FROM events)
            SELECT user_id, CAST(SUM(CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_sessions
            FROM g GROUP BY 1 ORDER BY 1"""))

  /** Backward as-of join (see [[AsOfJoin]]): each purchase matched to the
    * user's most recent prior view. Oracle is DuckDB's native ASOF JOIN. */
  private val eAsof = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.backward(purchases, views, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("prior_event_id"),
          unix_micros(col("prior_ts")).as("prior_ts_us"),
          col("prior_value"))
        .orderBy("event_id")
    },
    Some("""SELECT l.event_id AS event_id, l.user_id AS user_id,
                   epoch_us(l.ts) AS ts_us, r.event_id AS prior_event_id,
                   epoch_us(r.ts) AS prior_ts_us, r.value AS prior_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') l
            ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type = 'view') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY event_id"""))

  /** Forward as-of (see [[AsOfJoin.forward]]): each view matched to the
    * user's next purchase at-or-after it — time-to-conversion. Oracle is
    * DuckDB's forward ASOF (`l.ts <= r.ts`). */
  private val eAsofFwd = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.forward(views, purchases, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("next_event_id"),
          unix_micros(col("next_ts")).as("next_ts_us"),
          col("next_value"))
        .orderBy("event_id")
    },
    Some("""SELECT l.event_id AS event_id, l.user_id AS user_id,
                   epoch_us(l.ts) AS ts_us, r.event_id AS next_event_id,
                   epoch_us(r.ts) AS next_ts_us, r.value AS next_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts <= r.ts
            ORDER BY event_id"""))

  /** Keyless time-proximity range join (see [[RangeJoin]]): purchases within
    * ±60 s of each error event, counted. Oracle is DuckDB's BETWEEN range
    * join (IEJoin); the Spark side uses the banded equi-join encoding. */
  private val eRange = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase").select("ts")
      RangeJoin.countNearby(errors, purchases, "ts", 60000000L, "event_id")
        .select("event_id", "n_nearby")
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events
                       WHERE event_type = 'error'),
                 p AS (SELECT epoch_us(ts) AS us FROM events
                       WHERE event_type = 'purchase')
            SELECT e.event_id AS event_id, CAST(COUNT(p.us) AS BIGINT) AS n_nearby
            FROM e LEFT JOIN p
              ON p.us BETWEEN e.us - 60000000 AND e.us + 60000000
            GROUP BY 1 ORDER BY 1"""))

  val queries: Map[String, Q] = Map(
    "q_p1_project" -> p1,
    "q_p2_name_predicate" -> p2,
    "q_p3_drop" -> p3,
    "q_p4_filter" -> p4,
    "q_p5_isin" -> p5,
    "q_p6_dropdup" -> p6,
    "q_p8_fillna" -> p8,
    "q_p9_recode" -> p9,
    "q_p10_rename" -> p10,
    "q_p11_cast" -> p11,
    "q_p12_derived" -> p12,
    "q_p13_sample" -> p13,
    "q_j1_left_broadcast" -> j1,
    "q_j2_inner_multikey" -> j2,
    "q_j3_positional" -> j3,
    "q_j4_mapjoin" -> j4,
    "q_j5_semi" -> j5,
    "q_j6_anti" -> j6,
    "q_j7_interval" -> j7,
    "q_a1_count" -> a1,
    "q_a2_crosstab" -> a2,
    "q_a3_weighted_sum" -> a3,
    "q_a4_mode" -> a4,
    "q_a5_pair_count" -> a5,
    "q_a6_nunique" -> a6,
    "q_a7_reduce" -> a7,
    "q_a8_nonnull_rate" -> a8,
    "q_a9_proportions" -> a9,
    "q_a10_grouped_topn" -> a10,
    "q_a11_quantiles" -> a11,
    "q_w1_avg_rank" -> w1,
    "q_w2_argmax" -> w2,
    "q_w3_sort_limit" -> w3,
    "q_w4_topk_group" -> w4,
    "q_w5_cumsum" -> w5,
    "q_u1_union" -> u1,
    "q_u3_explode_wordcount" -> u3,
    "q_f_strings" -> fStrings,
    "q_f_math" -> fMath,
    "q_f_arrays" -> fArrays,
    "q_f_json" -> fJson,
    "q_e_window_agg" -> eWindow,
    "q_e_sessionize" -> eSession,
    "q_e_asof" -> eAsof,
    "q_e_asof_fwd" -> eAsofFwd,
    "q_e_range_join" -> eRange,
    "q_j_salted" -> SaltedJoinQuery.jSalted,
    "q_j_salted_adaptive" -> SaltedJoinQuery.jSaltedAdaptive,
    "q_a12_profile" -> ProfileQuery.pProfile)
}

/** Column profiling — the data-quality pass a pipeline runs on arrival:
  * per column, row count, null count, exact distinct count, in ONE scan
  * (the k countDistincts expand the aggregation k-way — the standard
  * trade; at 100 TB profile with the HLL sketch instead, whose error
  * contract q_sk_hll_distinct certifies). */
private[etl] object ProfileQuery {
  import org.apache.spark.sql.DataFrame

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  val pProfile = Q(
    (s, d) => profile(Tables.lineitem(s, d),
      Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount"))
      .orderBy("col_name"),
    Some(Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount")
      .map(c => s"""SELECT '$c' AS col_name,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
          CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
        FROM lineitem""")
      .mkString("", "\n UNION ALL ", "\n ORDER BY col_name")))
}

/** Salted skew join registration, split out so its `val` initializes
  * before [[Relational.queries]] references it (object vals initialize in
  * declaration order; `Relational.queries` sits above for readability). */
private[etl] object SaltedJoinQuery {

  /** Salted skew join (see [[SkewJoin]]): the customer fact against the
    * tiny nation dim after renaming to a shared key. With |keys| = 25 and
    * 32 shuffle partitions, every key is hot — exactly the shape where an
    * unsalted shuffle join stragglers at 100 TB. Salting must be
    * row-for-row transparent, which is what the oracle certifies: the
    * DuckDB side is the PLAIN join. */
  /** Adaptive salting over PLANTED sentinel-key skew: three quarters of
    * the customer fact collapses onto key 0 (the "null-ish sentinel"
    * scenario from [[SkewJoin]]'s scaladoc); the detector must salt
    * exactly that key (cnt·n_keys ≥ 2·total — integer test) and leave
    * the 24 light keys unsalted. The oracle is the PLAIN join plus the
    * same integer heavy test, so both the row-for-row transparency AND
    * the detection decision sit inside the hash. */
  val jSaltedAdaptive = Q(
    (s, d) => {
      val fact = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          when(pmod(col("c_custkey"), lit(4)) =!= 0, lit(0))
            .otherwise(col("c_nationkey")).cast("int").as("nk"))
      val dim = Tables.nation(s, d)
        .select(col("n_nationkey").cast("int").as("nk"), col("n_name"))
      SkewJoin.adaptiveSaltedJoin(fact, dim, "nk", salts = 8, factor = 2,
          spreadCols = Seq("c_custkey"))
        .select(col("c_custkey"), col("n_name"),
          round(col("c_acctbal"), 2).as("acctbal"), col("is_heavy"))
        .orderBy("c_custkey")
    },
    Some("""WITH f AS (SELECT c_custkey, c_acctbal,
                CAST(CASE WHEN c_custkey % 4 <> 0 THEN 0
                     ELSE c_nationkey END AS INT) AS nk
              FROM customer),
            cnt AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS c
                    FROM f GROUP BY nk),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                           CAST(COUNT(*) AS BIGINT) AS nkeys FROM cnt),
            heavy AS (SELECT nk FROM cnt CROSS JOIN tot
                      WHERE c * nkeys >= 2 * total)
            SELECT f.c_custkey, n.n_name,
                   round(f.c_acctbal, 2) AS acctbal,
                   (h.nk IS NOT NULL) AS is_heavy
            FROM f JOIN nation n ON f.nk = n.n_nationkey
            LEFT JOIN heavy h ON f.nk = h.nk
            ORDER BY f.c_custkey"""))

  val jSalted = Q(
    (s, d) => {
      val fact = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").as("nk"))
      val dim = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk"), col("n_name"))
      SkewJoin.saltedJoin(fact, dim, "nk", salts = 8,
          spreadCols = Seq("c_custkey"))
        .select(col("c_custkey"), col("n_name"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, n_name, round(c_acctbal, 2) AS acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            ORDER BY c_custkey"""))
}
