package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multi-table analytical join shapes (TPC-H Q3/Q5 adapted to the test
  * schema) — the declarative star-join showcase: selective dimension
  * filters written as plain `filter`s so Catalyst pushes them below the
  * joins, dimension tables picked up by broadcast, and ONLY the
  * fact-fact edge (orders ⋈ lineitem) allowed to shuffle. No join hints,
  * no manual ordering — the point is that the optimizer, fed a fully
  * declarative plan, reproduces the hand-tuned strategy (ExplainAudit
  * pins broadcasts + single TakeOrderedAndProject; the reference engine
  * has no multi-join optimizer at all — its pandas merges execute in
  * whatever order the script author wrote, SURVEY §4.1).
  */
object MultiJoin {

  /** Q3 shape: shipping-priority revenue — segment-filtered customers ⋈
    * date-filtered orders ⋈ late-shipped lineitems, top-10 orders by
    * revenue. Date columns hash-compare as formatted strings (the
    * engine-neutral encoding for DATE output). */
  private val jTpchQ3 = Q(
    (s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") < lit("1998-07-01"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") > lit("1998-07-01"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .as("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
              strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND CAST(o_orderdate AS DATE) < DATE '1998-07-01'
              AND CAST(l_shipdate AS DATE) > DATE '1998-07-01'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Q5 shape: local-supplier revenue by nation — six tables, the
    * region→nation→{customer,supplier} dimension chain broadcast down
    * onto the orders ⋈ lineitem fact edge, with the Q5 twist that the
    * supplier must sit in the CUSTOMER's nation (an extra equi-key on
    * the lineitem⋈supplier join, not a post-filter). */
  private val jTpchQ5 = Q(
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01") &&
          col("o_orderdate").cast("date") < lit("1998-01-01"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
              AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
            GROUP BY 1 ORDER BY revenue DESC, n_name"""))

  val queries: Map[String, Q] = Map(
    "q_j8_tpch_q3" -> jTpchQ3,
    "q_j9_tpch_q5" -> jTpchQ5)
}
