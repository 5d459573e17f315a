package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-skipping layout (Z-order / Morton curve) — the
  * missing half of the write path: [[graft.pipeline.Sinks.writeBucketed]]
  * optimizes JOIN locality, this optimizes SCAN selectivity when queries
  * filter on MORE THAN ONE column. Sorting a table by `(a)` makes parquet
  * row-group min/max stats razor-sharp on `a` and useless on `b`;
  * interleaving the bits of binned `a` and `b` into one Morton key and
  * range-sorting by it makes every output file a small HYPER-RECTANGLE in
  * (a, b) space, so a scan with predicates on either or both columns
  * skips most files on footer stats alone. This is the published
  * technique behind Delta Lake's `OPTIMIZE ZORDER BY` and the classic
  * Morton-curve literature; everything here is rebuilt from the public
  * idea on plain DataFrame ops.
  *
  * Scale: binning needs one tiny min/max aggregate per column (a 1-row
  * broadcast — no rank shuffle, unlike ntile-based binning), the Morton
  * key is pure map-side integer bit-twiddling (codegen'd `shiftleft`/
  * `bitwise OR` — no UDF), and the layout itself is ONE
  * `repartitionByRange` on the key (the same shuffle a 1-D sort-on-write
  * would pay). Nothing about the shape changes at 100 TB: the only
  * driver-side state is 2·k longs.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (already-binned, non-negative)
    * integer column into one Morton key: bit i of column j lands at
    * position `i * k + j` (k = number of columns). Pure Column arithmetic
    * — stays inside whole-stage codegen. With k·bits <= 62 the key fits a
    * long. */
  def mortonKey(binned: Seq[Column], bits: Int): Column = {
    val k = binned.size
    require(k >= 2, "interleaving needs >= 2 columns")
    require(k * bits <= 62, s"$k cols x $bits bits overflows a long key")
    val terms = for {
      i <- 0 until bits; (c, j) <- binned.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(lit(1L << i)), i), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Equi-width integer binning of `col` into [0, 2^bits) given inclusive
    * domain bounds: `(x - min) * 2^bits DIV (max - min + 1)` — exact
    * integer arithmetic (no float quantiles), so the bin of a value is
    * reproducible in any engine. Callers supply bounds as Columns (one
    * broadcast min/max row, see [[withMortonKey]]). */
  def equiWidthBin(x: Column, minC: Column, maxC: Column,
      bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    val b = lit(1L << bits)
    val width = maxC.cast("long") - minC.cast("long") + lit(1L)
    // exact integer floor-div (SQL `div`), never a double ratio: both
    // operands are non-negative longs, so the quotient is the true bin
    // for ANY domain — no 2^52 mantissa assumption to silently violate.
    // The only failure mode left is long overflow of (x-min)*2^bits,
    // which the assert makes LOUD instead of a silent mis-bin.
    val guard = assert_true(width <= lit(Long.MaxValue >> bits),
      concat(lit(s"equiWidthBin: domain width "), width.cast("string"),
        lit(s" * 2^$bits overflows a long — reduce bits")))
    when(guard.isNull, call_function("div",
      (x.cast("long") - minC.cast("long")) * b, width)).cast("long")
  }

  /** Attach a Morton key over integer-valued `cols`: one global min/max
    * aggregate (1 row, broadcast), map-side binning + interleave. */
  def withMortonKey(df: DataFrame, cols: Seq[String], bits: Int,
      keyCol: String = "zkey"): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c)).as(s"__mn$j"), max(col(c)).as(s"__mx$j")) }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val withB = df.crossJoin(broadcast(bounds))
    val bins = cols.zipWithIndex.map { case (c, j) =>
      equiWidthBin(col(c), col(s"__mn$j"), col(s"__mx$j"), bits) }
    withB.withColumn(keyCol, mortonKey(bins, bits))
      .drop(cols.indices.flatMap(j => Seq(s"__mn$j", s"__mx$j")): _*)
  }

  /** Z-ordered write layout: Morton key -> `repartitionByRange(numFiles)`
    * (contiguous curve segments per file) -> in-file sort by the key so
    * row-group stats are tight too. Returns the frame ready for
    * `.write.parquet` — one shuffle total, the same price as sorting by a
    * single column. */
  def layout(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    val keyed = withMortonKey(df, cols, bits)
    keyed.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** DuckDB replica of [[equiWidthBin]] + [[mortonKey]] for the oracle:
    * integer-only arithmetic (`//` floor-div, `% 2` bit extract), so the
    * key is bit-identical across engines. */
  private def oracleZ(xa: String, xb: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($xa) // ${1L << i}) % 2) * ${1L << (i * 2)}",
        s"((($xb) // ${1L << i}) % 2) * ${1L << (i * 2 + 1)}")
    }
    terms.mkString(" + ")
  }

  /** Morton keys over orders (customer x order day) — the canonical
    * "filter by customer AND date range" layout. 8+8 bits; bounds from
    * the data; key arithmetic is exact integer on both engines. */
  private val pZOrder = Q(
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).cast("long").as("dy"))
      withMortonKey(o, Seq("ck", "dy"), bits = 8)
        .select(col("o_orderkey"), col("zkey"))
        .orderBy("o_orderkey")
    },
    Some(s"""WITH o AS (SELECT o_orderkey,
               CAST(o_custkey AS BIGINT) AS ck,
               date_diff('day', DATE '1995-01-01',
                 CAST(o_orderdate AS DATE)) AS dy
             FROM orders),
            b AS (SELECT MIN(ck) AS mnc, MAX(ck) AS mxc,
                         MIN(dy) AS mnd, MAX(dy) AS mxd FROM o),
            binned AS (SELECT o_orderkey,
                ((ck - mnc) * 256) // (mxc - mnc + 1) AS bc,
                ((dy - mnd) * 256) // (mxd - mnd + 1) AS bd
              FROM o, b)
            SELECT o_orderkey,
              CAST(${oracleZ("bc", "bd", 8)} AS BIGINT) AS zkey
            FROM binned ORDER BY o_orderkey"""))

  /** Hilbert-keyed variant of [[withMortonKey]] — same 1-row bounds
    * broadcast and map-side binning, the codegen'd
    * [[graft.functions.HilbertIndex]] in place of the bit interleave.
    * Use when box-query locality matters most: the Hilbert curve has no
    * quadrant jumps, so contiguous index ranges are tighter rectangles
    * (ZOrderSpec measures it against Morton on the same workload). */
  def withHilbertKey(df: DataFrame, cols: Seq[String], bits: Int,
      keyCol: String = "hkey"): DataFrame = {
    require(cols.size == 2, "hilbert layout is 2-D")
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c)).as(s"__mn$j"), max(col(c)).as(s"__mx$j")) }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val bins = cols.zipWithIndex.map { case (c, j) =>
      equiWidthBin(col(c), col(s"__mn$j"), col(s"__mx$j"), bits) }
    df.crossJoin(broadcast(bounds))
      .withColumn(keyCol,
        graft.functions.HilbertIndex.index(bins(0), bins(1), bits))
      .drop(cols.indices.flatMap(j => Seq(s"__mn$j", s"__mx$j")): _*)
  }

  def hilbertLayout(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame =
    withHilbertKey(df, cols, bits)
      .repartitionByRange(numFiles, col("hkey"))
      .sortWithinPartitions("hkey")

  /** Generated SQL replica of the iterated-rotation construction: one
    * CTE stage per bit plane carrying (x, y, d); pure integer CASE/XOR
    * arithmetic, so the key is bit-identical across engines. */
  private def oracleHilbert(bits: Int): String = {
    val stages = (bits - 1 to 0 by -1).zipWithIndex.map { case (p, i) =>
      val s = 1L << p
      val prev = if (i == 0) "binned" else s"h${i - 1}"
      val (x, y, d) = if (i == 0) ("bc", "bd", "CAST(0 AS BIGINT)")
        else ("x", "y", "d")
      s""",
            h$i AS (SELECT o_orderkey,
                CASE WHEN ($y & $s) = 0
                     THEN (CASE WHEN ($x & $s) > 0
                                THEN $s - 1 - $y ELSE $y END)
                     ELSE $x END AS x,
                CASE WHEN ($y & $s) = 0
                     THEN (CASE WHEN ($x & $s) > 0
                                THEN $s - 1 - $x ELSE $x END)
                     ELSE $y END AS y,
                $d + ${s * s} * xor(
                  3 * (CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END),
                  CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) AS d
              FROM $prev)"""
    }.mkString
    stages
  }

  /** Hilbert keys over the same (customer × order day) plane as
    * q_p23_zorder — the two layout queries share binning, so their keys
    * are directly comparable. */
  private val pHilbert = Q(
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).cast("long").as("dy"))
      withHilbertKey(o, Seq("ck", "dy"), bits = 8)
        .select(col("o_orderkey"), col("hkey"))
        .orderBy("o_orderkey")
    },
    Some(s"""WITH o AS (SELECT o_orderkey,
               CAST(o_custkey AS BIGINT) AS ck,
               date_diff('day', DATE '1995-01-01',
                 CAST(o_orderdate AS DATE)) AS dy
             FROM orders),
            b AS (SELECT MIN(ck) AS mnc, MAX(ck) AS mxc,
                         MIN(dy) AS mnd, MAX(dy) AS mxd FROM o),
            binned AS (SELECT o_orderkey,
                ((ck - mnc) * 256) // (mxc - mnc + 1) AS bc,
                ((dy - mnd) * 256) // (mxd - mnd + 1) AS bd
              FROM o, b)${oracleHilbert(8)}
            SELECT o_orderkey, CAST(d AS BIGINT) AS hkey
            FROM h7 ORDER BY o_orderkey"""))

  val queries: Map[String, Q] = Map(
    "q_p23_zorder" -> pZOrder,
    "q_p25_hilbert" -> pHilbert)
}
