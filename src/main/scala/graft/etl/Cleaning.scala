package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StringType}

/** Survey-cleaning semantics (SURVEY.md §1.3, §2.2; reference
  * src/kraken/app/utils.py). All pure `DataFrame => DataFrame` — column-name
  * work happens on the driver against the schema, data work is codegen'd
  * expressions; nothing collects.
  *
  * The reference's naming conventions are load-bearing (SURVEY §1.3):
  * `_time` columns dropped, `_fb`/`_gg` auto-tagged `_tgt`, `_numeric`
  * stripped, string NA → 'not selected', numeric NA → -999, literal
  * 'None' → null.
  */
object Cleaning {

  val StringNaSentinel = "not selected"
  val NumericNaSentinel: Double = -999.0
  val NotShown = "Not shown"

  /** Drop `_time` columns (utils.py:61-63). */
  def removeTimeCols(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.contains("_time")): _*)

  /** Lowercase every column name (utils.py:65). */
  def lowercaseHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Auto-tag ad-platform columns: `_fb`/`_gg` suffixed names gain `_tgt`
    * (utils.py:83-89). Idempotent. */
  def addTgtTags(df: DataFrame): DataFrame =
    df.toDF(df.columns.map { c =>
      if ((c.endsWith("_fb") || c.endsWith("_gg")) && !c.endsWith("_tgt"))
        s"${c}_tgt"
      else c
    }: _*)

  /** Strip `_numeric` suffixes (utils.py:92-95). */
  def stripNumericTags(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.stripSuffix("_numeric")): _*)

  /** Typed sentinel NA fill: strings → 'not selected', numerics → -999
    * (utils.py:47-58). */
  def fillSentinels(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }
    df.na.fill(StringNaSentinel, stringCols).na.fill(NumericNaSentinel, numCols)
  }

  /** Literal 'None' strings → null (clustering.py:169). */
  def noneToNull(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    df.na.replace(stringCols, Map("None" -> null))
  }

  /** Recode stored answer codes to display labels from the question bank
    * (main.py:18-42): per response column with bank rows, broadcast-join the
    * (option_value → option_text) pairs. Mapping applied via a single
    * map-literal expression per column (codegen'd; no join on the fact side). */
  def mapToOptionTitles(df: DataFrame, questionBank: DataFrame): DataFrame = {
    val mappings: Map[String, Map[String, String]] = questionBank
      .select(lower(col("varname")).as("varname"), col("option_value"),
        col("option_text"))
      .filter(col("option_value") =!= col("option_text"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getString(2)).toMap).toMap
    mappings.foldLeft(df) { case (acc, (c, m)) =>
      if (!acc.columns.contains(c)) acc
      else {
        val mapExpr = map(m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
        acc.withColumn(c, coalesce(element_at(mapExpr, col(c)), col(c)))
      }
    }
  }

  /** Per-column best-effort numeric coercion (pd.to_numeric errors='ignore',
    * clustering.py:101): a string column converts iff every non-null,
    * non-sentinel value parses as a double — decided from one aggregate
    * over try_cast, then applied as a plain cast. */
  def coerceNumerics(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    if (stringCols.isEmpty) return df
    val checks = stringCols.map { c =>
      (count(when(col(c).isNotNull &&
        expr(s"try_cast(`$c` AS DOUBLE)").isNull, 1)) === 0).as(c)
    }
    val convertible = df.agg(checks.head, checks.tail: _*).head()
    stringCols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      if (convertible.getBoolean(i)) acc.withColumn(c, col(c).cast(DoubleType))
      else acc
    }
  }

  /** The reference's standard cleaning chain (main.py:66-80 order). */
  def cleanResponses(df: DataFrame): DataFrame =
    fillSentinels(stripNumericTags(addTgtTags(lowercaseHeaders(removeTimeCols(df)))))

  /** P7: drop duplicate column names keeping the first occurrence
    * (clustering.py:412,641 — duplicates arise from column-set concat /
    * self-joins). Renames positionally to unique temps, selects the kept
    * positions, restores names — pure driver-side schema work. */
  def dedupColumns(df: DataFrame): DataFrame = {
    val names = df.columns
    if (names.distinct.length == names.length) df
    else {
      val tmp = names.indices.map(i => s"__c$i")
      val keep = names.zipWithIndex.groupBy(_._1).values
        .map(_.head._2).toSeq.sorted
      df.toDF(tmp: _*)
        .select(keep.map(i => col(s"__c$i")): _*)
        .toDF(keep.map(names): _*)
    }
  }

  /** Columns excluded from inference: cint ids, weights, segmentation
    * outputs (chisquared_tester.py:155-190). */
  def inferenceVariables(df: DataFrame, clusterCol: String): Seq[String] =
    df.columns.filterNot { c =>
      val lc = c.toLowerCase
      c == clusterCol || lc.contains("cint") || lc.contains("weight") ||
        lc.contains("segmentation") || lc.contains("_id") || lc == "id"
    }.toSeq
}
