package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure `functions._` expressions — whole-stage
  * codegen'd, no UDFs, scale linearly with input and never shuffle
  * (except the explicit aggregations).
  */
object TextOps {

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish pre-tokenizer count — the GPT-2-family pre-tok regex shape
    * (letter runs / digit runs / punctuation runs, each with an optional
    * leading space). The pattern avoids lookahead so the SAME string runs
    * on java.util.regex (Spark) and RE2 (DuckDB oracle). */
  val bpePattern: String = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpePattern), lit(0))).cast("long")

  /** Quality features: chars, tokens, avg token length, punctuation ratio,
    * stopword ratio, uppercase ratio (compare reference-style length/punct
    * heuristics; all single-pass scalar expressions). `toks` must be the
    * MATERIALIZED token-array column (own projection, see [[qualityFeatures]]):
    * passing `tokens(text)` directly re-splits the text once per referencing
    * output column — the [[graft.dedup.DedupOps.shingles]] pathology. */
  def qualityColumns(text: Column, toks: Column): Seq[Column] = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    Seq(
      length(text).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)) /
        greatest(size(toks), lit(1)).cast("double"), 6).as("avg_token_len"),
      round(length(regexp_replace(text, "[^.,!?;:]", "")) /
        greatest(length(text), lit(1)).cast("double"), 6).as("punct_ratio"),
      round(size(filter(toks, t => lower(t).isin(stop: _*))) /
        greatest(size(toks), lit(1)).cast("double"), 6).as("stopword_ratio"),
      round(length(regexp_replace(text, "[^A-Z]", "")) /
        greatest(length(text), lit(1)).cast("double"), 6).as("upper_ratio"))
  }

  /** Quality features over a document frame, tokenizing each text exactly
    * once: the token array is materialized in its own projection, which
    * survives CollapseProject as a multi-referenced non-cheap alias. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("__text"),
        tokens(col(textCol)).as("__toks"))
      .select(col(idCol) +: qualityColumns(col("__text"), col("__toks")): _*)

  /** Language-ID by profile-token hits with a fixed tie-break order —
    * the n-gram/stopword heuristic family; argmax over per-language scores.
    * `toks` must be a materialized token-array column (see [[langId]]). */
  def langIdScoreColumns(toks: Column): Seq[Column] = {
    def score(words: Seq[String]): Column =
      size(filter(toks, t => lower(t).isin(words: _*))).cast("long")
    Seq(score(Seq("the", "and", "of", "fast", "slow")).as("s_en"),
      score(Seq("spark", "shuffle", "partition", "executor", "batch")).as("s_spark"),
      score(Seq("select", "join", "query", "table", "scan")).as("s_sql"))
  }

  /** Argmax over already-computed score columns (attributes, so referencing
    * each score twice here costs nothing). */
  def langPredColumn(sEn: Column, sSpark: Column, sSql: Column): Column =
    when(sEn >= sSpark && sEn >= sSql, "en")
      .when(sSpark >= sSql, "spark").otherwise("sql").as("lang_pred")

  /** Language-ID over a document frame: tokenize once, score once, then
    * argmax over the score ATTRIBUTES — three stacked projections so neither
    * the token split nor the score filters are re-evaluated per reference. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol) +: langIdScoreColumns(col("__toks")): _*)
      .select(col(idCol), col("s_en"), col("s_spark"), col("s_sql"),
        langPredColumn(col("s_en"), col("s_spark"), col("s_sql")))

  /** Canonical fingerprint: md5 over the sorted distinct token set — the
    * classic near-dup "fingerprint" normalization (case/order/dup-insensitive). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(tokens(lower(text))))).cast("binary"))

  // -- registered queries -------------------------------------------------

  private val tTokens = Q(
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
              AS n_tokens,
            CAST(len(regexp_extract_all(text,
              ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT)
              AS n_bpe_tokens,
            CAST(length(text) AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id"""))

  private val tQuality = Q(
    (s, d) => qualityFeatures(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, text,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents)
            SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              ROUND(CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS DOUBLE)
                / GREATEST(len(toks), 1), 6) AS avg_token_len,
              ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                / GREATEST(length(text), 1), 6) AS punct_ratio,
              ROUND(CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','of','and','to','in','is'], lower(x)))) AS DOUBLE)
                / GREATEST(len(toks), 1), 6) AS stopword_ratio,
              ROUND(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                / GREATEST(length(text), 1), 6) AS upper_ratio
            FROM t ORDER BY doc_id"""))

  private val tLangId = Q(
    (s, d) => langId(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents),
            sc AS (SELECT doc_id,
              CAST(len(list_filter(toks, x -> list_contains(
                ['the','and','of','fast','slow'], lower(x)))) AS BIGINT) AS s_en,
              CAST(len(list_filter(toks, x -> list_contains(
                ['spark','shuffle','partition','executor','batch'], lower(x)))) AS BIGINT) AS s_spark,
              CAST(len(list_filter(toks, x -> list_contains(
                ['select','join','query','table','scan'], lower(x)))) AS BIGINT) AS s_sql
              FROM t)
            SELECT doc_id, s_en, s_spark, s_sql,
              CASE WHEN s_en >= s_spark AND s_en >= s_sql THEN 'en'
                   WHEN s_spark >= s_sql THEN 'spark' ELSE 'sql' END AS lang_pred
            FROM sc ORDER BY doc_id"""))

  private val tFingerprint = Q(
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
            md5(array_to_string(list_sort(list_distinct(
              list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' ')) AS fp
            FROM documents ORDER BY doc_id"""))

  val queries: Map[String, Q] = Map(
    "q_t_token_count" -> tTokens,
    "q_t_quality" -> tQuality,
    "q_t_langid" -> tLangId,
    "q_t_fingerprint" -> tFingerprint)
}
