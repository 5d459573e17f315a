package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast-lexicon blocklist gate — the C4/RefinedWeb "bad words
  * list" curation filter (Raffel et al., JMLR 2020 §2.2 dropped any
  * page containing a lexicon phrase; production gates threshold on the
  * hit count instead of hard-dropping). The LEXICON IS DATA, not code:
  * K phrases arrive as a DataFrame and the scan is ONE pass however
  * large K grows — docs explode to word n-grams once per distinct
  * phrase LENGTH (a handful) and equi-join the broadcast lexicon —
  * not K regex passes over the corpus (the naive shape, O(K · corpus)
  * scans) and not a driver-side loop.
  *
  * Match semantics: a hit is every word-aligned window equal to a
  * lexicon phrase (whitespace tokenization, the corpus-wide
  * [[TextOps.tokens]] convention; overlapping windows all count —
  * automaton semantics, exactly what an Aho–Corasick pass over the
  * token stream reports). Exact integer counts; keep = n_hits ≤
  * maxHits. Every doc emits a row (zero-hit docs keep with 0/0).
  *
  * Scale shape: lexicon lengths are a config-sized driver aggregate;
  * per length ONE map-side gram transform over the already-split
  * token array (no self-joins, no positional shuffle) + a BROADCAST
  * equi-join; the only shuffle is the final doc-keyed count. */
object Blocklist {

  /** Hit counts + gate per doc. `lexicon(phraseCol)` holds
    * space-separated word phrases. Output: (idCol, n_hits,
    * n_phrases, keep) — n_phrases = distinct lexicon phrases hit. */
  def blocklistGate(docs: DataFrame, idCol: String, textCol: String,
      lexicon: DataFrame, phraseCol: String, maxHits: Long): DataFrame = {
    val lex = lexicon
      .select(col(phraseCol).as("__phrase"),
        size(TextOps.tokens(col(phraseCol))).as("__len"))
      .filter(col("__len") >= 1).distinct()
    // distinct phrase lengths: a config-sized aggregate collect
    val lengths = lex.select("__len").distinct()
      .collect().map(_.getInt(0)).sorted
    // empty (or all-whitespace) lexicon: nothing can hit — the gate is
    // the all-keep zero-hit report, not an empty.reduce crash
    if (lengths.isEmpty)
      return docs.select(col(idCol),
        lit(0L).as("n_hits"), lit(0L).as("n_phrases"),
        lit(true).as("keep"))
    val toked = docs.select(col(idCol).as("__id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val hits = lengths.map { l =>
      toked
        .filter(size(col("__toks")) >= l)
        .select(col("__id"), explode(expr(
          s"transform(sequence(0, size(__toks) - $l), " +
            s"i -> concat_ws(' ', slice(__toks, i + 1, $l)))")).as("gram"))
        .join(broadcast(lex.filter(col("__len") === l)),
          col("gram") === col("__phrase"))
        .select(col("__id"), col("__phrase"))
    }.reduce(_ unionAll _)
    val perDoc = hits.groupBy("__id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct("__phrase").as("n_phrases"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"))
      .withColumn("keep", col("n_hits") <= maxHits)
  }

  /** The registered lexicon: one unigram, two bigrams, one trigram
    * over the synthetic corpus vocabulary — exercises every gram
    * length the join splits into. */
  private[text] val demoLexicon: Seq[String] =
    Seq("spark", "slow scan", "big table", "key agg row")

  /** q_t_blocklist: gate the documents table on the demo lexicon at
    * maxHits = 3. The oracle rebuilds the word n-gram windows per
    * length with list slicing and replays the counts, the distinct
    * phrases, and the keep flag exactly. */
  private val tBlocklist = Q(
    (s, d) => {
      import s.implicits._
      blocklistGate(Tables.documents(s, d), "doc_id", "text",
        demoLexicon.toDF("phrase"), "phrase", maxHits = 3L)
        .orderBy("doc_id")
    },
    Some {
      // single quotes doubled: a phrase like "don't" must not break
      // the generated SQL
      val lexRows = demoLexicon.map(p =>
        s"('${p.replace("'", "''")}', ${p.split(" ").length})")
        .mkString(", ")
      // one branch per distinct phrase length with L INLINED: DuckDB's
      // LATERAL cannot bind a second FROM-table's column inside the
      // range bound (internal binder error), so the length must be a
      // literal — the SQL is generated from the same lexicon anyway
      val branches = demoLexicon.map(_.split(" ").length).distinct.sorted
        .map { l =>
          s"""SELECT t.doc_id, l.phrase
            FROM toked t, LATERAL (SELECT unnest(range(0,
              greatest(len(t.toks) - $l + 1, 0))) AS i) ii
            JOIN lex l ON l.plen = $l
              AND array_to_string(
                t.toks[CAST(i + 1 AS INT):CAST(i + $l AS INT)], ' ')
                = l.phrase"""
        }.mkString("\n            UNION ALL\n            ")
      s"""WITH lex(phrase, plen) AS (VALUES $lexRows),
          toked AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents),
          hits AS (
            $branches),
          perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
              CAST(COUNT(DISTINCT phrase) AS BIGINT) AS n_phrases
            FROM hits GROUP BY 1)
          SELECT d.doc_id,
            COALESCE(p.n_hits, 0) AS n_hits,
            COALESCE(p.n_phrases, 0) AS n_phrases,
            COALESCE(p.n_hits, 0) <= 3 AS keep
          FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
          ORDER BY d.doc_id"""
    })

  val queries: Map[String, Q] = Map("q_t_blocklist" -> tBlocklist)
}
